package graft.streaming

/** Backend seam for the bitemporal visible-view state machine shared by
  * both [[BiStore]] siblings. Two implementations:
  *
  *  - [[BiVisibility]] — the boxed reference implementation (per-key
  *    `List[BiRec]` + TreeMap/HashSet time indexes, ~500 B/datom
  *    measured);
  *  - [[BiPacked]] — the packed sorted-run implementation (datoms as
  *    8-long stride records in [[PackedRuns]], time indexes and emitted
  *    view as packed runs, values interned through a kind-aware
  *    dictionary) — the default; the footprint is dominated by the
  *    8·stride primitive arrays instead of boxed cons cells.
  *
  * The datom HISTORY is stored ONCE at FINE times and shared by every
  * Coarsen lane: a lane is a VIEW dimension (`lane` id + its window),
  * never a second copy of the history — the reference's shape, where
  * every `Interest.granularity` coarsens its own delivery over the ONE
  * shared domain trace (`server/src/main.rs:455-462`). Per-lane state
  * inside a backend is only the lane's EMITTED VIEW (output-sized: one
  * record per currently-visible key), maintained by
  * [[BiVis.transition]] against the shared history.
  *
  * `-Dgraft.bi.packed=off` forces the boxed sibling (A/B + parity
  * tests). The factory is resolved ONCE on the driver — StateCell
  * `zero()` thunks run inside executor tasks where driver system
  * properties are not visible. */
private[streaming] trait BiVis extends Serializable {
  /** Append a batch of datom records at FINE times (pure; shares
    * structure). Every lane sees the same ingested history. */
  def ingest(recs: IterableOnce[(BiKey, BiRec)]): BiVis

  /** Advance lane `lane`'s visible view from `tPrev` to its lex-next
    * completed COARSE time `t` (lattice points of `win`; fine times for
    * `win = None`), returning the successor state and the signed view
    * transitions `(attribute, e, v, ±w)`. Visibility of a fine datom at
    * coarse `t` is `coarse(r.t) ≤ t`, evaluated against the shared fine
    * history via [[BiTime.visBound]]; the LWW winner compares COARSE
    * coordinates (`(coarse(sys), coarse(event), seq)`) — the order the
    * lane's subscribers observe. Scanned sys-index entries at or under
    * `pruneUpTo` are cancelled (they can never be scanned again by any
    * CURRENT lane; the caller computes the min across lanes) — a later
    * transition whose sys slab reaches into the pruned region falls
    * back to an all-keys candidate scan (late-lane replay). */
  def transition(lane: Int, win: Option[(Long, Long)],
      tPrev: Option[(Long, Long)], t: (Long, Long),
      sem: BiVisibility.Sem,
      pruneUpTo: Long): (BiVis, Array[(String, Any, Any, Long)])

  /** Lane `lane`'s full emitted view — replay feed for late/rebuilt
    * standing queries on that lane. */
  def dumpEmitted(lane: Int): Iterator[(String, Any, Any, Long)]

  /** Distinct COARSE times of the ingested history under `win` —
    * lattice reconstruction for a lane attached AFTER transacts (one
    * O(history) scan returning a lattice-sized set). */
  def coarseTimes(win: Option[(Long, Long)]): Iterator[(Long, Long)]

  /** Split by the [[org.apache.spark.HashPartitioner]] BiKey routing
    * into `p` per-partition states (driver → distributed migration).
    * Sys-index entries at or under the already-pruned watermark are
    * dropped — without this, a migration would plant dead full-history
    * sys index weight in every partition. */
  def split(p: Int): IndexedSeq[BiVis]

  /** Declared resident-byte estimate (KnownSizeEstimation input). */
  def estimatedBytes: Long

  def datomCount: Long
}

private[streaming] object BiVis {
  /** Backend factory, resolved once on the driver from the
    * `graft.bi.packed` dial (default: packed). */
  def maker(): () => BiVis =
    if (sys.props.get("graft.bi.packed").contains("off"))
      () => BiVisibility.empty
    else
      () => BiPacked.empty

  def empty: BiVis = maker()()
}

/** Coarsen time arithmetic shared by the backends and [[BiMaintained]]
  * (reference `Coarsen`, `src/timestamp/mod.rs:144-184`). */
private[streaming] object BiTime {
  /** One coordinate rounded STRICTLY up to the next window bound —
    * `(t/w + 1)·w` even at exact multiples; identity for `w ≤ 0`. */
  def coarse(x: Long, w: Long): Long = if (w <= 0L) x else (x / w + 1L) * w

  /** Largest FINE coordinate visible at coarse lattice point `tc`:
    * `coarse(x, w) ≤ tc  ⇔  x ≤ visBound(tc, w)` — the identity for
    * `w ≤ 0`, `tc − 1` on the positive lattice, `tc − w` at/below zero
    * (truncating division rounds toward zero there). */
  def visBound(tc: Long, w: Long): Long =
    if (w <= 0L) tc else if (tc > 0L) tc - 1L else tc - w

  /** Lex compare of two fine (sys, event, seq) triples under the lane's
    * COARSE order: windows first, the global sequence as tie-break —
    * the LWW winner rule a coarsened store would apply natively. */
  def lwwGreater(win: Option[(Long, Long)],
      s1: Long, e1: Long, q1: Long, s2: Long, e2: Long, q2: Long): Boolean = {
    val (ws, we) = win.getOrElse((0L, 0L))
    val cs1 = coarse(s1, ws); val cs2 = coarse(s2, ws)
    if (cs1 != cs2) return cs1 > cs2
    val ce1 = coarse(e1, we); val ce2 = coarse(e2, we)
    if (ce1 != ce2) return ce1 > ce2
    q1 > q2
  }
}
