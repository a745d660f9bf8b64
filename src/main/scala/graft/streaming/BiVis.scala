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
      pruneUpTo: Long,
      // DEMAND filter (round 17 — lazy per-attribute views): only
      // attributes some attached standing actually reads are aggregated
      // and tracked in the lane's emitted view; an undemanded
      // attribute's candidates are skipped outright, so a registered-
      // but-unread attribute costs ~0 per advance. A later standing
      // that demands it is served by [[backfill]] — the emitted view is
      // a pure function of (history, lane time), so reconstruction is
      // exact. Index pruning is demand-INDEPENDENT (pruned entries are
      // never needed again by any current lane; backfill scans the
      // datom records, not the sys index).
      demand: String => Boolean = _ => true)
    : (BiVis, Array[(String, Any, Any, Long)])

  /** Reconstruct lane `lane`'s emitted view for `attrs` — attributes the
    * lane's transitions skipped under the demand filter — at its last
    * processed coarse time `t`: aggregate every key of those attributes
    * at the translated fine bounds and upsert the visible results into
    * the lane's emitted view (exact: the emitted view is a pure function
    * of the shared history and the lane time). Called BEFORE a late
    * standing's replay dump. */
  def backfill(lane: Int, win: Option[(Long, Long)], t: (Long, Long),
      sem: BiVisibility.Sem, attrs: Set[String]): BiVis

  /** Lane `lane`'s full emitted view — replay feed for late/rebuilt
    * standing queries on that lane. */
  def dumpEmitted(lane: Int): Iterator[(String, Any, Any, Long)]

  /** Drop lane `lane`'s emitted view (teardown — the lane's last
    * interest left). The shared datom history is untouched; only the
    * lane's output-sized view frees. */
  def dropLane(lane: Int): BiVis

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

  /** TRACE COMPACTION (the reference's `advance_traces`,
    * `src/domain/mod.rs:291-341`, driven by `trace_slack`): datoms at
    * `sys ≤ bound` — behind EVERY registered lane's processed bound
    * minus the declared slack — can never again be distinguished by
    * their sys coordinate at any admissible future query time, so:
    *
    *  - Raw/Distinct keys consolidate per `(key, event)`: the net diff
    *    at each event coordinate (the event-CDF is the ONLY thing a
    *    future aggregate reads from them) — one surviving record per
    *    live (key, event), EXACT for every present and future lane;
    *  - LastWriteWins keys keep the UNION over the registered windows
    *    `wins` of the winner STAIRCASES (the records that are the
    *    running `(coarse sys, coarse event, seq)` maximum as the event
    *    bound sweeps upward) — verbatim, original coordinates — and
    *    drop everything else: a dropped record is beaten by a kept one
    *    at every event bound where it is visible, for every registered
    *    window. EXACT for the registered lanes; a lane registered at a
    *    NEW granularity after a compaction replays the COMPACTED trace
    *    (the reference's late-interest-over-advanced-trace semantics).
    *
    * The event index rewrites to the survivors and the interning
    * dictionaries re-encode (both were append-only before this). */
  def compact(bound: Long, wins: Seq[Option[(Long, Long)]],
      sem: BiVisibility.Sem): BiVis

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

  /** Indices into `recs` (one key's (sys, event, seq) triples) kept by
    * trace compaction for LWW: the UNION over `wins` of the winner
    * staircases — sweep the event bound upward; at each event
    * coordinate, the window's best record there either beats the
    * running winner (→ kept, new running winner) or never wins at any
    * future bound (visible only when the running winner also is).
    * Everything outside the union is beaten at every admissible bound
    * for every registered window. */
  def lwwStaircase(recs: IndexedSeq[(Long, Long, Long)],
      wins: Seq[Option[(Long, Long)]]): Set[Int] = {
    val keep = scala.collection.mutable.Set.empty[Int]
    val byEvent = recs.indices.groupBy(i => recs(i)._2).toSeq.sortBy(_._1)
    wins.foreach { win =>
      def beats(i: Int, j: Int): Boolean =
        lwwGreater(win, recs(i)._1, recs(i)._2, recs(i)._3,
          recs(j)._1, recs(j)._2, recs(j)._3)
      var best = -1
      byEvent.foreach { case (_, idx) =>
        val cand = idx.reduceLeft((a, b) => if (beats(b, a)) b else a)
        if (best < 0 || beats(cand, best)) { best = cand; keep += cand }
      }
    }
    keep.toSet
  }
}
