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
  * `-Dgraft.bi.packed=off` forces the boxed sibling (A/B + parity
  * tests). The factory is resolved ONCE on the driver — StateCell
  * `zero()` thunks run inside executor tasks where driver system
  * properties are not visible. */
private[streaming] trait BiVis extends Serializable {
  /** Append a batch of datom records (pure; shares structure). */
  def ingest(recs: IterableOnce[(BiKey, BiRec)]): BiVis

  /** Advance the visible view from `tPrev` to lex-next completed `t`,
    * returning the successor state and the signed view transitions
    * `(attribute, e, v, ±w)`. */
  def transition(tPrev: Option[(Long, Long)], t: (Long, Long),
      sem: BiVisibility.Sem): (BiVis, Array[(String, Any, Any, Long)])

  /** The full emitted view — replay feed for late/rebuilt standing
    * queries. */
  def dumpEmitted: Iterator[(String, Any, Any, Long)]

  /** Split by the [[org.apache.spark.HashPartitioner]] BiKey routing
    * into `p` per-partition states (driver → distributed migration).
    * `processedSys` is the last processed system-time coordinate: sys
    * index entries at or under it can never be scanned again (future
    * slabs are `(py+1, ty]` and the processed sys only advances), so
    * the split drops them — without this, a migration would plant a
    * permanently-resident full-history sys index in every partition. */
  def split(p: Int, processedSys: Option[Long]): IndexedSeq[BiVis]

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
