package graft.streaming

import scala.collection.immutable.{HashMap, HashSet, TreeMap}
import scala.collection.mutable

import graft.model.InputSemantics

/** Key of a maintained bitemporal visible-view entry. For Raw/Distinct
  * attributes the view is per `(e, v)` pair (`v` rides in the key); for
  * LastWriteWins the view is per entity (`v` is null in the key — the
  * winner value lives in the emitted record). `e`/`v` are NATIVE values
  * ([[graft.model.Value.native]]), hash-stable across JVMs. */
final case class BiKey(a: String, e: Any, v: Any)

/** One bitemporal datom occurrence under its key: FINE `Pair(sys,
  * event)` coordinates, the global transaction sequence (LWW
  * tie-break), the signed input diff, and — for LWW keys only — the
  * written value. */
final case class BiRec(sys: Long, event: Long, seq: Long, diff: Long, v: Any)

/** Per-key emitted view record: the value column and its served weight
  * (Raw: clamped net weight; Distinct: 1; LWW: winner value, weight 1). */
final case class BiEmit(v: Any, w: Long)

/** The incremental bitemporal visible-view state machine — the datom
  * history INDEXED for O(toggled + touched-keys) view transitions, in
  * place of the round-9 O(history)-per-completed-time driver rescan
  * (`viewAt`). One instance serves either the whole (byte-gated small)
  * history on the driver or ONE PARTITION of it inside a [[StateCell]]
  * — the distributed arrangement analog the reference keeps its datoms
  * in (`src/domain/mod.rs` arrangements over `Pair(sys, event)`,
  * `src/timestamp/pair.rs`).
  *
  * Structure: per-key datom lists plus two one-dimensional FINE time
  * indexes (`bySys`, `byEvent`: time coordinate → keys with a datom
  * there), SHARED by every Coarsen lane, plus one EMITTED VIEW per lane
  * (output-sized). A lane's transition from processed coarse time
  * `tPrev` to the next lex coarse time `t` resolves the keys whose
  * visibility can change from the indexes — a fine datom is visible at
  * coarse `t` iff its fine coordinates are at or under
  * [[BiTime.visBound]] of each, so visible(t) Δ visible(tPrev) lies
  * inside the translated fine sys/event slabs; candidates are the index
  * entries of those ranges, a superset of the true toggled keys — then
  * re-aggregates JUST those keys against `t` (LWW winners compared in
  * the lane's COARSE order) and emits the signed difference vs the
  * lane's emitted view. Scanned sys entries at or under `pruneUpTo`
  * (the min across lanes) are dropped; a transition reaching into the
  * pruned region (a late lane's replay) falls back to an all-keys
  * candidate scan. All collections are immutable with
  * structural-sharing updates: inside a StateCell each generation
  * shares unchanged sub-trees with its predecessor (the [[StateCell]]
  * O(delta + touched keys) discipline).
  */
final class BiVisibility private (
    val datoms: HashMap[BiKey, List[BiRec]],
    val bySys: TreeMap[Long, HashSet[BiKey]],
    val byEvent: TreeMap[Long, HashSet[BiKey]],
    val emitted: HashMap[Int, HashMap[BiKey, BiEmit]],
    val prunedThrough: Long,
    val datomCount: Long) extends BiVis {

  import BiVisibility.Sem

  /** Append a batch of datom records (pure; shares structure). */
  def ingest(recs: IterableOnce[(BiKey, BiRec)]): BiVisibility = {
    var d = datoms; var s = bySys; var e = byEvent; var n = datomCount
    recs.iterator.foreach { case (k, r) =>
      d = d.updated(k, r :: d.getOrElse(k, Nil))
      s = s.updated(r.sys, s.getOrElse(r.sys, HashSet.empty) + k)
      e = e.updated(r.event, e.getOrElse(r.event, HashSet.empty) + k)
      n += 1
    }
    new BiVisibility(d, s, e, emitted, prunedThrough, n)
  }

  /** Advance lane `lane`'s visible view from `tPrev` (the last
    * processed coarse pair time, None before the first) to `t`, its
    * next lex-ordered completed coarse time. Returns the successor
    * state and the signed view transitions `(attribute, e, v, ±w)` —
    * exactly the rows the standing queries consume. `sem` resolves each
    * attribute's input semantics (Raw clamp / Distinct support / LWW
    * coarse-lex-latest winner — BiEngine's `asOfBi` rules verbatim). */
  def transition(lane: Int, win: Option[(Long, Long)],
      tPrev: Option[(Long, Long)], t: (Long, Long), sem: Sem,
      pruneUpTo: Long,
      demand: String => Boolean = _ => true)
    : (BiVisibility, Array[(String, Any, Any, Long)]) = {
    val (ws, we) = win.getOrElse((0L, 0L))
    val sy = BiTime.visBound(t._1, ws)
    val ev = BiTime.visBound(t._2, we)
    val needLow: Long = tPrev match {
      case None          => Long.MinValue
      case Some((py, _)) => BiTime.visBound(py, ws) + 1L
    }
    val cands: Iterator[BiKey] =
      // Slab reaches into the pruned region (late-lane replay): all-keys.
      if (prunedThrough > Long.MinValue && needLow <= prunedThrough)
        datoms.keysIterator
      else tPrev match {
        case None =>
          bySys.rangeTo(sy).valuesIterator.flatten
        case Some((py, pe)) =>
          val psy = BiTime.visBound(py, ws)
          val sysSlab =
            if (sy > psy) bySys.range(psy + 1, sy + 1).valuesIterator.flatten
            else Iterator.empty
          val pev = BiTime.visBound(pe, we)
          val lo = math.min(pev, ev); val hi = math.max(pev, ev)
          val evSlab =
            if (hi > lo) byEvent.range(lo + 1, hi + 1).valuesIterator.flatten
            else Iterator.empty
          sysSlab ++ evSlab
      }
    val seen = mutable.HashSet.empty[BiKey]
    val out = mutable.ArrayBuffer.empty[(String, Any, Any, Long)]
    var em = emitted.getOrElse(lane, HashMap.empty)
    cands.foreach { k =>
      if (seen.add(k) && demand(k.a)) {
        val cur = aggregate(k, sy, ev, win, sem(k.a))
        val prev = em.get(k)
        (prev, cur) match {
          case (None, None) => ()
          case (Some(p), Some(c)) if p == c => ()
          case _ =>
            // Weight change on the same value emits one signed delta;
            // an LWW winner change emits the regression (-1 old value)
            // plus the assertion (+1 new value).
            (prev, cur) match {
              case (Some(p), Some(c)) if p.v == c.v =>
                if (c.w != p.w) out += ((k.a, k.e, c.v, c.w - p.w))
              case _ =>
                prev.foreach(p => out += ((k.a, k.e, p.v, -p.w)))
                cur.foreach(c => out += ((k.a, k.e, c.v, c.w)))
            }
            em = cur match {
              case Some(c) => em.updated(k, c)
              case None    => em.removed(k)
            }
        }
      }
    }
    // Self-prune: entries at or under the min-across-lanes processed
    // bound can never be scanned again (slabs are (prev, cur] and every
    // lane's bound only advances); late lanes replay via the all-keys
    // fallback above.
    val (sysKept, pruned) =
      if (pruneUpTo > prunedThrough) (bySys.rangeFrom(pruneUpTo + 1L), pruneUpTo)
      else (bySys, prunedThrough)
    (new BiVisibility(datoms, sysKept, byEvent,
      emitted.updated(lane, em), pruned, datomCount), out.toArray)
  }

  /** Visible aggregate of key `k` at the TRANSLATED fine bounds
    * `(sy, ev)` — None when the key serves nothing there. The LWW
    * winner compares the lane's COARSE coordinates. */
  private def aggregate(k: BiKey, sy: Long, ev: Long,
      win: Option[(Long, Long)],
      semantics: InputSemantics): Option[BiEmit] = {
    val visible = datoms.getOrElse(k, Nil)
      .filter(r => r.sys <= sy && r.event <= ev)
    if (visible.isEmpty) None
    else semantics match {
      case InputSemantics.LastWriteWins =>
        val last = visible.reduceLeft { (a, b) =>
          if (BiTime.lwwGreater(win, b.sys, b.event, b.seq,
            a.sys, a.event, a.seq)) b else a
        }
        if (last.diff > 0L) Some(BiEmit(last.v, 1L)) else None
      case InputSemantics.Distinct =>
        if (visible.map(_.diff).sum > 0L) Some(BiEmit(k.v, 1L)) else None
      case InputSemantics.Raw =>
        val w = math.max(0L, visible.map(_.diff).sum)
        if (w > 0L) Some(BiEmit(k.v, w)) else None
    }
  }

  /** Reconstruct lane `lane`'s emitted view for previously-undemanded
    * `attrs` at its last processed coarse time `t` — one pass over those
    * attributes' keys, aggregated at the translated fine bounds (exact
    * on compacted history too: survivors carry collapsed sys ≤ every
    * lane's processed bound and verbatim event coordinates). */
  def backfill(lane: Int, win: Option[(Long, Long)], t: (Long, Long),
      sem: Sem, attrs: Set[String]): BiVisibility = {
    val (ws, we) = win.getOrElse((0L, 0L))
    val sy = BiTime.visBound(t._1, ws)
    val ev = BiTime.visBound(t._2, we)
    var em = emitted.getOrElse(lane, HashMap.empty)
    datoms.keysIterator.foreach { k =>
      if (attrs.contains(k.a)) {
        aggregate(k, sy, ev, win, sem(k.a)) match {
          case Some(c) => em = em.updated(k, c)
          case None    => em = em.removed(k)
        }
      }
    }
    // Stale emitted keys with NO surviving history (fully retracted and
    // slack-compacted away while the attribute was unmaintained under a
    // covered-shrink window) are unreachable from the datoms iteration —
    // retract them here or a re-attached standing replays phantom rows.
    em.keysIterator.toList.foreach { k =>
      if (attrs.contains(k.a) && !datoms.contains(k)) em = em.removed(k)
    }
    new BiVisibility(datoms, bySys, byEvent, emitted.updated(lane, em),
      prunedThrough, datomCount)
  }

  /** Lane `lane`'s full emitted view — replay feed for a standing query
    * built (or rebuilt on a revealed kind) after times were already
    * processed. */
  def dumpEmitted(lane: Int): Iterator[(String, Any, Any, Long)] =
    emitted.getOrElse(lane, HashMap.empty[BiKey, BiEmit])
      .iterator.map { case (k, e) => (k.a, k.e, e.v, e.w) }

  /** Drop lane `lane`'s emitted view (teardown). */
  def dropLane(lane: Int): BiVisibility =
    new BiVisibility(datoms, bySys, byEvent, emitted.removed(lane),
      prunedThrough, datomCount)

  /** Distinct coarse times of the history under `win` (late-lane
    * lattice reconstruction; lattice-sized output). */
  def coarseTimes(win: Option[(Long, Long)]): Iterator[(Long, Long)] = {
    val (ws, we) = win.getOrElse((0L, 0L))
    val seen = mutable.HashSet.empty[(Long, Long)]
    datoms.valuesIterator.flatten.foreach { r =>
      seen += ((BiTime.coarse(r.sys, ws), BiTime.coarse(r.event, we)))
    }
    seen.iterator
  }

  /** Split by the [[org.apache.spark.HashPartitioner]] key routing into
    * `p` per-partition states — the one-time driver → distributed
    * migration when a growing history crosses the byte gate. The
    * already-pruned sys watermark rides along. */
  def split(p: Int): IndexedSeq[BiVisibility] = {
    def slot(k: BiKey): Int = {
      val h = k.hashCode % p; if (h < 0) h + p else h
    }
    (0 until p).map { i =>
      val d = datoms.filter { case (k, _) => slot(k) == i }
      val keep = d.keySet
      def prune(idx: TreeMap[Long, HashSet[BiKey]]) =
        idx.iterator.map { case (c, ks) => c -> ks.filter(keep) }
          .filter(_._2.nonEmpty)
          .foldLeft(TreeMap.empty[Long, HashSet[BiKey]])(_ + _)
      new BiVisibility(d, prune(bySys), prune(byEvent),
        emitted.iterator.map { case (lane, em) =>
          lane -> em.filter { case (k, _) => slot(k) == i }
        }.filter(_._2.nonEmpty)
          .foldLeft(HashMap.empty[Int, HashMap[BiKey, BiEmit]])(_ + _),
        prunedThrough,
        d.valuesIterator.map(_.size.toLong).sum)
    }
  }

  /** Trace compaction — see [[BiVis.compact]]. Consolidates the
    * `sys ≤ bound` portion of every key's history (per-event nets for
    * Raw/Distinct, registered-window winner staircases for LWW) and
    * rebuilds both time indexes to the survivors. */
  def compact(bound: Long, wins: Seq[Option[(Long, Long)]],
      sem: Sem): BiVisibility = {
    var d = HashMap.empty[BiKey, List[BiRec]]
    var n = 0L
    datoms.foreach { case (k, rs) =>
      val (old, recent) = rs.partition(_.sys <= bound)
      val kept: List[BiRec] =
        if (old.isEmpty) rs
        else sem(k.a) match {
          case InputSemantics.LastWriteWins =>
            val arr = old.toIndexedSeq
            val keepIdx = BiTime.lwwStaircase(
              arr.map(r => (r.sys, r.event, r.seq)), wins)
            recent ++ keepIdx.toSeq.sorted.map(arr)
          case _ =>
            // Per-event net: the event-CDF is everything a future
            // aggregate reads from the compacted region. The surviving
            // record's sys collapses to the bound (visible at every
            // admissible future time); seq keeps the group max
            // (uniqueness across groups for the packed sibling's runs).
            recent ++ old.groupBy(_.event).toList.collect {
              case (e, grp) if grp.map(_.diff).sum != 0L =>
                BiRec(bound, e, grp.map(_.seq).max, grp.map(_.diff).sum, null)
            }
        }
      if (kept.nonEmpty) { d = d.updated(k, kept); n += kept.size }
    }
    var s = TreeMap.empty[Long, HashSet[BiKey]]
    var e = TreeMap.empty[Long, HashSet[BiKey]]
    d.foreach { case (k, rs) =>
      rs.foreach { r =>
        if (r.sys > prunedThrough)
          s = s.updated(r.sys, s.getOrElse(r.sys, HashSet.empty) + k)
        e = e.updated(r.event, e.getOrElse(r.event, HashSet.empty) + k)
      }
    }
    new BiVisibility(d, s, e, emitted, prunedThrough, n)
  }

  /** Declared resident-byte estimate (KnownSizeEstimation input). The
    * per-datom constant is the MEASURED SizeEstimator figure for this
    * boxed layout (BiRec + List cons + two TreeMap/HashSet index
    * entries ≈ 500 B/datom — round-10 VERDICT; the packed [[BiPacked]]
    * sibling replaces the constant with actual array lengths). */
  def estimatedBytes: Long =
    datomCount * 500L +
      emitted.valuesIterator.map(_.size.toLong).sum * 130L +
      (bySys.size + byEvent.size).toLong * 80L
}

object BiVisibility {
  /** Attribute → input-semantics resolver shipped into closures. */
  type Sem = String => InputSemantics

  def empty: BiVisibility = new BiVisibility(
    HashMap.empty, TreeMap.empty, TreeMap.empty, HashMap.empty,
    Long.MinValue, 0L)
}
