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

/** One bitemporal datom occurrence under its key: `Pair(sys, event)`
  * coordinates, the global transaction sequence (LWW tie-break), the
  * signed input diff, and — for LWW keys only — the written value. */
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
  * Structure: per-key datom lists plus two one-dimensional time indexes
  * (`bySys`, `byEvent`: time coordinate → keys with a datom there). A
  * transition from processed time `tPrev` to the next lex time `t`
  * resolves the keys whose visibility can change from the indexes —
  * visible(t) Δ visible(tPrev) lies inside the sys-slab `(tPrev.sys,
  * t.sys]` union the event-slab `(min(e), max(e)]`, so candidates are
  * the index entries of those ranges, a superset of the true toggled
  * keys — then re-aggregates JUST those keys against `t` and emits the
  * signed difference vs the emitted view. All collections are immutable
  * with structural-sharing updates: inside a StateCell each generation
  * shares unchanged sub-trees with its predecessor (the [[StateCell]]
  * O(delta + touched keys) discipline).
  */
final class BiVisibility private (
    val datoms: HashMap[BiKey, List[BiRec]],
    val bySys: TreeMap[Long, HashSet[BiKey]],
    val byEvent: TreeMap[Long, HashSet[BiKey]],
    val emitted: HashMap[BiKey, BiEmit],
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
    new BiVisibility(d, s, e, emitted, n)
  }

  /** Advance the visible view from `tPrev` (the last processed pair
    * time, None before the first) to `t`, the next lex-ordered
    * completed time. Returns the successor state and the signed view
    * transitions `(attribute, e, v, ±w)` — exactly the rows the
    * standing queries consume. `sem` resolves each attribute's input
    * semantics (Raw clamp / Distinct support / LWW lex-latest winner —
    * BiEngine's `asOfBi` rules verbatim). */
  def transition(tPrev: Option[(Long, Long)], t: (Long, Long),
      sem: Sem): (BiVisibility, Array[(String, Any, Any, Long)]) = {
    val (ty, te) = t
    val cands: Iterator[BiKey] = tPrev match {
      case None =>
        bySys.rangeTo(ty).valuesIterator.flatten
      case Some((py, pe)) =>
        val sysSlab =
          if (ty > py) bySys.range(py + 1, ty + 1).valuesIterator.flatten
          else Iterator.empty
        val lo = math.min(pe, te); val hi = math.max(pe, te)
        val evSlab =
          if (hi > lo) byEvent.range(lo + 1, hi + 1).valuesIterator.flatten
          else Iterator.empty
        sysSlab ++ evSlab
    }
    val seen = mutable.HashSet.empty[BiKey]
    val out = mutable.ArrayBuffer.empty[(String, Any, Any, Long)]
    var em = emitted
    cands.foreach { k =>
      if (seen.add(k)) {
        val cur = aggregate(k, ty, te, sem(k.a))
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
    (new BiVisibility(datoms, bySys, byEvent, em, datomCount), out.toArray)
  }

  /** Visible aggregate of key `k` at pair time `(ty, te)` — None when
    * the key serves nothing there. */
  private def aggregate(k: BiKey, ty: Long, te: Long,
      semantics: InputSemantics): Option[BiEmit] = {
    val visible = datoms.getOrElse(k, Nil)
      .filter(r => r.sys <= ty && r.event <= te)
    if (visible.isEmpty) None
    else semantics match {
      case InputSemantics.LastWriteWins =>
        val last = visible.maxBy(r => (r.sys, r.event, r.seq))
        if (last.diff > 0L) Some(BiEmit(last.v, 1L)) else None
      case InputSemantics.Distinct =>
        if (visible.map(_.diff).sum > 0L) Some(BiEmit(k.v, 1L)) else None
      case InputSemantics.Raw =>
        val w = math.max(0L, visible.map(_.diff).sum)
        if (w > 0L) Some(BiEmit(k.v, w)) else None
    }
  }

  /** The full emitted view — replay feed for a standing query built (or
    * rebuilt on a revealed kind) after times were already processed. */
  def dumpEmitted: Iterator[(String, Any, Any, Long)] =
    emitted.iterator.map { case (k, e) => (k.a, k.e, e.v, e.w) }

  /** Split by the [[org.apache.spark.HashPartitioner]] key routing into
    * `p` per-partition states — the one-time driver → distributed
    * migration when a growing history crosses the byte gate. */
  def split(p: Int, processedSys: Option[Long]): IndexedSeq[BiVisibility] = {
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
      // Sys entries at or under the processed frontier can never be
      // scanned again (slabs are (py+1, ty], processed sys only
      // advances) — drop them instead of planting dead index weight.
      val sysKept = processedSys match {
        case None     => prune(bySys)
        case Some(sy) => prune(bySys.rangeFrom(sy + 1))
      }
      new BiVisibility(d, sysKept, prune(byEvent),
        emitted.filter { case (k, _) => slot(k) == i },
        d.valuesIterator.map(_.size.toLong).sum)
    }
  }

  /** Declared resident-byte estimate (KnownSizeEstimation input). The
    * per-datom constant is the MEASURED SizeEstimator figure for this
    * boxed layout (BiRec + List cons + two TreeMap/HashSet index
    * entries ≈ 500 B/datom — round-10 VERDICT; the packed [[BiPacked]]
    * sibling replaces the constant with actual array lengths). */
  def estimatedBytes: Long =
    datomCount * 500L + emitted.size.toLong * 130L +
      (bySys.size + byEvent.size).toLong * 80L
}

object BiVisibility {
  /** Attribute → input-semantics resolver shipped into closures. */
  type Sem = String => InputSemantics

  def empty: BiVisibility = new BiVisibility(
    HashMap.empty, TreeMap.empty, TreeMap.empty, HashMap.empty, 0L)
}
