package graft.streaming

import scala.collection.immutable.HashMap
import scala.collection.mutable

import graft.model.InputSemantics

/** Packed sorted-run implementation of the bitemporal visible-view
  * state machine ([[BiVis]]) — the round-11 answer to the boxed
  * sibling's ~500 B/datom residency (round-10 VERDICT #1):
  *
  *  - DATOMS: one [[PackedRuns]] of 8-long stride records
  *    `[aid, e, v, sys, event, seq, vRec] → diff`, lex-sorted — a key's
  *    history is one prefix scan, already (sys, event, seq)-ordered for
  *    the LWW winner rule. `seq` is globally unique, so records never
  *    collide or cancel in the run merges.
  *  - TIME INDEXES: `bySys [sys, aid, e, v] → count` and
  *    `byEvent [event, aid, e, v] → count` packed runs — a transition's
  *    candidate keys are two first-column range scans
  *    ([[PackedRuns.rangeByFirst]]); duplicate (time, key) entries
  *    collapse to counts at compaction.
  *  - EMITTED VIEW: `[aid, e, v, vEmit] → w` packed runs, updated with
  *    exact retract/assert deltas per transition (nets to ≤ 1 surviving
  *    record per key).
  *  - VALUES: attribute names through a per-instance dictionary (aid);
  *    e/v/vRec natives through a kind-aware long code — 2-bit tag:
  *    inline long (covers KEid/KNumber/KInstant and anything else
  *    |l| < 2⁶¹), null, or an interning dictionary id (strings, reals,
  *    booleans, rationals/variants) — so the per-datom cost is 8 longs
  *    per store touched, and the boxed residual is one dictionary entry
  *    per DISTINCT non-long value, not per datom.
  *
  * All components are immutable with structural sharing / size-tiered
  * run merges — the same StateCell generation discipline as the boxed
  * sibling; `estimatedBytes` is computed from the ACTUAL packed array
  * lengths plus the tracked dictionary payload, never a per-datom
  * constant (the round-10 accounting fix).
  *
  * Semantics are pinned to [[BiVisibility]] (reference
  * `src/timestamp/pair.rs` product order, `tests/input_semantics.rs:
  * 337-508`) by BiMaintainedSpec's cross-backend parity properties. */
final class BiPacked private (
    attrNames: Vector[String],
    attrIds: Map[String, Long],
    dictVals: Vector[Any],
    dictIds: HashMap[Any, Long],
    dictBytes: Long,
    recs: PackedRuns,
    bySys: PackedRuns,
    byEvent: PackedRuns,
    emitted: PackedRuns,
    val datomCount: Long) extends BiVis {

  import BiPacked._

  // ---- value codes ----------------------------------------------------

  private def decode(c: Long): Any = (c & 3L) match {
    case TagInline => c >> 2
    case TagNull   => null
    case _         => dictVals((c >>> 2).toInt)
  }

  /** Mutable encoding context for one batch (dictionary grows once per
    * distinct value; committed into the successor instance). */
  private final class Enc {
    var vals: Vector[Any] = dictVals
    var ids: HashMap[Any, Long] = dictIds
    var bytes: Long = dictBytes
    def code(x: Any): Long = x match {
      case null => TagNull
      case l: Long if (l << 2 >> 2) == l => (l << 2) | TagInline
      case other =>
        ids.get(other) match {
          case Some(i) => i << 2
          case None =>
            val i = vals.length.toLong
            vals = vals :+ other
            ids = ids.updated(other, i)
            bytes += valBytes(other)
            i << 2
        }
    }
  }

  // ---- BiVis ----------------------------------------------------------

  def ingest(rs: IterableOnce[(BiKey, BiRec)]): BiPacked = {
    val enc = new Enc
    var names = attrNames
    var ids = attrIds
    def aid(a: String): Long = ids.get(a) match {
      case Some(i) => i
      case None =>
        val i = names.length.toLong
        names = names :+ a; ids = ids.updated(a, i); i
    }
    val rb = mutable.ArrayBuilder.make[Long]
    val sb = mutable.ArrayBuilder.make[Long]
    val eb = mutable.ArrayBuilder.make[Long]
    var n = datomCount
    rs.iterator.foreach { case (k, r) =>
      val ai = aid(k.a); val ec = enc.code(k.e); val vc = enc.code(k.v)
      rb += ai; rb += ec; rb += vc
      rb += r.sys; rb += r.event; rb += r.seq; rb += enc.code(r.v)
      rb += r.diff
      sb += r.sys; sb += ai; sb += ec; sb += vc; sb += 1L
      eb += r.event; eb += ai; eb += ec; eb += vc; eb += 1L
      n += 1
    }
    new BiPacked(names, ids, enc.vals, enc.ids, enc.bytes,
      recs.merged(rb.result()), bySys.merged(sb.result()),
      byEvent.merged(eb.result()), emitted, n)
  }

  def transition(tPrev: Option[(Long, Long)], t: (Long, Long),
      sem: BiVisibility.Sem): (BiVis, Array[(String, Any, Any, Long)]) = {
    val (ty, te) = t
    // Candidate keys: exactly the boxed sibling's slab rule — sys slab
    // (py, ty] union event slab (min(pe,te), max(pe,te)]; first
    // transition scans everything with a datom at sys ≤ ty.
    //
    // The sys index is PRUNED as it is scanned: times process in lex
    // order so the processed sys coordinate only advances, transact
    // rejects writes at or under the frontier (every new datom's sys is
    // strictly above the last processed sys), and future slabs
    // (py', ty'] have py' ≥ ty — a scanned entry can never be queried
    // again. Appending the exact negative counts cancels the entries at
    // the next run merge, so the RESIDENT sys index holds only
    // not-yet-visible datoms (~0 in steady state) instead of the full
    // history's 40 B/datom. The event index cannot be pruned the same
    // way (event slabs move in both directions).
    val sysPrune = mutable.ArrayBuilder.make[Long]
    def pruning(it: Iterator[(Array[Long], Long)]) = it.map { e =>
      sysPrune += e._1(0); sysPrune += e._1(1); sysPrune += e._1(2)
      sysPrune += e._1(3); sysPrune += -e._2
      e
    }
    val cands: Iterator[(Array[Long], Long)] = tPrev match {
      case None => pruning(bySys.rangeByFirst(Long.MinValue, ty))
      case Some((py, pe)) =>
        val sysSlab =
          if (ty > py) pruning(bySys.rangeByFirst(py + 1, ty))
          else Iterator.empty
        val lo = math.min(pe, te); val hi = math.max(pe, te)
        val evSlab =
          if (hi > lo) byEvent.rangeByFirst(lo + 1, hi) else Iterator.empty
        sysSlab ++ evSlab
    }
    val seen = mutable.HashSet.empty[(Long, Long, Long)]
    val out = mutable.ArrayBuffer.empty[(String, Any, Any, Long)]
    val ed = mutable.ArrayBuilder.make[Long]
    val key = new Array[Long](3)
    cands.foreach { case (entry, _) =>
      val ai = entry(1); val ec = entry(2); val vc = entry(3)
      if (seen.add((ai, ec, vc))) {
        key(0) = ai; key(1) = ec; key(2) = vc
        val aName = attrNames(ai.toInt)
        val cur = aggregate(key, ty, te, sem(aName))
        val prev = emittedOf(key)
        if (cur != prev) {
          def emit(vEmit: Long, dw: Long): Unit = {
            out += ((aName, decode(ec), decode(vEmit), dw))
            ed += ai; ed += ec; ed += vc; ed += vEmit; ed += dw
          }
          (prev, cur) match {
            // Weight change on the same value: one signed delta; an LWW
            // winner change: regression (-old) plus assertion (+new).
            case (Some((pv, pw)), Some((cv, cw))) if pv == cv =>
              emit(cv, cw - pw)
            case _ =>
              prev.foreach { case (pv, pw) => emit(pv, -pw) }
              cur.foreach { case (cv, cw) => emit(cv, cw) }
          }
        }
      }
    }
    (new BiPacked(attrNames, attrIds, dictVals, dictIds, dictBytes,
      recs, bySys.merged(sysPrune.result()), byEvent,
      emitted.merged(ed.result()), datomCount),
      out.toArray)
  }

  /** Visible aggregate of the encoded key at `(ty, te)` as
    * `(vEmit code, w)` — the packed mirror of the boxed `aggregate`
    * (BiEngine's `asOfBi` rules verbatim). */
  private def aggregate(key: Array[Long], ty: Long, te: Long,
      semantics: InputSemantics): Option[(Long, Long)] = {
    var sum = 0L
    var any = false
    var bSys = Long.MinValue; var bEv = Long.MinValue; var bSeq = Long.MinValue
    var bV = 0L; var bDiff = 0L
    recs.prefix(key).foreach { case (rest, diff) =>
      val s = rest(0); val ev = rest(1)
      if (s <= ty && ev <= te) {
        any = true
        sum += diff
        val seq = rest(2)
        if (s > bSys || (s == bSys && (ev > bEv || (ev == bEv && seq > bSeq)))) {
          bSys = s; bEv = ev; bSeq = seq; bV = rest(3); bDiff = diff
        }
      }
    }
    if (!any) None
    else semantics match {
      case InputSemantics.LastWriteWins =>
        if (bDiff > 0L) Some((bV, 1L)) else None
      case InputSemantics.Distinct =>
        if (sum > 0L) Some((key(2), 1L)) else None
      case InputSemantics.Raw =>
        val w = math.max(0L, sum)
        if (w > 0L) Some((key(2), w)) else None
    }
  }

  /** Current emitted record of the encoded key (≤ 1 by construction —
    * every transition retracts exactly before asserting). */
  private def emittedOf(key: Array[Long]): Option[(Long, Long)] = {
    val it = emitted.prefix(key)
    if (it.hasNext) { val (rest, w) = it.next(); Some((rest(0), w)) }
    else None
  }

  def dumpEmitted: Iterator[(String, Any, Any, Long)] =
    emitted.iterator.map { case (k, w) =>
      (attrNames(k(0).toInt), decode(k(1)), decode(k(3)), w)
    }

  def split(p: Int, processedSys: Option[Long]): IndexedSeq[BiVis] = {
    // One-time migration (gate flip): decode, route by the SAME BiKey
    // hash the CellBiStore's HashPartitioner uses, rebuild per-partition
    // packed states with partition-local dictionaries.
    def slot(k: BiKey): Int = {
      val h = k.hashCode % p; if (h < 0) h + p else h
    }
    val datomBuf = Array.fill(p)(mutable.ArrayBuffer.empty[(BiKey, BiRec)])
    recs.iterator.foreach { case (rk, diff) =>
      val k = BiKey(attrNames(rk(0).toInt), decode(rk(1)), decode(rk(2)))
      datomBuf(slot(k)) += ((k,
        BiRec(rk(3), rk(4), rk(5), diff, decode(rk(6)))))
    }
    val emitBuf = Array.fill(p)(mutable.ArrayBuffer.empty[(BiKey, Any, Long)])
    emitted.iterator.foreach { case (ek, w) =>
      val k = BiKey(attrNames(ek(0).toInt), decode(ek(1)), decode(ek(2)))
      emitBuf(slot(k)) += ((k, decode(ek(3)), w))
    }
    (0 until p).map { i =>
      BiPacked.empty.ingest(datomBuf(i)).plantEmitted(emitBuf(i))
        .pruneSysThrough(processedSys)
    }
  }

  /** Cancel every sys-index entry at or under `sy` (one range scan +
    * negative-count merge). Migration-time counterpart of the
    * transition-time scan-prune: ingest() re-derived sys entries for
    * already-processed datoms, which future slabs (strictly above the
    * processed sys) would never scan — without this they would stay
    * resident forever. */
  private def pruneSysThrough(processedSys: Option[Long]): BiPacked =
    processedSys match {
      case None => this
      case Some(sy) =>
        // REBUILD (netted, single run) rather than appending negative
        // cancels: a migration is one-time, and an appended cancel run
        // would leave the dead entries resident until a later tier
        // merge — the opposite of the point.
        val b = mutable.ArrayBuilder.make[Long]
        bySys.iterator.foreach { case (e, c) =>
          if (e(0) > sy) { b += e(0); b += e(1); b += e(2); b += e(3); b += c }
        }
        new BiPacked(attrNames, attrIds, dictVals, dictIds, dictBytes,
          recs, PackedRuns.empty(4).merged(b.result()), byEvent, emitted,
          datomCount)
    }

  /** Plant an emitted view wholesale (migration only). */
  private def plantEmitted(rows: Iterable[(BiKey, Any, Long)]): BiPacked = {
    val enc = new Enc
    var names = attrNames
    var ids = attrIds
    def aid(a: String): Long = ids.get(a) match {
      case Some(i) => i
      case None =>
        val i = names.length.toLong
        names = names :+ a; ids = ids.updated(a, i); i
    }
    val ed = mutable.ArrayBuilder.make[Long]
    rows.foreach { case (k, vEmit, w) =>
      ed += aid(k.a); ed += enc.code(k.e); ed += enc.code(k.v)
      ed += enc.code(vEmit); ed += w
    }
    new BiPacked(names, ids, enc.vals, enc.ids, enc.bytes,
      recs, bySys, byEvent, emitted.merged(ed.result()), datomCount)
  }

  /** Resident bytes from the ACTUAL packed array lengths plus the
    * tracked dictionary payload — measured structure, not a per-datom
    * constant. */
  def estimatedBytes: Long =
    recs.bytes + bySys.bytes + byEvent.bytes + emitted.bytes +
      dictBytes + attrNames.length.toLong * 80L + 256L
}

object BiPacked {
  private final val TagDict = 0L
  private final val TagInline = 1L
  private final val TagNull = 2L

  /** Approximate heap cost of one interned dictionary value: the boxed
    * payload plus its HashMap entry and Vector slot. */
  private def valBytes(x: Any): Long = 64L + (x match {
    case s: String => 40L + 2L * s.length
    case _         => 32L
  })

  def empty: BiPacked = new BiPacked(Vector.empty, Map.empty,
    Vector.empty, HashMap.empty, 0L,
    PackedRuns.empty(7), PackedRuns.empty(4), PackedRuns.empty(4),
    PackedRuns.empty(4), 0L)
}
