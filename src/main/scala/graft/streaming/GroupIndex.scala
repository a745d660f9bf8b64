package graft.streaming

import scala.collection.mutable

import graft.model.ValueKind

/** Key-grouped weighted-row state behind the footprint seam — the
  * compound support tables of the join / antijoin-left / aggregate /
  * pull-level nodes (`key → (row → net weight)`). Two backends:
  *
  *  - [[BoxedGroups]]: the original nested `immutable.HashMap` trie
  *    (~240 B/entry measured) — structural sharing per batch;
  *  - [[PackedGroups]]: for ALL-LONG key+row kinds, records pack as
  *    `key ++ row ++ weight` strides into [[PackedRuns]] (~8·(kw+rw+1)
  *    B/entry), group reads are prefix scans over the key columns, and
  *    a batch appends one netted delta run (size-tiered merge — the
  *    same amortized O(delta) as structural sharing). Null-bearing rows
  *    route to a boxed side map, so packing is an optimization, never a
  *    semantics change. `-Dgraft.iq.runs=off` forces the boxed backend.
  *
  * Readers materialize a group's `WMap` per TOUCHED key per batch (the
  * advance functions' access pattern); reads always see the pre-batch
  * state — `merged` is applied once per batch with the full netted
  * delta, exactly the discipline the nested-map code kept implicitly.
  */
sealed trait GroupIndex extends Serializable {
  /** Net-weighted rows under `k` (empty when none). */
  def group(k: Seq[Any]): IncrementalQuery.WMap
  /** Apply one batch of netted `((key, row), ±w)` deltas. */
  def merged(deltas: Iterable[((Seq[Any], Seq[Any]), Long)]): GroupIndex
  /** Declared resident bytes (KnownSizeEstimation input). */
  def bytes: Long
}

object GroupIndex {
  /** Backend factory, resolved ONCE on the DRIVER from the key/row
    * column kinds and the `-Dgraft.iq.runs` dial. The returned thunk
    * bakes the decision in: StateCell zero() closures execute inside
    * executor tasks, where the driver's system properties are not
    * visible — reading the dial there would silently ignore the A/B
    * switch on any multi-JVM deployment. */
  def maker(keyKinds: Seq[ValueKind], rowKinds: Seq[ValueKind]): () => GroupIndex = {
    val packed = !sys.props.get("graft.iq.runs").contains("off") &&
      rowKinds.nonEmpty && (keyKinds ++ rowKinds).forall(ValueKind.longBacked)
    val kw = keyKinds.length
    val rw = rowKinds.length
    if (packed)
      () => PackedGroups(PackedRuns.empty(kw + rw), kw, rw,
        scala.collection.immutable.HashMap.empty)
    else
      () => BoxedGroups(scala.collection.immutable.HashMap.empty)
  }

  /** Driver-side convenience (tests; production cells use [[maker]]). */
  def empty(keyKinds: Seq[ValueKind], rowKinds: Seq[ValueKind]): GroupIndex =
    maker(keyKinds, rowKinds)()

  private[streaming] val emptyW: IncrementalQuery.WMap =
    scala.collection.immutable.HashMap.empty
}

final case class BoxedGroups(m: IncrementalQuery.GMap) extends GroupIndex {
  def group(k: Seq[Any]): IncrementalQuery.WMap =
    m.getOrElse(k, GroupIndex.emptyW)

  def merged(deltas: Iterable[((Seq[Any], Seq[Any]), Long)]): GroupIndex = {
    var next = m
    deltas.foreach { case ((k, row), dw) =>
      if (dw != 0L) {
        val g = next.getOrElse(k, GroupIndex.emptyW)
        val nw = g.getOrElse(row, 0L) + dw
        val g2 = if (nw == 0L) g - row else g.updated(row, nw)
        next = if (g2.isEmpty) next - k else next.updated(k, g2)
      }
    }
    BoxedGroups(next)
  }

  def bytes: Long = m.size * 240L
}

final case class PackedGroups(
    runs: PackedRuns, kw: Int, rw: Int,
    side: IncrementalQuery.GMap) extends GroupIndex {

  private def longsOf(xs: Seq[Any], out: Array[Long], at: Int): Boolean = {
    var i = 0
    val it = xs.iterator
    while (it.hasNext) {
      it.next() match {
        case l: Long => out(at + i) = l
        case _       => return false
      }
      i += 1
    }
    true
  }

  def group(k: Seq[Any]): IncrementalQuery.WMap = {
    val boxed = side.getOrElse(k, GroupIndex.emptyW)
    val keyArr = new Array[Long](kw)
    if (k.length != kw || !longsOf(k, keyArr, 0)) boxed
    else {
      var g = boxed
      runs.prefix(keyArr).foreach { case (rest, w) =>
        g = g.updated(rest.map(l => l: Any).toSeq, w)
      }
      g
    }
  }

  def merged(deltas: Iterable[((Seq[Any], Seq[Any]), Long)]): GroupIndex = {
    val buf = mutable.ArrayBuilder.make[Long]
    var sd = side
    val stride = kw + rw
    val rec = new Array[Long](stride)
    deltas.foreach { case ((k, row), dw) =>
      if (dw != 0L) {
        if (k.length == kw && row.length == rw &&
            longsOf(k, rec, 0) && longsOf(row, rec, kw)) {
          var i = 0
          while (i < stride) { buf += rec(i); i += 1 }
          buf += dw
        } else {
          val g = sd.getOrElse(k, GroupIndex.emptyW)
          val nw = g.getOrElse(row, 0L) + dw
          val g2 = if (nw == 0L) g - row else g.updated(row, nw)
          sd = if (g2.isEmpty) sd - k else sd.updated(k, g2)
        }
      }
    }
    PackedGroups(runs.merged(buf.result()), kw, rw, sd)
  }

  def bytes: Long = runs.bytes + side.size * 240L
}
