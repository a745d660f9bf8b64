package graft.streaming

import scala.collection.mutable

/** Compact immutable keyed state for LONG-keyed weighted pairs — the
  * sorted-run / delta-merge specialization the boxed
  * `immutable.HashMap` cells cost ~200–240 B/entry for (SCALE_NOTES):
  * entries live PACKED in primitive long arrays, `[k1, k2, w]` triples
  * sorted by `(k1, k2)`, ~24 B/entry + run headers — an order-of-
  * magnitude lower resident set at 10M keys/partition.
  *
  * Persistence comes from immutability of the RUNS, not of a trie: a
  * batch appends its (already netted, sorted) delta as a new run —
  * O(delta) allocation, every older run shared with the previous
  * generation — and size-tiered compaction merges the newest runs only
  * when the newer of a pair has grown to half its elder, so total merge
  * work stays O(delta · log(state/delta)) amortized (the LSM
  * discipline). Reads sum weights ACROSS runs (runs are signed deltas;
  * a key's net weight is the total), so zero-weight keys disappear
  * physically only at compaction and semantically everywhere.
  *
  * One store sorted by `(e, v)` serves both point lookups and e-prefix
  * scans; a sibling sorted by `(v, e)` serves v-prefix scans — together
  * they replace the hash pair-index plus both per-variable arrangement
  * maps of a long-kinded Hector binding.
  */
final class LongRuns private (
    private val runs: Vector[Array[Long]]) extends Serializable {

  /** Total packed triples across runs (cancelling entries included) —
    * an upper bound on live keys, the size signal callers gate on. */
  def packedCount: Long = runs.iterator.map(_.length.toLong / 3L).sum

  /** Declared resident bytes (the KnownSizeEstimation input). */
  def bytes: Long = 64L + runs.iterator.map(_.length.toLong * 8L + 48L).sum

  def runCount: Int = runs.length

  // Binary search for the first triple index with key >= (a, b).
  private def lowerBound(r: Array[Long], a: Long, b: Long): Int = {
    var lo = 0
    var hi = r.length / 3
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      val i = mid * 3
      val c =
        if (r(i) != a) java.lang.Long.compare(r(i), a)
        else java.lang.Long.compare(r(i + 1), b)
      if (c < 0) lo = mid + 1 else hi = mid
    }
    lo * 3
  }

  /** Net weight of key `(a, b)` — 0 means absent. */
  def get(a: Long, b: Long): Long = {
    var w = 0L
    var ri = 0
    while (ri < runs.length) {
      val r = runs(ri)
      val i = lowerBound(r, a, b)
      if (i < r.length && r(i) == a && r(i + 1) == b) w += r(i + 2)
      ri += 1
    }
    w
  }

  /** Net `(k2, w)` entries under first-key `a`, zero weights dropped. */
  def prefix(a: Long): Iterator[(Long, Long)] = {
    val acc = mutable.LongMap.empty[Long]
    var ri = 0
    while (ri < runs.length) {
      val r = runs(ri)
      var i = lowerBound(r, a, Long.MinValue)
      while (i < r.length && r(i) == a) {
        val nw = acc.getOrElse(r(i + 1), 0L) + r(i + 2)
        if (nw == 0L) acc.remove(r(i + 1)) else acc(r(i + 1)) = nw
        i += 3
      }
      ri += 1
    }
    acc.iterator
  }

  /** All net entries (k-way merge across runs, zero weights dropped). */
  def iterator: Iterator[((Long, Long), Long)] = new Iterator[((Long, Long), Long)] {
    private val cursors = Array.fill(runs.length)(0)
    private var nextKV: ((Long, Long), Long) = null
    advanceTo()
    private def advanceTo(): Unit = {
      nextKV = null
      while (nextKV == null) {
        // Smallest current key across run cursors.
        var ka = Long.MaxValue; var kb = Long.MaxValue; var found = false
        var ri = 0
        while (ri < runs.length) {
          val r = runs(ri); val i = cursors(ri)
          if (i < r.length) {
            val c =
              if (r(i) != ka) java.lang.Long.compare(r(i), ka)
              else java.lang.Long.compare(r(i + 1), kb)
            if (!found || c < 0) { ka = r(i); kb = r(i + 1); found = true }
          }
          ri += 1
        }
        if (!found) return
        var w = 0L
        ri = 0
        while (ri < runs.length) {
          val r = runs(ri); val i = cursors(ri)
          if (i < r.length && r(i) == ka && r(i + 1) == kb) {
            w += r(i + 2); cursors(ri) = i + 3
          }
          ri += 1
        }
        if (w != 0L) nextKV = (((ka, kb), w))
      }
    }
    def hasNext: Boolean = nextKV != null
    def next(): ((Long, Long), Long) = {
      val out = nextKV; advanceTo(); out
    }
  }

  /** Append one batch's netted delta triples (UNSORTED; sorted here)
    * as a new run, then size-tiered compaction: while the newest run
    * has grown to at least half its predecessor, merge the two —
    * amortized O(delta log(state/delta)), worst single batch O(state)
    * exactly when the whole store rewrites (rare by construction). */
  def merged(delta: Array[Long]): LongRuns = {
    if (delta.length == 0) return this
    val d = LongRuns.sortTriples(delta)
    var rs = runs :+ d
    while (rs.length >= 2 &&
        rs(rs.length - 1).length * 2 >= rs(rs.length - 2).length) {
      val merged2 = LongRuns.mergeTwo(rs(rs.length - 2), rs(rs.length - 1))
      rs = rs.dropRight(2) :+ merged2
    }
    new LongRuns(rs)
  }
}

object LongRuns {
  val empty: LongRuns = new LongRuns(Vector.empty)

  /** Sort packed triples by (k1, k2) — delegates to the boxing-free
    * in-place quicksort ([[PackedRuns.sortPacked]], width 2). */
  private[streaming] def sortTriples(t: Array[Long]): Array[Long] =
    PackedRuns.sortPacked(t, 2)

  /** Merge two sorted runs, summing equal keys, dropping zeros. */
  private[streaming] def mergeTwo(a: Array[Long], b: Array[Long]): Array[Long] = {
    val out = new Array[Long](a.length + b.length)
    var i = 0; var j = 0; var o = 0
    while (i < a.length || j < b.length) {
      val takeA =
        if (i >= a.length) false
        else if (j >= b.length) true
        else {
          val c =
            if (a(i) != b(j)) java.lang.Long.compare(a(i), b(j))
            else java.lang.Long.compare(a(i + 1), b(j + 1))
          c <= 0
        }
      if (takeA && j < b.length && a.length > i &&
          a(i) == b(j) && a(i + 1) == b(j + 1)) {
        val w = a(i + 2) + b(j + 2)
        if (w != 0L) { out(o) = a(i); out(o + 1) = a(i + 1); out(o + 2) = w; o += 3 }
        i += 3; j += 3
      } else if (takeA) {
        if (a(i + 2) != 0L) {
          out(o) = a(i); out(o + 1) = a(i + 1); out(o + 2) = a(i + 2); o += 3
        }
        i += 3
      } else {
        if (b(j + 2) != 0L) {
          out(o) = b(j); out(o + 1) = b(j + 1); out(o + 2) = b(j + 2); o += 3
        }
        j += 3
      }
    }
    if (o == out.length) out else java.util.Arrays.copyOf(out, o)
  }
}
