package graft.streaming

/** Width-parametric sibling of [[LongRuns]]: immutable sorted-run state
  * for ALL-LONG tuples of arbitrary arity — records of `width` key
  * longs plus a signed weight, packed `width+1` to a stride in
  * primitive arrays, lexicographically sorted. Same persistence and
  * amortization story as [[LongRuns]] (append the netted delta as a new
  * run, size-tiered merge), ~8·(width+1) B/entry against the boxed
  * trie's ~200–240 B. Backs the tuple-keyed support cells (threshold /
  * set-semantics distinct) when every column kind is long-backed.
  */
final class PackedRuns private (
    val width: Int,
    private val runs: Vector[Array[Long]]) extends Serializable {

  private val stride = width + 1

  def packedCount: Long = runs.iterator.map(_.length.toLong / stride).sum
  def bytes: Long = 64L + runs.iterator.map(_.length.toLong * 8L + 48L).sum
  def runCount: Int = runs.length

  private def cmpAt(r: Array[Long], i: Int, key: Array[Long]): Int = {
    var k = 0
    while (k < width) {
      val c = java.lang.Long.compare(r(i + k), key(k))
      if (c != 0) return c
      k += 1
    }
    0
  }

  private def lowerBound(r: Array[Long], key: Array[Long]): Int = {
    var lo = 0
    var hi = r.length / stride
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (cmpAt(r, mid * stride, key) < 0) lo = mid + 1 else hi = mid
    }
    lo * stride
  }

  /** Net weight of `key` — 0 means absent. */
  def get(key: Array[Long]): Long = {
    var w = 0L
    var ri = 0
    while (ri < runs.length) {
      val r = runs(ri)
      val i = lowerBound(r, key)
      if (i < r.length && cmpAt(r, i, key) == 0) w += r(i + width)
      ri += 1
    }
    w
  }

  /** All net entries (k-way merge, zeros dropped) as (packed key, w). */
  def iterator: Iterator[(Array[Long], Long)] = new Iterator[(Array[Long], Long)] {
    private val cursors = Array.fill(runs.length)(0)
    private var nextKV: (Array[Long], Long) = null
    advanceTo()
    private def cmpRuns(ri: Int, key: Array[Long]): Int =
      cmpAt(runs(ri), cursors(ri), key)
    private def advanceTo(): Unit = {
      nextKV = null
      while (nextKV == null) {
        var best: Array[Long] = null
        var ri = 0
        while (ri < runs.length) {
          if (cursors(ri) < runs(ri).length) {
            if (best == null || cmpRuns(ri, best) < 0) {
              val r = runs(ri); val i = cursors(ri)
              best = java.util.Arrays.copyOfRange(r, i, i + width)
            }
          }
          ri += 1
        }
        if (best == null) return
        var w = 0L
        ri = 0
        while (ri < runs.length) {
          if (cursors(ri) < runs(ri).length && cmpRuns(ri, best) == 0) {
            w += runs(ri)(cursors(ri) + width)
            cursors(ri) += stride
          }
          ri += 1
        }
        if (w != 0L) nextKV = ((best, w))
      }
    }
    def hasNext: Boolean = nextKV != null
    def next(): (Array[Long], Long) = { val out = nextKV; advanceTo(); out }
  }

  /** Append one batch's netted delta records (unsorted packed
    * `width+1`-stride array), then size-tiered compaction. */
  def merged(delta: Array[Long]): PackedRuns = {
    if (delta.length == 0) return this
    val d = PackedRuns.sortPacked(delta, width)
    var rs = runs :+ d
    while (rs.length >= 2 &&
        rs(rs.length - 1).length * 2 >= rs(rs.length - 2).length) {
      val m = PackedRuns.mergeTwo(rs(rs.length - 2), rs(rs.length - 1), width)
      rs = rs.dropRight(2) :+ m
    }
    new PackedRuns(width, rs)
  }
}

object PackedRuns {
  def empty(width: Int): PackedRuns = new PackedRuns(width, Vector.empty)

  private def cmpKeys(t: Array[Long], i: Int, j: Int, width: Int): Int = {
    var k = 0
    while (k < width) {
      val c = java.lang.Long.compare(t(i + k), t(j + k))
      if (c != 0) return c
      k += 1
    }
    0
  }

  private[streaming] def sortPacked(t: Array[Long], width: Int): Array[Long] = {
    val stride = width + 1
    val n = t.length / stride
    val boxed = Array.range(0, n).map(Integer.valueOf)
    java.util.Arrays.sort(boxed, new java.util.Comparator[Integer] {
      def compare(x: Integer, y: Integer): Int =
        cmpKeys(t, x.intValue() * stride, y.intValue() * stride, width)
    })
    val out = new Array[Long](t.length)
    var k = 0
    while (k < n) {
      System.arraycopy(t, boxed(k).intValue() * stride, out, k * stride, stride)
      k += 1
    }
    out
  }

  private[streaming] def mergeTwo(
      a: Array[Long], b: Array[Long], width: Int): Array[Long] = {
    val stride = width + 1
    val out = new Array[Long](a.length + b.length)
    var i = 0; var j = 0; var o = 0
    def cmpAB(): Int = {
      var k = 0
      while (k < width) {
        val c = java.lang.Long.compare(a(i + k), b(j + k))
        if (c != 0) return c
        k += 1
      }
      0
    }
    while (i < a.length || j < b.length) {
      if (i < a.length && j < b.length && cmpAB() == 0) {
        val w = a(i + width) + b(j + width)
        if (w != 0L) {
          System.arraycopy(a, i, out, o, width); out(o + width) = w; o += stride
        }
        i += stride; j += stride
      } else if (j >= b.length || (i < a.length && cmpAB() < 0)) {
        if (a(i + width) != 0L) {
          System.arraycopy(a, i, out, o, stride); o += stride
        }
        i += stride
      } else {
        if (b(j + width) != 0L) {
          System.arraycopy(b, j, out, o, stride); o += stride
        }
        j += stride
      }
    }
    if (o == out.length) out else java.util.Arrays.copyOf(out, o)
  }
}
