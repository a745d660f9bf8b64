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

  /** [[lowerBound]] comparing only the leading `pfx.length` columns —
    * the seek shared by [[prefix]] and [[iteratorForPrefix]]. */
  private def lowerBoundForPrefix(r: Array[Long], pfx: Array[Long]): Int = {
    var lo = 0
    var hi = r.length / stride
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      val i = mid * stride
      var c = 0
      var k = 0
      while (c == 0 && k < pfx.length) {
        c = java.lang.Long.compare(r(i + k), pfx(k)); k += 1
      }
      if (c < 0) lo = mid + 1 else hi = mid
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

  /** Net `(rest-columns, w)` entries whose first `key.length` columns
    * equal `key` — the GROUP read of a key-first-packed index. `key`
    * must be shorter than `width`; zero weights are dropped. */
  def prefix(key: Array[Long]): Iterator[(scala.collection.immutable.ArraySeq[Long], Long)] = {
    val kw = key.length
    require(kw < width, s"prefix width $kw must be < record width $width")
    val acc = scala.collection.mutable.LinkedHashMap
      .empty[scala.collection.immutable.ArraySeq[Long], Long]
    var ri = 0
    while (ri < runs.length) {
      val r = runs(ri)
      var i = lowerBoundForPrefix(r, key)
      def prefixEq(at: Int): Boolean = {
        var k = 0
        while (k < kw) {
          if (r(at + k) != key(k)) return false
          k += 1
        }
        true
      }
      while (i < r.length && prefixEq(i)) {
        val rest = scala.collection.immutable.ArraySeq.unsafeWrapArray(
          java.util.Arrays.copyOfRange(r, i + kw, i + width))
        val nw = acc.getOrElse(rest, 0L) + r(i + width)
        if (nw == 0L) acc.remove(rest) else acc(rest) = nw
        i += stride
      }
      ri += 1
    }
    acc.iterator
  }

  /** Entries whose FIRST column lies in `[lo, hi]`, streamed per run
    * (duplicate keys across runs possible, weights NOT netted) — the
    * index-scan read of a time-first-packed index, where the caller
    * dedupes candidates anyway. Each run contributes one binary-search
    * seek plus a contiguous scan of its in-range records. */
  def rangeByFirst(lo: Long, hi: Long): Iterator[(Array[Long], Long)] =
    runs.iterator.flatMap { r =>
      var lb = 0
      var ub = r.length / stride
      while (lb < ub) {
        val mid = (lb + ub) >>> 1
        if (r(mid * stride) < lo) lb = mid + 1 else ub = mid
      }
      Iterator.unfold(lb * stride) { i =>
        if (i < r.length && r(i) <= hi)
          Some(((java.util.Arrays.copyOfRange(r, i, i + width), r(i + width)),
            i + stride))
        else None
      }
    }

  /** All net entries (k-way merge, zeros dropped) as (packed key, w). */
  def iterator: Iterator[(Array[Long], Long)] = iteratorBounded(null)

  /** [[iterator]] restricted to records whose leading `pfx.length`
    * columns equal `pfx` — each run contributes one binary seek to the
    * prefix's lower bound and a contiguous scan of its in-prefix
    * records, so reading ONE attribute's records out of a wide
    * lex-sorted store costs O(runs · log n + that prefix's records),
    * not O(store). Streaming with the same netting/zero-dropping as
    * the full iterator. */
  def iteratorForPrefix(pfx: Array[Long]): Iterator[(Array[Long], Long)] = {
    require(pfx != null && pfx.length <= width,
      s"prefix width ${if (pfx == null) -1 else pfx.length} must be <= $width")
    iteratorBounded(pfx)
  }

  private def iteratorBounded(pfx: Array[Long]): Iterator[(Array[Long], Long)] =
    new Iterator[(Array[Long], Long)] {
    private val cursors =
      if (pfx == null) Array.fill(runs.length)(0)
      else Array.tabulate(runs.length)(ri => lowerBoundForPrefix(runs(ri), pfx))
    private def inRange(ri: Int): Boolean =
      cursors(ri) < runs(ri).length && (pfx == null || {
        val r = runs(ri); val i = cursors(ri)
        var k = 0
        var eq = true
        while (eq && k < pfx.length) { eq = r(i + k) == pfx(k); k += 1 }
        eq
      })
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
          if (inRange(ri)) {
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
          if (inRange(ri) && cmpRuns(ri, best) == 0) {
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

  /** In-place primitive quicksort over packed records (median-of-three,
    * insertion cutoff) — zero boxing; a comparator-based index sort
    * allocated an Integer per record, which on data-sized delta batches
    * (millions of records per advance) dominated the merge cost. The
    * caller owns `t` (a fresh delta buffer), so sorting in place is
    * safe. */
  private[streaming] def sortPacked(t: Array[Long], width: Int): Array[Long] = {
    val stride = width + 1
    val n = t.length / stride
    val tmp = new Array[Long](stride)
    def cmp(i: Int, j: Int): Int = cmpKeys(t, i * stride, j * stride, width)
    def swap(i: Int, j: Int): Unit = if (i != j) {
      System.arraycopy(t, i * stride, tmp, 0, stride)
      System.arraycopy(t, j * stride, t, i * stride, stride)
      System.arraycopy(tmp, 0, t, j * stride, stride)
    }
    def insertion(lo: Int, hi: Int): Unit = {
      var i = lo + 1
      while (i <= hi) {
        var j = i
        while (j > lo && cmp(j - 1, j) > 0) { swap(j - 1, j); j -= 1 }
        i += 1
      }
    }
    def qs(lo0: Int, hi0: Int): Unit = {
      var lo = lo0; var hi = hi0
      while (hi - lo > 16) {
        val mid = (lo + hi) >>> 1
        // median-of-three pivot to `mid`
        if (cmp(lo, mid) > 0) swap(lo, mid)
        if (cmp(mid, hi) > 0) { swap(mid, hi); if (cmp(lo, mid) > 0) swap(lo, mid) }
        val pivot = mid
        swap(pivot, hi - 1) // park pivot
        val p = hi - 1
        var i = lo; var j = p
        while (i < j) {
          i += 1
          while (cmp(i, p) < 0) i += 1
          j -= 1
          while (j > lo && cmp(j, p) > 0) j -= 1
          if (i < j) swap(i, j)
        }
        swap(i, p)
        // recurse smaller half, loop larger
        if (i - lo < hi - i) { qs(lo, i - 1); lo = i + 1 }
        else { qs(i + 1, hi); hi = i - 1 }
      }
      insertion(lo, hi)
    }
    if (n > 1) qs(0, n - 1)
    t
  }

  /** In-place primitive sort of weightless stride records (compares the
    * FULL `stride` longs of each record) — the arrangement-index sibling
    * of [[sortPacked]] for packed tables that carry no weight column. */
  def sortRecords(t: Array[Long], stride: Int): Array[Long] = {
    val n = t.length / stride
    val tmp = new Array[Long](stride)
    def cmp(i: Int, j: Int): Int = {
      var k = 0
      while (k < stride) {
        val c = java.lang.Long.compare(t(i * stride + k), t(j * stride + k))
        if (c != 0) return c
        k += 1
      }
      0
    }
    def swap(i: Int, j: Int): Unit = if (i != j) {
      System.arraycopy(t, i * stride, tmp, 0, stride)
      System.arraycopy(t, j * stride, t, i * stride, stride)
      System.arraycopy(tmp, 0, t, j * stride, stride)
    }
    def insertion(lo: Int, hi: Int): Unit = {
      var i = lo + 1
      while (i <= hi) {
        var j = i
        while (j > lo && cmp(j - 1, j) > 0) { swap(j - 1, j); j -= 1 }
        i += 1
      }
    }
    def qs(lo0: Int, hi0: Int): Unit = {
      var lo = lo0; var hi = hi0
      while (hi - lo > 16) {
        val mid = (lo + hi) >>> 1
        if (cmp(lo, mid) > 0) swap(lo, mid)
        if (cmp(mid, hi) > 0) { swap(mid, hi); if (cmp(lo, mid) > 0) swap(lo, mid) }
        swap(mid, hi - 1)
        val p = hi - 1
        var i = lo; var j = p
        while (i < j) {
          i += 1
          while (cmp(i, p) < 0) i += 1
          j -= 1
          while (j > lo && cmp(j, p) > 0) j -= 1
          if (i < j) swap(i, j)
        }
        swap(i, p)
        if (i - lo < hi - i) { qs(lo, i - 1); lo = i + 1 }
        else { qs(i + 1, hi); hi = i - 1 }
      }
      insertion(lo, hi)
    }
    if (n > 1) qs(0, n - 1)
    t
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
