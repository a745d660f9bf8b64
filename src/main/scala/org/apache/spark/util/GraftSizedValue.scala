package org.apache.spark.util

/** A cached value with a DECLARED size estimate.
  *
  * Spark's `SizeEstimator` honors the (package-private)
  * [[KnownSizeEstimation]] trait — the same mechanism Spark's own
  * broadcast hash relations use — returning `estimatedSize` instead of
  * reflectively walking the value's object graph. For
  * `graft.streaming.StateCell`, whose partitions cache ONE persistent
  * index map each, the walk would visit every trie node and boxed key
  * of the accumulated state on every per-batch cache put: an O(state)
  * CPU tax per advance on otherwise O(delta) maintenance. The declared
  * estimate (entry count × average entry footprint) restores O(1) puts
  * while keeping the block store's memory accounting sane.
  */
final class GraftSizedValue[T](val value: T, declaredSize: Long)
    extends KnownSizeEstimation with Serializable {
  override def estimatedSize: Long = declaredSize
}

/** Real resident-size measurement for scale evidence (the package shim
  * exposes Spark's reflective `SizeEstimator` walk — used ONLY in
  * tests/smokes; production paths declare sizes instead of walking). */
object GraftSizeOf {
  def estimate(o: AnyRef): Long = SizeEstimator.estimate(o)
}
