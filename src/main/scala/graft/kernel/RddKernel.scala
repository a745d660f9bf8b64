package graft.kernel

import graft.kernel.Ckpt._

import scala.reflect.ClassTag

import org.apache.spark.Partitioner
import org.apache.spark.rdd.RDD

/** Shared primitives for the iterative RDD kernels (the recursive-fixpoint
  * loop in the compiler and the incrementally-maintained streaming
  * closure): hash-partitioned within-batch dedup, subtraction against a
  * co-partitioned chain of already-derived tuples, and chain compaction.
  *
  * Two invariants every caller relies on, in one place so a fix can't
  * miss a copy:
  *  - every RDD in a chain shares ONE partitioner, so dedup/subtract/
  *    concat are narrow (positional `zipPartitions` alignment);
  *  - state living across jobs is `localCheckpoint()`ed, NOT merely
  *    persisted — without lineage truncation each round/batch stacks its
  *    shuffle dependencies on the last — and chain members are never
  *    manually unpersisted while any live RDD still references them
  *    (checkpointed RDDs cannot recompute);
  *  - an operator whose OUTPUT is keyed differently than its input must
  *    never claim `preservesPartitioning = true`: the claimed partitioner
  *    makes a later `partitionBy` on the same partitioner a silent no-op,
  *    stranding records in the wrong partition (the connected-components
  *    kernel shipped exactly this bug; every helper here keeps keys
  *    unchanged, which is why their `true` claims are valid).
  */
object RddKernel {

  /** The session's `autoBroadcastJoinThreshold` in bytes (accepts raw
    * byte counts and size strings like "10MB") — the ONE byte gate every
    * driver-landing/broadcast decision measures against (fixpoint loop,
    * connected-components driver union-find). */
  def broadcastThresholdBytes(spark: org.apache.spark.sql.SparkSession): Long = {
    val raw = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB")
    try raw.toLong
    catch {
      case _: NumberFormatException =>
        org.apache.spark.network.util.JavaUtils.byteStringAsBytes(raw)
    }
  }

  /** Assert `part` on an RDD whose records are ALREADY placed
    * accordingly — e.g. derived narrowly (zipPartitions / per-partition
    * flatMap) from a `part`-partitioned parent, where the
    * transformation dropped the partitioner but not the placement.
    * Restores partitioner-aware unions and narrow chain ops without the
    * shuffle a `partitionBy` would re-pay. The caller GUARANTEES the
    * placement invariant; asserting it falsely strands records in the
    * wrong partition for every downstream narrow op. */
  def assertPartitioned[T: ClassTag](rdd: RDD[T], part: Partitioner): RDD[T] =
    new AssertPartitionedRdd(rdd, part)

  private final class AssertPartitionedRdd[T: ClassTag](
      parent: RDD[T], p: Partitioner) extends RDD[T](parent) {
    override val partitioner: Option[Partitioner] = Some(p)
    override protected def getPartitions: Array[org.apache.spark.Partition] =
      firstParent[T].partitions
    override def compute(split: org.apache.spark.Partition,
        context: org.apache.spark.TaskContext): Iterator[T] =
      firstParent[T].iterator(split, context)
  }

  /** Hash-partition candidates and drop within-batch duplicates. */
  def dedup[K: ClassTag](cand: RDD[(K, Null)], part: Partitioner): RDD[(K, Null)] =
    cand.partitionBy(part).mapPartitions({ it =>
      val seen = new java.util.HashSet[K]()
      it.filter { case (k, _) => seen.add(k) }
    }, preservesPartitioning = true)

  /** Remove every key present in the co-partitioned chain (narrow
    * anti-join per link). */
  def subtract[K: ClassTag](
      cand: RDD[(K, Null)], chain: Seq[RDD[(K, Null)]]): RDD[(K, Null)] =
    chain.foldLeft(cand) { (acc, tot) =>
      acc.zipPartitions(tot, preservesPartitioning = true) { (a, b) =>
        val seen = new java.util.HashSet[K]()
        b.foreach(p => seen.add(p._1))
        a.filter(p => !seen.contains(p._1))
      }
    }

  /** Keep only the keys present somewhere in the co-partitioned chain —
    * the complement of [[subtract]], built from it (cand ∩ chain =
    * cand − (cand − chain)) so both directions share one membership
    * implementation: two narrow passes, no shuffle. */
  def retain[K: ClassTag](
      cand: RDD[(K, Null)], chain: Seq[RDD[(K, Null)]]): RDD[(K, Null)] =
    subtract(cand, Seq(subtract(cand, chain)))

  /** dedup + subtract + lineage-truncating checkpoint: the per-round step
    * of every semi-naive kernel. The caller's next action materializes it. */
  def freshDelta[K: ClassTag](cand: RDD[(K, Null)], part: Partitioner,
      chain: Seq[RDD[(K, Null)]]): RDD[(K, Null)] =
    subtract(dedup(cand, part), chain).graftCheckpoint()

  /** Collapse a chain into one materialized frame (narrow concat). */
  def compact[K: ClassTag](chain: Seq[RDD[(K, Null)]]): RDD[(K, Null)] = {
    val comp = chain.reduce((a, b) =>
      a.zipPartitions(b, preservesPartitioning = true)(_ ++ _))
      .graftCheckpoint()
    comp.count()
    comp
  }

  /** Materialize several marked (graftCheckpoint-ed) sets through ONE
    * tagged-count union action, returning each set's count in order —
    * per-job scheduler latency dominates control-sized fixpoint rounds,
    * so k checkpoints that can share a materializing job must.
    * Chain-dependent sets are safe: every set is a direct union branch,
    * so the one action computes (and caches — the checkpoint marks the
    * storage level) every partition and `RDD.doCheckpoint` truncates
    * every marked branch at job end. */
  def materializeCounts[K](ss: Seq[RDD[(K, Null)]]): Array[Long] = {
    val tagged = ss.zipWithIndex.map { case (s, i) =>
      s.mapPartitions({ it =>
        var c = 0L; it.foreach(_ => c += 1L)
        Iterator.single((i, c))
      }, preservesPartitioning = false)
    }
    val out = new Array[Long](ss.length)
    ss.head.sparkContext.union(tagged).collect()
      .foreach { case (i, c) => out(i) += c }
    out
  }
}
