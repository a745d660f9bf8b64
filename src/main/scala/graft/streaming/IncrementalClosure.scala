package graft.streaming

import scala.collection.mutable

import org.apache.spark.HashPartitioner
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import org.apache.spark.storage.StorageLevel

/** Incrementally maintained transitive closure over a streamed edge
  * attribute — the monotone-recursion slice of the reference's
  * incrementally-maintained rules (differential's `iterate`), which the
  * general [[StreamCompiler]] intentionally leaves to the batch engine.
  *
  * Per micro-batch of edge ADDITIONS at time `t`, emits the exact closure
  * diffs `((src, dst), t, +1)` — precisely the tuples in
  * `closure(E ∪ Δe) − closure(E)` — by warm-starting the semi-naive
  * iteration from the persisted totals instead of recomputing:
  *
  *   D₁   = (Δe ∪ Δe∘C) − C          (new edges, and new edges entering
  *                                    existing paths)
  *   Dₖ₊₁ = (E'∘Dₖ) − (C ∪ D₁ ∪ …)   (ordinary semi-naive rounds against
  *                                    the UPDATED edge set)
  *
  * Sound for monotone programs: iteration starts from a post-fixpoint of
  * the old rules below the new least fixpoint. Retractions are rejected —
  * delete-and-rederive is the batch engine's job (snapshot diffing).
  *
  * State lives where the batch fixpoint kernel puts it: closure totals as
  * hash-partitioned, persisted RDDs (subtraction is a co-partitioned
  * narrow `zipPartitions` chain, compacted every `maxChain` batches), and
  * the adjacency as a broadcast reverse index, size-gated like the
  * kernel's static side (`maxEdges`). The one full-total scan per batch
  * (Δe∘C) is narrow and partition-parallel; the arrangement-style upgrade
  * if batches ever dominate is a second totals copy keyed by source.
  */
class IncrementalClosure(
    spark: SparkSession,
    partitions: Int = 8,
    maxEdges: Long = 5000000L) {

  private type Tup = (Long, Long)
  private val sc = spark.sparkContext
  private val part = new HashPartitioner(partitions)
  private val maxChain = 16

  private val edgeSet = mutable.Set.empty[Tup]
  // reverse adjacency: dst -> srcs (the semi-naive round joins
  // edges(x,y) with delta(y,z) on y)
  private val rev = mutable.Map.empty[Long, mutable.ArrayBuffer[Long]]
  private var totalParts: Vector[RDD[(Tup, Null)]] = Vector.empty

  /** Current closure size (tuples). */
  def size: Long = totalParts.map(_.count()).sum

  /** Apply one batch of edge additions; returns the exact new closure
    * tuples as a DataFrame (src, dst, t, diff) — all diffs +1. */
  def advance(newEdges: Seq[(Long, Long)], t: Long): DataFrame =
    advanceFresh(newEdges.distinct.filterNot(edgeSet), t)

  /** RDD-side variant for firehose ingest: the raw batch is deduped and
    * subtracted against the known edge set DISTRIBUTED (the known set
    * rides a broadcast — an immutable copy, since local-mode broadcasts
    * share driver references), so only genuinely fresh edges — bounded by
    * the `maxEdges` gate, however large the raw batch — ever reach the
    * driver (which needs them anyway: the adjacency is a broadcast map). */
  def advanceRdd(newEdges: RDD[(Long, Long)], t: Long): DataFrame = {
    val known = sc.broadcast(edgeSet.toSet)
    val fresh =
      try {
        val deduped = newEdges.distinct(partitions)
          .filter(e => !known.value(e))
          .persist(StorageLevel.MEMORY_AND_DISK)
        try {
          // Gate BEFORE collecting: the whole point of this path is that
          // nothing unbounded ever lands on the driver — a batch of
          // millions of genuinely fresh edges must fail loudly, not OOM
          // the driver on the way to the failure.
          val n = deduped.count()
          require(edgeSet.size + n <= maxEdges,
            s"edge relation exceeds the broadcast gate ($maxEdges); " +
              "use the batch engine for edge sets this large")
          deduped.collect().toSeq
        } finally deduped.unpersist(blocking = false)
      } finally known.destroy()
    advanceFresh(fresh, t)
  }

  private def advanceFresh(fresh: Seq[(Long, Long)], t: Long): DataFrame = {
    require(edgeSet.size + fresh.size <= maxEdges,
      s"edge relation exceeds the broadcast gate ($maxEdges); " +
        "use the batch engine for edge sets this large")
    fresh.foreach { case (s, d) =>
      edgeSet += ((s, d))
      rev.getOrElseUpdate(d, mutable.ArrayBuffer.empty) += s
    }
    if (fresh.isEmpty) return diffDf(sc.emptyRDD[(Tup, Null)], t)

    // D1 candidates: Δe itself, plus Δe entering existing paths
    // ((x,y) ∈ Δe, (y,z) ∈ C ⇒ (x,z)) — a narrow scan of the persisted
    // totals against the broadcast Δe-by-destination map (y → {x}).
    val dxBc = sc.broadcast(fresh.groupBy(_._2).map { case (y, es) =>
      y -> es.map(_._1).toArray
    })
    val viaOld: RDD[(Tup, Null)] = if (totalParts.isEmpty) sc.emptyRDD
    else sc.union(totalParts).mapPartitions { it =>
      val m = dxBc.value
      it.flatMap { case ((y, z), _) =>
        m.get(y) match {
          case None     => Iterator.empty
          case Some(xs) => xs.iterator.map(x => ((x, z): Tup, null))
        }
      }
    }
    val cand0 = sc.parallelize(fresh.map(e => (e: Tup, null)), 1).union(viaOld)

    val revBc = sc.broadcast(rev.view.mapValues(_.toArray).toMap)
    var newParts = Vector.empty[RDD[(Tup, Null)]]
    var delta = materializeFresh(cand0)
    var n = delta.count()
    while (n > 0) {
      newParts = newParts :+ delta
      totalParts = totalParts :+ delta
      val next = delta.mapPartitions { it =>
        val m = revBc.value
        it.flatMap { case ((y, z), _) =>
          m.get(y) match {
            case None     => Iterator.empty
            case Some(xs) => xs.iterator.map(x => ((x, z): Tup, null))
          }
        }
      }
      delta = materializeFresh(next)
      n = delta.count()
    }
    if (totalParts.length > maxChain) compact()

    val out = if (newParts.isEmpty) sc.emptyRDD[(Tup, Null)]
    else sc.union(newParts)
    diffDf(out, t)
  }

  // Processed-time frontier: a batch's diffs are computed against totals
  // that absorbed every earlier time, so a regressing input time would
  // stamp historically wrong diffs — fail loudly instead.
  private var frontier: Long = Long.MinValue

  /** Structured Streaming integration: drain a `(src, dst, t, diff)` edge
    * stream through [[advanceRdd]] per micro-batch, handing each batch's
    * closure diffs to `onDiffs`. Additions only (diff must be +1 —
    * asserted distributed, never by collecting the batch: the raw batch
    * may exceed driver limits; only its deduped fresh edges land there).
    * Times must advance strictly across the whole stream. */
  def attach(edges: DataFrame, queryName: String)(
      onDiffs: DataFrame => Unit): org.apache.spark.sql.streaming.StreamingQuery =
    edges.writeStream
      .outputMode("append")
      .queryName(queryName)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        import org.apache.spark.sql.functions.col
        batch.persist(StorageLevel.MEMORY_AND_DISK)
        try {
          // Null-safe: a null diff must fail the guard, not slip through
          // three-valued logic as "not =!= 1".
          require(batch.where(!(col("diff") <=> 1L)).isEmpty,
            "IncrementalClosure maintains additions only; retract via the batch engine")
          val times = batch.select("t").distinct().collect().map(_.getLong(0)).sorted
          times.foreach { t =>
            require(t > frontier,
              s"input time $t does not advance the processed frontier " +
                s"$frontier; diffs against already-advanced totals would " +
                "be historically wrong")
            frontier = t
            val es = batch.where(col("t") === t)
              .select("src", "dst").rdd.map(r => (r.getLong(0), r.getLong(1)))
            onDiffs(advanceRdd(es, t))
          }
        } finally batch.unpersist()
      }
      .start()

  // ------------------------------------------------------------------ impl

  /** Partition candidates by tuple hash, dedup within the batch, subtract
    * everything already derived — the shared semi-naive step
    * ([[graft.kernel.RddKernel]] holds the partitioning and
    * lineage-truncation invariants). */
  private def materializeFresh(cand: RDD[(Tup, Null)]): RDD[(Tup, Null)] =
    graft.kernel.RddKernel.freshDelta(cand, part, totalParts)

  private def compact(): Unit =
    totalParts = Vector(graft.kernel.RddKernel.compact(totalParts))

  private val schema = StructType(Seq(
    StructField("src", LongType), StructField("dst", LongType),
    StructField("t", LongType), StructField("diff", LongType)))

  private def diffDf(rdd: RDD[(Tup, Null)], t: Long): DataFrame =
    spark.createDataFrame(
      rdd.map { case ((s, d), _) => Row(s, d, t, 1L) }, schema)
}
