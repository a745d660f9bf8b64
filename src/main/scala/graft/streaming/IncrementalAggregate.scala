package graft.streaming

import graft.kernel.Ckpt._

import scala.collection.mutable
import scala.jdk.CollectionConverters._

import org.apache.spark.Partitioner
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{LongType, StructField, StructType}

import graft.model.AggregationFn

/** Incrementally maintained grouped aggregation — the Spark analog of the
  * reference's `Aggregate` maintenance under differential reduce
  * (`src/plan/aggregate_neu.rs:45-285`): as signed `(key, value, diff)`
  * deltas arrive, emit the EXACT output diffs of `groupBy(key).fn(value)`
  * — a retraction of the key's previous aggregate row and an assertion of
  * its new one — for precisely the keys the batch touched.
  *
  * Semantics match the batch compiler
  * ([[graft.compile.Compiler]] aggregate, multiset form):
  *  - COUNT/SUM are computed in the diff monoid (weighted); AVG and
  *    VARIANCE emit their exact integer accumulators — (sum, count) and
  *    (sumsq, sum, count) — the engine's Rational convention, division
  *    belongs to the consumer;
  *  - MIN/MAX/MEDIAN operate on the key's distinct support set (weights
  *    > 0), MEDIAN being the element at `len/2` of the sorted distinct
  *    values (upper median), not an interpolated percentile.
  *
  * Scale shape (the [[IncrementalHector]] state discipline, applied to
  * the aggregate class): state is the input relation itself —
  * `((key, value) -> weight)`, hash-partitioned by KEY once — so every
  * value of a key lives in one partition. A batch reduces its delta onto
  * that same partitioner (the ONLY shuffle, O(delta) bytes) and merges
  * partition-by-partition; the same narrow pass recomputes old/new
  * aggregates for exactly the touched keys, whose support is partition-
  * local by construction. Per-batch shuffled bytes never scale with
  * accumulated state (spec-pinned, as for the conjunction class).
  *
  * Weights must stay non-negative per (key, value) — a retraction below
  * zero support means a mis-ordered stream and fails loudly rather than
  * emitting wrong aggregates.
  */
class IncrementalAggregate(spark: SparkSession, fn: AggregationFn) {

  import AggregationFn._

  private type KV = ((Long, Long), Long) // ((key, value), weight)

  private val part = new IncrementalAggregate.KeyPartitioner(
    spark.conf.get("spark.sql.shuffle.partitions", "32").toInt)

  private var stateRdd: RDD[KV] =
    spark.sparkContext.emptyRDD[KV].partitionBy(part)

  private val diffSchema: StructType = StructType(
    StructField("k", LongType, false) +:
      (fn match {
        case AVG      => Seq(StructField("s", LongType, false),
          StructField("n", LongType, false))
        case VARIANCE => Seq(StructField("ss", LongType, false),
          StructField("s", LongType, false),
          StructField("n", LongType, false))
        case _        => Seq(StructField("agg", LongType, false))
      }) :+ StructField("_w", LongType, false))

  /** Current consolidated input state (tests / introspection). */
  def stateOf: DataFrame =
    spark.createDataFrame(
      stateRdd.map { case ((k, v), w) => Row(k, v, w) },
      StructType(Seq(StructField("k", LongType, false),
        StructField("v", LongType, false),
        StructField("_w", LongType, false))))

  /** Apply one batch of signed `(k, v, diff)` deltas; returns the exact
    * output diffs (retraction of replaced aggregates at -1, new
    * aggregates at +1), consolidated (an untouched aggregate emits
    * nothing; a key whose aggregate is unchanged emits nothing).
    *
    * The per-partition state discipline DELEGATES to the one shared
    * merge ([[IncrementalQuery.aggregateMerge]]) — this class only
    * supplies its accumulator-convention aggregate function and the
    * non-negative-support input contract. */
  def advance(delta: DataFrame): DataFrame = {
    val fnLocal = fn
    val deltaRdd: RDD[KV] = delta
      .select(col("k").cast("long"), col("v").cast("long"),
        col("diff").cast("long"))
      .rdd.map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2)))
      .reduceByKey(part, _ + _) // map-side combine; the only shuffle

    // One narrow co-partitioned pass: merge weights, recompute touched
    // keys (their support is partition-local). Left = new state rows,
    // Right = diff rows (k, accumulators..., w).
    val tagged: RDD[Either[KV, Seq[Any]]] =
      stateRdd.zipPartitions(deltaRdd, preservesPartitioning = true) {
        (sIt, dIt) =>
          IncrementalQuery.aggregateMerge[Long, Long](
            sIt, dIt, requireNonNeg = true,
            (k, rows) => IncrementalAggregate.aggOf(fnLocal, rows)
              .map(accs => k +: accs))
      }.graftCheckpoint()
    tagged.count() // materialize before rebinding state

    stateRdd = tagged.collect { case Left(kv) => kv }
      // Narrow rebind: rows never moved, so the key layout still matches
      // `part` — keep the claim so it stays zip-safe (and a partitionBy
      // with the same partitioner stays a no-op).
      .mapPartitions(identity, preservesPartitioning = true)
    val diffRows = tagged.collect { case Right(vals) => Row.fromSeq(vals) }
    spark.createDataFrame(diffRows, diffSchema)
  }

  // Processed-time frontier (the IncrementalHector/IncrementalClosure
  // discipline): regressing input times would emit historically wrong
  // diffs — fail loudly instead.
  private var frontier: Long = Long.MinValue

  /** Structured Streaming integration: drain a `(k, v, t, diff)` stream
    * through [[advance]] per completed time, strictly advancing. */
  def attach(deltas: DataFrame, queryName: String)(
      onDiffs: (Long, DataFrame) => Unit): org.apache.spark.sql.streaming.StreamingQuery =
    deltas.writeStream
      .outputMode("append")
      .queryName(queryName)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batch.persist()
        try {
          val times = batch.select("t").distinct().collect().map(_.getLong(0)).sorted
          times.foreach { t =>
            require(t > frontier,
              s"input time $t does not advance the processed frontier " +
                s"$frontier; diffs against already-advanced state would " +
                "be historically wrong")
            frontier = t
            onDiffs(t, advance(batch.where(col("t") === t)))
          }
        } finally batch.unpersist()
      }
      .start()
}

object IncrementalAggregate {
  import AggregationFn._

  /** Partition by KEY ONLY: a key's whole support set is co-resident, so
    * touched-key recompute is partition-local. Top-level (not an inner
    * class): a Partitioner ships to every task and must not drag the
    * operator instance with it. */
  private final class KeyPartitioner(n: Int) extends Partitioner {
    def numPartitions: Int = n
    def getPartition(key: Any): Int = {
      val k = key.asInstanceOf[(Long, Long)]._1
      java.lang.Math.floorMod(java.lang.Long.hashCode(k), n)
    }
    override def equals(o: Any): Boolean = o match {
      case p: KeyPartitioner => p.numPartitions == n
      case _                 => false
    }
    override def hashCode: Int = n
  }

  /** Aggregate a key's consolidated support `(value, weight)` rows; None
    * if the key has no support left. Static: runs inside tasks. */
  private def aggOf(fn: AggregationFn,
      rows: Iterable[(Long, Long)]): Option[Seq[Long]] = {
    val live = rows.filter(_._2 > 0)
    if (live.isEmpty) None
    else fn match {
      case COUNT => Some(Seq(live.map(_._2).sum))
      case SUM   => Some(Seq(live.map { case (v, w) => v * w }.sum))
      case AVG   => Some(Seq(live.map { case (v, w) => v * w }.sum,
        live.map(_._2).sum))
      case VARIANCE => Some(Seq(
        live.map { case (v, w) => v * v * w }.sum,
        live.map { case (v, w) => v * w }.sum,
        live.map(_._2).sum))
      case MIN => Some(Seq(live.map(_._1).min))
      case MAX => Some(Seq(live.map(_._1).max))
      case MEDIAN =>
        val vals = live.map(_._1).toSeq.distinct.sorted
        Some(Seq(vals(vals.length / 2)))
    }
  }
}
