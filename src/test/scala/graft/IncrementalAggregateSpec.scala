package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.model.AggregationFn
import graft.streaming.IncrementalAggregate

/** Incrementally maintained aggregation: across ANY history of signed
  * input batches, applying the emitted output diffs must reproduce the
  * from-scratch aggregate of the accumulated inputs, for every
  * AggregationFn — with per-batch shuffle O(delta), never O(state). */
class IncrementalAggregateSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def deltaDf(rows: Seq[(Long, Long, Long)]) =
    rows.toDF("k", "v", "diff")

  /** Driver-side reference aggregate over consolidated (k, v) -> w. */
  private def brute(fn: AggregationFn,
      state: Map[(Long, Long), Long]): Map[Long, Seq[Long]] = {
    import AggregationFn._
    state.groupBy(_._1._1).flatMap { case (k, rows) =>
      val live = rows.collect { case ((_, v), w) if w > 0 => (v, w) }.toSeq
      if (live.isEmpty) None
      else Some(k -> (fn match {
        case COUNT    => Seq(live.map(_._2).sum)
        case SUM      => Seq(live.map { case (v, w) => v * w }.sum)
        case AVG      => Seq(live.map { case (v, w) => v * w }.sum,
          live.map(_._2).sum)
        case VARIANCE => Seq(live.map { case (v, w) => v * v * w }.sum,
          live.map { case (v, w) => v * w }.sum, live.map(_._2).sum)
        case MIN      => Seq(live.map(_._1).min)
        case MAX      => Seq(live.map(_._1).max)
        case MEDIAN   =>
          val vals = live.map(_._1).distinct.sorted
          Seq(vals(vals.length / 2))
      }))
    }
  }

  // Batches retract only existing support: pick additions freely; a
  // retraction re-issues a previously added (k, v), never below the
  // support still available after this batch's earlier retractions.
  private def genBatch(existing: Map[(Long, Long), Long]): Gen[Seq[(Long, Long, Long)]] =
    Gen.nonEmptyListOf(for {
      k <- Gen.choose(0L, 5L)
      v <- Gen.choose(0L, 9L)
      retract <- Gen.frequency(4 -> false, 1 -> true)
    } yield (k, v, retract)).map { raw =>
      val remaining = scala.collection.mutable.Map.empty[(Long, Long), Long] ++= existing
      raw.take(10).map {
        case (k, v, true) if remaining.exists(_._2 > 0) =>
          val live = remaining.toSeq.filter(_._2 > 0).sortBy(_._1)
          val (kv, _) = live((k * 31 + v).toInt % live.length)
          remaining(kv) -= 1
          (kv._1, kv._2, -1L)
        case (k, v, _) =>
          remaining((k, v)) = remaining.getOrElse((k, v), 0L) + 1
          (k, v, 1L)
      }
    }

  test("maintenance equals batch recompute for every AggregationFn") {
    import AggregationFn._
    val params = Gen.Parameters.default
    for (fn <- Seq(COUNT, SUM, AVG, VARIANCE, MIN, MAX, MEDIAN)) {
      val inc = new IncrementalAggregate(spark, fn)
      val state = scala.collection.mutable.Map.empty[(Long, Long), Long]
      val out = scala.collection.mutable.Map.empty[Long, Seq[Long]]
      (1 to 3).foreach { i =>
        val existing = state.toMap.filter(_._2 > 0)
        val batch = genBatch(existing)(params, Seed(fn.hashCode * 7919L + i))
          .getOrElse(Seq.empty)
        batch.foreach { case (k, v, d) =>
          val w = state.getOrElse((k, v), 0L) + d
          if (w == 0L) state.remove((k, v)) else state((k, v)) = w
        }
        val diffs = inc.advance(deltaDf(batch)).collect()
        diffs.foreach { r =>
          val n = r.length
          val k = r.getLong(0)
          val agg = (1 until n - 1).map(r.getLong)
          if (r.getLong(n - 1) > 0) out(k) = agg
          else {
            assert(out.get(k).contains(agg),
              s"$fn: retraction of $agg but held ${out.get(k)}")
            out.remove(k)
          }
        }
        assert(out.toMap == brute(fn, state.toMap), s"$fn batch $i: $batch")
      }
    }
  }

  test("per-batch shuffle is O(delta) as state grows 100x") {
    import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
    val inc = new IncrementalAggregate(spark, AggregationFn.SUM)
    val records = new java.util.concurrent.atomic.AtomicLong
    val listener = new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) records.addAndGet(m.shuffleWriteMetrics.recordsWritten)
      }
    }
    def settled(): Long = {
      val deadline = System.nanoTime + 10_000_000_000L
      var prev = -1L
      var cur = records.get
      while (prev != cur && System.nanoTime < deadline) {
        prev = cur; Thread.sleep(200); cur = records.get
      }
      cur
    }
    def rows(from: Long, n: Long): Seq[(Long, Long, Long)] =
      (from until from + n).map(i => (i % 97, i, 1L))
    def measuredBatch(batch: Seq[(Long, Long, Long)]): Long = {
      spark.sparkContext.addSparkListener(listener)
      try {
        records.set(0)
        assert(inc.advance(deltaDf(batch)).count() > 0)
        settled()
      } finally spark.sparkContext.removeSparkListener(listener)
    }
    inc.advance(deltaDf(rows(0, 100))).collect()
    val small = measuredBatch(rows(1_000_000, 10))
    inc.advance(deltaDf(rows(1_000, 10_000))).collect()
    val big = measuredBatch(rows(2_000_000, 10))
    assert(inc.stateOf.count() == 100L + 10L + 10_000L + 10L)
    // Identical 10-row deltas against 110-row and ~10k-row state: the
    // shuffle must carry the delta only (the state is merged narrowly,
    // never re-shuffled).
    assert(big <= small + 500,
      s"10-row batch shuffled $small records on small state but $big on 100x state")
    assert(big < 2000, s"10-row batch shuffled $big records against ~10k-row state")
  }

  test("foreachBatch attachment maintains per-time diffs; frontier enforced") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val inc = new IncrementalAggregate(spark, AggregationFn.MAX)
    val in = MemoryStream[(Long, Long, Long, Long)]
    val got = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Long)]
    val query = inc.attach(in.toDF.toDF("k", "v", "t", "diff"), "inc-agg-spec") {
      (t, df) =>
        got ++= df.collect().map(r => (t, r.getLong(0), r.getLong(1), r.getLong(2)))
    }
    try {
      in.addData((1L, 5L, 1L, 1L), (1L, 9L, 1L, 1L))
      query.processAllAvailable()
      assert(got.toSet == Set((1L, 1L, 9L, 1L)))
      got.clear()
      // Retracting the max re-ranks to the runner-up.
      in.addData((1L, 9L, 2L, -1L))
      query.processAllAvailable()
      assert(got.toSet == Set((2L, 1L, 9L, -1L), (2L, 1L, 5L, 1L)))
    } finally query.stop()
  }
}
