package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.IncrementalClosure

/** The streamed closure must emit, per batch, EXACTLY the tuples of
  * closure(E ∪ Δe) − closure(E) — verified against a driver-side BFS
  * closure on random edge batches, and end-to-end through the
  * foreachBatch attachment on a memory stream.
  */
class IncrementalClosureSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Driver-side reference closure by repeated BFS. */
  private def closure(edges: Set[(Long, Long)]): Set[(Long, Long)] = {
    val adj = edges.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val nodes = edges.flatMap(e => Seq(e._1, e._2))
    nodes.flatMap { s =>
      val seen = scala.collection.mutable.Set.empty[Long]
      var frontier = adj.getOrElse(s, Set.empty)
      while (frontier.nonEmpty) {
        seen ++= frontier
        frontier = frontier.flatMap(adj.getOrElse(_, Set.empty)) -- seen
      }
      seen.map(d => (s, d))
    }
  }

  test("per-batch diffs equal closure(E ∪ Δe) − closure(E) on random batches") {
    val rnd = new scala.util.Random(42)
    val inc = new IncrementalClosure(spark, partitions = 2)
    var accumulated = Set.empty[(Long, Long)]
    for (batch <- 1 to 6) {
      val edges = Seq.fill(8)((rnd.nextInt(12).toLong, rnd.nextInt(12).toLong))
        .filter(e => e._1 != e._2)
      val before = closure(accumulated)
      accumulated ++= edges
      val after = closure(accumulated)
      val got = inc.advance(edges, batch.toLong).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == after -- before, s"batch $batch edges=$edges")
    }
    assert(inc.size == closure(accumulated).size.toLong)
  }

  test("duplicate and already-known edges emit nothing") {
    val inc = new IncrementalClosure(spark, partitions = 2)
    val d1 = inc.advance(Seq((1L, 2L), (2L, 3L), (1L, 2L)), 1L).collect()
    assert(d1.map(r => (r.getLong(0), r.getLong(1))).toSet ==
      Set((1L, 2L), (2L, 3L), (1L, 3L)))
    assert(inc.advance(Seq((1L, 2L)), 2L).collect().isEmpty)
  }

  test("advanceRdd dedups a firehose batch distributed: raw rows never collected") {
    // 500k raw rows but only 100 distinct fresh edges: the driver must see
    // the 100, not the 500k (the raw batch is deduped and subtracted
    // against the known set as an RDD before any collect).
    val inc = new IncrementalClosure(spark, partitions = 4, maxEdges = 200L)
    val path = (0L until 100L).map(i => (i, i + 1))
    val raw = spark.sparkContext
      .parallelize(0 until 500000, 8)
      .map(i => path(i % path.length))
    // maxEdges=200 < 500k raw rows: this only passes if dedup/subtract
    // runs BEFORE the driver-side gate sees the batch.
    val d1 = inc.advanceRdd(raw, 1L)
    assert(d1.count() === 100L * 101L / 2) // closure of a 101-node path
    // Re-sending the same firehose adds nothing.
    assert(inc.advanceRdd(raw, 2L).count() === 0L)
  }

  test("attach rejects retractions via the distributed guard") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val edges = MemoryStream[(Long, Long, Long, Long)]
    val inc = new IncrementalClosure(spark, partitions = 2)
    val query = inc.attach(
      edges.toDF.toDF("src", "dst", "t", "diff"), "inc-closure-guard-spec") { _ => () }
    try {
      edges.addData((1L, 2L, 1L, -1L))
      val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        query.processAllAvailable()
      }
      assert(ex.getMessage.contains("additions only") ||
        Option(ex.getCause).exists(_.getMessage.contains("additions only")))
    } finally query.stop()
  }

  test("attach rejects a time that regresses the processed frontier") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val edges = MemoryStream[(Long, Long, Long, Long)]
    val inc = new IncrementalClosure(spark, partitions = 2)
    val query = inc.attach(
      edges.toDF.toDF("src", "dst", "t", "diff"), "inc-closure-frontier-spec") { _ => () }
    try {
      edges.addData((1L, 2L, 5L, 1L))
      query.processAllAvailable()
      edges.addData((2L, 3L, 3L, 1L)) // t=3 regresses past t=5
      val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        query.processAllAvailable()
      }
      def chain(t: Throwable): Seq[Throwable] =
        Iterator.iterate(t: Throwable)(_.getCause).takeWhile(_ != null).take(20).toSeq
      assert(chain(ex).exists(c =>
        c.getMessage != null && c.getMessage.contains("processed frontier")),
        s"expected frontier violation, got: ${ex.getMessage}")
    } finally query.stop()
  }

  test("foreachBatch attachment streams closure diffs from a memory stream") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val edges = MemoryStream[(Long, Long, Long, Long)]
    val inc = new IncrementalClosure(spark, partitions = 2)
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
    val query = inc.attach(
      edges.toDF.toDF("src", "dst", "t", "diff"), "inc-closure-spec") { df =>
      out ++= df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    }
    try {
      edges.addData((1L, 2L, 1L, 1L), (2L, 3L, 1L, 1L))
      query.processAllAvailable()
      assert(out.toSet == Set((1L, 2L, 1L), (2L, 3L, 1L), (1L, 3L, 1L)))
      out.clear()
      edges.addData((3L, 1L, 2L, 1L)) // closes the cycle
      query.processAllAvailable()
      val want = Set(
        (3L, 1L), (3L, 2L), (3L, 3L),
        (1L, 1L), (2L, 2L), (2L, 1L))
      assert(out.map(r => (r._1, r._2)).toSet == want)
      assert(out.forall(_._3 == 2L))
    } finally query.stop()
  }
}
