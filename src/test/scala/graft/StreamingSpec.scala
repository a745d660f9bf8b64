package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.{DatomStreams, Update}

/** Structured Streaming semantics: LWW and Distinct input operators emit
  * the reference's exact retract/assert diffs across micro-batches
  * (mirrors `tests/input_semantics.rs` expectations), and Coarsen rounds
  * up to interval bounds (`src/timestamp/mod.rs:144-184`). */
class StreamingSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def runBatches[V](
      name: String,
      transform: org.apache.spark.sql.Dataset[Update[V]] => org.apache.spark.sql.Dataset[Update[V]],
      batches: Seq[Seq[Update[V]]])(
      implicit enc: org.apache.spark.sql.Encoder[Update[V]]): Seq[Seq[Update[V]]] = {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[Update[V]]
    val query = transform(input.toDS())
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append()).start()
    try {
      val out = scala.collection.mutable.ArrayBuffer.empty[Seq[Update[V]]]
      var seen = 0L
      batches.foreach { b =>
        input.addData(b)
        query.processAllAvailable()
        val all = spark.table(name).as[Update[V]].collect().toSeq
        out += all.drop(seen.toInt)
        seen = all.length
      }
      out.toSeq
    } finally query.stop()
  }

  test("lastWriteWins emits retract+assert per entity across batches") {
    implicit val enc = org.apache.spark.sql.Encoders.product[Update[String]]
    implicit val vEnc = org.apache.spark.sql.Encoders.STRING
    val got = runBatches[String](
      "lww_out",
      ds => DatomStreams.lastWriteWins(ds),
      Seq(
        // batch 1: e1 written twice (time order within the batch), e2 once
        Seq(Update(1L, "A", 0L, 1L), Update(1L, "B", 1L, 1L), Update(2L, "C", 0L, 1L)),
        // batch 2: e1 overwritten, e2 explicitly retracted
        Seq(Update(1L, "D", 2L, 1L), Update(2L, "X", 2L, -1L))))

    assert(got(0).toSet == Set(
      Update(1L, "A", 0L, 1L), Update(1L, "A", 1L, -1L), Update(1L, "B", 1L, 1L),
      Update(2L, "C", 0L, 1L)))
    assert(got(1).toSet == Set(
      Update(1L, "B", 2L, -1L), Update(1L, "D", 2L, 1L),
      // retraction retracts the CURRENT value (state machine), not the
      // retraction's own payload
      Update(2L, "C", 2L, -1L)))
  }

  test("distinctSet emits one diff per support zero-crossing") {
    implicit val enc = org.apache.spark.sql.Encoders.product[Update[Long]]
    implicit val vEnc = org.apache.spark.sql.Encoders.scalaLong
    val got = runBatches[Long](
      "distinct_out",
      ds => DatomStreams.distinctSet(ds),
      Seq(
        // double assert → a single +1
        Seq(Update(1L, 7L, 0L, 1L), Update(1L, 7L, 1L, 1L)),
        // one retraction → support still positive, nothing emitted
        Seq(Update(1L, 7L, 2L, -1L)),
        // second retraction → support zero, -1 emitted
        Seq(Update(1L, 7L, 3L, -1L))))
    assert(got(0) == Seq(Update(1L, 7L, 0L, 1L)))
    assert(got(1).isEmpty)
    assert(got(2) == Seq(Update(1L, 7L, 3L, -1L)))
  }

  test("joinDiffs maintains an incremental equijoin with retractions") {
    import graft.streaming.{JoinDiff, JoinUpdate}
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    implicit val uEnc = org.apache.spark.sql.Encoders.product[Update[String]]
    implicit val tEnc = org.apache.spark.sql.Encoders.product[JoinUpdate[String, String]]
    implicit val oEnc = org.apache.spark.sql.Encoders.product[JoinDiff[String, String]]

    val l = MemoryStream[Update[String]]
    val r = MemoryStream[Update[String]]
    val query = DatomStreams.joinDiffs(l.toDS(), r.toDS())
      .writeStream.format("memory").queryName("join_out")
      .outputMode(OutputMode.Append()).start()
    try {
      def drained(seen: Int): Seq[JoinDiff[String, String]] = {
        query.processAllAvailable()
        spark.table("join_out").as[JoinDiff[String, String]].collect().toSeq.drop(seen)
      }
      // batch 1: both sides matched on e=1, unmatched e=2 left only
      l.addData(Seq(Update(1L, "A", 0L, 1L), Update(2L, "B", 0L, 1L)))
      r.addData(Seq(Update(1L, "X", 0L, 1L)))
      val b1 = drained(0)
      assert(b1.toSet == Set(JoinDiff(1L, "A", "X", 0L, 1L)))

      // batch 2: second right value joins existing left; left retraction
      // propagates as a negative diff
      r.addData(Seq(Update(1L, "Y", 1L, 1L)))
      l.addData(Seq(Update(1L, "A", 1L, -1L)))
      val b2 = drained(b1.length)
      // net effect: +(A,Y) then -(A,X), -(A,Y) — or the retraction first;
      // net diffs are order-independent, so compare consolidated sums
      val net = b2.groupBy(d => (d.left, d.right))
        .view.mapValues(_.map(_.diff).sum).filter(_._2 != 0L).toMap
      assert(net == Map(("A", "X") -> -1L))
    } finally query.stop()
  }

  test("aggregateDiffs retracts the previous aggregate and asserts the new") {
    implicit val enc = org.apache.spark.sql.Encoders.product[Update[Long]]
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[Update[Long]]
    val query = DatomStreams.aggregateDiffs(input.toDS())(identity)
      .writeStream.format("memory").queryName("agg_out")
      .outputMode(OutputMode.Append()).start()
    try {
      def drained(seen: Int): Seq[Update[Long]] = {
        query.processAllAvailable()
        spark.table("agg_out").as[Update[Long]].collect().toSeq.drop(seen)
      }
      input.addData(Seq(Update(1L, 10L, 0L, 1L), Update(1L, 5L, 0L, 1L)))
      val b1 = drained(0)
      assert(b1 == Seq(Update(1L, 15L, 0L, 1L)))

      input.addData(Seq(Update(1L, 10L, 1L, -1L)))
      val b2 = drained(1)
      assert(b2.toSet == Set(Update(1L, 15L, 1L, -1L), Update(1L, 5L, 1L, 1L)))

      // retracting the last contribution empties the key's support: the
      // aggregate retracts without re-asserting
      input.addData(Seq(Update(1L, 5L, 2L, -1L)))
      val b3 = drained(3)
      assert(b3 == Seq(Update(1L, 5L, 2L, -1L)))
    } finally query.stop()
  }

  test("composed pipeline: distinct -> incremental join -> incremental count") {
    import graft.streaming.{JoinDiff, JoinUpdate}
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    implicit val uEnc = org.apache.spark.sql.Encoders.product[Update[String]]
    implicit val vEnc = org.apache.spark.sql.Encoders.STRING
    implicit val tEnc = org.apache.spark.sql.Encoders.product[JoinUpdate[String, String]]
    implicit val oEnc = org.apache.spark.sql.Encoders.product[JoinDiff[String, String]]
    implicit val aEnc = org.apache.spark.sql.Encoders.product[Update[Long]]

    val l = MemoryStream[Update[String]]
    val r = MemoryStream[Update[String]]
    // distinct-ed left side joined to right, then count of joined pairs per
    // entity — three stateful operators chained on one diff stream.
    val joined = DatomStreams.joinDiffs(
      DatomStreams.distinctSet(l.toDS()), r.toDS())
    val counted = DatomStreams.aggregateDiffs(
      joined.map(d => Update[String](d.e, d.left + "|" + d.right, d.t, d.diff)))(_ => 1L)
    val query = counted.writeStream.format("memory").queryName("pipe_out")
      .outputMode(OutputMode.Append()).start()
    try {
      // duplicate left asserts collapse to one; two right values → count 2
      l.addData(Seq(Update(1L, "A", 0L, 1L), Update(1L, "A", 0L, 1L)))
      r.addData(Seq(Update(1L, "X", 0L, 1L), Update(1L, "Y", 0L, 1L)))
      query.processAllAvailable()
      val rows = spark.table("pipe_out").as[Update[Long]].collect().toSeq
      // accumulated aggregate state for entity 1 must net to count=2
      val net = rows.groupBy(_.v).view.mapValues(_.map(_.diff).sum)
        .filter(_._2 != 0L).toMap
      assert(net == Map(2L -> 1L), s"rows: $rows")
    } finally query.stop()
  }

  test("coarsen rounds STRICTLY up to the next interval bound") {
    import spark.implicits._
    // (t/g + 1)·g — exact multiples round up too (src/timestamp/mod.rs:151-154).
    val df = Seq(0L, 1L, 59L, 60L, 61L, 120L).toDF("t")
    val got = df.select(DatomStreams.coarsen($"t", 60L).as("c"))
      .collect().map(_.getLong(0)).toSeq
    assert(got == Seq(60L, 60L, 60L, 120L, 120L, 180L))
  }

  test("windowedCounts groups by tumbling event-time windows") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[Long]
    val query = DatomStreams.windowedCounts(
      input.toDS().toDF("t"), "t", granularityMs = 1000L, slackMs = 2000L)
      .writeStream.format("memory").queryName("win_out")
      .outputMode(OutputMode.Update()).start()
    try {
      input.addData(Seq(0L, 100L, 999L, 1000L, 1500L))
      query.processAllAvailable()
      val rows = spark.table("win_out")
        .selectExpr("window.start", "count").collect()
        .map(r => (r.getTimestamp(0).getTime, r.getLong(1))).toMap
      assert(rows == Map(0L -> 3L, 1000L -> 2L))
    } finally query.stop()
  }
}
