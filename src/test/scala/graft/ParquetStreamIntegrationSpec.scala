package graft

import java.nio.file.Files

import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.model._
import graft.model.Plan._
import graft.model.ValueKind._
import graft.sources.FileSources
import graft.streaming.StreamCompiler

/** Parquet directory source → streaming plan compiler, end to end — the
  * columnar twin of [[CsvStreamIntegrationSpec]] (round-15 VERDICT item
  * #5): a watched directory of parquet files fans into per-attribute
  * update streams (`FileSources.streamParquet`) that a compiled JOIN
  * plan maintains incrementally, with `maxFilesPerTrigger` batching the
  * arrivals one file per micro-batch, and a poisoned file (null entity
  * coordinate) failing the stream loudly instead of corrupting state. */
class ParquetStreamIntegrationSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  /** Write `rows` as a single parquet PART FILE named `name` inside
    * `dir` — the file-stream source watches flat files, while a Spark
    * parquet write produces a directory, so the part file is moved in. */
  private def addFile(dir: java.io.File, name: String,
      rows: Seq[(Long, String, Long)]): Unit = {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft_pq_batch").toFile
    rows.toDF("id", "name", "age").coalesce(1)
      .write.mode("overwrite").parquet(tmp.getAbsolutePath)
    val part = tmp.listFiles().find(_.getName.endsWith(".parquet"))
      .getOrElse(fail(s"no part file in $tmp"))
    Files.move(part.toPath, dir.toPath.resolve(name))
  }

  test("parquet directory source drives a compiled join, one file per trigger") {
    val dir = Files.createTempDirectory("graft_pq_stream").toFile
    dir.deleteOnExit()

    val sources = FileSources.streamParquet(
      spark, dir.getAbsolutePath,
      schemaDDL = "id BIGINT, name STRING, age BIGINT",
      eidColumn = "id",
      attributes = Seq(
        ":ps/name" -> (("name", KString)),
        ":ps/age" -> (("age", KNumber))),
      maxFilesPerTrigger = 1)
      .map { case (aid, df, _) => aid -> df }.toMap

    val compiler = new StreamCompiler(sources,
      Map(":ps/name" -> KString, ":ps/age" -> KNumber))
    val plan = Join(Seq(0), MatchA(0, ":ps/name", 1), MatchA(0, ":ps/age", 2))

    val query = compiler.compileToFrame(plan)
      .writeStream.format("memory").queryName("pq_join_out")
      .outputMode(OutputMode.Append()).start()
    try {
      def rows(): Seq[(Long, String, Long, Long)] =
        spark.table("pq_join_out").collect().toSeq.map(r =>
          (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(4)))

      addFile(dir, "batch1.parquet",
        Seq((1L, "alice", 10L), (2L, "bob", 20L)))
      query.processAllAvailable()
      assert(rows().toSet == Set((1L, "alice", 10L, 1L), (2L, "bob", 20L, 1L)))

      // TWO more files land together; maxFilesPerTrigger=1 must batch
      // them into separate triggers, and each joins against RETAINED
      // state (alicia meets the existing age 10; eve's name and age
      // arrive in DIFFERENT files yet still join).
      val batchesBefore = query.recentProgress.count(_.numInputRows > 0)
      addFile(dir, "batch2.parquet", Seq((1L, "alicia", 11L)))
      addFile(dir, "batch3.parquet", Seq((3L, "eve", 30L)))
      query.processAllAvailable()
      val later = rows().toSet --
        Set((1L, "alice", 10L, 1L), (2L, "bob", 20L, 1L))
      assert(later == Set(
        (1L, "alicia", 10L, 1L),
        (1L, "alice", 11L, 1L),
        (1L, "alicia", 11L, 1L),
        (3L, "eve", 30L, 1L)))
      val batchesAfter = query.recentProgress.count(_.numInputRows > 0)
      assert(batchesAfter - batchesBefore >= 2,
        s"maxFilesPerTrigger=1 must split 2 files into >=2 data triggers " +
          s"(saw ${batchesAfter - batchesBefore})")
    } finally query.stop()
  }

  test("a poisoned parquet file (null entity id) fails the stream loudly") {
    // Fail-stop contract (`FileSources.streamParquet` doc): a silently
    // null coordinate would corrupt downstream state irrecoverably and
    // Structured Streaming retries would re-deliver it forever — the
    // stream must die with the coordinate named so the operator can
    // remove the file and restart.
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val dir = Files.createTempDirectory("graft_pq_poison").toFile
    dir.deleteOnExit()
    val tmp = Files.createTempDirectory("graft_pq_poison_b").toFile
    spark.createDataFrame(
      java.util.Arrays.asList(Row(1L, "ok", 5L), Row(null, "bad", 6L)),
      StructType(Seq(
        StructField("id", LongType, true),
        StructField("name", StringType, true),
        StructField("age", LongType, true))))
      .coalesce(1).write.mode("overwrite").parquet(tmp.getAbsolutePath)
    val part = tmp.listFiles().find(_.getName.endsWith(".parquet")).get
    Files.move(part.toPath, dir.toPath.resolve("poison.parquet"))

    val (_, df, _) = FileSources.streamParquet(
      spark, dir.getAbsolutePath,
      schemaDDL = "id BIGINT, name STRING, age BIGINT",
      eidColumn = "id",
      attributes = Seq(":ps/name" -> (("name", KString)))).head
    val query = df.writeStream.format("memory").queryName("pq_poison_out")
      .outputMode(OutputMode.Append()).start()
    try {
      val ex = intercept[Exception] { query.processAllAvailable() }
      val msg = Iterator.iterate(ex: Throwable)(_.getCause)
        .takeWhile(_ != null).map(String.valueOf(_)).mkString(" | ")
      assert(msg.contains("entity id"),
        s"expected the loud entity-coordinate message, got: $msg")
    } finally query.stop()
  }
}
