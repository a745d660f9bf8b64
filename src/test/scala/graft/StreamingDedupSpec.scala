package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamingDedup

/** Streaming ingest dedup: first occurrence per content digest across
  * micro-batches, with and without a standing-corpus anti filter. */
class StreamingDedupSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def run(name: String, corpus: Option[Seq[(Long, String)]],
      batches: Seq[Seq[(Long, String)]]): Seq[Set[(Long, String)]] = {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val stream = input.toDF().toDF("doc_id", "text")
    val deduped = corpus match {
      case Some(c) => StreamingDedup.againstCorpus(stream,
        c.toDF("doc_id", "text"), "doc_id", "text")
      case None => StreamingDedup.firstOccurrence(stream, "doc_id", "text")
    }
    val query = deduped.writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append()).start()
    try {
      val out = scala.collection.mutable.ArrayBuffer.empty[Set[(Long, String)]]
      var seen = 0
      batches.foreach { b =>
        input.addData(b)
        query.processAllAvailable()
        val all = spark.table(name)
          .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
        out += all.drop(seen).toSet
        seen = all.length
      }
      out.toSeq
    } finally query.stop()
  }

  private def md5(s: String): String = {
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }

  test("firstOccurrence: one survivor per digest across batches") {
    val got = run("sdedup_first", None, Seq(
      Seq((1L, "alpha"), (2L, "beta")),
      Seq((3L, "alpha"), (4L, "gamma")), // alpha already in state
      Seq((5L, "gamma"), (6L, "gamma")))) // gamma already in state
    assert(got(0) == Set((1L, md5("alpha")), (2L, md5("beta"))))
    assert(got(1) == Set((4L, md5("gamma"))))
    assert(got(2) == Set.empty)
  }

  test("againstCorpus: standing-corpus digests never emit or enter state") {
    val corpus = Seq((100L, "beta"), (101L, "delta"))
    val got = run("sdedup_corpus", Some(corpus), Seq(
      Seq((1L, "alpha"), (2L, "beta")),   // beta dropped by the anti join
      Seq((3L, "delta"), (4L, "alpha")))) // delta dropped; alpha in state
    assert(got(0) == Set((1L, md5("alpha"))))
    assert(got(1) == Set.empty)
  }
}
