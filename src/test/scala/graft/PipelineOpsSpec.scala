package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.Dedup

/** Unit coverage for pipeline operators whose driver queries only see one
  * data distribution (the sf0.01 documents table): edge shapes that the
  * oracle gate can't distinguish — chains deeper than one propagation
  * round, singletons, multiple components.
  */
class PipelineOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("connectedComponents: chains, singletons, separate components") {
    // Component 1: 1-2-3-4-5 as a CHAIN (diameter 4 — forces several
    // propagation rounds). Component 2: {10, 11}. Singletons: 20, 21.
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (10L, 11L))
      .toDF("a", "b")
    val ids = Seq(1L, 2L, 3L, 4L, 5L, 10L, 11L, 20L, 21L).toDF("id")
    val got = Dedup.connectedComponents(pairs, ids)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    val want = Set(
      (1L, 1L, true), (2L, 1L, false), (3L, 1L, false), (4L, 1L, false),
      (5L, 1L, false),
      (10L, 10L, true), (11L, 10L, false),
      (20L, 20L, true), (21L, 21L, true))
    assert(got == want)
  }

  test("connectedComponents: empty pair set keeps every doc") {
    val pairs = Seq.empty[(Long, Long)].toDF("a", "b")
    val ids = Seq(7L, 8L).toDF("id")
    val got = Dedup.connectedComponents(pairs, ids)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    assert(got == Set((7L, 7L, true), (8L, 8L, true)))
  }
}
