package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.queries.{CoreQueries, PipelineQueries}

class ScratchAuditSpec extends AnyFunSuite {
  test("md5 context") {
    val spark = TestSpark.spark
    val qs = (CoreQueries.queries ++ PipelineQueries.queries)
    for (name <- Seq("q_corpus_clean", "q_dedup_incremental")) {
      val plan = qs(name)(spark, "/root/testdata/sf0.001").queryExecution.executedPlan.toString
      println(s"=== $name ===")
      plan.split("\n").filter(_.contains("md5(")).foreach(l => println("LINE " + l.trim.take(300)))
    }
    println("AUDIT done")
  }
}
