package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.engine.Engine
import graft.model._
import graft.model.Plan._
import graft.sources.LoggingSource

/** The engine observes its own runtime: listener events surface as
  * queryable attributes, like the reference's logging sources
  * (`src/sources/timely_logging.rs`). */
class LoggingSourceSpec extends AnyFunSuite {

  private def spark = TestSpark.spark

  test("a rule queries the engine's own job events") {
    val engine = new Engine(spark)
    val source = new LoggingSource(engine,
      Seq(LoggingSource.JobId, LoggingSource.JobSucceededQ))
    try {
      engine.register(Rule("succeeded_jobs",
        Join(Seq(0),
          MatchA(0, LoggingSource.JobId, 1),
          MatchAV(0, LoggingSource.JobSucceededQ, Value.bool(true)))))
      engine.interest("succeeded_jobs")

      // Run a real Spark job; its events land on the listener bus.
      spark.range(100).count()
      // The bus is asynchronous — poll until the job events buffered.
      val deadline = System.currentTimeMillis() + 15000
      var n = 0
      while (n == 0 && System.currentTimeMillis() < deadline) {
        Thread.sleep(50)
        n = source.flush()
      }
      assert(n > 0, "no listener events arrived")

      engine.advance(1)
      val got = engine.drain("succeeded_jobs")
      assert(got.nonEmpty)
      assert(got.forall { case (tuple, _, d) => d == 1L && tuple(0) == tuple(1) })
    } finally source.close()
  }

  test("only requested attributes materialize; unknown names are rejected") {
    val engine = new Engine(spark)
    intercept[IllegalArgumentException] {
      new LoggingSource(engine, Seq("spark.event.job/nope"))
    }
    val source = new LoggingSource(engine, Seq(LoggingSource.StageName))
    try {
      spark.range(10).count()
      Thread.sleep(500)
      source.flush()
      // Job attributes were not requested, so they were never created.
      val ex = intercept[GraftError] {
        engine.register(Rule("jobs", MatchA(0, LoggingSource.JobId, 1)))
        engine.interest("jobs")
        engine.transact(Seq(Datom.add(1L, LoggingSource.StageName, Value.str("x"))))
        engine.advance(engine0Frontier(engine) + 1)
      }
      assert(ex.category == "df.error.category/not-found")
    } finally source.close()
  }

  // Current frontier isn't exposed; advancing by a large step is enough.
  private def engine0Frontier(engine: Engine): Long = 100L
}
