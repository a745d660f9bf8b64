package graft
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

/** Measurement harness for the optimization rounds (guide §1): runs the
  * named bench cells with a SparkListener attached and prints, per cell,
  * wall seconds next to the Spark-side job/stage/task counts and the
  * summed executor task time. The gap between wall time and task time /
  * cores is DRIVER time (planning, checkpoint bookkeeping, per-job
  * submission overhead) — the first thing to attribute on maintained
  * cells that run many small jobs per advance. Not part of the driver
  * bench contract; local iteration only.
  *
  * Usage: SPARK_GRAFT_ONLY=q_a,q_b sbt "runMain graft.Profile"
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.cleaner.referenceTracking.cleanCheckpoints", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val jobs = new AtomicInteger(0)
    val stages = new AtomicInteger(0)
    val tasks = new AtomicInteger(0)
    val taskTimeMs = new AtomicLong(0L)
    val gcTimeMs = new AtomicLong(0L)
    val shuffleReadB = new AtomicLong(0L)
    val shuffleWriteB = new AtomicLong(0L)
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit =
        stages.incrementAndGet()
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        val m = e.taskMetrics
        if (m != null) {
          taskTimeMs.addAndGet(m.executorRunTime)
          gcTimeMs.addAndGet(m.jvmGCTime)
          shuffleReadB.addAndGet(m.shuffleReadMetrics.totalBytesRead)
          shuffleWriteB.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)

    // Same warmup as Bench so cell numbers are comparable.
    try SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    try SparkEntry.queries("q_match_ea")(spark, sfDir).count()
    catch { case _: Throwable => () }
    Seq("lineitem", "orders", "customer", "documents", "embeddings", "events")
      .foreach { t =>
        try spark.read.parquet(s"$sfDir/$t.parquet").count()
        catch { case _: Throwable => () }
      }

    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    val selected = SparkEntry.queries.toSeq.sortBy(_._1).filter {
      case (name, _) => only.forall(_.contains(name))
    }
    println(f"${"cell"}%-28s ${"wall_s"}%8s ${"jobs"}%6s ${"stages"}%7s " +
      f"${"tasks"}%7s ${"task_s"}%8s ${"gc_s"}%6s ${"shR_MB"}%7s ${"shW_MB"}%7s")
    selected.foreach { case (name, fn) =>
      // Let in-flight listener events settle, then zero the counters.
      Thread.sleep(300)
      jobs.set(0); stages.set(0); tasks.set(0)
      taskTimeMs.set(0); gcTimeMs.set(0)
      shuffleReadB.set(0); shuffleWriteB.set(0)
      val t0 = System.nanoTime()
      val err = try { fn(spark, sfDir).count(); None }
        catch { case e: Throwable =>
          Some(Option(e.getMessage).getOrElse(e.getClass.getName)) }
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300)
      err match {
        case Some(m) => println(f"$name%-28s ERROR ${m.take(80)}")
        case None => println(
          f"$name%-28s $wall%8.2f ${jobs.get}%6d ${stages.get}%7d " +
          f"${tasks.get}%7d ${taskTimeMs.get / 1e3}%8.1f " +
          f"${gcTimeMs.get / 1e3}%6.1f " +
          f"${shuffleReadB.get / 1000000}%7d ${shuffleWriteB.get / 1000000}%7d")
      }
    }
    spark.stop()
  }
}
