package graft.sources

import java.util.concurrent.ConcurrentLinkedQueue
import scala.jdk.CollectionConverters._

import org.apache.spark.scheduler.{
  JobSucceeded, SparkListener, SparkListenerJobEnd, SparkListenerJobStart,
  SparkListenerStageCompleted}

import graft.engine.Engine
import graft.model.{AttributeConfig, Datom, InputSemantics, Value}

/** Engine self-observation as attribute streams — the Spark analog of the
  * reference's logging sources (`src/sources/timely_logging.rs:59-180`,
  * `differential_logging.rs`): runtime events become datoms on
  * namespaced attributes, registered and queryable like any other input.
  *
  * Reference attributes like `timely.event.operates/name` map to Spark's
  * execution vocabulary:
  *
  * | attribute                      | entity     | value                 |
  * |--------------------------------|------------|-----------------------|
  * | `spark.event.job/id`           | job        | job id                |
  * | `spark.event.job/stages`       | job        | stage count           |
  * | `spark.event.job/succeeded?`   | job        | success flag          |
  * | `spark.event.stage/name`       | stage      | stage name            |
  * | `spark.event.stage/num-tasks`  | stage      | task count            |
  *
  * Events arrive on Spark's listener bus asynchronously; like the
  * reference's scheduler-stepped sources, they buffer until [[flush]]
  * transacts them at the engine's current epoch (keeping all engine
  * mutation single-threaded). Only the attributes requested at
  * construction are materialized (`timely_logging.rs:22-23,62-69`). */
final class LoggingSource(engine: Engine, attributes: Seq[String])
    extends SparkListener {

  import LoggingSource._

  private val wanted = attributes.toSet
  private val pending = new ConcurrentLinkedQueue[Datom]()

  attributes.foreach { a =>
    require(All.contains(a), s"unknown logging attribute $a (known: $All)")
    engine.createAttribute(a, AttributeConfig(InputSemantics.Distinct))
  }
  engine.spark.sparkContext.addSparkListener(this)

  private def offer(d: Datom): Unit = if (wanted(d.a)) pending.add(d)

  override def onJobStart(ev: SparkListenerJobStart): Unit = {
    val e = ev.jobId.toLong
    offer(Datom.add(e, JobId, Value.num(ev.jobId.toLong)))
    offer(Datom.add(e, JobStages, Value.num(ev.stageIds.length.toLong)))
  }

  override def onJobEnd(ev: SparkListenerJobEnd): Unit =
    offer(Datom.add(ev.jobId.toLong, JobSucceededQ,
      Value.bool(ev.jobResult == JobSucceeded)))

  override def onStageCompleted(ev: SparkListenerStageCompleted): Unit = {
    // Stage entities offset away from job ids (both are small ints).
    val e = StageEidBase + ev.stageInfo.stageId.toLong
    offer(Datom.add(e, StageName, Value.str(ev.stageInfo.name)))
    offer(Datom.add(e, StageNumTasks, Value.num(ev.stageInfo.numTasks.toLong)))
  }

  /** Transact all buffered event datoms at the current epoch. Returns the
    * number of datoms applied. */
  def flush(): Int = {
    val drained = Iterator.continually(pending.poll()).takeWhile(_ != null).toSeq
    if (drained.nonEmpty) engine.transact(drained)
    drained.length
  }

  /** Detach from the listener bus. */
  def close(): Unit =
    engine.spark.sparkContext.removeSparkListener(this)
}

object LoggingSource {
  val JobId = "spark.event.job/id"
  val JobStages = "spark.event.job/stages"
  val JobSucceededQ = "spark.event.job/succeeded?"
  val StageName = "spark.event.stage/name"
  val StageNumTasks = "spark.event.stage/num-tasks"
  val All: Set[String] = Set(JobId, JobStages, JobSucceededQ, StageName, StageNumTasks)
  val StageEidBase = 1000000000L
}
