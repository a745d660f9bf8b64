package graft.sinks

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQueryListener}
import org.apache.spark.sql.Row

/** The /dev/null benchmarking sink — reference `Sink::TheVoid`
  * (`src/sinks/mod.rs:83-128`): swallows results while logging per-epoch
  * latency. Spark shape: the built-in `noop` streaming format plus a
  * query listener recording milliseconds per micro-batch (the analog of
  * the reference's ms-per-frontier-advance log). */
object TheVoid {

  /** Per-batch timing record: (batchId, processing ms, input rows). */
  final case class Epoch(batchId: Long, durationMs: Long, inputRows: Long)

  /** Listener collecting per-batch latencies for a named query. Attach
    * with `spark.streams.addListener(listener)`. */
  final class LatencyLog(queryName: String) extends StreamingQueryListener {
    private val log = new java.util.concurrent.ConcurrentLinkedQueue[Epoch]

    def epochs: Seq[Epoch] = {
      val it = log.iterator()
      val out = Seq.newBuilder[Epoch]
      while (it.hasNext) out += it.next()
      out.result()
    }

    override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
    override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
      val p = e.progress
      if (p.name == queryName) {
        val ms = Option(p.durationMs.get("triggerExecution"))
          .map(_.longValue()).getOrElse(0L)
        log.add(Epoch(p.batchId, ms, p.numInputRows))
      }
    }
  }

  /** Route a diff stream into the void, timing each epoch. Returns the
    * writer (caller starts it) and the latency log. */
  def sink(df: DataFrame, queryName: String): (DataStreamWriter[Row], LatencyLog) = {
    val listener = new LatencyLog(queryName)
    df.sparkSession.streams.addListener(listener)
    (df.writeStream.format("noop").queryName(queryName), listener)
  }
}
