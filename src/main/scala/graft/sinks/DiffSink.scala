package graft.sinks

import org.apache.spark.sql.DataFrame

/** Delivery target for DATA-SIZED rule results — the sink-based analog of
  * the reference's sink routing (`Output::direct` vs a configured `Sink`,
  * `src/server/mod.rs:94-108` + `src/sinks/mod.rs:30-80`).
  *
  * `Engine.drain` materializes result diffs on the driver, which is right
  * for query-sized results (the reference's wire delivery does the same)
  * but a hard ceiling when a rule's result is proportional to the data —
  * e.g. a full transitive closure at scale. An interest registered with a
  * `DiffSink` instead receives each advance's diffs as a *DataFrame*
  * (result columns `c0..cn`, then `_t`, `_diff`) whose computation — the
  * snapshot-vs-previous diff — runs entirely distributed; the sink decides
  * how to spend it (parquet append, foreach-style handoff, counting).
  * Nothing is ever `collect()`ed by the engine on this path.
  */
trait DiffSink {

  /** Deliver one advance's output diffs for `name` at emitted time `t`.
    * `diffs` columns: the rule's result columns `c0..cn`, `_t` (constant
    * `t`), `_diff` (non-zero signed multiplicity change). The frame is
    * stable — backed by immutable snapshots — and may be consumed lazily
    * or more than once. */
  def deliver(name: String, t: Long, diffs: DataFrame): Unit
}

/** Appends each advance's diffs under `root/<rule>/` as parquet,
  * partitioned by emitted time — the durable, cluster-sized delivery path
  * (readers see one directory per rule, one partition per epoch).
  *
  * READER CONTRACT: the directory is a CHANGELOG, not a snapshot — rows
  * carry a signed `_diff`, and retractions arrive as `_diff = -1` rows in
  * later partitions. A consumer that wants the current state must
  * consolidate by summed `_diff` first (group by the result columns, sum
  * `_diff`, keep positive — exactly what the `q_sink_parquet` oracle
  * does); reading the directory raw double-counts every retracted row. */
final class ParquetDirSink(root: String) extends DiffSink {
  def deliver(name: String, t: Long, diffs: DataFrame): Unit =
    diffs.write.mode("append").partitionBy("_t").parquet(s"$root/$name")
}

/** CSV flavor of [[ParquetDirSink]] (the data-sized analog of the wire
  * `Sink::CsvFile`): appends each advance's diffs under `root/<rule>/`
  * as headered CSV, partitioned by emitted time. Distributed write —
  * Spark's csv source handles quoting/escaping per the configured
  * delimiter. */
final class CsvDirSink(root: String, delimiter: Char = ',')
    extends DiffSink {
  def deliver(name: String, t: Long, diffs: DataFrame): Unit =
    diffs.write.mode("append").partitionBy("_t")
      .option("header", "true").option("sep", delimiter.toString)
      .csv(s"$root/$name")
}

/** Hands each diff frame to `f` — for tests and embedded consumers that
  * want to aggregate or re-route without a filesystem round trip. */
final class ForeachFrameSink(f: (String, Long, DataFrame) => Unit) extends DiffSink {
  def deliver(name: String, t: Long, diffs: DataFrame): Unit = f(name, t, diffs)
}
