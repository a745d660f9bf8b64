package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

import graft.engine.BiEngine
import graft.model.Value

/** Streaming bitemporal ingestion — `Pair(system, event)` semantics
  * (`src/timestamp/pair.rs:1-110`) over a Structured Streaming source.
  *
  * The stream carries bitemporal datoms `(e, a, v, sys, event, diff)`.
  * System time is the stream's arrival order and must be STRICTLY
  * increasing across micro-batches (each batch closes its system times on
  * completion — the streaming analogue of a watermark; violations fail
  * loudly via `BiEngine.transact`'s closed-time check). Event time is
  * unconstrained — that is the bitemporal point: late event-time data
  * arrives at higher system times and emits the product-order corrections
  * the reference's bitemporal suites assert
  * (`tests/input_semantics.rs:380-508`), e.g. a late write at `(1,1)`
  * retracts the value installed at `(0,0)` but not the one at `(0,2)`.
  *
  * Batches are *transactions* — control-sized writes, collected like every
  * transact path; the distributed work is the per-time rule evaluation
  * inside [[BiEngine]], which runs through the shared compiler. That
  * contract is ENFORCED, not assumed: each batch is counted distributed
  * and required under `maxTransaction` BEFORE anything lands on the
  * driver (the [[IncrementalClosure.advanceRdd]] gate pattern), so a
  * mis-routed data-sized stream fails loudly instead of OOMing.
  */
class BiStream(val engine: BiEngine, maxTransaction: Long = 100000L) {

  /** Drive `datoms` (columns e:long, a:string, v, sys:long, event:long,
    * diff:long) through the engine per micro-batch; after each batch the
    * system frontier advances past the batch's highest system time and
    * every interested rule's new diffs are handed to `onDiffs`. */
  def attach(datoms: DataFrame, queryName: String)(
      onDiffs: (String, Seq[(Seq[Any], (Long, Long), Long)]) => Unit): StreamingQuery =
    datoms.writeStream
      .outputMode("append")
      .queryName(queryName)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val sel = batch.select("e", "a", "v", "sys", "event", "diff")
        sel.persist()
        val rows = try {
          val n = sel.count()
          require(n <= maxTransaction,
            s"bitemporal micro-batch of $n datoms exceeds the transaction " +
              s"gate ($maxTransaction); bitemporal streams carry " +
              "control-sized transactions — route data-sized batches " +
              "through BiMaintained.transactFrame (the distributed " +
              "bulk-ingest edge) or the batch engine")
          sel.collect()
        } finally sel.unpersist()
        if (rows.nonEmpty) {
          val ds = rows.toSeq.map { r =>
            engine.BiDatom(Value.VEid(r.getLong(0)), r.getString(1),
              toValue(r.get(2)), (r.getLong(3), r.getLong(4)), r.getLong(5))
          }
          engine.transact(ds)
          engine.advance(ds.iterator.map(_.t._1).max + 1L)
          engine.interestNames.foreach { name =>
            val diffs = engine.drain(name)
            if (diffs.nonEmpty) onDiffs(name, diffs)
          }
        }
      }
      .start()

  private def toValue(v: Any): Value = v match {
    case n: Long    => Value.VNumber(n)
    case n: Int     => Value.VNumber(n.toLong)
    case s: String  => Value.VString(s)
    case b: Boolean => Value.VBool(b)
    case d: Double  => Value.VReal(d)
    case other      => sys.error(s"unsupported stream value type: $other")
  }
}
