package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.engine.Engine
import graft.model._
import graft.sinks.ForeachFrameSink
import graft.streaming.BiMaintained

/** Event-dominance compaction of the DELIVERY LEDGER under a declared
  * event watermark ([[BiMaintained.advanceEvent]]). Without a
  * watermark, nothing may collapse — ledger entries are distinguished
  * only by `event ≤ t.event` range tests, and a future late write can
  * place a query time between ANY two coordinates (the reference's
  * frontier-driven compaction discipline: only declared bounds license
  * consolidation). With the watermark enforced on every ingest path,
  * entries at dominated coordinates merge at the bound, and the ledger
  * PLATEAUS under monotone churn instead of growing with distinct
  * event coordinates — on both delivery edges (the distributed
  * `ledgerFrame` and the collected TreeMap).
  *
  * Pins: (1) sink-path ledger rows plateau with the watermark vs grow
  * ~2N without; (2) collected-path `ledgerEntries` likewise; (3) the
  * drained output is IDENTICAL with and without the watermark, on both
  * edges; (4) writes under the watermark reject loudly on both the Seq
  * and frame ingest paths. */
class BiLedgerCompactSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private val N = 24L

  private type Out = Map[(Seq[Any], (Long, Long), Long), Int]
  private def ms(xs: Seq[(Seq[Any], (Long, Long), Long)]): Out =
    xs.groupBy(identity).map { case (k, vs) => k -> vs.length }

  /** Monotone churn: each time s inserts entity s at event s and
    * retracts entity s−1 at event s — the live set stays one row while
    * distinct event coordinates grow with s. */
  private def drive(watermark: Boolean, sinkSide: Boolean)
      : (Out, Long, Map[String, Long]) = {
    val bm = new BiMaintained(spark, partitions = 4)
    bm.createAttribute(":lc/x", AttributeConfig(InputSemantics.Raw))
    bm.register(Rule("q", Plan.MatchA(0, ":lc/x", 1)))
    val got = scala.collection.mutable.ArrayBuffer
      .empty[(Seq[Any], (Long, Long), Long)]
    if (sinkSide) {
      val sink = new ForeachFrameSink((_, _, df) => {
        val n = df.columns.length - 3
        df.collect().foreach { row =>
          got += (((0 until n).map(i => Engine.deepNative(row.get(i))),
            (row.getLong(n), row.getLong(n + 1)), row.getLong(n + 2)))
        }
      })
      bm.interestSink("q", sink)
    } else bm.interest("q")
    (0L until N).foreach { s =>
      if (watermark) bm.advanceEvent(s)
      val ins = bm.BiDatom(Value.eid(s), ":lc/x", Value.num(s), (s, s), 1L)
      val batch =
        if (s == 0L) Seq(ins)
        else Seq(ins,
          bm.BiDatom(Value.eid(s - 1L), ":lc/x", Value.num(s - 1L), (s, s), -1L))
      bm.transact(batch)
      bm.advance(s + 1L)
      if (!sinkSide) got ++= bm.drain("q")
    }
    if (!sinkSide) got ++= bm.drain("q")
    val ledgerSize =
      if (sinkSide) bm.ledgerRowsProbe("q")
      else bm.controlPlaneStats("ledgerEntries")
    (ms(got.toSeq), ledgerSize, bm.sinkDeliveryStats.toMap)
  }

  test("sink-path ledger plateaus under the watermark; output unchanged") {
    val prev = sys.props.put("graft.bi.sink.segcap", "4")
    try {
      val (outNo, rowsNo, _) = drive(watermark = false, sinkSide = true)
      val (outWm, rowsWm, stats) = drive(watermark = true, sinkSide = true)
      assert(outWm == outNo,
        s"watermark changed the drain:\n no=$outNo\n wm=$outWm")
      assert(outNo.nonEmpty)
      // Without collapse every event coordinate survives: ~2N−1 rows.
      assert(rowsNo >= 2 * N - 4, s"expected ~${2 * N - 1} rows, got $rowsNo")
      // With the watermark the dominated coordinates merge and churn
      // nets away: the plateau is the live set + the uncollapsed tail.
      assert(rowsWm <= 8L, s"ledger did not plateau: $rowsWm rows")
      assert(stats.getOrElse("consolidate", 0L) >= 2L, s"stats=$stats")
    } finally {
      prev match {
        case Some(v) => sys.props("graft.bi.sink.segcap") = v
        case None    => sys.props.remove("graft.bi.sink.segcap")
      }
    }
  }

  test("collected-path TreeMap ledger plateaus under the watermark; output unchanged") {
    val (outNo, entNo, _) = drive(watermark = false, sinkSide = false)
    val (outWm, entWm, _) = drive(watermark = true, sinkSide = false)
    assert(outWm == outNo)
    assert(outNo.nonEmpty)
    assert(entNo >= N - 2, s"expected ~$N distinct-event entries, got $entNo")
    assert(entWm <= 3L, s"collected ledger did not plateau: $entWm entries")
  }

  test("writes under the watermark reject loudly on both ingest paths") {
    val bm = new BiMaintained(spark, partitions = 4)
    bm.createAttribute(":lc2/x", AttributeConfig(InputSemantics.Raw))
    bm.register(Rule("q", Plan.MatchA(0, ":lc2/x", 1)))
    bm.interest("q")
    bm.advanceEvent(10L)
    intercept[IllegalArgumentException] {
      bm.transact(Seq(bm.BiDatom(Value.eid(1L), ":lc2/x", Value.num(1L), (0L, 9L), 1L)))
    }
    import spark.implicits._
    intercept[IllegalArgumentException] {
      bm.transactFrame(Seq((1L, ":lc2/x", 1L, 0L, 9L, 1L))
        .toDF("e", "a", "v", "sys", "event", "diff"))
    }
    intercept[IllegalArgumentException] { bm.advanceEvent(5L) } // no rewind
    // At/above the watermark both paths accept.
    bm.transact(Seq(bm.BiDatom(Value.eid(1L), ":lc2/x", Value.num(1L), (0L, 10L), 1L)))
    bm.advance(1L)
    assert(bm.drain("q").nonEmpty)
  }
}
