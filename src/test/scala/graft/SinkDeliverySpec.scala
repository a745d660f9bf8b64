package graft

import java.nio.file.Files

import scala.collection.mutable

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, sum}
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.Engine
import graft.model._
import graft.sinks.{ForeachFrameSink, ParquetDirSink}

/** Sink-based delivery for data-sized results (`Engine.interestSink`): the
  * diff computation must stay distributed — the engine never `collect()`s
  * on this path — while emitting exactly the diffs the driver-side drain
  * path would (`Output::direct` vs sink routing, `src/server/mod.rs:94-108`). */
class SinkDeliverySpec extends AnyFunSuite {

  private val spark = TestSpark.spark

  private def diffsOf(df: DataFrame): Set[(Seq[Any], Long, Long)] = {
    val n = df.columns.length - 2
    df.collect().iterator.map { row =>
      ((0 until n).map(row.get), row.getLong(n), row.getLong(n + 1))
    }.toSet
  }

  test("sink path emits the same diffs as the drain path, including retractions") {
    def fresh(): Engine = {
      val e = new Engine(spark)
      e.createAttribute("sd/score", AttributeConfig(inputSemantics = InputSemantics.Raw))
      e.register(Rule("scores", Plan.MatchEA(100, "sd/score", 0)))
      e
    }
    val txs = Seq(
      Seq(Datom.addAt(100, "sd/score", Value.VNumber(5), 0L),
        Datom.addAt(100, "sd/score", Value.VNumber(6), 0L)),
      Seq(Datom.retractAt(100, "sd/score", Value.VNumber(5), 1L),
        Datom.addAt(100, "sd/score", Value.VNumber(7), 1L)))

    val drainEng = fresh()
    drainEng.interest("scores")
    val sinkEng = fresh()
    val got = mutable.ArrayBuffer.empty[(Seq[Any], Long, Long)]
    sinkEng.interestSink("scores", new ForeachFrameSink((_, _, df) => got ++= diffsOf(df)))

    var expected = Set.empty[(Seq[Any], Long, Long)]
    txs.zipWithIndex.foreach { case (tx, i) =>
      drainEng.transact(tx); sinkEng.transact(tx)
      drainEng.advance(i + 1L); sinkEng.advance(i + 1L)
      expected ++= drainEng.drain("scores").map { case (tup, t, d) => (tup, t, d) }
    }
    assert(expected.exists(_._3 == -1L)) // the case genuinely covers retraction
    assert(got.toSet === expected)
    // drain stays empty for sink-delivered rules: nothing buffered driver-side
    assert(sinkEng.drain("scores").isEmpty)
  }

  test("data-sized result: distributed diff, parquet sink, no driver materialization") {
    val n = 400000L
    val eng = new Engine(spark)
    // A result far beyond what drain-style delivery should ever hold:
    // n rows backed by a distributed range scan.
    eng.domain.registerStatic("sd/big",
      spark.range(n).select(col("id").as("e"), (col("id") * 7L % 9973L).as("v")),
      ValueKind.KNumber)
    eng.register(Rule("big", Plan.MatchA(0, "sd/big", 1)))

    val delivered = mutable.ArrayBuffer.empty[DataFrame]
    eng.interestSink("big", new ForeachFrameSink((_, _, df) => delivered += df))
    eng.domain.notePending(0L)
    eng.advance(1L)

    assert(delivered.size === 1)
    val df = delivered.head
    // PlanShapeSpec-style physical-plan walk: the delivered frame scans the
    // distributed range source — it is a real distributed plan, not a
    // re-parallelized driver collection, and contains no collect-shaped node.
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("Range"), s"expected distributed Range scan in:\n$plan")
    assert(!plan.contains("LocalTableScan"),
      s"delivered frame must not be driver-materialized:\n$plan")
    assert(!plan.contains("CollectLimit"), plan)
    // Verify content by distributed aggregation only (count + checksum).
    val agg = df.agg(sum(col("c0")).as("se"), sum(col("c1")).as("sv"),
      sum(col("_diff")).as("sd")).collect()(0)
    assert(df.count() === n)
    assert(agg.getLong(0) === n * (n - 1) / 2)
    assert(agg.getLong(2) === n) // all diffs +1
    assert(eng.drain("big").isEmpty)

    // Parquet delivery: the same frame lands as a per-epoch partition.
    val dir = Files.createTempDirectory("graft-sink").toString
    val pq = new ParquetDirSink(dir)
    pq.deliver("big", 1L, df)
    val back = spark.read.parquet(s"$dir/big")
    assert(back.count() === n)
    assert(back.agg(sum(col("c1"))).collect()(0).getLong(0) === agg.getLong(1))

    // CSV delivery (the data-sized Sink::CsvFile analog): same frame,
    // same checksum, headered distributed write.
    val cdir = Files.createTempDirectory("graft-csv-sink").toString
    new graft.sinks.CsvDirSink(cdir).deliver("big", 1L, df)
    val cback = spark.read.option("header", "true")
      .option("inferSchema", "true").csv(s"$cdir/big")
    assert(cback.count() === n)
    assert(cback.agg(sum(col("c1"))).collect()(0).getLong(0) === agg.getLong(1))
  }

  test("sink path honors delivery granularity: coarsened, held, then released") {
    val eng = new Engine(spark)
    eng.createAttribute("sd/g", AttributeConfig(inputSemantics = InputSemantics.Raw))
    eng.register(Rule("g", Plan.MatchEA(7, "sd/g", 0)))
    val got = mutable.ArrayBuffer.empty[(Long, Set[(Seq[Any], Long, Long)])]
    eng.interestSink("g",
      new ForeachFrameSink((_, t, df) => got += ((t, diffsOf(df)))),
      granularity = Some(10L))

    eng.transact(Seq(Datom.addAt(7, "sd/g", Value.VNumber(1), 3L)))
    eng.advance(5L)
    // t=3 coarsens STRICTLY up to 10; the frontier (5) hasn't passed it yet.
    assert(got.isEmpty)
    eng.advance(11L)
    assert(got.toSeq === Seq((10L, Set((Seq[Any](1L), 10L, 1L)))))
  }

  test("sink and drain paths agree for any plan and transaction history") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    import graft.model.Plan._
    val genDatom: Gen[Datom] = for {
      e <- Gen.choose(1L, 4L)
      a <- Gen.oneOf(":sp/x", ":sp/y")
      v <- Gen.choose(1L, 3L)
      diff <- Gen.frequency(3 -> 1L, 1 -> -1L)
    } yield Datom(e, a, Value.num(v), None, diff)
    val genHistory: Gen[Seq[Seq[Datom]]] =
      Gen.chooseNum(1, 3).flatMap(n =>
        Gen.listOfN(n, Gen.nonEmptyListOf(genDatom).map(_.take(6))))
    val plans: Seq[Seq[Rule]] = Seq(
      Seq(Rule("query",
        Join(Seq(0), matchA(0, ":sp/x", 1), matchA(0, ":sp/y", 2)))),
      Seq(Rule("query",
        Antijoin(Seq(0), matchA(0, ":sp/x", 1),
          Project(Seq(0), matchA(0, ":sp/y", 2))))),
      Seq(Rule("query",
        Aggregate(Seq(0, 1), matchA(0, ":sp/x", 1),
          Seq(AggregationFn.COUNT), Seq(0), Seq(1), Seq.empty))))

    def run(rules: Seq[Rule], history: Seq[Seq[Datom]]): Unit = {
      def mk(): Engine = {
        val e = new Engine(spark)
        Seq(":sp/x", ":sp/y").foreach(a =>
          e.createAttribute(a, AttributeConfig(InputSemantics.Raw)))
        rules.foreach(e.register)
        e
      }
      val drainEng = mk(); drainEng.interest("query")
      val sinkEng = mk()
      val got = mutable.ArrayBuffer.empty[(Seq[Any], Long, Long)]
      sinkEng.interestSink("query",
        new ForeachFrameSink((_, _, df) => got ++= diffsOf(df)))
      val want = mutable.ArrayBuffer.empty[(Seq[Any], Long, Long)]
      history.zipWithIndex.foreach { case (tx, i) =>
        drainEng.transact(tx); sinkEng.transact(tx)
        drainEng.advance(i + 1L); sinkEng.advance(i + 1L)
        want ++= drainEng.drain("query")
      }
      assert(got.sorted(TupleDiffOrd) == want.sorted(TupleDiffOrd),
        s"\nsink:  ${got.toList}\ndrain: ${want.toList}\nhistory: $history")
    }

    val params = Gen.Parameters.default
    for (rules <- plans; i <- 0 until 3) {
      val history = genHistory(params, Seed(11L + i * 104729L)).getOrElse(Seq.empty)
      run(rules, history)
    }
  }

  private object TupleDiffOrd extends Ordering[(Seq[Any], Long, Long)] {
    def compare(x: (Seq[Any], Long, Long), y: (Seq[Any], Long, Long)): Int = {
      val c = x._1.map(String.valueOf).mkString("|")
        .compareTo(y._1.map(String.valueOf).mkString("|"))
      if (c != 0) c
      else {
        val ct = java.lang.Long.compare(x._2, y._2)
        if (ct != 0) ct else java.lang.Long.compare(x._3, y._3)
      }
    }
  }

  test("attaching a sink to a live plain interest replays state, not double-delivery") {
    val eng = new Engine(spark)
    eng.createAttribute("sd/live", AttributeConfig(inputSemantics = InputSemantics.Raw))
    eng.register(Rule("live", Plan.MatchEA(1, "sd/live", 0)))
    eng.interest("live")
    eng.transact(Seq(Datom.addAt(1, "sd/live", Value.VNumber(1), 0L)))
    eng.advance(1L)
    assert(eng.drain("live").nonEmpty) // already delivered driver-side

    val got = mutable.ArrayBuffer.empty[Set[(Seq[Any], Long, Long)]]
    eng.interestSink("live", new ForeachFrameSink((_, _, df) => got += diffsOf(df)))
    eng.transact(Seq(Datom.addAt(1, "sd/live", Value.VNumber(2), 1L)))
    eng.advance(2L)
    // The sink is a NEW subscriber: it gets the accumulated state as a
    // separate initial-replay frame, then the time's genuine diff — never
    // one frame re-stating the whole snapshot as if it were change.
    assert(got.toList === List(
      Set((Seq[Any](1L), 1L, 1L)),  // replay of the pre-attach state
      Set((Seq[Any](2L), 1L, 1L)))) // the new datom only
  }

  test("late sink subscriber receives accumulated state as initial diffs") {
    val eng = new Engine(spark)
    eng.createAttribute("sd/late", AttributeConfig(inputSemantics = InputSemantics.Raw))
    eng.register(Rule("late", Plan.MatchEA(1, "sd/late", 0)))
    eng.register(Rule("late2", Plan.MatchEA(1, "sd/late", 0)))
    eng.interest("late")
    eng.transact(Seq(Datom.addAt(1, "sd/late", Value.VNumber(42), 0L)))
    eng.advance(1L)
    eng.drain("late")

    val got = mutable.ArrayBuffer.empty[(Seq[Any], Long, Long)]
    eng.interestSink("late2", new ForeachFrameSink((_, _, df) => got ++= diffsOf(df)))
    eng.advance(2L)
    assert(got.toSet === Set((Seq[Any](42L), 1L, 1L)))
  }
}
