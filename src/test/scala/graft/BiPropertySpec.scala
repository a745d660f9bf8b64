package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.BiEngine
import graft.model._

/** The bitemporal IVM invariant, property-tested: for EVERY processed
  * input time `t`, the sum of emitted diffs at product-dominated times
  * must equal a brute-force recompute of the LWW state visible at `t` —
  * the lattice generalization of the unitemporal Σdiffs == recompute
  * invariant (`IvmPropertySpec`), checked against an INDEPENDENT model
  * (direct visibility scan, not the engine's accumulation algorithm).
  * Random histories include corrections (late event times), retractions,
  * and ties. */
class BiPropertySpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private case class BD(e: Long, v: Long, sys: Long, event: Long, diff: Long)

  private val genDatom: Gen[BD] = for {
    e <- Gen.choose(1L, 2L)
    v <- Gen.choose(0L, 3L)
    sys <- Gen.choose(0L, 2L)
    event <- Gen.choose(0L, 3L)
    diff <- Gen.frequency(4 -> 1L, 1 -> -1L)
  } yield BD(e, v, sys, event, diff)

  private val genHistory: Gen[Seq[BD]] =
    Gen.chooseNum(2, 8).flatMap(n => Gen.listOfN(n, genDatom))

  /** Brute-force LWW state at pair time `t`: per entity, the value of the
    * lexicographically-latest visible ADDITION, where additions at the
    * same (sys, event) are tie-broken by transaction order (seq) and a
    * trailing retraction of the winning event clears it. Mirrors the
    * reference `last_write_wins.rs` ordering, written directly from the
    * visibility rule rather than via the engine's accumulation. */
  private def lwwAt(history: Seq[BD], t: (Long, Long)): Map[Seq[Any], Long] = {
    val visible = history.zipWithIndex.filter { case (d, _) =>
      d.sys <= t._1 && d.event <= t._2
    }
    visible.groupBy(_._1.e).flatMap { case (e, ds) =>
      val last = ds.maxBy { case (d, seq) => (d.sys, d.event, seq) }
      if (last._1.diff > 0L) Some(Seq[Any](e, last._1.v) -> 1L) else None
    }
  }

  private def check(history: Seq[BD]): Unit = {
    val engine = new BiEngine(spark)
    engine.createAttribute(":bp/v", AttributeConfig(InputSemantics.LastWriteWins))
    engine.register(Rule("query", Plan.MatchA(0, ":bp/v", 1)))
    engine.interest("query")
    // Transact in sys-time order (the engine rejects writes at closed
    // system times), advancing after each sys batch.
    val bySys = history.groupBy(_.sys).toSeq.sortBy(_._1)
    val emitted = scala.collection.mutable.ArrayBuffer.empty[(Seq[Any], (Long, Long), Long)]
    bySys.foreach { case (sys, ds) =>
      engine.transact(ds.map(d =>
        engine.BiDatom(Value.eid(d.e), ":bp/v", Value.num(d.v), (sys, d.event), d.diff)))
      engine.advance(sys + 1L)
      emitted ++= engine.drain("query")
    }
    // At every input time: accumulated dominated diffs == brute recompute.
    val times = history.map(d => (d.sys, d.event)).distinct
    for (t <- times) {
      val acc = scala.collection.mutable.Map.empty[Seq[Any], Long]
      emitted.foreach { case (tuple, s, d) =>
        if (s._1 <= t._1 && s._2 <= t._2)
          acc(tuple) = acc.getOrElse(tuple, 0L) + d
      }
      val got = acc.filter(_._2 != 0L).toMap
      val want = lwwAt(history, t)
      assert(got == want,
        s"\nat $t\naccumulated: $got\nrecompute:  $want\nhistory: $history")
    }
  }

  test("Σ dominated diffs == LWW recompute at every input time") {
    val params = Gen.Parameters.default
    (0 until 8).foreach { i =>
      val history = genHistory(params, Seed(23L + i * 7919L)).getOrElse(Seq.empty)
      check(history)
    }
  }
}
