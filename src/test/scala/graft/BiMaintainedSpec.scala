package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.BiEngine
import graft.model._
import graft.streaming.BiMaintained

/** Bitemporal × maintained composition parity: for any signed bitemporal
  * history, any advance schedule, any input semantics, and plans across
  * the maintained fragment, [[BiMaintained]] (standing query fed
  * visible-view transitions) must drain EXACTLY the diffs of
  * [[BiEngine]] (per-time snapshot recompute under the product-order
  * accumulation) — the reference's `Pair(sys, event)` semantics
  * (`src/timestamp/pair.rs`, `tests/input_semantics.rs:337-508`). */
class BiMaintainedSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private case class BD(e: Long, a: String, v: Long, sys: Long, event: Long, diff: Long)

  private val genDatom: Gen[BD] = for {
    e <- Gen.choose(1L, 2L)
    a <- Gen.oneOf(":bm/x", ":bm/y")
    v <- Gen.choose(0L, 3L)
    sys <- Gen.choose(0L, 2L)
    event <- Gen.choose(0L, 3L)
    diff <- Gen.frequency(4 -> 1L, 1 -> -1L)
  } yield BD(e, a, v, sys, event, diff)

  private val genHistory: Gen[Seq[BD]] =
    Gen.chooseNum(6, 14).flatMap(n => Gen.listOfN(n, genDatom))

  private type Out = Map[(Seq[Any], (Long, Long), Long), Int]

  private def drive(
      history: Seq[BD], semantics: InputSemantics,
      plan: Plan): (Out, Out) = {
    val bySys = history.groupBy(_.sys).toSeq.sortBy(_._1)

    val ref = new BiEngine(spark)
    val got = new BiMaintained(spark)
    Seq(":bm/x", ":bm/y").foreach { a =>
      ref.createAttribute(a, AttributeConfig(semantics))
      got.createAttribute(a, AttributeConfig(semantics))
    }
    ref.register(Rule("q", plan)); got.register(Rule("q", plan))
    ref.interest("q"); got.interest("q")

    val refOut = scala.collection.mutable.ArrayBuffer.empty[(Seq[Any], (Long, Long), Long)]
    val gotOut = scala.collection.mutable.ArrayBuffer.empty[(Seq[Any], (Long, Long), Long)]
    bySys.foreach { case (sys, ds) =>
      ref.transact(ds.map(d => ref.BiDatom(
        Value.eid(d.e), d.a, Value.num(d.v), (sys, d.event), d.diff)))
      got.transact(ds.map(d => got.BiDatom(
        Value.eid(d.e), d.a, Value.num(d.v), (sys, d.event), d.diff)))
      ref.advance(sys + 1L)
      got.advance(sys + 1L)
      refOut ++= ref.drain("q")
      gotOut ++= got.drain("q")
    }
    def ms(xs: Seq[(Seq[Any], (Long, Long), Long)]): Out =
      xs.groupBy(identity).map { case (k, vs) => k -> vs.length }
    (ms(refOut.toSeq), ms(gotOut.toSeq))
  }

  private val plans: Seq[(String, Plan)] = Seq(
    "scan" -> Plan.MatchA(0, ":bm/x", 1),
    "join" -> Plan.Join(Seq(0),
      Plan.MatchA(0, ":bm/x", 1), Plan.MatchA(0, ":bm/y", 2)),
    "union_set" -> Plan.Union(Seq(0), Seq(
      Plan.MatchA(0, ":bm/x", 1), Plan.MatchA(0, ":bm/y", 1))))

  test("maintained bitemporal drain == BiEngine drain (all semantics, plan zoo)") {
    val params = Gen.Parameters.default
    val semanticsZoo = Seq(
      InputSemantics.Raw, InputSemantics.Distinct, InputSemantics.LastWriteWins)
    for {
      (slabel, sem) <- semanticsZoo.zipWithIndex.map { case (s, i) => (s"sem$i", s) }
      ((plabel, plan), pi) <- plans.zipWithIndex
    } {
      val nonVacuous = (0 until 2).map { s =>
        val history = genHistory(params,
          Seed(101L + pi * 7919L + slabel.hashCode * 31L + s * 104729L))
          .getOrElse(Seq.empty)
        val (want, got) = drive(history, sem, plan)
        assert(got == want,
          s"$slabel/$plabel:\n want=$want\n got =$got\n history=$history")
        want.nonEmpty
      }
      assert(nonVacuous.contains(true), s"$slabel/$plabel produced no diffs")
    }
  }
}
