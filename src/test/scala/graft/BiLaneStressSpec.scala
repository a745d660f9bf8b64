package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.model._
import graft.streaming.BiMaintained

/** Stress composition over the SHARED bitemporal store: three Coarsen
  * lanes at different paces (fine, (2,2), (4,3)) + the trace-compaction
  * dial + a lane attached MID-HISTORY, driven by larger random signed
  * histories (longer sys ranges than BiMaintainedSpec's, so the
  * min-across-lanes sys-index pruning, the coarse lattices, and the
  * compaction bound interleave for many advances). Each lane's combined
  * drain must equal a DEDICATED BiMaintained instance at that coarsen
  * over the same history — the lanes must not observe each other, the
  * pruning must never starve a slab, and compaction must stay invisible.
  * (The late lane attaches at a granularity that exists from the start
  * in the dedicated reference, so its replay must reproduce the
  * reference's full drain byte-for-byte.) */
class BiLaneStressSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private case class BD(e: Long, a: String, v: Long, sys: Long, event: Long, diff: Long)

  private val genDatom: Gen[BD] = for {
    e <- Gen.choose(1L, 4L)
    a <- Gen.oneOf(":bs/x", ":bs/y")
    v <- Gen.choose(0L, 3L)
    sys <- Gen.choose(0L, 9L)
    event <- Gen.choose(0L, 11L)
    diff <- Gen.frequency(4 -> 1L, 1 -> -1L)
  } yield BD(e, a, v, sys, event, diff)

  private val genHistory: Gen[Seq[BD]] =
    Gen.chooseNum(40, 80).flatMap(n => Gen.listOfN(n, genDatom))

  private type Out = Map[(Seq[Any], (Long, Long), Long), Int]
  private def ms(xs: Seq[(Seq[Any], (Long, Long), Long)]): Out =
    xs.groupBy(identity).map { case (k, vs) => k -> vs.length }

  private val grains: Seq[(String, Option[(Long, Long)])] = Seq(
    "g_fine" -> None, "g_w22" -> Some((2L, 2L)), "g_w43" -> Some((4L, 3L)))
  private val lateName = "g_w43"

  test("3 lanes + compaction + mid-history attach == dedicated instances (stress)") {
    val params = Gen.Parameters.default
    val prevSlack = sys.props.get("graft.bi.slack")
    try {
      for {
        (slabel, sem) <- Seq(InputSemantics.Raw, InputSemantics.Distinct,
          InputSemantics.LastWriteWins).zipWithIndex
            .map { case (s, i) => (s"sem$i", s) }
        s <- 0 until 2
      } {
        val history = genHistory(params,
          Seed(130007L + slabel.hashCode * 31L + s * 7919L)).getOrElse(Seq.empty)
        val batches = history.groupBy(_.sys).toSeq.sortBy(_._1)
        // Compaction ON for the combined instance (Raw/Distinct: exact
        // for ANY window — per-(key, event) nets); the dedicated
        // references run WITHOUT it, so any compaction-visible behavior
        // shows up as a drain mismatch. LWW runs the dial OFF here: a
        // compaction BEFORE the late attach computes winner staircases
        // for the then-registered windows only, so the late (4,3) lane
        // would legitimately read the compacted-trace approximation
        // (the documented reference semantics) — not a byte-identity
        // case. LWW × compaction × all-lanes-up-front is pinned by
        // BiMaintainedSpec's coarse-lane compaction test instead.
        def runCombined(): Map[String, Out] = {
          if (sem != InputSemantics.LastWriteWins)
            sys.props("graft.bi.slack") = "1"
          try {
            val bm = new BiMaintained(spark, partitions = 4)
            Seq(":bs/x", ":bs/y").foreach(a =>
              bm.createAttribute(a, AttributeConfig(sem)))
            grains.foreach { case (n, _) =>
              bm.register(Rule(n, Plan.MatchA(0, ":bs/x", 1))) }
            grains.foreach { case (n, g) =>
              if (n != lateName) bm.interest(n, g) }
            val outs = grains.map { case (n, _) =>
              n -> scala.collection.mutable.ArrayBuffer
                .empty[(Seq[Any], (Long, Long), Long)]
            }.toMap
            batches.zipWithIndex.foreach { case ((sys0, ds), i) =>
              bm.transact(ds.map(d => bm.BiDatom(
                Value.eid(d.e), d.a, Value.num(d.v), (sys0, d.event), d.diff)))
              bm.advance(sys0 + 1L)
              if (i == batches.length / 2)
                bm.interest(lateName, grains.toMap.apply(lateName))
              grains.foreach { case (n, _) =>
                if (n != lateName || i >= batches.length / 2)
                  outs(n) ++= bm.drain(n) }
            }
            bm.advance(1000L)
            grains.foreach { case (n, _) => outs(n) ++= bm.drain(n) }
            outs.view.mapValues(b => ms(b.toSeq)).toMap
          } finally sys.props.remove("graft.bi.slack")
        }
        def runDedicated(g: Option[(Long, Long)]): Out = {
          val bm = new BiMaintained(spark, partitions = 4, coarsen = g)
          Seq(":bs/x", ":bs/y").foreach(a =>
            bm.createAttribute(a, AttributeConfig(sem)))
          bm.register(Rule("q", Plan.MatchA(0, ":bs/x", 1)))
          bm.interest("q")
          val out = scala.collection.mutable.ArrayBuffer
            .empty[(Seq[Any], (Long, Long), Long)]
          batches.foreach { case (sys0, ds) =>
            bm.transact(ds.map(d => bm.BiDatom(
              Value.eid(d.e), d.a, Value.num(d.v), (sys0, d.event), d.diff)))
            bm.advance(sys0 + 1L)
            out ++= bm.drain("q")
          }
          bm.advance(1000L)
          out ++= bm.drain("q")
          ms(out.toSeq)
        }
        val combined = runCombined()
        grains.foreach { case (n, g) =>
          val want = runDedicated(g)
          assert(combined(n) == want,
            s"stress lane $n/$g diverged ($slabel s=$s):\n" +
              s" want=$want\n got =${combined(n)}\n history=$history")
          assert(want.nonEmpty, s"vacuous stress case $n ($slabel s=$s)")
        }
      }
    } finally prevSlack match {
      case Some(v) => sys.props("graft.bi.slack") = v
      case None    => sys.props.remove("graft.bi.slack")
    }
  }
}
