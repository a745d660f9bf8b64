package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.model._
import graft.streaming.BiMaintained

/** `uninterest` + lane GC on the bitemporal maintained path (reference
  * teardown when the last client leaves, `src/server/mod.rs:276-281` /
  * ShutdownHandle `src/lib.rs:287-337`; the unitemporal mirror is
  * `Engine.uninterest` + `SinkDeliverySpec`):
  *
  *  1. an ABANDONED coarse lane (granularity so coarse its first window
  *     never completes) pins trace compaction at Long.MinValue; after
  *     `uninterest` the lane is GONE and compaction proceeds past the
  *     surviving fine lane's bound — the round-12 "idle-lane pin";
  *  2. the first-transact ingest-validation default lane is GC'd at
  *     advance (zero lanes remain) and a LATE interest still replays the
  *     full completed history;
  *  3. re-interest after uninterest replays exactly what an up-front
  *     interest would have drained (lane ids are monotonic — a dropped
  *     lane's emitted view can never leak into the replacement). */
class BiTeardownSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def mkBm(slack: Option[Long] = None): BiMaintained =
    new BiMaintained(spark, partitions = 4, slack = slack)

  test("abandoned coarse lane pins compaction; uninterest unpins it") {
    val bm = mkBm(slack = Some(0L))
    bm.createAttribute(":td/x", AttributeConfig(InputSemantics.Raw))
    bm.register(Rule("f", Plan.MatchA(0, ":td/x", 1)))
    bm.register(Rule("c", Plan.MatchA(0, ":td/x", 1)))
    bm.interest("f", None)
    // Granularity so coarse its first window bound (1000) never
    // completes within this test: the lane stays at
    // processedBound = Long.MinValue forever.
    bm.interest("c", Some((1000L, 1000L)))
    // Each batch nets to ZERO per (key, event): compaction behind the
    // bound would erase it entirely.
    def batch(s: Long): Seq[bm.BiDatom] = (0 until 50).flatMap { i =>
      Seq(bm.BiDatom(Value.eid(i.toLong), ":td/x", Value.num(1L), (s, s), 1L),
        bm.BiDatom(Value.eid(i.toLong), ":td/x", Value.num(1L), (s, s), -1L))
    }
    (0L to 2L).foreach { s => bm.transact(batch(s)); bm.advance(s + 1L) }
    val (declared0, _) = bm.storeBytes
    assert(declared0 > 0L)
    // The abandoned coarse lane blocks every compaction: all 300
    // records stay resident.
    assert(bm.datomCountProbe == 300L,
      "compaction must be pinned while the coarse lane is live")

    bm.uninterest("c")
    assert(bm.controlPlaneStats("lanes") == 1L, "coarse lane must be GC'd")
    bm.transact(batch(3L)); bm.advance(4L)
    // With only the fine lane bounding it, slack=0 compaction nets the
    // zero-sum history behind the processed bound.
    assert(bm.datomCountProbe < 350L,
      s"compaction must proceed after uninterest (resident=${bm.datomCountProbe})")
    // The surviving standing still drains correctly (all nets are zero
    // → no visible diffs at any time).
    assert(bm.drain("f").isEmpty)
  }

  test("first-transact default lane is GC'd; late interest replays full history") {
    val bm = mkBm()
    bm.createAttribute(":td/y", AttributeConfig(InputSemantics.LastWriteWins))
    bm.register(Rule("q", Plan.MatchA(0, ":td/y", 1)))
    // Transact + advance BEFORE any interest: only the ingest-validation
    // default lane exists, and advance must GC it (nothing to serve).
    (0L to 1L).foreach { s =>
      bm.transact((0 until 5).map(i => bm.BiDatom(
        Value.eid(i.toLong), ":td/y", Value.num(s * 10L + i), (s, s), 1L)))
      bm.advance(s + 1L)
    }
    assert(bm.controlPlaneStats("lanes") == 0L,
      "memberless default lane must be GC'd at advance")
    // Late interest: replays the completed history (the late-attach
    // path), identical to an up-front twin.
    bm.interest("q")
    val late = bm.drain("q").groupBy(identity).view.mapValues(_.size).toMap

    val ref = mkBm()
    ref.createAttribute(":td/y", AttributeConfig(InputSemantics.LastWriteWins))
    ref.register(Rule("q", Plan.MatchA(0, ":td/y", 1)))
    ref.interest("q")
    (0L to 1L).foreach { s =>
      ref.transact((0 until 5).map(i => ref.BiDatom(
        Value.eid(i.toLong), ":td/y", Value.num(s * 10L + i), (s, s), 1L)))
      ref.advance(s + 1L)
    }
    val want = ref.drain("q").groupBy(identity).view.mapValues(_.size).toMap
    assert(late == want, s"late replay diverged:\n want=$want\n got =$late")
  }

  test("re-interest after uninterest replays like an up-front interest") {
    def history(bm: BiMaintained): Unit = (0L to 2L).foreach { s =>
      bm.transact((0 until 4).map(i => bm.BiDatom(
        Value.eid(i.toLong), ":td/z", Value.num(s + i), (s, 2L - s), 1L)))
      bm.advance(s + 1L)
    }
    val bm = mkBm()
    bm.createAttribute(":td/z", AttributeConfig(InputSemantics.Distinct))
    bm.register(Rule("q", Plan.MatchA(0, ":td/z", 1)))
    bm.interest("q")
    history(bm)
    assert(bm.drain("q").nonEmpty)
    bm.uninterest("q")
    assert(bm.controlPlaneStats("lanes") == 0L)
    // Ingest more AFTER the teardown, then re-attach: the fresh lane
    // (new id — never reused) replays everything completed so far.
    bm.transact((0 until 4).map(i => bm.BiDatom(
      Value.eid(i.toLong), ":td/z", Value.num(100L + i), (3L, 3L), 1L)))
    bm.advance(4L)
    bm.interest("q")
    val replay = bm.drain("q").groupBy(identity).view.mapValues(_.size).toMap

    val ref = mkBm()
    ref.createAttribute(":td/z", AttributeConfig(InputSemantics.Distinct))
    ref.register(Rule("q", Plan.MatchA(0, ":td/z", 1)))
    ref.interest("q")
    history(ref)
    ref.transact((0 until 4).map(i => ref.BiDatom(
      Value.eid(i.toLong), ":td/z", Value.num(100L + i), (3L, 3L), 1L)))
    ref.advance(4L)
    val want = ref.drain("q").groupBy(identity).view.mapValues(_.size).toMap
    assert(replay == want, s"re-interest replay diverged:\n want=$want\n got =$replay")
  }
}
