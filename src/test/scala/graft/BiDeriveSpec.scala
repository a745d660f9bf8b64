package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.model.{Plan, Rule, Value}

/** Embedded-level pin of the bitemporal Derive path (round 16 — the last
  * wire asymmetry): `BiMaintained.derive` registers the GraphQL pull rule
  * and records each pulled path as a derived attribute whose defining
  * plan INLINES into later-attached standings (`DerivedViews.inline`,
  * shared with the unitemporal maintained engine). Reference:
  * `Request::Derive` is timestamp-generic in the server loop
  * (`src/server/mod.rs:158-160`); derive materialization
  * `src/derive/graphql.rs:501-534`. The wire e2e twin lives in
  * WsServerSpec ("bitemporal Derive republishes pulled paths"). */
class BiDeriveSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("embedded bi derive: inline join over a derived attribute") {
    val bm = new graft.streaming.BiMaintained(spark, partitions = 4)
    bm.createAttribute("link")
    bm.createAttribute("dname")
    bm.createAttribute("dbal")
    bm.derive("cust", "{ link { dname } }")
    bm.interest("cust", None)
    bm.register(Rule("bifans", Plan.Join(Seq(0),
      Plan.MatchA(0, "cust/dname", 1), Plan.MatchA(0, "dbal", 2))))
    bm.interest("bifans", None)
    // Self-link (the q_derive_maintain shape): the derived view's entity
    // is the pull TARGET, so a self-link keeps cust/dname and dbal on
    // the same entity for the join.
    bm.transact(Seq(
      bm.BiDatom(Value.eid(1), "link", Value.eid(1), (0L, 0L), 1L),
      bm.BiDatom(Value.eid(1), "dname", Value.str("n7"), (0L, 0L), 1L),
      bm.BiDatom(Value.eid(1), "dbal", Value.num(5L), (0L, 0L), 1L)))
    bm.advance(1L)
    val fans = bm.drain("bifans")
    assert(fans.exists { case (row, _, w) => w == 1L && row(1) == "n7" },
      s"expected the joined row: $fans")
    // Retract the link at a higher system time: the join collapses.
    bm.transact(Seq(
      bm.BiDatom(Value.eid(1), "link", Value.eid(1), (1L, 0L), -1L)))
    bm.advance(2L)
    val fans2 = bm.drain("bifans")
    assert(fans2.exists { case (row, _, w) => w == -1L && row(1) == "n7" },
      s"expected the joined row retracted: $fans2")
    // Re-derive is idempotent; a colliding namespace errors.
    bm.derive("cust", "{ link { dname } }")
    val err = intercept[RuntimeException] {
      bm.derive("bifans", "{ link { dname } }")
    }
    assert(err.getMessage.contains("collides"), err.getMessage)
  }

  test("derive after a standing already scans the attribute is loud") {
    // A standing attached BEFORE derive snapshot `cust2/dname` as a
    // plain (kind-unknown) attribute scan — it would serve empty
    // forever. The derive must reject instead of leaving it silent.
    val bm = new graft.streaming.BiMaintained(spark, partitions = 4)
    bm.createAttribute("link")
    bm.createAttribute("dname")
    bm.register(Rule("early", Plan.MatchA(0, "cust2/dname", 1)))
    bm.interest("early", None)
    val err = intercept[RuntimeException] {
      bm.derive("cust2", "{ link { dname } }")
    }
    assert(err.getMessage.contains("derive before attaching"),
      err.getMessage)
  }

  test("unreachable rule with unsupported derived usage doesn't poison " +
      "other bi standings (r16 ADVICE)") {
    // A registered-but-never-attached rule using the derived attribute in
    // a rejected shape (MatchEA) must not break the attach of standings
    // that never reference it — the Standing's inline closure is
    // restricted to rules reachable from its own plan.
    val bm = new graft.streaming.BiMaintained(spark, partitions = 4)
    Seq("ulink", "udname", "udbal").foreach(bm.createAttribute(_))
    bm.derive("uc", "{ ulink { udname } }")
    bm.register(Rule("ubad", Plan.MatchEA(1L, "uc/udname", 0)))
    bm.register(Rule("ugood", Plan.Join(Seq(0),
      Plan.MatchA(0, "uc/udname", 1), Plan.MatchA(0, "udbal", 2))))
    bm.interest("ugood", None) // pre-fix: threw GraftError inlining ubad
    bm.transact(Seq(
      bm.BiDatom(Value.eid(1), "ulink", Value.eid(1), (0L, 0L), 1L),
      bm.BiDatom(Value.eid(1), "udname", Value.str("n1"), (0L, 0L), 1L),
      bm.BiDatom(Value.eid(1), "udbal", Value.num(5L), (0L, 0L), 1L)))
    bm.advance(1L)
    assert(bm.drain("ugood").exists { case (row, _, w) =>
      w == 1L && row(1) == "n1" })
    // Attaching the bad rule itself still rejects loudly.
    val err = intercept[RuntimeException] { bm.interest("ubad", None) }
    assert(err.getMessage.contains("MatchA scans"), err.getMessage)
  }

  test("derive parity: bi drains == uni maintained drains on random histories") {
    // The round's cross-domain property: the SAME signed history driven
    // through the unitemporal maintained engine (Derive + standing) and
    // the bitemporal domain (derive + standing at (sys, 0) times) must
    // accumulate identical multisets — the inline machinery is shared
    // (DerivedViews), so any divergence is a domain-mode bug. Random
    // links are many-to-one (several entities link one target), so the
    // derived view's weight-1 distinctify contract is exercised, not
    // just the self-link shape.
    for (seed <- Seq(11L, 23L, 47L)) {
      val rnd = new scala.util.Random(seed)
      val net = scala.collection.mutable.Map
        .empty[(String, Long, Any), Long].withDefaultValue(0L)
      def batch(): Seq[(String, Long, Any, Long)] = Seq.fill(30) {
        val (a, e, v): (String, Long, Any) = rnd.nextInt(3) match {
          case 0 => ("plink", rnd.nextInt(5).toLong,
            Value.eid(rnd.nextInt(5).toLong))
          case 1 => ("pdname", rnd.nextInt(5).toLong, s"n${rnd.nextInt(3)}")
          case _ => ("pdbal", rnd.nextInt(5).toLong, rnd.nextInt(3).toLong)
        }
        val k = (a, e, v)
        val d = if (rnd.nextInt(4) == 0 && net(k) > 0L) -1L else 1L
        net(k) += d
        (a, e, v, d)
      }
      val batches = Seq.fill(3)(batch())

      val eng = new graft.engine.Engine(spark)
      Seq("plink", "pdname", "pdbal").foreach(a => eng.createAttribute(a,
        graft.model.AttributeConfig(graft.model.InputSemantics.Distinct)))
      eng.handle(graft.server.Request.Derive("pc", "{ plink { pdname } }"))
      eng.register(Rule("pfans", Plan.Join(Seq(0),
        Plan.MatchA(0, "pc/pdname", 1), Plan.MatchA(0, "pdbal", 2))))
      eng.interestIncremental("pfans")

      val bm = new graft.streaming.BiMaintained(spark, partitions = 4)
      Seq("plink", "pdname", "pdbal").foreach(a => bm.createAttribute(a,
        graft.model.AttributeConfig(graft.model.InputSemantics.Distinct)))
      bm.derive("pc", "{ plink { pdname } }")
      bm.register(Rule("pfans", Plan.Join(Seq(0),
        Plan.MatchA(0, "pc/pdname", 1), Plan.MatchA(0, "pdbal", 2))))
      bm.interest("pfans", None)

      def wrap(v: Any): Value = v match {
        case s: String => Value.str(s)
        case n: Long   => Value.num(n)
        case vv: Value => vv
      }
      val uniAcc = scala.collection.mutable.Map
        .empty[Seq[Any], Long].withDefaultValue(0L)
      val biAcc = scala.collection.mutable.Map
        .empty[Seq[Any], Long].withDefaultValue(0L)
      batches.zipWithIndex.foreach { case (b, i) =>
        eng.transact(b.map { case (a, e, v, d) =>
          graft.model.Datom(e, a, wrap(v), None, d)
        })
        eng.advance(i + 1L)
        eng.drain("pfans").foreach { case (row, _, w) => uniAcc(row) += w }
        bm.transact(b.map { case (a, e, v, d) =>
          bm.BiDatom(Value.eid(e), a, wrap(v), (i.toLong, 0L), d)
        })
        bm.advance(i + 1L)
        bm.drain("pfans").foreach { case (row, _, w) => biAcc(row) += w }
      }
      val uni = uniAcc.filter(_._2 != 0L).toMap
      val bi = biAcc.filter(_._2 != 0L).toMap
      assert(uni == bi, s"seed $seed: uni=$uni bi=$bi")
    }
  }
}
