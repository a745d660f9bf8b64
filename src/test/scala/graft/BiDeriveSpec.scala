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
}
