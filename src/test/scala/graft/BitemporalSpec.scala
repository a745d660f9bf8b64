package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.engine.BiEngine
import graft.model._
import graft.model.Plan._
import graft.model.Value._

/** Port of the reference's bitemporal cases
  * (`tests/input_semantics.rs:337-508`): LastWriteWins attributes under
  * `Pair(system, event)` time, exact diff multisets per advance. */
class BitemporalSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def mkEngine(attr: String): BiEngine = {
    val e = new BiEngine(spark)
    e.createAttribute(attr, AttributeConfig(InputSemantics.LastWriteWins))
    e.register(Rule("query", matchA(0, attr, 1)))
    e.interest("query")
    e
  }

  test("bitemporal conflict (input_semantics.rs:339)") {
    val e = mkEngine(":amount")
    e.transact(Seq(
      e.BiDatom(eid(100), ":amount", num(0), (0L, 0L), 1L),
      e.BiDatom(eid(100), ":amount", num(2), (0L, 2L), 1L),
      e.BiDatom(eid(100), ":amount", num(1), (1L, 1L), 1L)))
    e.advance(1L)
    val got = e.drain("query").toSet
    assert(got == Set(
      (Seq(100L, 0L), (0L, 0L), 1L),
      (Seq(100L, 0L), (0L, 2L), -1L),
      (Seq(100L, 2L), (0L, 2L), 1L)))
  }

  test("bitemporal correction (input_semantics.rs:380)") {
    val e = mkEngine(":amount")
    e.transact(Seq(
      e.BiDatom(eid(100), ":amount", num(0), (0L, 0L), 1L),
      e.BiDatom(eid(100), ":amount", num(2), (0L, 2L), 1L)))
    e.advance(1L)
    assert(e.drain("query").toSet == Set(
      (Seq(100L, 0L), (0L, 0L), 1L),
      (Seq(100L, 0L), (0L, 2L), -1L),
      (Seq(100L, 2L), (0L, 2L), 1L)))

    // Late write at (1,1): retracts the value visible at (1,1) — the one
    // installed at (0,0); (0,2) is NOT product-dominated by (1,1).
    e.transact(Seq(
      e.BiDatom(eid(100), ":amount", num(1), (1L, 1L), 1L)))
    e.advance(2L)
    assert(e.drain("query").toSet == Set(
      (Seq(100L, 0L), (1L, 1L), -1L),
      (Seq(100L, 1L), (1L, 1L), 1L)))
  }

  test("bitemporal toggle (input_semantics.rs:438)") {
    val e = mkEngine(":flow")
    val u = VUuid("71828aae-4fc8-421b-82ca-68c5f4981d74")
    e.transact(Seq(
      e.BiDatom(u, ":flow", VReal(30.006), (0L, 1554120030000L), 1L),
      e.BiDatom(u, ":flow", VReal(31.006), (0L, 1554120061000L), 1L),
      e.BiDatom(u, ":flow", VReal(30.006), (0L, 1554120150000L), 1L)))
    e.advance(1L)
    val got = e.drain("query").toSet
    val us = u.native
    assert(got == Set(
      (Seq(us, 30.006), (0L, 1554120030000L), 1L),
      (Seq(us, 30.006), (0L, 1554120061000L), -1L),
      (Seq(us, 31.006), (0L, 1554120061000L), 1L),
      (Seq(us, 31.006), (0L, 1554120150000L), -1L),
      (Seq(us, 30.006), (0L, 1554120150000L), 1L)))
  }

  test("out-of-order event times within one system time") {
    val e = mkEngine(":x")
    // Event times arrive out of order; lex processing sorts them.
    e.transact(Seq(
      e.BiDatom(eid(1), ":x", num(20), (0L, 2L), 1L),
      e.BiDatom(eid(1), ":x", num(10), (0L, 1L), 1L)))
    e.advance(1L)
    assert(e.drain("query").toSet == Set(
      (Seq(1L, 10L), (0L, 1L), 1L),
      (Seq(1L, 10L), (0L, 2L), -1L),
      (Seq(1L, 20L), (0L, 2L), 1L)))
  }
}
