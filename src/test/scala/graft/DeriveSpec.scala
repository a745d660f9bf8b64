package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.engine.Engine
import graft.model._
import graft.model.Plan._
import graft.server.{Request, Wire}

/** `Request::Derive` materialization parity (`src/derive/graphql.rs:501-534`):
  * derived paths are re-published as attributes under the namespace
  * (`aid.with_namespace`), so OTHER rules can `MatchA` on them — plus
  * typed registration-error parity (`Error` categories, `src/lib.rs:163-208`). */
class DeriveSpec extends AnyFunSuite {

  private def spark = TestSpark.spark

  test("Derive publishes namespace/attr attributes other rules can MatchA") {
    val engine = new Engine(spark)
    engine.createAttribute("hero", AttributeConfig(InputSemantics.Distinct))
    engine.createAttribute("name", AttributeConfig(InputSemantics.Distinct))
    engine.createAttribute(":liked-by", AttributeConfig(InputSemantics.Distinct))
    engine.handle(Request.Derive("heroes", "{ hero { name } }"))

    // A SECOND rule joins against the derived attribute "heroes/name" —
    // keyed by the level's pull variable (the child entity), exactly as the
    // reference's path stream (graphql.rs:135-139 joins on t[e_offset]):
    // [?e heroes/name ?n] [?e :liked-by ?f]
    engine.register(Rule("fans_of_heroes",
      Join(Seq(0), MatchA(0, "heroes/name", 1), MatchA(0, ":liked-by", 2))))
    engine.interest("fans_of_heroes")

    engine.transact(Seq(
      Datom.add(1L, "hero", Value.eid(7)),
      Datom.add(7L, "name", Value.str("alice")),
      Datom.add(2L, "hero", Value.eid(8)),
      Datom.add(8L, "name", Value.str("bob")),
      Datom.add(7L, ":liked-by", Value.eid(42))))
    engine.advance(1)

    val got = engine.drain("fans_of_heroes").map { case (t, _, d) => (t, d) }.toSet
    // Hero child 7 pulled name "alice" and has fan 42; "bob" has none.
    assert(got == Set((Seq(7L, "alice", 42L), 1L)))

    // The derived attribute reflects LATER data too (computed view, not a
    // snapshot at derive time).
    engine.transact(Seq(Datom.add(8L, ":liked-by", Value.eid(99))))
    engine.advance(2)
    val got2 = engine.drain("fans_of_heroes").map { case (t, _, d) => (t, d) }.toSet
    assert(got2 == Set((Seq(8L, "bob", 99L), 1L)))
  }

  test("root-level Derive (PullAll lowering) republishes the attribute") {
    val engine = new Engine(spark)
    engine.createAttribute("name", AttributeConfig(InputSemantics.Distinct))
    engine.handle(Request.Derive("people", "{ name }"))
    engine.register(Rule("named", MatchA(0, "people/name", 1)))
    engine.interest("named")
    engine.transact(Seq(Datom.add(5L, "name", Value.str("eve"))))
    engine.advance(1)
    assert(engine.drain("named") == Seq((Seq(5L, "eve"), 0L, 1L)))
  }

  test("registration errors carry reference categories (lib.rs:163-208)") {
    val engine = new Engine(spark)
    engine.createAttribute(":a")

    val dup = intercept[GraftError](engine.createAttribute(":a"))
    assert(dup.category == "df.error.category/conflict")

    val unknownRule = intercept[GraftError](engine.interest("nope"))
    assert(unknownRule.category == "df.error.category/not-found")

    engine.register(Rule("bad", MatchA(0, ":does-not-exist", 1)))
    engine.interest("bad")
    engine.transact(Seq(Datom.add(1L, ":a", Value.num(1))))
    val unknownAttr = intercept[GraftError](engine.advance(1))
    assert(unknownAttr.category == "df.error.category/not-found")

    val engine2 = new Engine(spark)
    engine2.transact(Seq(Datom.add(1L, ":k", Value.num(1))))
    val kindClash = intercept[GraftError](
      engine2.transact(Seq(Datom.add(2L, ":k", Value.str("x")))))
    assert(kindClash.category == "df.error.category/incorrect")
  }

  test("wire Error output carries the typed category") {
    val err = Wire.parseOutput(Wire.renderOutput(
      graft.server.Output.Error(3L, "df.error.category/not-found", "unknown rule q", 7L)))
    assert(err == graft.server.Output.Error(3L, "df.error.category/not-found", "unknown rule q", 7L))
  }
}
