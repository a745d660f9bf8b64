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

  test("inline pushes the distinctify below the join for key-unique attrs") {
    // Round 17 (r16 VERDICT #1): when the pulled attribute is key-unique
    // by input semantics, the view's full-row Union wrap narrows to a
    // single-entity-column threshold BELOW the defining join; a
    // non-unique attribute keeps the full wrap (the pushdown would be
    // unsound — raw (e, v) weights can exceed 1).
    val dp: Plan = Project(Seq(1, 999999), Join(Seq(1),
      Hector(Seq(0, 1), Seq(Binding.Attr(0, "link", 1))),
      MatchA(1, "dname", 999999)))
    val derived = Map("ns/dname" -> ((dp: Plan, Seq(1, 999999))))
    val scan: Plan = MatchA(10, "ns/dname", 11)
    graft.plans.DerivedViews.inline(scan, Nil, derived,
        uniqueAttr = Set("dname")) match {
      case Join(Seq(10), Union(Seq(10), Seq(Project(Seq(10), _))),
          MatchA(10, "dname", 11)) => ()
      case other => fail(s"expected pushed-down shape, got $other")
    }
    graft.plans.DerivedViews.inline(scan, Nil, derived) match {
      case Union(Seq(10, 11), Seq(Project(Seq(10, 11), _))) => ()
      case other => fail(s"expected full-row distinctify wrap, got $other")
    }
    // PullAll-shaped view over a key-unique attribute: no wrap at all.
    val dpAll: Plan = MatchA(0, "name", 1)
    val derivedAll = Map("p/name" -> ((dpAll, Seq(0, 1))))
    graft.plans.DerivedViews.inline(MatchA(20, "p/name", 21), Nil,
        derivedAll, uniqueAttr = Set("name")) match {
      case MatchA(20, "name", 21) => ()
      case other => fail(s"expected bare scan, got $other")
    }
    graft.plans.DerivedViews.inline(MatchA(20, "p/name", 21), Nil,
        derivedAll) match {
      case Union(Seq(20, 21), Seq(MatchA(20, "name", 21))) => ()
      case other => fail(s"expected wrapped scan, got $other")
    }
  }

  test("pushed-down view: retracting one of two links keeps the row") {
    // The weight-1 contract the pushdown must preserve: two entities link
    // one target — retracting ONE link must emit NOTHING (support 2 -> 1),
    // retracting the second collapses the row.
    val e = new Engine(spark)
    Seq("klink", "kname", "kbal").foreach(a =>
      e.createAttribute(a, AttributeConfig(InputSemantics.Distinct)))
    e.handle(Request.Derive("kc", "{ klink { kname } }"))
    e.register(Rule("kfans", Join(Seq(0),
      MatchA(0, "kc/kname", 1), MatchA(0, "kbal", 2))))
    e.interestIncremental("kfans")
    e.transact(Seq(
      Datom.add(1L, "klink", Value.eid(7)),
      Datom.add(2L, "klink", Value.eid(7)),
      Datom.add(7L, "kname", Value.str("x")),
      Datom.add(7L, "kbal", Value.num(3L))))
    e.advance(1)
    assert(e.drain("kfans").map { case (t, _, d) => (t, d) } ==
      Seq((Seq(7L, "x", 3L), 1L)))
    e.transact(Seq(Datom(1L, "klink", Value.eid(7), None, -1L)))
    e.advance(2)
    assert(e.drain("kfans").isEmpty, "one surviving link must keep the row")
    e.transact(Seq(Datom(2L, "klink", Value.eid(7), None, -1L)))
    e.advance(3)
    assert(e.drain("kfans").map { case (t, _, d) => (t, d) } ==
      Seq((Seq(7L, "x", 3L), -1L)))
  }

  test("Raw pulled attribute keeps the full-row distinctify") {
    // Uniqueness does NOT hold (Raw semantics: duplicate (e, v) asserts
    // accumulate weight): the threshold must stay — the view serves
    // weight 1 while ANY support remains and collapses only at zero.
    val e = new Engine(spark)
    e.createAttribute("wl", AttributeConfig(InputSemantics.Distinct))
    e.createAttribute("wn", AttributeConfig(InputSemantics.Raw))
    e.createAttribute("wb", AttributeConfig(InputSemantics.Distinct))
    e.handle(Request.Derive("wc", "{ wl { wn } }"))
    e.register(Rule("wfans", Join(Seq(0),
      MatchA(0, "wc/wn", 1), MatchA(0, "wb", 2))))
    e.interestIncremental("wfans")
    e.transact(Seq(
      Datom.add(1L, "wl", Value.eid(7)),
      Datom.add(7L, "wn", Value.str("x")),
      Datom.add(7L, "wn", Value.str("x")), // raw duplicate
      Datom.add(7L, "wb", Value.num(3L))))
    e.advance(1)
    assert(e.drain("wfans").map { case (t, _, d) => (t, d) } ==
      Seq((Seq(7L, "x", 3L), 1L)))
    e.transact(Seq(Datom(7L, "wn", Value.str("x"), None, -1L)))
    e.advance(2)
    assert(e.drain("wfans").isEmpty,
      "one raw duplicate surviving must keep the row")
    e.transact(Seq(Datom(7L, "wn", Value.str("x"), None, -1L)))
    e.advance(3)
    assert(e.drain("wfans").map { case (t, _, d) => (t, d) } ==
      Seq((Seq(7L, "x", 3L), -1L)))
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
