package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.model._
import graft.model.Plan._
import graft.model.Value._
import graft.plans.GraphQl

/** GraphQL document → pull paths (`src/plan/graphql.rs`), evaluated against
  * the pull_test hero fixtures. */
class GraphQlSpec extends AnyFunSuite with EngineCases {

  test("parser handles nesting, arguments, and commas") {
    val fields = GraphQl.parse(
      """{ hero(name: "alice", active: true, rank: -3) { age friend { name } } }""")
    assert(fields.length == 1)
    val hero = fields.head
    assert(hero.name == "hero")
    assert(hero.arguments == Seq(
      "name" -> VString("alice"), "active" -> VBool(true), "rank" -> VNumber(-3)))
    assert(hero.selections.map(_.name) == Seq("age", "friend"))
    assert(hero.selections(1).selections.map(_.name) == Seq("name"))
  }

  private def heroData = Seq(
    Datom.add(100, "name", str("Alice")),
    Datom.add(100, "hero", bool(true)),
    Datom.add(200, "name", str("Bob")),
    Datom.add(200, "hero", bool(true)),
    Datom.add(300, "name", str("Mabel")),
    Datom.add(300, "hero", bool(true)),
    Datom.add(400, "name", str("Dipper")),
    Datom.add(400, "hero", bool(true)),
    Datom.add(300, "bested", eid(400)),
    Datom.add(200, "bested", eid(100)),
    Datom.add(300, "age", num(13)),
    Datom.add(400, "age", num(12)))

  private val heroRoot = Hector(Seq(0), Seq(Binding.attribute(0, "hero", 11111)))

  test("{name bested {name}} lowers to root + nested pull levels") {
    val plan = Pull(Seq.empty, GraphQl.paths("{ name bested { name } }", heroRoot))
    runCases(Seq(
      TC("graphql {name bested {name}}",
        plan,
        Seq(heroData),
        Seq(Seq(
          (Seq(eid(100), VAid("name"), str("Alice")), 0, 1),
          (Seq(eid(200), VAid("name"), str("Bob")), 0, 1),
          (Seq(eid(300), VAid("name"), str("Mabel")), 0, 1),
          (Seq(eid(400), VAid("name"), str("Dipper")), 0, 1),
          // nested level (cardinality-one): value rows + synthetic db__id
          (Seq(eid(200), VAid("bested"), VAid("name"), str("Alice")), 0, 1),
          (Seq(eid(300), VAid("bested"), VAid("name"), str("Dipper")), 0, 1),
          (Seq(eid(200), VAid("bested"), VAid("db__id"), eid(100)), 0, 1),
          (Seq(eid(300), VAid("bested"), VAid("db__id"), eid(400)), 0, 1))))),
      semantics = InputSemantics.Raw)
  }

  test("field arguments constrain the level's entity") {
    val plan = Pull(Seq.empty,
      GraphQl.paths("""{ bested(name: "Dipper") { age } }""", heroRoot))
    runCases(Seq(
      TC("graphql argument filter",
        plan,
        Seq(heroData),
        Seq(Seq(
          (Seq(eid(300), VAid("bested"), VAid("age"), num(12)), 0, 1),
          (Seq(eid(300), VAid("bested"), VAid("db__id"), eid(400)), 0, 1))))),
      semantics = InputSemantics.Raw)
  }
}
