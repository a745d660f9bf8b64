package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.model._
import graft.model.Plan._
import graft.model.Value._

/** Port of `/root/reference/tests/pull_test.rs` plus Pull/PullAll coverage
  * derived from the graphql expectations in the same file (the graphql
  * operator itself is feature-gated off in the reference build). */
class PullTestSpec extends AnyFunSuite with EngineCases {

  test("pull_level (pull_test.rs:107)") {
    runCases(Seq(
      TC("[:find (pull ?e [:name :age]) :where [?e :admin? false]]",
        PullLevel(Seq.empty,
          matchAV(0, "admin?", bool(false)),
          pullVariable = 0,
          pullAttributes = Seq("name", "age"),
          pathAttributes = Seq.empty,
          cardinalityMany = false),
        Seq(Seq(
          Datom.add(100, "admin?", bool(true)),
          Datom.add(200, "admin?", bool(false)),
          Datom.add(300, "admin?", bool(false)),
          Datom.add(100, "name", str("Mabel")),
          Datom.add(200, "name", str("Dipper")),
          Datom.add(300, "name", str("Soos")),
          Datom.add(100, "age", num(12)),
          Datom.add(200, "age", num(13)))),
        Seq(Seq(
          (Seq(eid(200), VAid("age"), num(13)), 0, 1),
          (Seq(eid(200), VAid("name"), str("Dipper")), 0, 1),
          (Seq(eid(300), VAid("name"), str("Soos")), 0, 1))))),
      semantics = InputSemantics.Raw)
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

  private def heroes: Plan =
    Hector(Seq(0), Seq(Binding.attribute(0, "hero", 11111)))

  test("pull: {name age} over heroes (pull_test.rs:175 expectations)") {
    runCases(Seq(
      TC("{name age}",
        PullLevel(Seq.empty, heroes, 0,
          pullAttributes = Seq("name", "age"),
          pathAttributes = Seq.empty,
          cardinalityMany = false),
        Seq(heroData),
        Seq(Seq(
          (Seq(eid(100), VAid("name"), str("Alice")), 0, 1),
          (Seq(eid(200), VAid("name"), str("Bob")), 0, 1),
          (Seq(eid(300), VAid("name"), str("Mabel")), 0, 1),
          (Seq(eid(400), VAid("name"), str("Dipper")), 0, 1),
          (Seq(eid(300), VAid("age"), num(13)), 0, 1),
          (Seq(eid(400), VAid("age"), num(12)), 0, 1))))),
      semantics = InputSemantics.Raw)
  }

  test("pull: nested {name bested {name}} (pull_test.rs:196 expectations)") {
    // Two paths of different arity unioned by Pull: the root level pulls
    // `name`, the nested level follows `bested` and pulls `name` with
    // path_attributes=["bested"] (db__id rows retained at the child level
    // appear in the third graphql case; here cardinality_many=true keeps
    // the child id in the path — matching the expectations that include
    // [e "bested" child "name" v]).
    val rootLevel = PullLevel(Seq.empty, heroes, 0,
      pullAttributes = Seq("name"), pathAttributes = Seq.empty,
      cardinalityMany = false)
    val bested = Hector(Seq(0, 1), Seq(
      Binding.attribute(0, "hero", 11111),
      Binding.attribute(0, "bested", 1)))
    val nestedLevel = PullLevel(Seq.empty, bested, 1,
      pullAttributes = Seq("name"), pathAttributes = Seq("bested"),
      cardinalityMany = true)
    runCases(Seq(
      TC("{name bested {name}}",
        Pull(Seq.empty, Seq(rootLevel, nestedLevel)),
        Seq(heroData),
        Seq(Seq(
          (Seq(eid(100), VAid("name"), str("Alice")), 0, 1),
          (Seq(eid(200), VAid("name"), str("Bob")), 0, 1),
          (Seq(eid(300), VAid("name"), str("Mabel")), 0, 1),
          (Seq(eid(400), VAid("name"), str("Dipper")), 0, 1),
          (Seq(eid(300), VAid("bested"), eid(400), VAid("name"), str("Dipper")), 0, 1),
          (Seq(eid(200), VAid("bested"), eid(100), VAid("name"), str("Alice")), 0, 1))))),
      semantics = InputSemantics.Raw)
  }

  test("pull level with db__id rows (cardinality-one child, pull_test.rs:216)") {
    val bested = Hector(Seq(0, 1), Seq(
      Binding.attribute(0, "hero", 11111),
      Binding.attribute(0, "bested", 1)))
    // bested(name: "Dipper") { age } — child level keyed by path attribute
    // "bested" with cardinality_many=false injects synthetic db__id rows.
    val dipperBested = Hector(Seq(0, 1), Seq(
      Binding.attribute(0, "hero", 11111),
      Binding.attribute(0, "bested", 1)))
    runCases(Seq(
      TC("{bested {age}} with db__id",
        PullLevel(Seq.empty, dipperBested, 1,
          pullAttributes = Seq("age"),
          pathAttributes = Seq("bested"),
          cardinalityMany = false),
        Seq(heroData),
        Seq(Seq(
          (Seq(eid(300), VAid("bested"), VAid("age"), num(12)), 0, 1),
          (Seq(eid(200), VAid("bested"), VAid("db__id"), eid(100)), 0, 1),
          (Seq(eid(300), VAid("bested"), VAid("db__id"), eid(400)), 0, 1))))),
      semantics = InputSemantics.Raw)
  }

  test("pull_all") {
    runCases(Seq(
      TC("[e a v] dump for name/age",
        PullAll(Seq.empty, Seq("name", "age")),
        Seq(Seq(
          Datom.add(100, "name", str("Mabel")),
          Datom.add(100, "age", num(12)),
          Datom.add(200, "name", str("Dipper")))),
        Seq(Seq(
          (Seq(eid(100), VAid("name"), str("Mabel")), 0, 1),
          (Seq(eid(100), VAid("age"), num(12)), 0, 1),
          (Seq(eid(200), VAid("name"), str("Dipper")), 0, 1))))),
      semantics = InputSemantics.Raw)
  }
}
