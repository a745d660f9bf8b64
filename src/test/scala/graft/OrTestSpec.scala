package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.model._
import graft.model.Plan._
import graft.model.Value._

/** Port of `/root/reference/tests/or_test.rs` — Union (or / or-join) over
  * Hector branches, plus recursion through NameExpr (the labelprop pattern,
  * `experiments/src/bin/labelprop.rs:23-48`). */
class OrTestSpec extends AnyFunSuite with EngineCases {

  private def data = Seq(
    Datom.add(1, ":name", str("Ivan")),
    Datom.add(1, ":age", num(10)),
    Datom.add(2, ":name", str("Ivan")),
    Datom.add(2, ":age", num(20)),
    Datom.add(3, ":name", str("Oleg")),
    Datom.add(3, ":age", num(10)),
    Datom.add(4, ":name", str("Oleg")),
    Datom.add(4, ":age", num(20)),
    Datom.add(5, ":name", str("Ivan")),
    Datom.add(5, ":age", num(10)),
    Datom.add(6, ":name", str("Ivan")),
    Datom.add(6, ":age", num(20)))

  private def hectorEq(attr: String, const: Value): Plan =
    Hector(Seq(0), Seq(
      Binding.attribute(0, attr, 1),
      Binding.constant(1, const)))

  test("or (or_test.rs:115)") {
    runCases(Seq(
      TC("[:find ?e :where (or [?e :name Oleg] [?e :age 10])]",
        Union(Seq(0), Seq(
          hectorEq(":name", str("Oleg")),
          hectorEq(":age", num(10)))),
        Seq(data),
        Seq(Seq(
          (Seq(eid(1)), 0, 1),
          (Seq(eid(3)), 0, 1),
          (Seq(eid(4)), 0, 1),
          (Seq(eid(5)), 0, 1)))),
      TC("(or [?e :name Oleg] [?e :age 30]) — one branch empty",
        Union(Seq(0), Seq(
          hectorEq(":name", str("Oleg")),
          hectorEq(":age", num(30)))),
        Seq(data),
        Seq(Seq((Seq(eid(3)), 0, 1), (Seq(eid(4)), 0, 1)))),
      TC("(or [?e :name Petr] [?e :age 30]) — both empty",
        Union(Seq(0), Seq(
          hectorEq(":name", str("Petr")),
          hectorEq(":age", num(30)))),
        Seq(data),
        Seq(Seq.empty)),
      TC("or with two-var join branches (or_test.rs:244)",
        Union(Seq(0), Seq(
          Hector(Seq(0), Seq(
            Binding.attribute(0, ":age", 2),
            Binding.attribute(0, ":name", 1),
            Binding.constant(1, str("Ivan")),
            Binding.attribute(3, ":age", 2),
            Binding.constant(3, eid(1)))),
          Hector(Seq(0), Seq(
            Binding.attribute(0, ":age", 2),
            Binding.attribute(0, ":name", 1),
            Binding.constant(1, str("Oleg")),
            Binding.attribute(3, ":age", 2),
            Binding.constant(3, eid(2)))))),
        Seq(data),
        Seq(Seq(
          (Seq(eid(1)), 0, 1),
          (Seq(eid(5)), 0, 1),
          (Seq(eid(4)), 0, 1))))),
      semantics = InputSemantics.Raw)
  }

  test("or_join (or_test.rs:284)") {
    runCases(Seq(
      TC("[:find ?e :where (or-join [?e] [?e :name ?n] (and [?e :age ?a] [?e :name ?n]))]",
        Union(Seq(0), Seq(
          Hector(Seq(0), Seq(Binding.attribute(0, ":name", 2))),
          Hector(Seq(0), Seq(
            Binding.attribute(0, ":age", 1),
            Binding.attribute(0, ":name", 2))))),
        Seq(data),
        Seq(Seq(
          (Seq(eid(1)), 0, 1),
          (Seq(eid(2)), 0, 1),
          (Seq(eid(3)), 0, 1),
          (Seq(eid(4)), 0, 1),
          (Seq(eid(5)), 0, 1),
          (Seq(eid(6)), 0, 1))))),
      semantics = InputSemantics.Raw)
  }

  test("recursive rule: transitive closure via NameExpr self-reference") {
    // reach(x, y) :- edge(x, y) ∪ (edge(x, z) ⋈ reach(z, y)), the shape of
    // the reference's labelprop experiment (recursion closed under
    // distinct, src/lib.rs:999-1019).
    val reach = Rule("reach",
      Union(Seq(0, 1), Seq(
        matchA(0, ":edge", 1),
        Project(Seq(0, 1),
          Join(Seq(2),
            Project(Seq(2, 0), matchA(0, ":edge", 2)),
            NameExpr(Seq(2, 1), "reach"))))))
    runCases(Seq(
      TC("reach = edge+",
        Seq(Rule("query", NameExpr(Seq(0, 1), "reach")), reach),
        Seq(Seq(
          Datom.add(1, ":edge", eid(2)),
          Datom.add(2, ":edge", eid(3)),
          Datom.add(3, ":edge", eid(4))),
          Seq(Datom.retract(3, ":edge", eid(4)))),
        Seq(
          Seq(
            (Seq(eid(1), eid(2)), 0, 1),
            (Seq(eid(2), eid(3)), 0, 1),
            (Seq(eid(3), eid(4)), 0, 1),
            (Seq(eid(1), eid(3)), 0, 1),
            (Seq(eid(2), eid(4)), 0, 1),
            (Seq(eid(1), eid(4)), 0, 1)),
          Seq(
            (Seq(eid(3), eid(4)), 1, -1),
            (Seq(eid(2), eid(4)), 1, -1),
            (Seq(eid(1), eid(4)), 1, -1))))),
      semantics = InputSemantics.Distinct)
  }
}
