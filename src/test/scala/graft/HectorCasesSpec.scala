package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.model._
import graft.model.Plan._
import graft.model.Value._

/** End-to-end WCO conjunction cases from `tests/hector_test.rs:167+`
  * (`run_hector_cases`): triangle query, star join, self-join with a
  * theta predicate. */
class HectorCasesSpec extends AnyFunSuite with EngineCases {

  test("triangle [?a :edge ?b][?b :edge ?c][?a :edge ?c] (hector_test.rs:230)") {
    val (a, b, c) = (1, 2, 3)
    runCases(Seq(TC(
      "triangle",
      Hector(Seq(a, b, c), Seq(
        Binding.attribute(a, "edge", b),
        Binding.attribute(b, "edge", c),
        Binding.attribute(a, "edge", c))),
      Seq(Seq(
        Datom.add(100, "edge", eid(200)),
        Datom.add(200, "edge", eid(300)),
        Datom.add(100, "edge", eid(300)),
        Datom.add(100, "edge", eid(400)),
        Datom.add(400, "edge", eid(500)),
        Datom.add(500, "edge", eid(100)))),
      Seq(Seq(
        (Seq(eid(100), eid(200), eid(300)), 0, 1))))))
  }

  test("star join over four attributes (hector_test.rs:252)") {
    val (e, a, b, c, d) = (1, 2, 3, 4, 5)
    runCases(Seq(TC(
      "star",
      Hector(Seq(e, a, b, c, d), Seq(
        Binding.attribute(e, ":age", a),
        Binding.attribute(e, ":name", b),
        Binding.attribute(e, ":likes", c),
        Binding.attribute(e, ":fears", d))),
      Seq(Seq(
        Datom.add(100, ":name", str("Dipper")),
        Datom.add(100, ":age", num(12)),
        Datom.add(100, ":likes", eid(200)),
        Datom.add(100, ":fears", eid(300)),
        Datom.add(200, ":name", str("Mabel")),
        Datom.add(200, ":age", num(13)),
        Datom.add(300, ":name", str("Soos")))),
      Seq(Seq(
        (Seq(eid(100), num(12), str("Dipper"), eid(200), eid(300)), 0, 1))))))
  }

  test("self-join with theta predicate [?a :num ?b][?a :num ?c](< ?b ?c) (hector_test.rs:285)") {
    runCases(Seq(TC(
      "num pairs",
      Hector(Seq(0, 1, 2), Seq(
        Binding.attribute(0, ":num", 1),
        Binding.attribute(0, ":num", 2),
        Binding.binaryPredicate(Predicate.LT, 1, 2))),
      Seq(Seq(
        Datom.add(100, ":num", num(1)),
        Datom.add(100, ":num", num(2)),
        Datom.add(100, ":num", num(3)))),
      Seq(Seq(
        (Seq(eid(100), num(1), num(2)), 0, 1),
        (Seq(eid(100), num(1), num(3)), 0, 1),
        (Seq(eid(100), num(2), num(3)), 0, 1))))))
  }
}
