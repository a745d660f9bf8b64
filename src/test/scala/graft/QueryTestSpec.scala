package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.model._
import graft.model.Plan._
import graft.model.Value._

/** Port of `/root/reference/tests/query_test.rs` — Match* patterns,
  * projections, equijoins, and the WCO (Hector) variants. */
class QueryTestSpec extends AnyFunSuite with EngineCases {

  private def nameData = Seq(
    Datom.add(100, ":name", str("Dipper")),
    Datom.add(100, ":name", str("Alias")),
    Datom.add(200, ":name", str("Mabel")))

  test("base_patterns (query_test.rs:116)") {
    runCases(Seq(
      TC("[:find ?e ?n :where [?e :name ?n]]",
        matchA(0, ":name", 1),
        Seq(nameData),
        Seq(Seq(
          (Seq(eid(100), str("Dipper")), 0, 1),
          (Seq(eid(100), str("Alias")), 0, 1),
          (Seq(eid(200), str("Mabel")), 0, 1)))),
      TC("[:find ?n :where [100 :name ?n]]",
        matchEA(100, ":name", 0),
        Seq(nameData),
        Seq(Seq(
          (Seq(str("Alias")), 0, 1),
          (Seq(str("Dipper")), 0, 1)))),
      TC("[:find ?e :where [?e :name Mabel]]",
        matchAV(0, ":name", str("Mabel")),
        Seq(nameData),
        Seq(Seq((Seq(eid(200)), 0, 1))))))
  }

  test("base_projections (query_test.rs:154)") {
    runCases(Seq(
      TC("[:find ?e :where [?e :name ?n]]",
        Project(Seq(0), matchA(0, ":name", 1)),
        Seq(nameData),
        Seq(Seq((Seq(eid(100)), 0, 2), (Seq(eid(200)), 0, 1)))),
      TC("[:find ?n :where [?e :name ?n]]",
        Project(Seq(1), matchA(0, ":name", 1)),
        Seq(nameData),
        Seq(Seq(
          (Seq(str("Dipper")), 0, 1),
          (Seq(str("Alias")), 0, 1),
          (Seq(str("Mabel")), 0, 1)))),
      TC("[:find ?e ?n :where [?e :name ?n]]",
        Project(Seq(0, 1), matchA(0, ":name", 1)),
        Seq(nameData),
        Seq(Seq(
          (Seq(eid(100), str("Dipper")), 0, 1),
          (Seq(eid(100), str("Alias")), 0, 1),
          (Seq(eid(200), str("Mabel")), 0, 1)))),
      TC("[:find ?n ?e :where [?e :name ?n]]",
        Project(Seq(1, 0), matchA(0, ":name", 1)),
        Seq(nameData),
        Seq(Seq(
          (Seq(str("Dipper"), eid(100)), 0, 1),
          (Seq(str("Alias"), eid(100)), 0, 1),
          (Seq(str("Mabel"), eid(200)), 0, 1))))))
  }

  test("wco_base_patterns (query_test.rs:215)") {
    runCases(Seq(
      TC("[:find ?e ?n :where [?e :name ?n]] (hector)",
        q(Seq(0, 1), Seq(Binding.attribute(0, ":name", 1))),
        Seq(nameData),
        Seq(Seq(
          (Seq(eid(100), str("Dipper")), 0, 1),
          (Seq(eid(100), str("Alias")), 0, 1),
          (Seq(eid(200), str("Mabel")), 0, 1)))),
      TC("[:find ?n :where [100 :name ?n]] (hector)",
        q(Seq(0, 1), Seq(
          Binding.attribute(0, ":name", 1),
          Binding.constant(0, eid(100)))),
        Seq(nameData),
        Seq(Seq(
          (Seq(eid(100), str("Alias")), 0, 1),
          (Seq(eid(100), str("Dipper")), 0, 1)))),
      TC("[:find ?e :where [?e :name Mabel]] (hector)",
        q(Seq(0, 1), Seq(
          Binding.attribute(0, ":name", 1),
          Binding.constant(1, str("Mabel")))),
        Seq(nameData),
        Seq(Seq((Seq(eid(200), str("Mabel")), 0, 1))))))
  }

  test("joins (query_test.rs:263)") {
    val (e, a, n) = (1, 2, 3)
    runCases(Seq(
      TC("[:find ?e ?n ?a :where [?e :age ?a] [?e :name ?n]]",
        Project(Seq(e, n, a),
          Join(Seq(e), matchA(e, ":name", n), matchA(e, ":age", a))),
        Seq(Seq(
          Datom.add(1, ":name", str("Dipper")),
          Datom.add(1, ":age", num(12)))),
        Seq(Seq((Seq(eid(1), str("Dipper"), num(12)), 0, 1))))))
  }

  private def wcoData = Seq(
    Datom.add(1, ":name", str("Ivan")),
    Datom.add(1, ":age", num(15)),
    Datom.add(2, ":name", str("Petr")),
    Datom.add(2, ":age", num(37)),
    Datom.add(3, ":name", str("Ivan")),
    Datom.add(3, ":age", num(37)),
    Datom.add(4, ":age", num(15)))

  test("wco_joins (query_test.rs:289)") {
    runCases(Seq(
      TC("[:find ?e :where [?e :name]]",
        q(Seq(0), Seq(Binding.attribute(0, ":name", 1))),
        Seq(wcoData),
        Seq(Seq(
          (Seq(eid(1)), 0, 1),
          (Seq(eid(2)), 0, 1),
          (Seq(eid(3)), 0, 1)))),
      TC("[:find ?e ?v :where [?e :name Ivan] [?e :age ?v]]",
        q(Seq(0, 2), Seq(
          Binding.attribute(0, ":name", 1),
          Binding.constant(1, str("Ivan")),
          Binding.attribute(0, ":age", 2))),
        Seq(wcoData),
        Seq(Seq(
          (Seq(eid(1), num(15)), 0, 1),
          (Seq(eid(3), num(37)), 0, 1)))),
      TC("[:find ?e1 ?e2 :where [?e1 :name ?n] [?e2 :name ?n]]",
        q(Seq(0, 2), Seq(
          Binding.attribute(0, ":name", 1),
          Binding.attribute(2, ":name", 1))),
        Seq(wcoData),
        Seq(Seq(
          (Seq(eid(1), eid(1)), 0, 1),
          (Seq(eid(2), eid(2)), 0, 1),
          (Seq(eid(3), eid(3)), 0, 1),
          (Seq(eid(1), eid(3)), 0, 1),
          (Seq(eid(3), eid(1)), 0, 1)))),
      {
        val (e, c, e2, a, n) = (0, 1, 2, 3, 4)
        TC("[:find ?e ?e2 ?n :where [?e :name Ivan] [?e :age ?a] [?e2 :age ?a] [?e2 :name ?n]]",
          q(Seq(e, e2, n), Seq(
            Binding.attribute(e, ":name", c),
            Binding.constant(c, str("Ivan")),
            Binding.attribute(e, ":age", a),
            Binding.attribute(e2, ":age", a),
            Binding.attribute(e2, ":name", n))),
          Seq(wcoData),
          Seq(Seq(
            (Seq(eid(1), eid(1), str("Ivan")), 0, 1),
            (Seq(eid(3), eid(3), str("Ivan")), 0, 1),
            (Seq(eid(3), eid(2), str("Petr")), 0, 1))))
      }))
  }

  test("wco_join_many (query_test.rs:370)") {
    val (e1, x, e2, n1, n2) = (0, 1, 2, 3, 4)
    runCases(Seq(
      TC("[:find ?n1 ?n2 :where [?e1 :aka ?x] [?e2 :aka ?x] [?e1 :name ?n1] [?e2 :name ?n2]]",
        q(Seq(n1, n2), Seq(
          Binding.attribute(e1, ":aka", x),
          Binding.attribute(e2, ":aka", x),
          Binding.attribute(e1, ":name", n1),
          Binding.attribute(e2, ":name", n2))),
        Seq(Seq(
          Datom.add(1, ":name", str("Ivan")),
          Datom.add(1, ":aka", str("ivolga")),
          Datom.add(1, ":aka", str("pi")),
          Datom.add(2, ":name", str("Petr")),
          Datom.add(2, ":aka", str("porosenok")),
          Datom.add(2, ":aka", str("pi")))),
        Seq(Seq(
          (Seq(str("Ivan"), str("Ivan")), 0, 2),
          (Seq(str("Petr"), str("Petr")), 0, 2),
          (Seq(str("Ivan"), str("Petr")), 0, 1),
          (Seq(str("Petr"), str("Ivan")), 0, 1))))))
  }

  test("retractions produce negative diffs") {
    runCases(Seq(
      TC("retract then re-add",
        matchA(0, ":name", 1),
        Seq(
          Seq(Datom.add(100, ":name", str("Dipper"))),
          Seq(Datom.retract(100, ":name", str("Dipper"))),
          Seq(Datom.add(100, ":name", str("Dipper")))),
        Seq(
          Seq((Seq(eid(100), str("Dipper")), 0, 1)),
          Seq((Seq(eid(100), str("Dipper")), 1, -1)),
          Seq((Seq(eid(100), str("Dipper")), 2, 1))))))
  }
}
