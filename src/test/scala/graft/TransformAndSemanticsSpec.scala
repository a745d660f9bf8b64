package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.model._
import graft.model.Plan._
import graft.model.Value._

/** Ports of `/root/reference/tests/transform_test.rs` (TRUNCATE/ADD/
  * SUBTRACT) and the LastWriteWins cases of
  * `/root/reference/tests/input_semantics.rs`. */
class TransformAndSemanticsSpec extends AnyFunSuite with EngineCases {

  test("TRUNCATE default :hour (transform_test.rs:35)") {
    val (e, t, h) = (1, 2, 3)
    runCases(Seq(
      TC("[:find ?h :where [?e :timestamp ?t] [(interval ?t) ?h]]",
        Transform(Seq(t), h, matchA(e, ":timestamp", t),
          Fn.TRUNCATE, Seq(None, None)),
        Seq(Seq(
          Datom.add(1, ":timestamp", instant(1540048515500L)),
          Datom.add(2, ":timestamp", instant(1540048515616L)))),
        Seq(Seq(
          (Seq(eid(1), instant(1540048515500L), instant(1540047600000L)), 0, 1),
          (Seq(eid(2), instant(1540048515616L), instant(1540047600000L)), 0, 1))))),
      semantics = InputSemantics.Raw)
  }

  test("TRUNCATE :day and :minute intervals") {
    val (e, t, h) = (1, 2, 3)
    runCases(Seq(
      TC("truncate to :day",
        Transform(Seq(t), h, matchA(e, ":timestamp", t),
          Fn.TRUNCATE, Seq(None, Some(str(":day")))),
        Seq(Seq(Datom.add(1, ":timestamp", instant(1540048515500L)))),
        Seq(Seq(
          (Seq(eid(1), instant(1540048515500L), instant(1539993600000L)), 0, 1)))),
      TC("truncate to :minute",
        Transform(Seq(t), h, matchA(e, ":timestamp", t),
          Fn.TRUNCATE, Seq(None, Some(str(":minute")))),
        Seq(Seq(Datom.add(1, ":timestamp", instant(1540048515500L)))),
        Seq(Seq(
          (Seq(eid(1), instant(1540048515500L), instant(1540048500000L)), 0, 1))))),
      semantics = InputSemantics.Raw)
  }

  test("ADD and SUBTRACT (transform.rs:114-192 semantics)") {
    val (e, a, b, r) = (0, 1, 2, 3)
    def joined = Join(Seq(e), matchA(e, ":a", a), matchA(e, ":b", b))
    runCases(Seq(
      TC("[(add ?a ?b 10) ?r]",
        Transform(Seq(a, b), r, joined, Fn.ADD, Seq(Some(num(10)))),
        Seq(Seq(
          Datom.add(1, ":a", num(5)),
          Datom.add(1, ":b", num(7)))),
        Seq(Seq((Seq(eid(1), num(5), num(7), num(22)), 0, 1)))),
      TC("[(subtract ?a ?b) ?r] — variable minuend",
        Transform(Seq(a, b), r, joined, Fn.SUBTRACT, Seq.empty),
        Seq(Seq(
          Datom.add(1, ":a", num(5)),
          Datom.add(1, ":b", num(7)))),
        Seq(Seq((Seq(eid(1), num(5), num(7), num(-2)), 0, 1)))),
      TC("[(subtract 100 ?a ?b) ?r] — constant minuend",
        Transform(Seq(a, b), r, joined, Fn.SUBTRACT, Seq(Some(num(100)))),
        Seq(Seq(
          Datom.add(1, ":a", num(5)),
          Datom.add(1, ":b", num(7)))),
        Seq(Seq((Seq(eid(1), num(5), num(7), num(88)), 0, 1))))),
      semantics = InputSemantics.Raw)
  }

  test("last_write_wins (input_semantics.rs:185)") {
    runCases(Seq(
      TC("happy case",
        matchA(0, ":amount", 1),
        Seq(
          Seq(Datom.add(100, ":amount", num(5)), Datom.add(200, ":amount", num(100))),
          Seq(Datom.add(100, ":amount", num(10)))),
        Seq(
          Seq((Seq(eid(100), num(5)), 0, 1), (Seq(eid(200), num(100)), 0, 1)),
          Seq((Seq(eid(100), num(5)), 1, -1), (Seq(eid(100), num(10)), 1, 1)))),
      TC("happy case reversed",
        matchA(0, ":amount", 1),
        Seq(
          Seq(Datom.add(100, ":amount", num(10)), Datom.add(200, ":amount", num(100))),
          Seq(Datom.add(100, ":amount", num(5)))),
        Seq(
          Seq((Seq(eid(100), num(10)), 0, 1), (Seq(eid(200), num(100)), 0, 1)),
          Seq((Seq(eid(100), num(10)), 1, -1), (Seq(eid(100), num(5)), 1, 1)))),
      TC("retraction clears the current value",
        matchA(0, ":amount", 1),
        Seq(
          Seq(Datom.add(100, ":amount", num(5)), Datom.add(200, ":amount", num(100))),
          Seq(Datom.retract(200, ":amount", num(100)))),
        Seq(
          Seq((Seq(eid(100), num(5)), 0, 1), (Seq(eid(200), num(100)), 0, 1)),
          Seq((Seq(eid(200), num(100)), 1, -1)))),
      TC("toggle",
        matchA(0, ":amount", 1),
        Seq(
          Seq(Datom.add(100, ":amount", num(5))),
          Seq(Datom.add(100, ":amount", num(10))),
          Seq(Datom.add(100, ":amount", num(5)))),
        Seq(
          Seq((Seq(eid(100), num(5)), 0, 1)),
          Seq((Seq(eid(100), num(5)), 1, -1), (Seq(eid(100), num(10)), 1, 1)),
          Seq((Seq(eid(100), num(10)), 2, -1), (Seq(eid(100), num(5)), 2, 1))))),
      semantics = InputSemantics.LastWriteWins)
  }

  test("last_write_wins_unordered — late arrival (input_semantics.rs:272)") {
    runCases(Seq(
      TC("late arrival",
        matchA(0, ":amount", 1),
        Seq(
          Seq(
            Datom.add(100, ":amount", num(0)),
            Datom.addAt(100, ":amount", num(2), 2L)),
          Seq(Datom.add(100, ":amount", num(1)))),
        Seq(
          Seq((Seq(eid(100), num(0)), 0, 1)),
          Seq((Seq(eid(100), num(0)), 1, -1), (Seq(eid(100), num(1)), 1, 1)),
          Seq((Seq(eid(100), num(1)), 2, -1), (Seq(eid(100), num(2)), 2, 1))))),
      semantics = InputSemantics.LastWriteWins)
  }
}
