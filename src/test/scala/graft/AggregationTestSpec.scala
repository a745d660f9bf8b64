package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.model._
import graft.model.Plan._
import graft.model.Value._

/** Port of `/root/reference/tests/aggregation_test.rs` — multiset-semantics
  * aggregation (the reference's default build): COUNT/SUM in the diff
  * monoid, exact rational AVG/VARIANCE, distinct-set MIN/MAX/MEDIAN,
  * multiple aggregations re-inserted at find-clause positions, and `:with`.
  * Attributes use Raw input semantics (duplicates count), as the reference
  * suite does.
  */
class AggregationTestSpec extends AnyFunSuite with EngineCases {

  private val (e, amount) = (1, 2)

  private def data = Seq(
    Datom.add(1, ":amount", num(5)),
    Datom.add(2, ":amount", num(10)),
    Datom.add(2, ":amount", num(10)),
    Datom.add(1, ":amount", num(2)),
    Datom.add(1, ":amount", num(4)),
    Datom.add(1, ":amount", num(6)))

  private def agg1(fn: AggregationFn): Plan =
    Aggregate(Seq(amount),
      Project(Seq(amount), matchA(e, ":amount", amount)),
      Seq(fn), Seq.empty, Seq(amount), Seq.empty)

  private def aggByE(fn: AggregationFn): Plan =
    Aggregate(Seq(e, amount), matchA(e, ":amount", amount),
      Seq(fn), Seq(e), Seq(amount), Seq.empty)

  test("count (aggregation_test.rs:104)") {
    runCases(Seq(
      TC("[:find (count ?amount)]", agg1(AggregationFn.COUNT),
        Seq(data), Seq(Seq((Seq(num(6)), 0, 1)))),
      TC("[:find ?e (count ?amount)]", aggByE(AggregationFn.COUNT),
        Seq(data), Seq(Seq(
          (Seq(eid(1), num(4)), 0, 1),
          (Seq(eid(2), num(2)), 0, 1))))),
      semantics = InputSemantics.Raw)
  }

  test("max (aggregation_test.rs:163)") {
    runCases(Seq(
      TC("[:find (max ?amount)]", agg1(AggregationFn.MAX),
        Seq(data), Seq(Seq((Seq(num(10)), 0, 1)))),
      TC("[:find ?e (max ?amount)]", aggByE(AggregationFn.MAX),
        Seq(data), Seq(Seq(
          (Seq(eid(1), num(6)), 0, 1),
          (Seq(eid(2), num(10)), 0, 1))))),
      semantics = InputSemantics.Raw)
  }

  test("min (aggregation_test.rs:213)") {
    runCases(Seq(
      TC("[:find (min ?amount)]", agg1(AggregationFn.MIN),
        Seq(data), Seq(Seq((Seq(num(2)), 0, 1)))),
      TC("[:find ?e (min ?amount)]", aggByE(AggregationFn.MIN),
        Seq(data), Seq(Seq(
          (Seq(eid(1), num(2)), 0, 1),
          (Seq(eid(2), num(10)), 0, 1))))),
      semantics = InputSemantics.Raw)
  }

  test("sum (aggregation_test.rs:263)") {
    runCases(Seq(
      TC("[:find (sum ?amount)]", agg1(AggregationFn.SUM),
        Seq(data), Seq(Seq((Seq(num(37)), 0, 1)))),
      TC("[:find ?e (sum ?amount)]", aggByE(AggregationFn.SUM),
        Seq(data), Seq(Seq(
          (Seq(eid(1), num(17)), 0, 1),
          (Seq(eid(2), num(20)), 0, 1))))),
      semantics = InputSemantics.Raw)
  }

  test("avg (aggregation_test.rs:323)") {
    runCases(Seq(
      TC("[:find (avg ?amount)]", agg1(AggregationFn.AVG),
        Seq(data), Seq(Seq((Seq(rational(37, 6)), 0, 1)))),
      TC("[:find ?e (avg ?amount)]", aggByE(AggregationFn.AVG),
        Seq(data), Seq(Seq(
          (Seq(eid(1), rational(17, 4)), 0, 1),
          (Seq(eid(2), rational(10, 1)), 0, 1))))),
      semantics = InputSemantics.Raw)
  }

  test("variance (aggregation_test.rs:383)") {
    runCases(Seq(
      TC("[:find (variance ?amount)]", agg1(AggregationFn.VARIANCE),
        Seq(data), Seq(Seq((Seq(rational(317, 36)), 0, 1)))),
      TC("[:find ?e (variance ?amount)]", aggByE(AggregationFn.VARIANCE),
        Seq(data), Seq(Seq(
          (Seq(eid(1), rational(35, 16)), 0, 1),
          (Seq(eid(2), rational(0, 1)), 0, 1))))),
      semantics = InputSemantics.Raw)
  }

  test("median (aggregation_test.rs:429)") {
    runCases(Seq(
      TC("[:find (median ?amount)]", agg1(AggregationFn.MEDIAN),
        Seq(data), Seq(Seq((Seq(num(5)), 0, 1)))),
      TC("[:find ?e (median ?amount)]", aggByE(AggregationFn.MEDIAN),
        Seq(data), Seq(Seq(
          (Seq(eid(1), num(5)), 0, 1),
          (Seq(eid(2), num(10)), 0, 1))))),
      semantics = InputSemantics.Raw)
  }

  private def multiData = Seq(
    Datom.add(1, ":amount", num(5)),
    Datom.add(1, ":amount", num(2)),
    Datom.add(1, ":amount", num(6)),
    Datom.add(1, ":amount", num(9)),
    Datom.add(1, ":amount", num(10)),
    Datom.add(1, ":debt", num(13)),
    Datom.add(1, ":debt", num(4)),
    Datom.add(1, ":debt", num(9)),
    Datom.add(1, ":debt", num(15)),
    Datom.add(1, ":debt", num(10)),
    Datom.add(2, ":amount", num(2)),
    Datom.add(2, ":amount", num(4)),
    Datom.add(2, ":debt", num(5)),
    Datom.add(2, ":debt", num(42)))

  test("multiple_aggregations (aggregation_test.rs:477)") {
    import AggregationFn._
    val (e, amount, debt) = (1, 2, 3)
    runCases(Seq(
      TC("[:find (max ?amount) (min ?debt) (sum ?amount) (avg ?debt)]",
        Aggregate(Seq(amount, debt, amount, debt),
          Project(Seq(amount, debt),
            Join(Seq(e), matchA(e, ":amount", amount), matchA(e, ":debt", debt))),
          Seq(MAX, MIN, SUM, AVG),
          Seq.empty, Seq(amount, debt, amount, debt), Seq.empty),
        Seq(multiData),
        Seq(Seq((Seq(num(10), num(4), num(172), rational(349, 29)), 0, 1)))),
      TC("[:find ?e (min ?a) (max ?a) (median ?a) (count ?a) (min ?d) (max ?d) (median ?d) (count ?d)]",
        Aggregate(
          Seq(e, amount, amount, amount, amount, debt, debt, debt, debt),
          Project(Seq(e, amount, debt),
            Join(Seq(e), matchA(e, ":amount", amount), matchA(e, ":debt", debt))),
          Seq(MIN, MAX, MEDIAN, COUNT, MIN, MAX, MEDIAN, COUNT),
          Seq(e),
          Seq(amount, amount, amount, amount, debt, debt, debt, debt),
          Seq.empty),
        Seq(multiData),
        Seq(Seq(
          (Seq(eid(1), num(2), num(10), num(6), num(25), num(4), num(15), num(10), num(25)), 0, 1),
          (Seq(eid(2), num(2), num(4), num(4), num(4), num(5), num(42), num(42), num(4)), 0, 1))))),
      semantics = InputSemantics.Raw)
  }

  test("sum with :with (aggregation_test.rs:602)") {
    val (e, monster, heads) = (1, 2, 3)
    runCases(Seq(
      TC("[:find (sum ?heads) :with ?monster]",
        Aggregate(Seq(heads),
          Project(Seq(heads, monster),
            Join(Seq(e), matchA(e, ":monster", monster), matchA(e, ":heads", heads))),
          Seq(AggregationFn.SUM),
          Seq.empty, Seq(heads), Seq(monster)),
        Seq(Seq(
          Datom.add(1, ":monster", str("Cerberus")),
          Datom.add(1, ":heads", num(3)),
          Datom.add(2, ":monster", str("Medusa")),
          Datom.add(2, ":heads", num(1)),
          Datom.add(3, ":monster", str("Cyclops")),
          Datom.add(3, ":heads", num(1)),
          Datom.add(4, ":monster", str("Chimera")),
          Datom.add(4, ":heads", num(1)))),
        Seq(Seq((Seq(num(6)), 0, 1))))),
      semantics = InputSemantics.Raw)
  }
}
