package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.Engine
import graft.model._
import graft.model.Plan._

/** IVM invariant the reference suites never state explicitly but always
  * rely on: for ANY plan and ANY transaction history, the accumulated
  * output diffs must equal the from-scratch recompute of the final state —
  * Σ_t diff(tuple, t) == weight(tuple) in the final consolidated result.
  * Property-based: random datom histories (including retractions and
  * duplicate asserts) against a fixed pool of plans covering joins,
  * negation, union, aggregation, and recursion.
  */
class IvmPropertySpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private val genDatom: Gen[Datom] = for {
    e <- Gen.choose(1L, 4L)
    a <- Gen.oneOf(":p/x", ":p/y")
    v <- Gen.choose(1L, 3L)
    diff <- Gen.frequency(3 -> 1L, 1 -> -1L)
  } yield Datom(e, a, Value.num(v), None, diff)

  private val genHistory: Gen[Seq[Seq[Datom]]] =
    Gen.chooseNum(1, 3).flatMap(n =>
      Gen.listOfN(n, Gen.nonEmptyListOf(genDatom).map(_.take(6))))

  private val plans: Seq[(String, Seq[Rule])] = Seq(
    "scan" -> Seq(Rule("query", matchA(0, ":p/x", 1))),
    "join" -> Seq(Rule("query",
      Join(Seq(0), matchA(0, ":p/x", 1), matchA(0, ":p/y", 2)))),
    "antijoin" -> Seq(Rule("query",
      Antijoin(Seq(0), matchA(0, ":p/x", 1), Project(Seq(0), matchA(0, ":p/y", 2))))),
    "union" -> Seq(Rule("query",
      Union(Seq(0, 1), Seq(matchA(0, ":p/x", 1), matchA(0, ":p/y", 1))))),
    "aggregate" -> Seq(Rule("query",
      Aggregate(Seq(0, 1), matchA(0, ":p/x", 1),
        Seq(AggregationFn.COUNT), Seq(0), Seq(1), Seq.empty))),
    // Mixed weight-sensitive + order-statistic functions: net-zero weight
    // sums null out COUNT while MIN stays defined (round-2 advice).
    "aggregate_mixed" -> Seq(Rule("query",
      Aggregate(Seq(0, 1, 1), matchA(0, ":p/x", 1),
        Seq(AggregationFn.COUNT, AggregationFn.MIN), Seq(0), Seq(1, 1), Seq.empty))),
    "hector" -> Seq(Rule("query",
      q(Seq(0, 1, 2), Seq(
        Binding.attribute(0, ":p/x", 1),
        Binding.attribute(0, ":p/y", 2),
        Binding.binaryPredicate(Predicate.LTE, 1, 2))))),
    "transform" -> Seq(Rule("query",
      Transform(Seq(1), 3, matchA(0, ":p/x", 1), Fn.ADD,
        Seq(Some(Value.num(2)))))),
    "closure" -> Seq(
      Rule("edges", matchA(0, ":p/x", 1)),
      Rule("query", Union(Seq(0, 1), Seq(
        NameExpr(Seq(0, 1), "edges"),
        Project(Seq(0, 1), Join(Seq(2),
          NameExpr(Seq(0, 2), "edges"), NameExpr(Seq(2, 1), "query"))))))))

  private def check(rules: Seq[Rule], history: Seq[Seq[Datom]]): Unit = {
    val engine = new Engine(spark)
    Seq(":p/x", ":p/y").foreach(a =>
      engine.createAttribute(a, AttributeConfig(InputSemantics.Raw)))
    rules.foreach(engine.register)
    engine.interest("query")

    val accumulated = scala.collection.mutable.Map.empty[Seq[Any], Long]
    history.zipWithIndex.foreach { case (tx, i) =>
      engine.transact(tx)
      engine.advance(i + 1L)
      engine.drain("query").foreach { case (tuple, _, d) =>
        accumulated(tuple) = accumulated.getOrElse(tuple, 0L) + d
      }
    }
    val net = accumulated.filter(_._2 != 0L).toMap

    val frame = engine.resultFrame("query")
    val n = frame.columns.length - 1
    val recomputed = frame.collect().iterator.map { row =>
      ((0 until n).map(i => Engine.deepNative(row.get(i))): Seq[Any]) -> row.getLong(n)
    }.toMap

    assert(net == recomputed,
      s"\ndiff-sum:  $net\nrecompute: $recomputed\nhistory: $history")
  }

  test("coarsened delivery == plain delivery with times mapped to bounds") {
    // For any history and granularity g, draining with granularity must
    // yield exactly the plain drain with t ↦ (t/g + 1)·g once the
    // frontier has passed every bound — coarsening changes WHEN and AT
    // WHICH TIME diffs deliver, never their content.
    val params = Gen.Parameters.default
    for (i <- 0 until 4; g <- Seq(2L, 10L)) {
      val history = genHistory(params, Seed(77L + i * 524287L)).getOrElse(Seq.empty)
      def run(granularity: Option[Long]): Seq[(Seq[Any], Long, Long)] = {
        val e = new Engine(spark)
        Seq(":p/x", ":p/y").foreach(a =>
          e.createAttribute(a, AttributeConfig(InputSemantics.Raw)))
        e.register(Rule("query", matchA(0, ":p/x", 1)))
        e.interest("query", granularity)
        history.zipWithIndex.foreach { case (tx, j) =>
          e.transact(tx)
          e.advance(j + 1L)
        }
        e.advance(1000L) // past every coarsen bound: everything released
        e.drain("query")
      }
      val plain = run(None).map { case (tup, t, d) => (tup, (t / g + 1L) * g, d) }
      val coarse = run(Some(g))
      assert(coarse.groupBy(identity).view.mapValues(_.size).toMap ==
        plain.groupBy(identity).view.mapValues(_.size).toMap,
        s"g=$g history=$history")
    }
  }

  plans.foreach { case (name, rules) =>
    test(s"Σ diffs == recompute for '$name' under random histories") {
      // Deterministic seeds; each case runs several Spark jobs, so keep the
      // sample count modest — coverage comes from plan × history diversity.
      val params = Gen.Parameters.default
      (0 until 6).foreach { i =>
        val history = genHistory(params, Seed(42L + i * 7919L))
          .getOrElse(Seq.empty)
        check(rules, history)
      }
    }
  }
}
