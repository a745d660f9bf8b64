package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.Engine
import graft.model._
import graft.model.Plan._

/** `interestIncremental` — the maintained-dataflow serving path — must
  * drain EXACTLY like the default snapshot-diff path: same tuples, same
  * times, same weights, for any plan in the maintainable fragment and
  * any transaction history (retractions included). The work profile
  * differs (delta-proportional vs recompute); the observable stream must
  * not. */
class EngineIncrementalSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private val genDatom: Gen[Datom] = for {
    e <- Gen.choose(1L, 4L)
    a <- Gen.oneOf(":p/x", ":p/y")
    v <- Gen.choose(1L, 3L)
    diff <- Gen.frequency(3 -> 1L, 1 -> -1L)
  } yield Datom(e, a, Value.num(v), None, diff)

  private val genHistory: Gen[Seq[Seq[Datom]]] =
    Gen.chooseNum(2, 4).flatMap(n =>
      Gen.listOfN(n, Gen.nonEmptyListOf(genDatom).map(_.take(6))))

  /** Clamp a history to the valid retract-only-what-exists contract
    * (per-(e,a,v) net weight stays >= 0): AVG/VARIANCE are loudly
    * UNDEFINED at net count 0 with live support (both compilers throw,
    * as the reference's Rational32 panics), so their parity runs on
    * histories that cannot reach that state — phantom retractions flip
    * to additions. */
  private def validHistory(h: Seq[Seq[Datom]]): Seq[Seq[Datom]] = {
    val net = scala.collection.mutable.Map
      .empty[(Long, String, Value), Long].withDefaultValue(0L)
    h.map(_.map { d =>
      val k = (d.e, d.a, d.v)
      val dd = if (d.diff < 0 && net(k) <= 0) d.copy(diff = 1L) else d
      net(k) += dd.diff
      dd
    })
  }

  // The maintainable fragment: linear zones, union (with negation),
  // hector (with predicates), join-of-matches, aggregation over both.
  private val plans: Seq[(String, Plan)] = Seq(
    "scan" -> matchA(0, ":p/x", 1),
    "linear" -> Transform(Seq(1), 3,
      Filter(Seq(1), Predicate.GT, matchA(0, ":p/x", 1),
        Seq(None, Some(Value.num(1)))),
      Fn.ADD, Seq(Some(Value.num(5)))),
    "union_negated" -> Union(Seq(0), Seq(
      matchA(0, ":p/x", 1), Negate(matchA(0, ":p/y", 1)))),
    "join" -> Join(Seq(0), matchA(0, ":p/x", 1), matchA(0, ":p/y", 2)),
    "antijoin" -> Antijoin(Seq(0),
      matchA(0, ":p/x", 1), Project(Seq(0), matchA(0, ":p/y", 2))),
    "hector_pred" -> q(Seq(0, 1, 2), Seq(
      Binding.attribute(0, ":p/x", 1),
      Binding.attribute(0, ":p/y", 2),
      Binding.binaryPredicate(Predicate.LTE, 1, 2))),
    "hector_not" -> q(Seq(0, 1), Seq(
      Binding.attribute(0, ":p/x", 1),
      Binding.not(0, ":p/y", 2))),
    "agg_count" -> Aggregate(Seq(0, 1), matchA(0, ":p/x", 1),
      Seq(AggregationFn.COUNT), Seq(0), Seq(1), Seq.empty),
    "agg_avg_hector" -> Aggregate(Seq(0, 2),
      Hector(Seq(0, 1, 2), Seq(
        Binding.attribute(0, ":p/x", 1), Binding.attribute(1, ":p/y", 2))),
      Seq(AggregationFn.AVG), Seq(0), Seq(2), Seq.empty),
    "pull_level" -> PullLevel(Seq.empty,
      Project(Seq(1), matchA(0, ":p/x", 1)),
      pullVariable = 1, pullAttributes = Seq(":p/y"),
      pathAttributes = Seq.empty, cardinalityMany = false))

  private type Drained = Map[(Seq[Any], Long, Long), Int]
  private def multiset(s: Seq[(Seq[Any], Long, Long)]): Drained =
    s.groupBy(identity).view.mapValues(_.size).toMap

  private def run(plan: Plan, history: Seq[Seq[Datom]],
      incremental: Boolean,
      semantics: InputSemantics = InputSemantics.Raw,
      set: Boolean = false): Seq[Drained] = {
    val e = new Engine(spark, setSemantics = set)
    Seq(":p/x", ":p/y").foreach(a =>
      e.createAttribute(a, AttributeConfig(semantics)))
    e.register(Rule("query", plan))
    if (incremental) e.interestIncremental("query") else e.interest("query")
    history.zipWithIndex.map { case (tx, i) =>
      e.transact(tx)
      e.advance(i + 1L)
      multiset(e.drain("query"))
    }
  }

  test("incremental drains exactly like the snapshot path, per advance") {
    val params = Gen.Parameters.default
    for (((label, plan), i) <- plans.zipWithIndex) {
      // Parity must hold on every history; at least one of the tried
      // seeds must produce output (no vacuous green).
      val nonVacuous = (0 until 3).map { s =>
        val raw =
          genHistory(params, Seed(31L + i * 8191L + s * 131071L)).getOrElse(Seq.empty)
        val history = if (label.contains("avg")) validHistory(raw) else raw
        val snap = run(plan, history, incremental = false)
        val inc = run(plan, history, incremental = true)
        assert(inc == snap, s"$label: history=$history")
        snap.exists(_.nonEmpty)
      }
      assert(nonVacuous.contains(true), s"$label produced no diffs at all")
    }
  }

  test("registered-but-unread attributes cost ZERO Spark jobs per advance (uni lazy demand)") {
    // r17 VERDICT #6: the bi domain's demand-driven laziness was pinned
    // by the pqsource probe; this is the uni twin. The maintained path
    // prices by DEMAND by construction — `incrementalDeltas` iterates
    // the standing's referencedAttributes only, and an advance whose
    // buffered deltas touch none of them skips the standing outright —
    // so advances that write ONLY a registered-but-unread attribute
    // (with its own registered-but-uninterested rule) must schedule NO
    // Spark job at all, regardless of catalog width.
    import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
    val e = new Engine(spark)
    e.createAttribute(":u/x", AttributeConfig(InputSemantics.Distinct))
    e.createAttribute(":u/y", AttributeConfig(InputSemantics.Distinct))
    e.register(Rule("qx", matchA(0, ":u/x", 1)))
    e.register(Rule("qy", matchA(0, ":u/y", 1))) // never interested
    e.interestIncremental("qx")
    e.transact(Seq(Datom(1, ":u/x", Value.num(1), None, 1),
      Datom(1, ":u/y", Value.num(9), None, 1)))
    e.advance(1L)
    assert(e.drain("qx").nonEmpty)
    val jobs = new java.util.concurrent.atomic.AtomicLong
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        val _ = jobs.incrementAndGet()
      }
    }
    def settled(): Long = {
      // The listener bus is async: wait until the counter stops moving.
      val deadline = System.nanoTime + 10_000_000_000L
      var prev = -1L
      var cur = jobs.get
      while (prev != cur && System.nanoTime < deadline) {
        prev = cur; Thread.sleep(200); cur = jobs.get
      }
      cur
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      jobs.set(0)
      (2L to 4L).foreach { t =>
        e.transact(Seq(Datom(t, ":u/y", Value.num(t), None, 1)))
        e.advance(t)
        assert(e.drain("qx").isEmpty)
      }
      val n = settled()
      assert(n == 0L,
        s"3 unread-attribute advances scheduled $n Spark jobs; the " +
          "maintained path must price by demand, not catalog width")
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("late subscriber replays accumulated state at the current frontier") {
    val history = Seq(
      Seq(Datom(1, ":p/x", Value.num(1), None, 1),
        Datom(2, ":p/x", Value.num(2), None, 1)),
      Seq(Datom(1, ":p/x", Value.num(1), None, -1),
        Datom(3, ":p/x", Value.num(3), None, 1)))
    def late(incremental: Boolean): Drained = {
      val e = new Engine(spark)
      e.createAttribute(":p/x", AttributeConfig(InputSemantics.Raw))
      e.register(Rule("query", matchA(0, ":p/x", 1)))
      history.zipWithIndex.foreach { case (tx, i) =>
        e.transact(tx); e.advance(i + 1L)
      }
      if (incremental) e.interestIncremental("query") else e.interest("query")
      e.advance(3L)
      multiset(e.drain("query"))
    }
    val snap = late(incremental = false)
    assert(late(incremental = true) == snap)
    assert(snap.nonEmpty)
  }

  test("static bulk attributes feed the maintained state once") {
    import spark.implicits._
    def run(incremental: Boolean): Seq[Drained] = {
      val e = new Engine(spark)
      e.domain.registerStatic(":s/dim",
        Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("e", "v"),
        ValueKind.KNumber)
      e.createAttribute(":p/x", AttributeConfig(InputSemantics.Raw))
      e.register(Rule("query", Hector(Seq(0, 1, 2), Seq(
        Binding.attribute(0, ":p/x", 1), Binding.attribute(0, ":s/dim", 2)))))
      if (incremental) e.interestIncremental("query") else e.interest("query")
      Seq(
        Seq(Datom(1, ":p/x", Value.num(7), None, 1)),
        Seq(Datom(2, ":p/x", Value.num(8), None, 1),
          Datom(1, ":p/x", Value.num(7), None, -1)))
        .zipWithIndex.map { case (tx, i) =>
          e.transact(tx); e.advance(i + 1L)
          multiset(e.drain("query"))
        }
    }
    val snap = run(incremental = false)
    assert(run(incremental = true) == snap)
    assert(snap.head.nonEmpty)
  }

  test("non-recursive rule references inline into the standing query") {
    val history = Seq(
      Seq(Datom(1, ":p/x", Value.num(2), None, 1),
        Datom(1, ":p/y", Value.num(3), None, 1)),
      Seq(Datom(2, ":p/x", Value.num(1), None, 1),
        Datom(1, ":p/x", Value.num(2), None, -1)))
    def run2(incremental: Boolean): Seq[Drained] = {
      val e = new Engine(spark)
      Seq(":p/x", ":p/y").foreach(a =>
        e.createAttribute(a, AttributeConfig(InputSemantics.Raw)))
      e.register(Rule("pairs",
        Join(Seq(0), matchA(0, ":p/x", 1), matchA(0, ":p/y", 2))))
      e.register(Rule("query", Aggregate(Seq(0, 1),
        NameExpr(Seq(0, 1, 2), "pairs"),
        Seq(AggregationFn.COUNT), Seq(0), Seq(1), Seq.empty)))
      if (incremental) e.interestIncremental("query") else e.interest("query")
      history.zipWithIndex.map { case (tx, i) =>
        e.transact(tx); e.advance(i + 1L)
        multiset(e.drain("query"))
      }
    }
    val snap = run2(incremental = false)
    assert(run2(incremental = true) == snap)
    assert(snap.exists(_.nonEmpty))
  }

  test("late-revealed kinds: snapshot-served, then converted silently") {
    // Batch 1 carries only :p/x datoms — :p/y's kind is unknown, so the
    // rule is served by the snapshot path. Batch 2 reveals :p/y; the
    // standing query takes over (replaying state, NOT re-delivering).
    val plan = Join(Seq(0), matchA(0, ":p/x", 1), matchA(0, ":p/y", 2))
    val history = Seq(
      Seq(Datom(1, ":p/x", Value.num(1), None, 1),
        Datom(2, ":p/x", Value.num(2), None, 1)),
      Seq(Datom(1, ":p/y", Value.num(9), None, 1)),
      Seq(Datom(1, ":p/x", Value.num(1), None, -1),
        Datom(2, ":p/y", Value.num(8), None, 1)))
    val snap = run(plan, history, incremental = false)
    val inc = run(plan, history, incremental = true)
    assert(inc == snap)
    assert(snap.exists(_.nonEmpty))
  }

  test("incremental sink delivery matches the incremental drain path") {
    import graft.sinks.ForeachFrameSink
    val history = Seq(
      Seq(Datom(1, ":p/x", Value.num(1), None, 1),
        Datom(1, ":p/y", Value.num(2), None, 1)),
      Seq(Datom(2, ":p/x", Value.num(3), None, 1),
        Datom(1, ":p/x", Value.num(1), None, -1)),
      Seq(Datom(2, ":p/y", Value.num(4), None, 1)))
    val plan = Join(Seq(0), matchA(0, ":p/x", 1), matchA(0, ":p/y", 2))
    def fresh(): Engine = {
      val e = new Engine(spark)
      Seq(":p/x", ":p/y").foreach(a =>
        e.createAttribute(a, AttributeConfig(InputSemantics.Raw)))
      e.register(Rule("query", plan))
      e
    }
    val drainEng = fresh()
    drainEng.interestIncremental("query")
    val sinkEng = fresh()
    val got = scala.collection.mutable.ArrayBuffer.empty[(Seq[Any], Long, Long)]
    sinkEng.interestIncrementalSink("query", new ForeachFrameSink((_, _, df) => {
      val n = df.columns.length - 2
      got ++= df.collect().iterator.map { row =>
        ((0 until n).map(row.get), row.getLong(n), row.getLong(n + 1))
      }
    }))
    var expected = Set.empty[(Seq[Any], Long, Long)]
    history.zipWithIndex.foreach { case (tx, i) =>
      drainEng.transact(tx); sinkEng.transact(tx)
      drainEng.advance(i + 1L); sinkEng.advance(i + 1L)
      expected ++= drainEng.drain("query")
    }
    assert(expected.exists(_._3 == -1L)) // retraction genuinely covered
    assert(got.toSet == expected)
    assert(sinkEng.drain("query").isEmpty) // nothing buffered driver-side
  }

  test("derived attributes inline into the standing query") {
    // The DeriveSpec scenario served INCREMENTALLY: a rule joining a
    // GraphQL-derived attribute ("heroes/name") with a base attribute
    // must drain exactly like the snapshot path — the maintained query
    // inlines the derived view's plan over base datom deltas.
    def run2(incremental: Boolean): Seq[Drained] = {
      val e = new Engine(spark)
      e.createAttribute("hero", AttributeConfig(InputSemantics.Distinct))
      e.createAttribute("name", AttributeConfig(InputSemantics.Distinct))
      e.createAttribute(":liked-by", AttributeConfig(InputSemantics.Distinct))
      e.handle(graft.server.Request.Derive("heroes", "{ hero { name } }"))
      e.register(Rule("fans", Join(Seq(0),
        matchA(0, "heroes/name", 1), matchA(0, ":liked-by", 2))))
      if (incremental) e.interestIncremental("fans") else e.interest("fans")
      val history = Seq(
        Seq(Datom.add(1L, "hero", Value.eid(7)),
          Datom.add(7L, "name", Value.str("alice")),
          Datom.add(2L, "hero", Value.eid(8)),
          Datom.add(8L, "name", Value.str("bob")),
          Datom.add(7L, ":liked-by", Value.eid(42))),
        Seq(Datom.add(8L, ":liked-by", Value.eid(99))),
        // Retract the hero link: child 7's derived name disappears, and
        // with it the standing join's output row.
        Seq(Datom.retract(1L, "hero", Value.eid(7))))
      history.zipWithIndex.map { case (tx, i) =>
        e.transact(tx); e.advance(i + 1L)
        multiset(e.drain("fans"))
      }
    }
    val snap = run2(incremental = false)
    assert(run2(incremental = true) == snap)
    assert(snap.head.nonEmpty && snap.last.nonEmpty)
  }

  test("set-semantics engines drain exactly like the snapshot path") {
    // Result-set canonicalization and distinct-input aggregation, both
    // as maintained support thresholds; parity across the plan zoo.
    val params = Gen.Parameters.default
    for (((label, plan), i) <- plans.zipWithIndex) {
      val nonVacuous = (0 until 2).map { s =>
        val raw = genHistory(params,
          Seed(577L + i * 16381L + s * 262147L)).getOrElse(Seq.empty)
        val history = if (label.contains("avg")) validHistory(raw) else raw
        val snap = run(plan, history, incremental = false, set = true)
        val inc = run(plan, history, incremental = true, set = true)
        assert(inc == snap, s"set/$label: history=$history")
        snap.exists(_.nonEmpty)
      }
      assert(nonVacuous.contains(true), s"set/$label produced no diffs")
    }
  }

  test("unsupported semantics and plans fail loudly") {
    val e3 = new Engine(spark)
    e3.createAttribute(":p/x", AttributeConfig(InputSemantics.Raw))
    e3.createAttribute(":p/y", AttributeConfig(InputSemantics.Raw))
    // NON-MONOTONE recursion (a negated self-reference) stays outside
    // the maintainable scope. (Nonlinear monotone recursion — e.g.
    // closure∘closure — is maintained by the general clique node now.)
    e3.register(Rule("q3", Union(Seq(0, 1), Seq(
      matchA(0, ":p/x", 1),
      Negate(NameExpr(Seq(0, 1), "q3"))))))
    e3.interestIncremental("q3")
    e3.transact(Seq(Datom(1, ":p/x", Value.num(1), None, 1)))
    intercept[RuntimeException](e3.advance(1L)) // non-monotone recursion
  }

  test("Distinct input semantics drain exactly like the snapshot path") {
    // The maintained per-attribute support threshold must reproduce the
    // snapshot path's "net support > 0 -> weight 1" collection for any
    // raw history (duplicate asserts and phantom retractions included).
    val params = Gen.Parameters.default
    val covered = plans.filterNot { case (label, _) => label.contains("avg") }
    for (((label, plan), i) <- covered.zipWithIndex) {
      val nonVacuous = (0 until 2).map { s =>
        val history =
          genHistory(params, Seed(977L + i * 4099L + s * 65537L)).getOrElse(Seq.empty)
        val snap = run(plan, history, incremental = false,
          semantics = InputSemantics.Distinct)
        val inc = run(plan, history, incremental = true,
          semantics = InputSemantics.Distinct)
        assert(inc == snap, s"distinct/$label: history=$history")
        snap.exists(_.nonEmpty)
      }
      assert(nonVacuous.contains(true), s"distinct/$label produced no diffs")
    }
  }

  test("LastWriteWins input semantics drain exactly like the snapshot path") {
    // The maintained per-entity latest-event view must reproduce the
    // snapshot path's "last event per entity wins; value iff it was an
    // add" collection (row_number over (t desc, seq desc)) for any
    // history — overwrites, clears (retraction events), and re-asserts
    // included — across the whole maintainable fragment.
    val params = Gen.Parameters.default
    for (((label, plan), i) <- plans.zipWithIndex) {
      val nonVacuous = (0 until 2).map { s =>
        val history =
          genHistory(params, Seed(8317L + i * 524287L + s * 131L)).getOrElse(Seq.empty)
        val snap = run(plan, history, incremental = false,
          semantics = InputSemantics.LastWriteWins)
        val inc = run(plan, history, incremental = true,
          semantics = InputSemantics.LastWriteWins)
        assert(inc == snap, s"lww/$label: history=$history")
        snap.exists(_.nonEmpty)
      }
      assert(nonVacuous.contains(true), s"lww/$label produced no diffs")
    }
    // History includes genuine clears (a retraction event arriving last
    // for some entity) — otherwise the latest-wins semantics is untested.
    val h = genHistory(params, Seed(8317L)).getOrElse(Seq.empty)
    assert(h.flatten.exists(_.diff < 0), "no retraction events covered")
  }

  test("LWW late subscriber replays the latest-wins state exactly") {
    // Replay feeds the WHOLE multi-time history as one advance — the
    // per-entity arg-max over (t, seq) must still pick each entity's
    // globally latest event, not a per-batch one.
    val history = Seq(
      Seq(Datom(1, ":l/x", Value.num(1), None, 1),
        Datom(2, ":l/x", Value.num(5), None, 1)),
      Seq(Datom(1, ":l/x", Value.num(2), None, 1)),  // overwrite e1
      Seq(Datom(2, ":l/x", Value.num(5), None, -1))) // clear e2
    def late(incremental: Boolean): Drained = {
      val e = new Engine(spark)
      e.createAttribute(":l/x", AttributeConfig(InputSemantics.LastWriteWins))
      e.register(Rule("query", matchA(0, ":l/x", 1)))
      history.zipWithIndex.foreach { case (tx, i) =>
        e.transact(tx); e.advance(i + 1L)
      }
      if (incremental) e.interestIncremental("query") else e.interest("query")
      e.advance(4L)
      multiset(e.drain("query"))
    }
    val snap = late(incremental = false)
    val inc = late(incremental = true)
    assert(inc == snap)
    assert(snap.nonEmpty)
  }

  test("transitive-closure rule maintained through the engine, snapshot-exact") {
    val closure = Rule("closure", Union(Seq(0, 1), Seq(
      matchA(0, ":p/x", 1),
      Project(Seq(0, 1), Join(Seq(2),
        matchA(0, ":p/x", 2), NameExpr(Seq(2, 1), "closure"))))))
    def runRule(history: Seq[Seq[Datom]], incremental: Boolean): Seq[Drained] = {
      val e = new Engine(spark)
      e.createAttribute(":p/x", AttributeConfig(InputSemantics.Raw))
      e.register(closure)
      if (incremental) e.interestIncremental("closure") else e.interest("closure")
      history.zipWithIndex.map { case (tx, i) =>
        e.transact(tx)
        e.advance(i + 1L)
        multiset(e.drain("closure"))
      }
    }
    val params = Gen.Parameters.default
    val history =
      genHistory(params, Seed(52361L)).getOrElse(Seq.empty)
    val snap = runRule(history, incremental = false)
    val inc = runRule(history, incremental = true)
    assert(inc == snap, s"closure-rule: history=$history")
    assert(snap.exists(_.nonEmpty), "closure rule produced no diffs")
  }
}
