package graft

import scala.collection.mutable
import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

import graft.engine.Engine
import graft.model._

/** Differential fuzzing over RANDOM plan trees (the fixed-pool property
  * specs cover known shapes; this one searches the shape space via
  * [[PlanGen]]): each generated plan runs against a random assert/retract
  * history on
  *
  *   1. the independent driver-side interpreter ([[NaiveEval]]),
  *   2. the snapshot engine (accumulated drained diffs AND the
  *      from-scratch `resultFrame` recompute),
  *   3. the maintained engine (`interestMaintained`, which serves the
  *      maintainable fragment with standing incremental state and
  *      auto-demotes the rest to the snapshot path),
  *
  * and all of them must agree exactly (signed multisets) — after EVERY
  * transaction, not just at the end, so intermediate diffs that are wrong
  * but cancel by the final epoch still fail. Generation is deterministic
  * (fixed seeds) so any failure is reproducible by seed.
  *
  * Each attribute draws random INPUT SEMANTICS per seed (Raw / Distinct /
  * LastWriteWins — `src/lib.rs:342-357`), exercising the engine's
  * per-attribute resolution and the weight-1 fast paths keyed on it; the
  * naive accumulator models all three from first principles.
  */
class PlanFuzzSpec extends AnyFunSuite {
  import PlanGen._

  private lazy val spark = TestSpark.spark

  // ---- histories -----------------------------------------------------------
  private def genDatom(rnd: Random, a: String, diff: Long): Datom =
    Datom(1L + rnd.nextInt(4), a, genValue(rnd, a), None, diff)

  private def genHistory(rnd: Random): Seq[Seq[Datom]] = {
    // tx0 seeds every attribute (kinds become known; leaves non-empty).
    val seedTx = attrNames.flatMap(a =>
      Seq.fill(2 + rnd.nextInt(3))(genDatom(rnd, a, 1L)))
    val txs = Seq.fill(1 + rnd.nextInt(2)) {
      Seq.fill(3 + rnd.nextInt(5)) {
        val diff = if (rnd.nextInt(10) < 3) -1L else 1L
        genDatom(rnd, pick(rnd, attrNames), diff)
      }
    }
    seedTx +: txs
  }

  /** First-principles per-attribute resolution (`src/lib.rs:342-357`,
    * `src/operators/last_write_wins.rs:71-101`): Raw nets the weights;
    * Distinct keeps positive support at weight 1; LastWriteWins keeps the
    * latest event per entity — datoms carry no explicit time, so history
    * order IS time-then-sequence order — present iff that event was an
    * assertion. */
  private def accumulate(history: Seq[Seq[Datom]],
      sem: Map[String, InputSemantics]): NaiveEval.Attrs =
    history.flatten.groupBy(_.a).map { case (a, ds) =>
      a -> (sem(a) match {
        case InputSemantics.Raw =>
          ds.groupMapReduce(d => (d.e, d.v.native))(_.diff)(_ + _)
            .filter(_._2 != 0L)
        case InputSemantics.Distinct =>
          ds.groupMapReduce(d => (d.e, d.v.native))(_.diff)(_ + _)
            .collect { case (k, w) if w > 0L => (k, 1L) }
        case InputSemantics.LastWriteWins =>
          val last = mutable.LinkedHashMap.empty[Long, Datom]
          ds.foreach(d => last(d.e) = d)
          last.values.collect {
            case d if d.diff > 0L => ((d.e, d.v.native), 1L)
          }.toMap
      })
    }

  // ---- engine harness --------------------------------------------------------
  /** Feeds `history` one tx per epoch; after each advance asserts the
    * accumulated drained diffs equal `expectAt(prefix)`. Returns the final
    * net, the from-scratch recompute, and the incremental-service flag. */
  private def runEngine(plan: Plan, history: Seq[Seq[Datom]],
      sem: Map[String, InputSemantics], maintained: Boolean,
      expectAt: Seq[Seq[Datom]] => Map[Seq[Any], Long],
      context: => String): (Map[Seq[Any], Long], Map[Seq[Any], Long], Boolean) = {
    val engine = new Engine(spark)
    attrNames.foreach(a => engine.createAttribute(a, AttributeConfig(sem(a))))
    engine.register(Rule("fuzz", plan))
    if (maintained) engine.interestMaintained("fuzz") else engine.interest("fuzz")
    val acc = mutable.Map.empty[Seq[Any], Long]
    history.zipWithIndex.foreach { case (tx, i) =>
      engine.transact(tx)
      engine.advance(i + 1L)
      engine.drain("fuzz").foreach { case (tuple, _, d) =>
        acc(tuple) = acc.getOrElse(tuple, 0L) + d
      }
      val net = acc.filter(_._2 != 0L).toMap
      assert(net == expectAt(history.take(i + 1)),
        s"\nafter tx $i (accumulated vs naive prefix)$context")
    }
    val net = acc.filter(_._2 != 0L).toMap
    val frame = engine.resultFrame("fuzz")
    val n = frame.columns.length - 1
    val recomputed = frame.collect().iterator.map { row =>
      // Pull results pack heterogeneous paths into one array<variant>
      // column; the engine unpacks them at collection (Engine.snapshot) —
      // mirror that here so the recompute compares in tuple space.
      val tuple: Seq[Any] =
        if (engine.isPathArrayResult("fuzz"))
          Engine.deepNative(row.get(0)).asInstanceOf[Seq[Any]]
        else (0 until n).map(i => Engine.deepNative(row.get(i)))
      tuple -> row.getLong(n)
    }.toMap
    (net, recomputed, engine.servedIncrementally("fuzz"))
  }

  private def naiveNet(plan: Plan, history: Seq[Seq[Datom]],
      sem: Map[String, InputSemantics]): Map[Seq[Any], Long] =
    NaiveEval.eval(plan, accumulate(history, sem)).rows
      .map { case (r, w) => (r: Seq[Any]) -> w }

  // ---- the properties ---------------------------------------------------------
  test("random plans: naive oracle == snapshot engine (accumulated + recompute)") {
    var nonEmpty = 0
    var nonRaw = 0
    for (seed <- 0 until 36) {
      val rnd = new Random(0xC0FFEEL + seed * 7919L)
      val tp = gen(rnd, 1 + rnd.nextInt(3))
      val history = genHistory(rnd)
      val sem = genSemantics(rnd)
      def ctx = s"\nseed=$seed\nplan=${tp.plan}\nsem=$sem\nhistory=$history"
      val expect = naiveNet(tp.plan, history, sem)
      val (net, recomputed, _) = runEngine(tp.plan, history, sem,
        maintained = false, naiveNet(tp.plan, _, sem), ctx)
      assert(net == expect, s"\nseed=$seed (accumulated vs naive)$ctx")
      assert(recomputed == expect, s"\nseed=$seed (recompute vs naive)$ctx")
      if (expect.nonEmpty) nonEmpty += 1
      if (sem.valuesIterator.exists(_ != InputSemantics.Raw)) nonRaw += 1
    }
    // Non-vacuity: a generator drifting toward empty results would make
    // every equality trivially true.
    assert(nonEmpty >= 12, s"only $nonEmpty/36 fuzz plans produced rows")
    assert(nonRaw >= 12, s"only $nonRaw/36 catalogs drew non-Raw semantics")
  }

  test("random plans: naive oracle == maintained engine") {
    var nonEmpty = 0
    var served = 0
    for (seed <- 100 until 118) {
      val rnd = new Random(0xBAD5EEDL + seed * 104729L)
      val tp = gen(rnd, 1 + rnd.nextInt(3))
      val history = genHistory(rnd)
      val sem = genSemantics(rnd)
      def ctx = s"\nseed=$seed\nplan=${tp.plan}\nsem=$sem\nhistory=$history"
      val expect = naiveNet(tp.plan, history, sem)
      val (net, recomputed, inc) = runEngine(tp.plan, history, sem,
        maintained = true, naiveNet(tp.plan, _, sem), ctx)
      assert(net == expect, s"\nseed=$seed (maintained vs naive)$ctx")
      assert(recomputed == expect,
        s"\nseed=$seed (maintained recompute vs naive)$ctx")
      if (expect.nonEmpty) nonEmpty += 1
      if (inc) served += 1
    }
    assert(nonEmpty >= 6, s"only $nonEmpty/18 maintained fuzz plans produced rows")
    // Non-vacuity for the maintained path itself: enough of the random
    // plans must actually be served by standing incremental state (the
    // rest legitimately demote to the snapshot path).
    assert(served >= 4, s"only $served/18 plans were served incrementally")
  }

  test("random aggregate plans: naive oracle == maintained engine") {
    // Aggregates are rare in unconstrained generation (1-in-10 per node),
    // so the general maintained test can leave MIN/MAX/MEDIAN groups
    // unexercised; these seeds redraw until the tree carries one.
    var nonEmpty = 0
    for (seed <- 200 until 208) {
      val rnd = new Random(0xA66E5EEDL + seed * 7919L)
      val tp = Iterator.continually(gen(rnd, 2)).find(_.hasAgg).get
      val history = genHistory(rnd)
      val sem = genSemantics(rnd)
      def ctx = s"\nseed=$seed\nplan=${tp.plan}\nsem=$sem\nhistory=$history"
      val expect = naiveNet(tp.plan, history, sem)
      val (net, recomputed, _) = runEngine(tp.plan, history, sem,
        maintained = true, naiveNet(tp.plan, _, sem), ctx)
      assert(net == expect, s"\nseed=$seed (maintained agg vs naive)$ctx")
      assert(recomputed == expect,
        s"\nseed=$seed (maintained agg recompute vs naive)$ctx")
      if (expect.nonEmpty) nonEmpty += 1
    }
    assert(nonEmpty >= 4, s"only $nonEmpty/8 aggregate fuzz plans produced rows")
  }

  test("random pull plans: naive oracle == snapshot and maintained engines") {
    // Pull family over random inner trees, path layouts and cardinality
    // flags (the driver oracle pins three fixed shapes; this searches the
    // space): PullAll, single PullLevel, and heterogeneous-arity Pull,
    // whose packed path rows compare as nested Seq cells.
    var nonEmpty = 0
    for (seed <- 300 until 312) {
      val rnd = new Random(0x50115EEDL + seed * 7919L)
      val plan = genPull(rnd)
      val history = genHistory(rnd)
      val sem = genSemantics(rnd)
      def ctx = s"\nseed=$seed\nplan=$plan\nsem=$sem\nhistory=$history"
      val expect = naiveNet(plan, history, sem)
      val (net, recomputed, _) = runEngine(plan, history, sem,
        maintained = false, naiveNet(plan, _, sem), ctx)
      assert(net == expect, s"\nseed=$seed (pull snapshot vs naive)$ctx")
      assert(recomputed == expect, s"\nseed=$seed (pull recompute vs naive)$ctx")
      val (netM, recomputedM, _) = runEngine(plan, history, sem,
        maintained = true, naiveNet(plan, _, sem), ctx)
      assert(netM == expect, s"\nseed=$seed (pull maintained vs naive)$ctx")
      assert(recomputedM == expect,
        s"\nseed=$seed (pull maintained recompute vs naive)$ctx")
      if (expect.nonEmpty) nonEmpty += 1
    }
    assert(nonEmpty >= 6, s"only $nonEmpty/12 pull fuzz plans produced rows")
  }

  test("random AVG/VARIANCE aggregates: naive == snapshot == maintained") {
    // Exact-rational aggregates generate only at the TREE TOP over a
    // unit-weight Union wrap: their struct outputs would break the
    // L-class discipline if consumed by parent operators, and the
    // engine (correctly) raises on net-count-0 groups — unit weights
    // make every group well-formed by construction.
    import AggregationFn._
    var nonEmpty = 0
    for (seed <- 400 until 410) {
      val rnd = new Random(0x4A7105EEDL + seed * 7919L)
      val inner = Iterator.continually(gen(rnd, 1 + rnd.nextInt(2)))
        .find(t => !t.hasAgg && t.vars.distinct.exists(cls(_) == 'L')).get
      val vars = inner.vars.distinct
      val wrapped = Plan.Union(vars, Seq(inner.plan)) // set-distinct: w=1
      val keys = rnd.shuffle(vars).take(rnd.nextInt(math.min(3, vars.length)))
      val restL = vars.filterNot(keys.contains).filter(cls(_) == 'L')
      if (restL.isEmpty) ()
      else {
        val rat = pick(rnd, Seq(AVG, VARIANCE))
        val picked = Seq((rat, pick(rnd, restL))) ++
          (if (rnd.nextBoolean())
            Seq((pick(rnd, Seq(COUNT, MIN, MEDIAN)), pick(rnd, restL)))
          else Seq.empty)
        val (fns, aggVs) = picked.unzip
        val withVars =
          if (rnd.nextInt(5) == 0) Seq(pick(rnd, vars)) else Seq.empty
        val outVars = rnd.shuffle(keys ++ aggVs)
        val plan = Plan.Aggregate(outVars, wrapped, fns, keys, aggVs, withVars)
        val history = genHistory(rnd)
        val sem = genSemantics(rnd)
        def ctx = s"\nseed=$seed\nplan=$plan\nsem=$sem\nhistory=$history"
        val expect = naiveNet(plan, history, sem)
        for (maintained <- Seq(false, true)) {
          val (net, recomputed, _) = runEngine(plan, history, sem,
            maintained, naiveNet(plan, _, sem), ctx)
          assert(net == expect, s"\nseed=$seed (rational maintained=$maintained)$ctx")
          assert(recomputed == expect,
            s"\nseed=$seed (rational recompute maintained=$maintained)$ctx")
        }
        if (expect.nonEmpty) nonEmpty += 1
      }
    }
    assert(nonEmpty >= 5, s"only $nonEmpty/10 rational fuzz plans produced rows")
  }

  test("pull db__id branch: naive == snapshot == maintained on a retraction history") {
    // The synthetic child-id branch (cardinality-one level with path
    // attributes — src/plan/pull.rs:211-230) is rare in random draws;
    // this pins it deterministically on all three evaluators, including
    // a retraction that must withdraw BOTH the value path and its db__id
    // row. Weight-sensitive: under Raw semantics the duplicate edge
    // contributes weight 2 to each path.
    val plan = Plan.PullLevel(Seq(0, 1), Plan.MatchA(0, ":z/r", 1),
      pullVariable = 1, pullAttributes = Seq(":z/m"),
      pathAttributes = Seq(":path/edge"), cardinalityMany = false)
    val history: Seq[Seq[Datom]] = Seq(
      Seq(Datom(1L, ":z/r", Value.eid(2L), None, 1L),
        Datom(1L, ":z/r", Value.eid(2L), None, 1L), // duplicate edge (w=2)
        Datom(2L, ":z/m", Value.num(9L), None, 1L)),
      Seq(Datom(2L, ":z/m", Value.num(9L), None, -1L)))
    val sem = attrNames.map(_ -> (InputSemantics.Raw: InputSemantics)).toMap
    def ctx = s"\nplan=$plan\nsem=$sem\nhistory=$history"
    // After tx0: value path (1, :path/edge, :z/m, 9) ×2 and db__id path
    // (1, :path/edge, db__id, 2) ×2. After tx1 the value path retracts;
    // db__id stays (the edge is still there).
    assert(naiveNet(plan, history.take(1), sem) == Map(
      (Seq[Any](1L, ":path/edge", ":z/m", 9L): Seq[Any]) -> 2L,
      (Seq[Any](1L, ":path/edge", "db__id", 2L): Seq[Any]) -> 2L))
    val expect = naiveNet(plan, history, sem)
    assert(expect == Map(
      (Seq[Any](1L, ":path/edge", "db__id", 2L): Seq[Any]) -> 2L))
    for (maintained <- Seq(false, true)) {
      val (net, recomputed, _) = runEngine(plan, history, sem,
        maintained, naiveNet(plan, _, sem), ctx)
      assert(net == expect, s"\n(db__id maintained=$maintained)$ctx")
      assert(recomputed == expect,
        s"\n(db__id recompute maintained=$maintained)$ctx")
    }
  }
}
