package graft

import scala.collection.mutable
import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

import graft.engine.Engine
import graft.model._
import graft.model.Plan._

/** Differential fuzzing over RANDOM plan trees (the fixed-pool property
  * specs cover known shapes; this one searches the shape space): each
  * generated plan runs against a random assert/retract history on
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
  *
  * Class discipline: var ids 0-3 and 6-9 always carry LongType natives,
  * 4-5 StringType — so any two occurrences of a var id are union- and
  * join-compatible by construction. COUNT/SUM aggregation slots are
  * restricted to L vars (their output column becomes a number).
  */
class PlanFuzzSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  // ---- catalog -----------------------------------------------------------
  private val attrClass: Map[String, Char] = Map(
    ":z/m" -> 'L', ":z/n" -> 'L', ":z/s" -> 'S', ":z/r" -> 'L')
  private val attrNames: Seq[String] = attrClass.keys.toSeq.sorted
  private val lAttrs = attrNames.filter(attrClass(_) == 'L')

  private def cls(v: Int): Char = if (v == 4 || v == 5) 'S' else 'L'
  private val lVars = Seq(0, 1, 2, 3)
  private val sVars = Seq(4, 5)
  private val freshVars = Seq(6, 7, 8, 9) // transform results (class L)

  private def genValue(rnd: Random, a: String): Value =
    if (attrClass(a) == 'S') Value.str(Seq("a", "b", "c")(rnd.nextInt(3)))
    else if (a == ":z/r") Value.eid(1L + rnd.nextInt(4))
    else Value.num(1L + rnd.nextInt(3))

  private def pick[T](rnd: Random, xs: Seq[T]): T = xs(rnd.nextInt(xs.length))

  /** Random nonempty sub-sequence in random order. */
  private def pickSubset(rnd: Random, xs: Seq[Int]): Seq[Int] = {
    val n = 1 + rnd.nextInt(xs.length)
    rnd.shuffle(xs).take(n)
  }

  // ---- typed plan generator ----------------------------------------------
  /** vars mirrors the COMPILED relation's column order (Compiler.Rel.vars),
    * including duplicate var ids where the compiled output has them. */
  private case class TP(plan: Plan, vars: Seq[Int], hasAgg: Boolean)

  private def genLeaf(rnd: Random): TP = rnd.nextInt(6) match {
    case 0 | 1 | 2 =>
      val a = pick(rnd, attrNames)
      val e = pick(rnd, lVars)
      if (attrClass(a) == 'S') {
        val v = pick(rnd, sVars)
        TP(MatchA(e, a, v), Seq(e, v), hasAgg = false)
      } else if (rnd.nextInt(8) == 0) {
        TP(MatchA(e, a, e), Seq(e), hasAgg = false) // e==v self-equality
      } else {
        val v = pick(rnd, lVars.filter(_ != e))
        TP(MatchA(e, a, v), Seq(e, v), hasAgg = false)
      }
    case 3 =>
      val a = pick(rnd, attrNames)
      val v = if (attrClass(a) == 'S') pick(rnd, sVars) else pick(rnd, lVars)
      TP(MatchEA(1L + rnd.nextInt(4), a, v), Seq(v), hasAgg = false)
    case 4 =>
      val a = pick(rnd, attrNames)
      val e = pick(rnd, lVars)
      TP(MatchAV(e, a, genValue(rnd, a)), Seq(e), hasAgg = false)
    case 5 => genHector(rnd)
  }

  private def genHector(rnd: Random): TP = {
    val n = 2 + rnd.nextInt(2)
    var attrBs = List.empty[Binding.Attr]
    var bound = Vector.empty[Int]
    for (_ <- 0 until n) {
      val a = pick(rnd, attrNames)
      val boundL = bound.filter(cls(_) == 'L').distinct
      val e =
        if (boundL.nonEmpty && rnd.nextBoolean()) pick(rnd, boundL)
        else pick(rnd, lVars)
      val v =
        if (attrClass(a) == 'S') pick(rnd, sVars)
        else {
          val cands = lVars.filter(_ != e)
          val reuse = boundL.filter(cands.contains)
          if (reuse.nonEmpty && rnd.nextBoolean()) pick(rnd, reuse)
          else pick(rnd, cands)
        }
      attrBs ::= Binding.Attr(e, a, v)
      bound = bound ++ Seq(e, v)
    }
    val boundDistinct = bound.distinct
    var bindings: List[Binding] = attrBs.reverse

    // Const on a bound var (pushed into scans) 40% of the time.
    var constVars = Map.empty[Int, Value]
    if (rnd.nextInt(5) < 2) {
      val x = pick(rnd, boundDistinct)
      val v = if (cls(x) == 'S') Value.str(Seq("a", "b", "c")(rnd.nextInt(3)))
      else Value.num(1L + rnd.nextInt(4))
      constVars += (x -> v)
      bindings :+= Binding.Const(x, v)
    }
    // Const-only target var 20% of the time.
    val constOnly: Seq[Int] =
      if (rnd.nextInt(5) == 0) {
        val free = (lVars ++ sVars).filterNot(boundDistinct.contains)
        if (free.nonEmpty) {
          val x = pick(rnd, free)
          val v = if (cls(x) == 'S') Value.str(Seq("a", "b", "c")(rnd.nextInt(3)))
          else Value.num(1L + rnd.nextInt(4))
          constVars += (x -> v)
          bindings :+= Binding.Const(x, v)
          Seq(x)
        } else Seq.empty
      } else Seq.empty

    // Binary predicate over two same-class bound-or-const vars, 40%.
    if (rnd.nextInt(5) < 2) {
      val usable = (boundDistinct ++ constOnly).distinct
      val byClass = usable.groupBy(cls)
      val pool = byClass.values.filter(_.lengthCompare(1) > 0).toSeq
      if (pool.nonEmpty) {
        val same = pick(rnd, pool)
        val x = pick(rnd, same)
        val y = pick(rnd, same.filter(_ != x))
        val p = pick(rnd, Seq(Predicate.LT, Predicate.GT, Predicate.LTE,
          Predicate.GTE, Predicate.EQ, Predicate.NEQ))
        bindings :+= Binding.BinaryPred(x, y, p)
      }
    }
    // Negation binding sharing >=1 var with the positive prefix, 30%.
    if (rnd.nextInt(10) < 3) {
      val a = pick(rnd, lAttrs)
      val e = pick(rnd, boundDistinct.filter(cls(_) == 'L'))
      val v = pick(rnd, lVars.filter(_ != e))
      bindings :+= Binding.Not(Binding.Attr(e, a, v))
    }

    val target = pickSubset(rnd, (boundDistinct ++ constOnly).distinct)
    TP(Hector(target, bindings), target, hasAgg = false)
  }

  private def gen(rnd: Random, depth: Int): TP = {
    if (depth <= 0) return genLeaf(rnd)
    rnd.nextInt(10) match {
      case 0 | 1 => // join
        val l = gen(rnd, depth - 1)
        val r = gen(rnd, depth - 1)
        val shared = l.vars.distinct.filter(r.vars.distinct.contains)
        if (shared.isEmpty) gen(rnd, depth - 1)
        else {
          val target = pickSubset(rnd, shared)
          val outVars = target ++ l.vars.distinct.filterNot(target.contains) ++
            r.vars.distinct.filterNot(target.contains)
          TP(Join(target, l.plan, r.plan), outVars, l.hasAgg || r.hasAgg)
        }
      case 2 => // antijoin
        val l = gen(rnd, depth - 1)
        val r = gen(rnd, depth - 1)
        val shared = l.vars.distinct.filter(r.vars.distinct.contains)
        if (shared.isEmpty) gen(rnd, depth - 1)
        else {
          val target = pickSubset(rnd, shared)
          val outVars = target ++ l.vars.distinct.filterNot(target.contains)
          TP(Antijoin(target, l.plan, r.plan), outVars, l.hasAgg || r.hasAgg)
        }
      case 3 => // union
        val branches = Seq.fill(2 + rnd.nextInt(2))(gen(rnd, depth - 1))
        val common = branches.map(_.vars.toSet).reduce(_ intersect _).toSeq.sorted
        if (common.isEmpty) gen(rnd, depth - 1)
        else {
          val target = pickSubset(rnd, common)
          TP(Union(target, branches.map(_.plan)), target, branches.exists(_.hasAgg))
        }
      case 4 => // project (occasionally with a duplicated column)
        val p = gen(rnd, depth - 1)
        val base = pickSubset(rnd, p.vars.distinct)
        val vs = if (rnd.nextInt(4) == 0) base :+ pick(rnd, base) else base
        TP(Project(vs, p.plan), vs, p.hasAgg)
      case 5 => // negate
        val p = gen(rnd, depth - 1)
        TP(Negate(p.plan), p.vars, p.hasAgg)
      case 6 => // filter
        val p = gen(rnd, depth - 1)
        val vars = p.vars.distinct
        val x = pick(rnd, vars)
        val pred = pick(rnd, Seq(Predicate.LT, Predicate.GT, Predicate.LTE,
          Predicate.GTE, Predicate.EQ, Predicate.NEQ))
        val const: Value =
          if (cls(x) == 'S') Value.str(Seq("a", "b", "c")(rnd.nextInt(3)))
          else Value.num(1L + rnd.nextInt(4))
        val partners = vars.filter(y => y != x && cls(y) == cls(x))
        val plan = rnd.nextInt(3) match {
          case 0 => Filter(Seq(x), pred, p.plan, Seq(Some(const), None))
          case 1 => Filter(Seq(x), pred, p.plan, Seq(None, Some(const)))
          case _ =>
            if (partners.isEmpty) Filter(Seq(x), pred, p.plan, Seq(None, Some(const)))
            else Filter(Seq(x, pick(rnd, partners)), pred, p.plan, Seq(None, None))
        }
        TP(plan, p.vars, p.hasAgg)
      case 7 => // transform
        val p = gen(rnd, depth - 1)
        val numVars = p.vars.distinct.filter(cls(_) == 'L')
        val fresh = freshVars.filterNot(p.vars.contains)
        if (numVars.isEmpty || fresh.isEmpty) gen(rnd, depth - 1)
        else {
          val tvars = rnd.shuffle(numVars).take(1 + rnd.nextInt(math.min(2, numVars.length)))
          val consts: Seq[Option[Value]] =
            if (rnd.nextBoolean()) Seq(Some(Value.num(1L + rnd.nextInt(3)))) else Seq.empty
          val fn = pick(rnd, Seq(Fn.ADD, Fn.SUBTRACT))
          val rv = fresh.head
          TP(Transform(tvars, rv, p.plan, fn, consts), p.vars :+ rv, p.hasAgg)
        }
      case _ => // aggregate (never nested: its outputs can be null)
        val p = gen(rnd, depth - 1)
        val vars = p.vars.distinct
        if (p.hasAgg || vars.isEmpty) gen(rnd, depth - 1)
        else {
          val keys = rnd.shuffle(vars).take(rnd.nextInt(math.min(3, vars.length)))
          val rest = vars.filterNot(keys.contains)
          val restL = rest.filter(cls(_) == 'L')
          if (rest.isEmpty) gen(rnd, depth - 1)
          else {
            import AggregationFn._
            val nf = 1 + rnd.nextInt(2)
            val picked = (0 until nf).flatMap { _ =>
              pick(rnd, Seq(COUNT, SUM, MIN, MAX, MEDIAN)) match {
                case f @ (COUNT | SUM) =>
                  if (restL.isEmpty) None else Some((f, pick(rnd, restL)))
                case f => Some((f, pick(rnd, rest)))
              }
            }
            if (picked.isEmpty) gen(rnd, depth - 1)
            else {
              val (fns, aggVs) = picked.unzip
              val withVars =
                if (rnd.nextInt(5) == 0) Seq(pick(rnd, vars)) else Seq.empty
              val full = rnd.shuffle(keys ++ aggVs)
              // Occasionally omit one key column from the output — two
              // groups may then emit identical rows (weights add to 2).
              val outVars =
                if (keys.nonEmpty && rnd.nextInt(5) == 0) {
                  val drop = full.indexOf(pick(rnd, keys))
                  full.patch(drop, Nil, 1)
                } else full
              TP(Aggregate(outVars, p.plan, fns, keys, aggVs, withVars),
                outVars, hasAgg = true)
            }
          }
        }
    }
  }

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

  private def genSemantics(rnd: Random): Map[String, InputSemantics] =
    attrNames.map { a =>
      a -> (rnd.nextInt(4) match {
        case 0 | 1 => InputSemantics.Raw
        case 2     => InputSemantics.Distinct
        case _     => InputSemantics.LastWriteWins
      })
    }.toMap

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
      ((0 until n).map(i => Engine.deepNative(row.get(i))): Seq[Any]) ->
        row.getLong(n)
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
}
