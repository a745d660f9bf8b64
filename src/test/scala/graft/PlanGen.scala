package graft

import scala.util.Random

import graft.model._
import graft.model.Plan._

/** Shared random TYPED plan-tree generator for the differential fuzz
  * suites ([[PlanFuzzSpec]] unitemporal, [[BiPlanFuzzSpec]] bitemporal).
  *
  * Class discipline: var ids 0-3 and 6-9 always carry LongType natives,
  * 4-5 StringType — so any two occurrences of a var id are union- and
  * join-compatible by construction. COUNT/SUM aggregation slots are
  * restricted to L vars (their output column becomes a number).
  */
object PlanGen {

  // ---- catalog -----------------------------------------------------------
  val attrClass: Map[String, Char] = Map(
    ":z/m" -> 'L', ":z/n" -> 'L', ":z/s" -> 'S', ":z/r" -> 'L')
  val attrNames: Seq[String] = attrClass.keys.toSeq.sorted
  val lAttrs: Seq[String] = attrNames.filter(attrClass(_) == 'L')

  def cls(v: Int): Char = if (v == 4 || v == 5) 'S' else 'L'
  val lVars = Seq(0, 1, 2, 3)
  val sVars = Seq(4, 5)
  val freshVars = Seq(6, 7, 8, 9) // transform results (class L)

  def genValue(rnd: Random, a: String): Value =
    if (attrClass(a) == 'S') Value.str(Seq("a", "b", "c")(rnd.nextInt(3)))
    else if (a == ":z/r") Value.eid(1L + rnd.nextInt(4))
    else Value.num(1L + rnd.nextInt(3))

  def pick[T](rnd: Random, xs: Seq[T]): T = xs(rnd.nextInt(xs.length))

  /** Random nonempty sub-sequence in random order. */
  def pickSubset(rnd: Random, xs: Seq[Int]): Seq[Int] = {
    val n = 1 + rnd.nextInt(xs.length)
    rnd.shuffle(xs).take(n)
  }

  def genSemantics(rnd: Random): Map[String, InputSemantics] =
    attrNames.map { a =>
      a -> (rnd.nextInt(4) match {
        case 0 | 1 => InputSemantics.Raw
        case 2     => InputSemantics.Distinct
        case _     => InputSemantics.LastWriteWins
      })
    }.toMap

  // ---- typed plan generator ----------------------------------------------
  /** vars mirrors the COMPILED relation's column order (Compiler.Rel.vars),
    * including duplicate var ids where the compiled output has them. */
  final case class TP(plan: Plan, vars: Seq[Int], hasAgg: Boolean)

  def genLeaf(rnd: Random): TP = rnd.nextInt(6) match {
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

  def genHector(rnd: Random): TP = {
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

  /** A random top-level Pull-family plan: a PullLevel over a shallow
    * inner tree, a Pull over 1-2 heterogeneous-arity levels, or a
    * PullAll. Pull outputs use synthetic path columns (negative ids), so
    * these wrap the TOP of a tree only — mirroring the reference, where
    * pull is the document edge, not a composable relational operator.
    * The interleave layout needs |pathAttrs| ∈ {arity−1, arity} (the
    * compiled alternation consumes them pairwise). */
  def genPull(rnd: Random): Plan = rnd.nextInt(4) match {
    case 0 => // PullAll over a random nonempty attribute subset
      val n = 1 + rnd.nextInt(attrNames.length)
      Plan.PullAll(Seq(-1, -2, -3), rnd.shuffle(attrNames).take(n))
    case 1 | 2 => genPullLevel(rnd)
    case _ =>
      val n = 1 + rnd.nextInt(2)
      Plan.Pull(Seq(-1), Seq.fill(n)(genPullLevel(rnd)))
  }

  private def genPullLevel(rnd: Random): Plan = {
    // Inner tree must bind an L-class var to pull on (entity ids join
    // against the Long `e` column of the pulled attribute tables).
    val inner = Iterator.continually(gen(rnd, rnd.nextInt(2)))
      .find(_.vars.exists(cls(_) == 'L')).get
    val pullVar = pick(rnd, inner.vars.distinct.filter(cls(_) == 'L'))
    val arity = inner.vars.length
    val pathAttrs: Seq[String] = rnd.nextInt(3) match {
      case 0 => Seq.empty
      case _ =>
        val n = if (rnd.nextBoolean()) arity - 1 else arity
        (0 until n).map(i => s":path/p$i")
    }
    val nPull = rnd.nextInt(3) // 0 => path-decoration-only level
    val pullAttrs = rnd.shuffle(attrNames).take(nPull)
    Plan.PullLevel(inner.vars, inner.plan, pullVar, pullAttrs, pathAttrs,
      cardinalityMany = rnd.nextBoolean())
  }

  def gen(rnd: Random, depth: Int): TP = {
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
}
