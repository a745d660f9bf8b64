package graft.model

/** Query-plan algebra mirroring the reference's `enum Plan`
  * (declarative-dataflow `src/plan/mod.rs:154-190`). The plan language is a
  * recursive algebra over multisets of dynamically-typed tuples; variables
  * are small integers and column meaning is positional.
  *
  * Our compiler (graft.compile.Compiler) lowers each node to a Spark
  * `DataFrame` whose columns are named after the bound variables, letting
  * Catalyst do pushdown / pruning / join planning.
  */
sealed trait Plan

object Plan {
  type Var = Int

  /** Data pattern `[?e a ?v]` — `src/plan/mod.rs:174`. */
  final case class MatchA(e: Var, a: String, v: Var) extends Plan

  /** Data pattern `[e a ?v]` (entity constant) — `src/plan/mod.rs:176`.
    * Output binds only `v` (`src/plan/mod.rs:349-374`). */
  final case class MatchEA(e: Long, a: String, v: Var) extends Plan

  /** Data pattern `[?e a v]` (value constant) — `src/plan/mod.rs:178`.
    * Output binds only `e` (`src/plan/mod.rs:375-401`). */
  final case class MatchAV(e: Var, a: String, v: Value) extends Plan

  /** Projection onto `variables`, in order — `src/plan/project.rs`. */
  final case class Project(variables: Seq[Var], plan: Plan) extends Plan

  /** Binary equijoin on `variables`; output = key ++ leftRest ++ rightRest
    * — `src/plan/join.rs:119-180`. */
  final case class Join(variables: Seq[Var], leftPlan: Plan, rightPlan: Plan) extends Plan

  /** N-way conjunction over `bindings` (the reference solves this
    * worst-case-optimally, `src/plan/hector.rs`); we produce the same
    * relation with ordered binary joins + pushed filters. */
  final case class Hector(variables: Seq[Var], bindings: Seq[Binding]) extends Plan

  /** Left tuples whose key has no match in right; both sides distinct-ed
    * first — `src/plan/antijoin.rs:95-98`. */
  final case class Antijoin(variables: Seq[Var], leftPlan: Plan, rightPlan: Plan) extends Plan

  /** Multiset negation (diff negation) — `src/plan/mod.rs:320-336`. */
  final case class Negate(plan: Plan) extends Plan

  /** N-ary union projected to `variables`, then distinct (set semantics)
    * — `src/plan/union.rs:73-77`. */
  final case class Union(variables: Seq[Var], plans: Seq[Plan]) extends Plan

  /** Binary predicate filter; `constants(0)` = constant left operand,
    * `constants(1)` = constant right operand — `src/plan/filter.rs:46-135`. */
  final case class Filter(
      variables: Seq[Var],
      predicate: Predicate,
      plan: Plan,
      constants: Seq[Option[Value]]) extends Plan

  /** Scalar function appended as a new column bound to `resultVariable`
    * — `src/plan/transform.rs`. */
  final case class Transform(
      variables: Seq[Var],
      resultVariable: Var,
      plan: Plan,
      function: Fn,
      constants: Seq[Option[Value]]) extends Plan

  /** Grouped aggregation — `src/plan/aggregate_neu.rs:45-285` (multiset
    * semantics, the reference's default build). `variables` is the full
    * output (find-clause) order; aggregate results are re-inserted at their
    * original positions. `withVariables` = Datomic `:with`.
    */
  final case class Aggregate(
      variables: Seq[Var],
      plan: Plan,
      aggregationFns: Seq[AggregationFn],
      keyVariables: Seq[Var],
      aggregationVariables: Seq[Var],
      withVariables: Seq[Var]) extends Plan

  /** Reference to another named rule (possibly itself => recursion), with
    * positional variable renaming — `src/plan/mod.rs:402-414`. */
  final case class NameExpr(variables: Seq[Var], name: String) extends Plan

  /** Single pull level: for each entity bound by `plan` at `pullVariable`,
    * fetch `(a, v)` for `pullAttributes`; emits interleaved paths
    * — `src/plan/pull.rs:94-237`. */
  final case class PullLevel(
      variables: Seq[Var],
      plan: Plan,
      pullVariable: Var,
      pullAttributes: Seq[String],
      pathAttributes: Seq[String],
      cardinalityMany: Boolean) extends Plan

  /** Union of several pull paths — `src/plan/pull.rs:45-50`. */
  final case class Pull(variables: Seq[Var], paths: Seq[Plan]) extends Plan

  /** Dump `[e a v]` for every listed attribute — `src/plan/pull.rs:288-358`. */
  final case class PullAll(variables: Seq[Var], pullAttributes: Seq[String]) extends Plan

  /** `Plan::match_a` helper — `src/plan/mod.rs:195`. */
  def matchA(e: Var, a: String, v: Var): Plan = MatchA(e, a, v)
  def matchEA(e: Long, a: String, v: Var): Plan = MatchEA(e, a, v)
  def matchAV(e: Var, a: String, v: Value): Plan = MatchAV(e, a, v)

  /** The public "write a query" entry: find-variables + constraints
    * — reference `q(target_variables, bindings)` (`src/lib.rs:867-875`). */
  def q(variables: Seq[Var], bindings: Seq[Binding]): Plan = Hector(variables, bindings)

  /** Variables bound by a plan's output, in output order. Mirrors the
    * per-node `variables()` logic of the reference's `Implementable` impls. */
  def boundVariables(plan: Plan, rules: String => Seq[Var]): Seq[Var] = plan match {
    case MatchA(e, _, v)       => Seq(e, v)
    case MatchEA(_, _, v)      => Seq(v)
    case MatchAV(e, _, _)      => Seq(e)
    case Project(vs, _)        => vs
    case Join(vs, l, r) =>
      val lv = boundVariables(l, rules); val rv = boundVariables(r, rules)
      vs ++ lv.filterNot(vs.contains) ++ rv.filterNot(vs.contains)
    case Hector(vs, _)         => vs
    case Antijoin(vs, l, _) =>
      vs ++ boundVariables(l, rules).filterNot(vs.contains)
    case Negate(p)             => boundVariables(p, rules)
    case Union(vs, _)          => vs
    case Filter(_, _, p, _)    => boundVariables(p, rules)
    case Transform(_, rv, p, _, _) => boundVariables(p, rules) :+ rv
    case Aggregate(vs, _, _, _, _, _) => vs
    case NameExpr(vs, _)       => vs
    case PullLevel(vs, _, _, _, _, _) => vs
    case Pull(vs, _)           => vs
    case PullAll(vs, _)        => vs
  }

  /** Transitive attribute + rule dependencies (reference
    * `Plan::dependencies`, `src/lib.rs:879-930`). */
  def dependencies(plan: Plan): (Set[String], Set[String]) = plan match {
    case MatchA(_, a, _)  => (Set(a), Set.empty)
    case MatchEA(_, a, _) => (Set(a), Set.empty)
    case MatchAV(_, a, _) => (Set(a), Set.empty)
    case Project(_, p)    => dependencies(p)
    case Join(_, l, r)    => merge(dependencies(l), dependencies(r))
    case Hector(_, bs) =>
      (bs.flatMap {
        case Binding.Attr(_, a, _)            => Seq(a)
        case Binding.Not(Binding.Attr(_, a, _)) => Seq(a)
        case Binding.Not(Binding.Not(Binding.Attr(_, a, _))) => Seq(a)
        case _                                => Seq.empty
      }.toSet, Set.empty)
    case Antijoin(_, l, r) => merge(dependencies(l), dependencies(r))
    case Negate(p)         => dependencies(p)
    case Union(_, ps)      => ps.map(dependencies).foldLeft((Set.empty[String], Set.empty[String]))(merge)
    case Filter(_, _, p, _)        => dependencies(p)
    case Transform(_, _, p, _, _)  => dependencies(p)
    case Aggregate(_, p, _, _, _, _) => dependencies(p)
    case NameExpr(_, name) => (Set.empty, Set(name))
    case PullLevel(_, p, _, pas, _, _) =>
      val (as, rs) = dependencies(p); (as ++ pas, rs)
    case Pull(_, paths) =>
      paths.map(dependencies).foldLeft((Set.empty[String], Set.empty[String]))(merge)
    case PullAll(_, pas) => (pas.toSet, Set.empty)
  }

  private def merge(a: (Set[String], Set[String]), b: (Set[String], Set[String])) =
    (a._1 ++ b._1, a._2 ++ b._2)

  /** Rule names reachable from `root`'s plan through `NameExpr`
    * references (root included; references to names absent from `plans`
    * are kept but not expanded). Shared by both engines' maintained
    * attach paths, which restrict derived-view inlining to the rules a
    * standing can actually reach — a registered-but-unreferenced rule
    * with an unsupported derived usage must not poison other standings
    * (round-16 advisory). */
  def reachableRules(root: String, plans: collection.Map[String, Plan]): Set[String] = {
    val seen = scala.collection.mutable.Set(root)
    def expand(p: Plan): Unit =
      dependencies(p)._2.foreach { n =>
        if (seen.add(n)) plans.get(n).foreach(expand)
      }
    plans.get(root).foreach(expand)
    seen.toSet
  }
}

/** Built-in binary predicates — reference `BinaryPredicate`
  * (`src/binding/mod.rs:284-297`). */
sealed trait Predicate
object Predicate {
  case object LT extends Predicate
  case object GT extends Predicate
  case object LTE extends Predicate
  case object GTE extends Predicate
  case object EQ extends Predicate
  case object NEQ extends Predicate
}

/** Built-in scalar functions — reference `Function`
  * (`src/plan/transform.rs:17-24`). */
sealed trait Fn
object Fn {
  /** Truncate a ms-epoch instant to :minute/:hour/:day/:week
    * (`src/plan/transform.rs:86-113`). */
  case object TRUNCATE extends Fn
  case object ADD extends Fn
  case object SUBTRACT extends Fn
}

/** Built-in aggregation functions — reference `AggregationFn`
  * (`src/plan/aggregate_neu.rs:22-39`). */
sealed trait AggregationFn
object AggregationFn {
  case object MIN extends AggregationFn
  case object MAX extends AggregationFn
  case object MEDIAN extends AggregationFn
  case object COUNT extends AggregationFn
  case object SUM extends AggregationFn
  case object AVG extends AggregationFn
  case object VARIANCE extends AggregationFn
}

/** The constraint language every plan lowers into — reference
  * `enum Binding` (`src/binding/mod.rs:52-92`). */
sealed trait Binding
object Binding {
  import Plan.Var

  /** Two variables bound by the (e,v) pairs of an attribute. */
  final case class Attr(e: Var, a: String, v: Var) extends Binding

  /** A variable bound to a constant value. */
  final case class Const(variable: Var, value: Value) extends Binding

  /** Two variables constrained by a binary predicate. */
  final case class BinaryPred(x: Var, y: Var, predicate: Predicate) extends Binding

  /** Negation-as-antijoin: the wrapped binding's tuples must be absent
    * (`AntijoinBinding` wraps any binding — `src/binding/mod.rs:56-57`). */
  final case class Not(binding: Binding) extends Binding

  def attribute(e: Var, a: String, v: Var): Binding = Attr(e, a, v)
  def constant(variable: Var, value: Value): Binding = Const(variable, value)
  def binaryPredicate(p: Predicate, x: Var, y: Var): Binding = BinaryPred(x, y, p)
  def not(e: Var, a: String, v: Var): Binding = Not(Attr(e, a, v))

  def variablesOf(b: Binding): Seq[Var] = b match {
    case Attr(e, _, v)       => Seq(e, v)
    case Const(x, _)         => Seq(x)
    case BinaryPred(x, y, _) => Seq(x, y)
    case Not(inner)          => variablesOf(inner)
  }
}

/** A named rule — reference `Rule { name, plan }`. */
final case class Rule(name: String, plan: Plan)

/** Per-attribute configuration — reference `AttributeConfig`
  * (`src/lib.rs:390-401`). Index direction / query support collapse away on
  * Spark (Catalyst picks join sides); input semantics and trace slack keep
  * their meaning.
  */
final case class AttributeConfig(
    inputSemantics: InputSemantics = InputSemantics.Raw,
    traceSlack: Option[Long] = None,
    valueType: Option[org.apache.spark.sql.types.DataType] = None)

/** Reference `InputSemantics` (`src/lib.rs:342-357`). */
sealed trait InputSemantics
object InputSemantics {
  /** No special semantics enforced (multiset of datoms). */
  case object Raw extends InputSemantics
  /** Only the latest value per entity is kept (CardinalityOne). */
  case object LastWriteWins extends InputSemantics
  /** Set semantics on (e, v) pairs. */
  case object Distinct extends InputSemantics
}
