package graft.plans

import scala.collection.mutable

import graft.model._
import graft.model.Plan.Var

/** The Hector binding-planning module — faithful port of the reference's
  * `AsBinding` analysis (`src/binding/mod.rs:13-360`) and `plan_order` /
  * `source_conflicts` (`src/plan/hector.rs:173-309`).
  *
  * `planOrder(source, bindings)` produces, for a delta pipeline rooted at
  * an attribute binding, a variable order in which every new variable is
  * reachable from the bound prefix, plus the binding order that achieves
  * it. The batch executor (`Compiler.hector`) enforces the same
  * reachability rule with a constrainedness tiebreak; this module is the
  * planning layer a streaming worst-case-optimal execution would consume
  * per delta pipeline (SURVEY.md §2.4, §4.1).
  */
object PlanOrder {

  /** Offset at which a binding binds `variable`, if any. */
  def binds(b: Binding, variable: Var): Option[Int] = b match {
    case Binding.Attr(e, _, v) =>
      if (e == variable) Some(0) else if (v == variable) Some(1) else None
    case Binding.Const(x, _) => if (x == variable) Some(0) else None
    case Binding.BinaryPred(x, y, _) =>
      if (x == variable) Some(0) else if (y == variable) Some(1) else None
    case Binding.Not(inner) => binds(inner, variable)
  }

  /** The variable by which this binding could extend `prefix`, if any —
    * `ready_to_extend` (`src/binding/mod.rs:156-166, 220-222, 257-263,
    * 323-333`). */
  def readyToExtend(b: Binding, prefix: Seq[Var]): Option[Var] = b match {
    case Binding.Attr(e, _, v)       => twoVarReady(e, v, prefix)
    case Binding.BinaryPred(x, y, _) => twoVarReady(x, y, prefix)
    case Binding.Not(inner)          => readyToExtend(inner, prefix)
    case Binding.Const(x, _) =>
      if (!prefix.contains(x)) Some(x) else None
  }

  private def twoVarReady(a: Var, b: Var, prefix: Seq[Var]): Option[Var] =
    if (prefix.contains(a) && !prefix.contains(b)) Some(b)
    else if (prefix.contains(b) && !prefix.contains(a)) Some(a)
    else None

  /** `None` if the binding doesn't involve `target`; `Some(None)` if it is
    * ready to participate in extending `prefix` to `target`; `Some(Some(x))`
    * if it requires `x` bound first — `required_to_extend`
    * (`src/binding/mod.rs:168-189, 265-273, 335-356`). */
  def requiredToExtend(b: Binding, prefix: Seq[Var], target: Var): Option[Option[Var]] =
    b match {
      case Binding.Attr(e, _, v)       => twoVarRequired(e, v, prefix, target)
      case Binding.BinaryPred(x, y, _) => twoVarRequired(x, y, prefix, target)
      case Binding.Not(inner)          => requiredToExtend(inner, prefix, target)
      case Binding.Const(x, _) =>
        if (x != target) None
        else if (!prefix.contains(target)) Some(Some(x))
        else Some(None)
    }

  private def twoVarRequired(
      a: Var, b: Var, prefix: Seq[Var], target: Var): Option[Option[Var]] =
    if (a == target) {
      require(!prefix.contains(a))
      if (prefix.contains(b)) Some(None) else Some(Some(b))
    } else if (b == target) {
      require(!prefix.contains(b))
      if (prefix.contains(a)) Some(None) else Some(Some(a))
    } else None

  def canExtend(b: Binding, prefix: Seq[Var], target: Var): Boolean =
    readyToExtend(b, prefix).contains(target)

  /** Bindings that conflict with the source's own change batch — they can
    * immediately extend one of the source's variables from the other
    * (`source_conflicts`, `src/plan/hector.rs:173-200`). */
  def sourceConflicts(sourceIndex: Int, bindings: Seq[Binding]): Seq[Binding] =
    bindings(sourceIndex) match {
      case Binding.Attr(e, _, v) =>
        bindings.zipWithIndex.collect {
          case (b, i) if i != sourceIndex &&
            (canExtend(b, Seq(e), v) || canExtend(b, Seq(v), e)) => b
        }
      case _ => sys.error("Source must be an AttributeBinding.")
    }

  /** Rust-derive ordering on bindings (variant order as declared in the
    * reference: Attribute < Not < Constant < BinaryPredicate, then
    * field-wise) — `candidates.sort()` uses it, and the resulting binding
    * order depends on it. */
  implicit val bindingOrdering: Ordering[Binding] = new Ordering[Binding] {
    private def variantRank(b: Binding): Int = b match {
      case _: Binding.Attr       => 0
      case _: Binding.Not        => 1
      case _: Binding.Const      => 2
      case _: Binding.BinaryPred => 3
    }
    private def valueRank(v: Value): (Int, String) =
      (ValueKind.of(v).tag, v.native.toString)
    private def predRank(p: Predicate): Int = p match {
      case Predicate.LT => 0; case Predicate.GT => 1; case Predicate.LTE => 2
      case Predicate.GTE => 3; case Predicate.EQ => 4; case Predicate.NEQ => 5
    }
    def compare(x: Binding, y: Binding): Int = (x, y) match {
      case (Binding.Attr(e1, a1, v1), Binding.Attr(e2, a2, v2)) =>
        Ordering[(Int, Int, String)].compare((e1, v1, a1), (e2, v2, a2))
      case (Binding.Not(i1), Binding.Not(i2)) => compare(i1, i2)
      case (Binding.Const(x1, val1), Binding.Const(x2, val2)) =>
        Ordering[(Int, (Int, String))].compare((x1, valueRank(val1)), (x2, valueRank(val2)))
      case (Binding.BinaryPred(x1, y1, p1), Binding.BinaryPred(x2, y2, p2)) =>
        Ordering[(Int, Int, Int)].compare((x1, y1, predRank(p1)), (x2, y2, predRank(p2)))
      case _ => variantRank(x) - variantRank(y)
    }
  }

  /** `plan_order` (`src/plan/hector.rs:209-309`): starting from the source
    * attribute's two variables, repeatedly admit candidate bindings that
    * are ready to extend the prefix, queueing the not-yet-ready ones for
    * the next round. Returns (variable order, binding order). */
  def planOrder(sourceIndex: Int, bindings: Seq[Binding]): (Seq[Var], Seq[Binding]) = {
    val variables = bindings.flatMap(Binding.variablesOf).sorted.distinct

    val prefix = mutable.ArrayBuffer.empty[Var]
    bindings(sourceIndex) match {
      case Binding.Attr(e, _, v) => prefix += e; prefix += v
      case _ => sys.error("Source binding must be an attribute.")
    }

    def candidatesFor(target: Var): Seq[Binding] =
      bindings.zipWithIndex.collect {
        case (b, i) if i != sourceIndex && binds(b, target).isDefined => b
      }

    var candidates = mutable.ArrayBuffer.from(prefix.toSeq.flatMap(candidatesFor))
    val ordered = mutable.ArrayBuffer.empty[Binding]
    var done = false
    while (!done) {
      val waiting = mutable.ArrayBuffer.empty[Binding]
      val round = candidates.sorted(bindingOrdering).distinct
      candidates.clear()
      round.foreach { candidate =>
        readyToExtend(candidate, prefix.toSeq) match {
          case None => waiting += candidate
          case Some(target) =>
            if (!prefix.contains(target)) {
              prefix += target
              candidatesFor(target).foreach { nc =>
                if (nc != candidate) waiting += nc
              }
            }
            ordered += candidate
        }
      }
      if (waiting.isEmpty) done = true
      else {
        candidates ++= waiting
        if (prefix.length == variables.length) done = true
      }
    }
    ordered ++= candidates
    (prefix.toSeq, ordered.toSeq)
  }
}
