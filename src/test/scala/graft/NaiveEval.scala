package graft

import scala.collection.mutable

import graft.model._
import graft.model.Plan._

/** Driver-side reference interpreter for the relational core of the plan
  * algebra — an oracle INDEPENDENT of both the batch compiler and the
  * maintained engine, written from first principles against the reference
  * semantics (declarative-dataflow src/plan/ modules). `PlanFuzzSpec` runs
  * random plan trees through this, the snapshot engine, and the maintained
  * engine, and requires all three to agree.
  *
  * Values are Spark NATIVES (Long / String / Boolean / null), mirroring how
  * the compiled plan compares columns: `VEid(3)` and `VNumber(3)` are both
  * LongType and DO equate in a compiled join, so the interpreter must treat
  * them as equal too. SQL comparison semantics apply: a null operand fails
  * every predicate, null join keys never match (not even each other), but
  * grouping/distinct treats null as a normal key (GROUP BY semantics).
  *
  * Supported: MatchA/MatchEA/MatchAV, Project, Join, Antijoin, Negate,
  * Union, Filter, Transform, Aggregate (all seven fns — AVG/VARIANCE as
  * exact gcd-reduced rationals comparing as Seq(num, den)), Hector
  * (Attr/Const/BinaryPred/Not bindings), PullLevel/Pull/PullAll (paths as
  * interleaved natives; Pull packs each path as one nested Seq cell,
  * mirroring the compiled array<variant> column after native decode).
  * NameExpr is out of scope (covered by the ported suites, the closure
  * property specs, and the kernel fixpoint specs).
  */
object NaiveEval {
  type Row = Vector[Any]

  /** A relation: bound variable ids in column order (duplicates possible,
    * first occurrence wins on lookup — mirroring `Rel.colOf`) plus a
    * signed multiset of rows. */
  final case class NRel(vars: Seq[Int], rows: Map[Row, Long]) {
    def idx(v: Int): Int = {
      val i = vars.indexOf(v)
      require(i >= 0, s"variable $v not bound by $vars")
      i
    }
  }

  type Attrs = Map[String, Map[(Long, Any), Long]]

  private def consolidate(rows: Iterable[(Row, Long)]): Map[Row, Long] =
    rows.groupMapReduce(_._1)(_._2)(_ + _).filter(_._2 != 0L)

  /** Z-set distinct: positive net weight at weight 1 (Compiler.distinctify). */
  private def zDistinct(rows: Iterable[(Row, Long)]): Map[Row, Long] =
    consolidate(rows).collect { case (r, w) if w > 0 => (r, 1L) }

  private def project(rel: NRel, vs: Seq[Int]): NRel = {
    val is = vs.map(rel.idx)
    NRel(vs, consolidate(rel.rows.toSeq.map { case (r, w) =>
      (is.map(r.apply).toVector, w)
    }))
  }

  /** Three-way native comparison; None when either side is null (SQL). */
  private def cmpNative(a: Any, b: Any): Option[Int] = (a, b) match {
    case (null, _) | (_, null)    => None
    case (x: Long, y: Long)       => Some(java.lang.Long.compare(x, y))
    case (x: String, y: String)   => Some(x.compareTo(y))
    case (x: Boolean, y: Boolean) => Some(java.lang.Boolean.compare(x, y))
    case _ => sys.error(s"incomparable natives: $a / $b")
  }

  private def predHolds(p: Predicate, a: Any, b: Any): Boolean =
    cmpNative(a, b) match {
      case None => false
      case Some(c) => p match {
        case Predicate.LT  => c < 0
        case Predicate.GT  => c > 0
        case Predicate.LTE => c <= 0
        case Predicate.GTE => c >= 0
        case Predicate.EQ  => c == 0
        case Predicate.NEQ => c != 0
      }
    }

  /** Binary equijoin on `target` — output `target ++ lRest ++ rRest`,
    * weights multiply; a var shared but NOT in `target` appears twice with
    * NO equality constraint (exactly the compiled `Compiler.join`). */
  private def join(target: Seq[Int], l: NRel, r: NRel): NRel = {
    val lRest = l.vars.distinct.filterNot(target.contains)
    val rRest = r.vars.distinct.filterNot(target.contains)
    val outVars = target ++ lRest ++ rRest
    val li = target.map(l.idx)
    val ri = target.map(r.idx)
    val lOut = (target ++ lRest).map(l.idx)
    val rOut = rRest.map(r.idx)
    val rIndex: Map[Seq[Any], Seq[(Row, Long)]] =
      r.rows.toSeq.groupBy { case (row, _) => ri.map(row.apply) }
    val out = for {
      (lr, lw) <- l.rows.toSeq
      key = li.map(lr.apply)
      if !key.contains(null) // null keys never match in SQL ===
      (rr, rw) <- rIndex.getOrElse(key, Seq.empty)
    } yield ((lOut.map(lr.apply) ++ rOut.map(rr.apply)).toVector, lw * rw)
    NRel(outVars, consolidate(out))
  }

  /** Left tuples whose key has no match in right; both sides distinct-ed
    * (Compiler.antijoin). A left row with a null key component is KEPT
    * (the anti-join condition is null => no match). */
  private def antijoin(target: Seq[Int], l: NRel, r: NRel): NRel = {
    val lRest = l.vars.distinct.filterNot(target.contains)
    val outVars = target ++ lRest
    val leftD = zDistinct(project(l, outVars).rows)
    val rightKeys = zDistinct(project(r, target).rows)
      .keySet.filterNot(_.contains(null))
    val k = target.length
    NRel(outVars, leftD.filter { case (row, _) =>
      val key = row.take(k)
      key.contains(null) || !rightKeys.contains(key)
    })
  }

  def eval(plan: Plan, attrs: Attrs): NRel = plan match {
    case MatchA(e, a, v) =>
      val data = attrs.getOrElse(a, Map.empty)
      if (e == v)
        NRel(Seq(e), consolidate(data.collect {
          case ((ent, vv), w) if vv == (ent: Any) => (Vector[Any](ent), w)
        }))
      else
        NRel(Seq(e, v), consolidate(data.map { case ((ent, vv), w) =>
          (Vector[Any](ent, vv), w)
        }))

    case MatchEA(eid, a, v) =>
      NRel(Seq(v), consolidate(attrs.getOrElse(a, Map.empty).collect {
        case ((ent, vv), w) if ent == eid => (Vector[Any](vv), w)
      }))

    case MatchAV(e, a, value) =>
      NRel(Seq(e), consolidate(attrs.getOrElse(a, Map.empty).collect {
        case ((ent, vv), w) if vv == value.native => (Vector[Any](ent), w)
      }))

    case Project(vs, p) => project(eval(p, attrs), vs)

    case Join(vs, l, r) => join(vs, eval(l, attrs), eval(r, attrs))

    case Antijoin(vs, l, r) => antijoin(vs, eval(l, attrs), eval(r, attrs))

    case Negate(p) =>
      val rel = eval(p, attrs)
      rel.copy(rows = rel.rows.map { case (r, w) => (r, -w) })

    case Union(vs, ps) =>
      val projected = ps.map(p => project(eval(p, attrs), vs).rows.toSeq)
      NRel(vs, zDistinct(projected.flatten))

    case Filter(fvars, pred, p, consts) =>
      val rel = eval(p, attrs)
      val cond: Row => Boolean = consts.lift(0).flatten match {
        case Some(k) =>
          val i = rel.idx(fvars(0)); row => predHolds(pred, k.native, row(i))
        case None => consts.lift(1).flatten match {
          case Some(k) =>
            val i = rel.idx(fvars(0)); row => predHolds(pred, row(i), k.native)
          case None =>
            val i = rel.idx(fvars(0)); val j = rel.idx(fvars(1))
            row => predHolds(pred, row(i), row(j))
        }
      }
      rel.copy(rows = rel.rows.filter { case (r, _) => cond(r) })

    case Transform(tvars, resultVar, p, fn, consts) =>
      val rel = eval(p, attrs)
      val idxs = tvars.map(rel.idx)
      val constNums: Seq[Long] = consts.flatten.collect { case Value.VNumber(n) => n }
      def longs(row: Row): Option[Seq[Long]] = {
        val ops = idxs.map(row.apply)
        if (ops.contains(null)) None
        else Some(ops.map(_.asInstanceOf[Long]) ++ constNums)
      }
      def f(row: Row): Any = fn match {
        case Fn.ADD => longs(row).map(_.sum).orNull
        case Fn.SUBTRACT =>
          // Minuend doubled then ALL operands (incl. its own occurrence)
          // subtracted — the reference's positional trick
          // (src/plan/transform.rs:146-192), mirrored by the compiler.
          longs(row).map { ops =>
            val minuend = consts.lift(0).flatten match {
              case Some(Value.VNumber(m)) => m
              case _                      => ops.head
            }
            ops.foldLeft(2 * minuend)(_ - _)
          }.orNull
        case Fn.TRUNCATE =>
          val mod = consts.lift(1).flatten match {
            case Some(Value.VString(":minute")) => 60000L
            case Some(Value.VString(":hour"))   => 3600000L
            case Some(Value.VString(":day"))    => 86400000L
            case Some(Value.VString(":week"))   => 604800000L
            case None                           => 3600000L
            case other => sys.error(s"bad TRUNCATE interval $other")
          }
          val t = row(idxs.head)
          if (t == null) null else { val x = t.asInstanceOf[Long]; x - x % mod }
      }
      NRel(rel.vars :+ resultVar, consolidate(rel.rows.toSeq.map {
        case (r, w) => (r :+ f(r), w)
      }))

    case Aggregate(outVars, p, fns, keyVars, aggVars, withVars) =>
      aggregate(eval(p, attrs), outVars, fns, keyVars, aggVars, withVars)

    case Hector(target, bindings) => hector(target, bindings, attrs)

    case PullLevel(_, p, pullVar, pullAttrs, pathAttrs, cardMany) =>
      pullLevel(eval(p, attrs), pullVar, pullAttrs, pathAttrs, cardMany, attrs)

    case Pull(_, paths) =>
      // Heterogeneous-arity paths: the compiled plan packs each into ONE
      // array<variant> column (src/plan/pull.rs:239-284) and the engine
      // UNPACKS it again at collection (`Engine.snapshot` isPathArray) —
      // so the observable tuple IS the path. Rows here may therefore have
      // differing arity inside one relation.
      val unioned = paths.flatMap(p => eval(p, attrs).rows.toSeq)
      NRel(Seq(-1), consolidate(unioned))

    case PullAll(_, pullAttrs) =>
      // [e a v] per listed attribute — src/plan/pull.rs:288-358.
      NRel(Seq(-1, -2, -3), consolidate(pullAttrs.flatMap { a =>
        attrs.getOrElse(a, Map.empty).map { case ((e, v), w) =>
          (Vector[Any](e, a, v), w)
        }
      }))

    case other => sys.error(s"NaiveEval does not support $other")
  }

  /** interleave(values, constants) — the pull path layout
    * (`src/plan/pull.rs:53-79`, `Compiler.pullInterleave`): even slots
    * take the next input column, odd slots the next path attribute. */
  private def interleave(vals: Row, consts: Seq[String]): Row =
    if (vals.isEmpty || consts.isEmpty) vals
    else {
      val out = Vector.newBuilder[Any]
      var (nv, nc) = (0, 0)
      (0 until (vals.size + consts.size)).foreach { i =>
        if (i % 2 == 0) { out += vals(nv); nv += 1 }
        else { out += consts(nc); nc += 1 }
      }
      out.result()
    }

  /** One pull level (`src/plan/pull.rs:94-237`, `Compiler.pullLevel`):
    * per pulled attribute, input rows joined to its (e, v) pairs emit the
    * interleaved path plus `(attribute, value)`; cardinality-one levels
    * drop the trailing child column and add the synthetic db__id branch
    * retaining the child id (`src/plan/pull.rs:211-230`). */
  private def pullLevel(input: NRel, pullVar: Int, pullAttrs: Seq[String],
      pathAttrs: Seq[String], cardMany: Boolean, attrs: Attrs): NRel = {
    if (pullAttrs.isEmpty) {
      if (pathAttrs.isEmpty) input
      else {
        val rows = input.rows.toSeq.map { case (r, w) =>
          (interleave(r, pathAttrs), w)
        }
        val arity = rows.headOption.map(_._1.length)
          .getOrElse(input.vars.length + pathAttrs.length)
        NRel((0 until arity).map(i => -(i + 1)), consolidate(rows))
      }
    } else {
      val eIdx = input.idx(pullVar)
      val keepChild = pathAttrs.isEmpty || cardMany
      val branches = pullAttrs.flatMap { a =>
        val table = attrs.getOrElse(a, Map.empty).toSeq
        input.rows.toSeq.flatMap { case (r, w) =>
          val path = interleave(r, pathAttrs)
          val base = if (keepChild) path else path.dropRight(1)
          table.collect {
            case ((ent, vv), aw) if (ent: Any) == r(eIdx) =>
              (base :+ (a: Any) :+ vv, w * aw)
          }
        }
      }
      val dbId =
        if (keepChild) Seq.empty
        else input.rows.toSeq.map { case (r, w) =>
          val path = interleave(r, pathAttrs)
          (path.dropRight(1) :+ ("db__id": Any) :+ path.last, w)
        }
      val all = branches ++ dbId
      val arity = all.headOption.map(_._1.length).getOrElse(
        (if (keepChild) input.vars.length + pathAttrs.length
         else input.vars.length + pathAttrs.length - 1) + 2)
      NRel((0 until arity).map(i => -(i + 1)), consolidate(all))
    }
  }

  private def aggregate(
      rel: NRel, outVars: Seq[Int], fns: Seq[AggregationFn],
      keyVars: Seq[Int], aggVars: Seq[Int], withVars: Seq[Int]): NRel = {
    import AggregationFn._

    val valueVars = (aggVars ++ withVars).distinct.filterNot(keyVars.contains)
    val pre = project(rel, keyVars ++ valueVars) // consolidates
    val k = keyVars.length
    val withIdx = withVars.map(pre.idx)

    val allWeightSensitive = fns.forall(f => f == COUNT || f == SUM)

    val outRows = pre.rows.toSeq
      .groupBy { case (row, _) => row.take(k) }
      .toSeq.flatMap { case (key, grp) =>
        val positive = grp.filter(_._2 > 0)
        if (positive.isEmpty) None // empty consolidated support: key vanishes
        else {
          val wsum = grp.map(_._2).sum
          if (wsum == 0L && allWeightSensitive) None
          else {
            val aggVals: Seq[Any] = fns.zipWithIndex.map { case (f, i) =>
              val vi = pre.idx(aggVars(i))
              f match {
                case COUNT => if (wsum == 0L) null else wsum
                case SUM =>
                  if (wsum == 0L) null
                  else {
                    val terms = grp.collect {
                      case (row, w) if row(vi) != null =>
                        row(vi).asInstanceOf[Long] * w
                    }
                    if (terms.isEmpty) null else terms.sum
                  }
                case MIN =>
                  val vs = positive.map(_._1(vi)).filter(_ != null)
                  if (vs.isEmpty) null else vs.minBy(identity[Any])(anyOrdering)
                case MAX =>
                  val vs = positive.map(_._1(vi)).filter(_ != null)
                  if (vs.isEmpty) null else vs.maxBy(identity[Any])(anyOrdering)
                case MEDIAN =>
                  // vals[len / 2] of the sorted DISTINCT (value ++ withs)
                  // entries over the positive support (upper median).
                  val entries = positive.map { case (row, _) =>
                    (row(vi) +: withIdx.map(row.apply)).toVector
                  }.distinct.sorted(rowOrdering)
                  if (entries.isEmpty) null else entries(entries.length / 2)(0)
                case AVG =>
                  // Exact rational Σ(v·w) / Σw, gcd-reduced — the
                  // reference's Rational32 (src/plan/aggregate_neu.rs:
                  // 206-215); a zero net count is an ill-formed history
                  // (the engine raises — generators keep weights unit).
                  require(wsum != 0L, "AVG over net count 0")
                  rational(weighted(grp, vi, identity), wsum)
                case VARIANCE =>
                  // (Σv²·w · Σw − (Σv·w)²) / (Σw)² exactly
                  // — src/plan/aggregate_neu.rs:231-239.
                  require(wsum != 0L, "VARIANCE over net count 0")
                  val s = weighted(grp, vi, identity)
                  val ssq = weighted(grp, vi, x => x * x)
                  rational(ssq * wsum - s * s, wsum * wsum)
              }
            }
            // Re-insert at find-clause positions: the i-th aggregation
            // consumes the first unconsumed occurrence of its variable
            // (Compiler.aggregate's output_offsets logic, replicated).
            val work = mutable.ArrayBuffer(outVars.map(Option(_)): _*)
            val posToAgg = mutable.Map.empty[Int, Int]
            for (i <- fns.indices) {
              val pos = work.indexOf(Some(aggVars(i)))
              require(pos >= 0, s"agg var ${aggVars(i)} not in $outVars")
              work(pos) = None
              posToAgg(pos) = i
            }
            val row = outVars.indices.map { j =>
              posToAgg.get(j) match {
                case Some(i) => aggVals(i)
                case None    => key(keyVars.indexOf(outVars(j)))
              }
            }.toVector
            Some((row, 1L))
          }
        }
      }
    NRel(outVars, consolidate(outRows))
  }

  private def weighted(grp: Seq[(Row, Long)], vi: Int, f: Long => Long): Long =
    grp.collect { case (row, w) if row(vi) != null =>
      f(row(vi).asInstanceOf[Long]) * w
    }.sum

  /** gcd-reduced, positive-denominator rational as Seq(num, den) — the
    * engine's `Compiler.rationalizeUdf` output after native decode. */
  private def rational(num: Long, den: Long): Any = {
    @annotation.tailrec
    def gcd(a: Long, b: Long): Long = if (b == 0) a else gcd(b, a % b)
    val sign = if (den < 0) -1L else 1L
    val g = gcd(math.abs(num), math.abs(den))
    val gg = if (g == 0) 1L else g
    Seq(sign * num / gg, sign * den / gg)
  }

  private val anyOrdering: Ordering[Any] =
    (a: Any, b: Any) => (a, b) match {
      case (null, null) => 0
      case (null, _)    => -1 // nulls first (defensive; unreachable in fuzz)
      case (_, null)    => 1
      case _            => cmpNative(a, b).get
    }

  private val rowOrdering: Ordering[Row] = (x: Row, y: Row) => {
    val it = x.iterator.zip(y.iterator)
    var r = 0
    while (r == 0 && it.hasNext) { val (a, b) = it.next(); r = anyOrdering.compare(a, b) }
    if (r != 0) r else x.length - y.length
  }

  private def hector(target: Seq[Int], bindings: Seq[Binding], attrs: Attrs): NRel = {
    val attrBs = bindings.collect { case a: Binding.Attr => a }
    val notBs = bindings.collect { case Binding.Not(a: Binding.Attr) => a }
    val constOf: Map[Int, Value] =
      bindings.collect { case Binding.Const(x, v) => x -> v }.toMap
    val preds = bindings.collect { case b: Binding.BinaryPred => b }
    require(attrBs.nonEmpty, "Hector requires at least one attribute binding")

    def scan(a: Binding.Attr): NRel = {
      var data = attrs.getOrElse(a.a, Map.empty).toSeq
      constOf.get(a.e).foreach(c => data = data.filter(_._1._1 == c.native))
      constOf.get(a.v).foreach(c => data = data.filter(_._1._2 == c.native))
      if (a.e == a.v)
        NRel(Seq(a.e), consolidate(data.collect {
          case ((ent, vv), w) if vv == (ent: Any) => (Vector[Any](ent), w)
        }))
      else
        NRel(Seq(a.e, a.v), consolidate(data.map { case ((ent, vv), w) =>
          (Vector[Any](ent, vv), w)
        }))
    }

    // Join order is irrelevant to the result (multiset equijoin algebra is
    // associative-commutative; predicates/filters commute with joins), so
    // fold in listed order and apply predicates at the end.
    var rel = scan(attrBs.head)
    var remaining = attrBs.tail
    while (remaining.nonEmpty) {
      val next = remaining
        .find(a => rel.vars.contains(a.e) || rel.vars.contains(a.v))
        .getOrElse(remaining.head) // disconnected => cross product
      val nextRel = scan(next)
      val shared = nextRel.vars.filter(rel.vars.contains)
      rel = join(shared, rel, nextRel)
      remaining = remaining.filterNot(_ eq next)
    }

    preds.foreach { p =>
      def operand(v: Int): Row => Any =
        if (rel.vars.contains(v)) { val i = rel.idx(v); row => row(i) }
        else constOf.get(v) match {
          case Some(c) => val n = c.native; _ => n
          case None => sys.error(s"predicate over unbound variable $v")
        }
      val (ox, oy) = (operand(p.x), operand(p.y))
      rel = rel.copy(rows = rel.rows.filter { case (row, _) =>
        predHolds(p.predicate, ox(row), oy(row))
      })
    }

    notBs.foreach { nb =>
      val notRel = scan(nb)
      val shared = notRel.vars.filter(rel.vars.contains)
      require(shared.nonEmpty, "Not binding shares no variable with prefix")
      val exclude = zDistinct(project(notRel, shared).rows)
        .keySet.filterNot(_.contains(null))
      val si = shared.map(rel.idx)
      rel = rel.copy(rows = rel.rows.filter { case (row, _) =>
        val key = si.map(row.apply).toVector
        key.contains(null) || !exclude.contains(key)
      })
    }

    // Target vars bound only by a Const binding become literal columns.
    val constOnly = target.filterNot(rel.vars.contains).filter(constOf.contains)
    if (constOnly.nonEmpty) {
      val lits = constOnly.map(v => constOf(v).native)
      rel = NRel(rel.vars ++ constOnly,
        rel.rows.map { case (r, w) => (r ++ lits, w) })
    }

    project(rel, target)
  }
}
