package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders, Row}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types.{LongType, StructField, StructType}

import graft.model._
import graft.model.{Plan => P}
import graft.model.ValueKind._

/** A generic tuple update flowing through the streaming plan compiler:
  * `key` is the current operator's grouping key (recomputed before each
  * stateful step), `tuple` the positional variable values (native types),
  * `t` the event time and `diff` the multiplicity. */
final case class SUpd(key: String, tuple: Vector[Any], t: Long, diff: Long)

/** Compiles the monotone core of the `Plan` algebra to ONE composed
  * Structured Streaming query over per-attribute diff streams, emitting
  * exact `(tuple, t, diff)` rows — retractions included — with no
  * driver-side snapshot diffing. The general-plan analog of the proven
  * single-operator streams in [[DatomStreams]] (delta-join, incremental
  * aggregate, distinct), which it generalizes from entity-keyed typed
  * streams to arbitrary key positions over untyped tuples.
  *
  * Streamable subset (README "streaming" section):
  *  - `MatchA` / `MatchEA` / `MatchAV` over a registered source stream;
  *  - `Project`, `Filter` (all six predicates, const or var operands),
  *    `Transform` (ADD / SUBTRACT / TRUNCATE) — stateless, map diffs 1:1;
  *  - `Negate` — flips diffs;
  *  - `Join` — incremental delta join with keyed two-sided multiset state
  *    (`Δ(L⋈R) = ΔL⋈R ∪ L⋈ΔR ∪ ΔL⋈ΔR`);
  *  - `Antijoin` — keyed left-tuple supports + right key presence, with
  *    presence transitions retracting/asserting every live left tuple;
  *  - `Union` — branch union + keyed set-distinct (matching the
  *    reference's `concat.distinct()`, `src/plan/union.rs:73-77`);
  *  - `Aggregate` with ALL seven functions: COUNT/SUM (diff-monoid keyed
  *    state), AVG/VARIANCE (exact gcd-reduced rationals from (s, ssq, cnt)
  *    state), MIN/MAX/MEDIAN (per-key value-multiset state, order
  *    statistics over the positive-support set, MEDIAN over distinct
  *    (value ++ :with) tuples), emitting retract+assert pairs
  *    (`src/plan/aggregate_neu.rs:108-243`);
  *  - `Hector` conjunctions — lowered to a connected Join/Filter/Antijoin
  *    chain over the attribute bindings (Const vars as EQ filters or
  *    predicate literals, `Not` attribute bindings as antijoins).
  *
  * NOT streamable here (use the batch engine): recursion (`NameExpr`
  * fixpoints) and Pull/PullAll/GraphQl — iteration and heterogeneous path
  * arity need the batch engine. Per-batch emissions are consolidated per
  * (tuple, time), so transient assert+retract pairs inside one batch
  * cancel exactly as differential consolidates. When the engine splits
  * one logical write across micro-batch triggers, diffs at one time can
  * span batches as a net-zero assert/retract transient — sound for a diff
  * stream; consumers wanting the reference's frontier-consolidated
  * delivery consolidate per (tuple, time) at their step boundary (the
  * reference's `relation.consolidate()` before delivery does the same).
  * (Rational outputs are terminal: don't key a downstream distinct/join
  * on them.)
  *
  * Sources are streaming DataFrames with columns `(e, v, t, diff)` — from
  * [[graft.sources.FileSources]], a Kafka reader, or a MemoryStream —
  * optionally pre-wrapped with [[DatomStreams.distinctSet]] /
  * [[DatomStreams.lastWriteWins]] for non-Raw input semantics.
  */
object StreamCompiler extends Serializable {

  /** Consolidate one batch's emissions per (tuple, time) — transient
    * assert+retract pairs at the same timestamp cancel, as differential
    * consolidates each batch (`src/lib.rs:1012-1016`). */
  private[streaming] def consolidated(
      out: scala.collection.Seq[SUpd]): Iterator[SUpd] =
    out.groupBy(u => (u.tuple, u.t)).iterator.flatMap { case ((tuple, t), us) =>
      val d = us.map(_.diff).sum
      if (d == 0L) None else Some(SUpd("", tuple, t, d))
    }

  /** Exact gcd-reduced rational as a (num, den) row — matches the batch
    * path's `rationalizeUdf` normalization (positive denominator). */
  private[streaming] def rationalRow(num: Long, den: Long): Row = {
    val sign = if (den < 0) -1L else 1L
    @annotation.tailrec
    def gcd(a: Long, b: Long): Long = if (b == 0) a else gcd(b, a % b)
    val g = gcd(math.abs(num), math.abs(den))
    val gg = if (g == 0) 1L else g
    Row(sign * num / gg, sign * den / gg)
  }

  /** Type-tagged, length-prefixed lossless key for a set of tuple
    * positions: "1" the string never collides with 1 the number, and
    * adjacent values can never be re-segmented into a colliding key. */
  private[streaming] def keyOf(tuple: Vector[Any], idxs: Seq[Int]): String =
    idxs.map { i =>
      val body = tuple(i) match {
        case null       => "?"
        case n: Long    => s"n$n"
        case s: String  => s"s$s"
        case b: Boolean => s"b$b"
        case d: Double  => s"d$d"
        case other      => s"x$other"
      }
      s"${body.length}:$body"
    }.mkString

  private[streaming] def asLong(v: Any): Long = v match {
    case n: Long => n
    case i: Int  => i.toLong
    case other   => sys.error(s"expected a number, got $other")
  }

  private[streaming] def cmp(pred: Predicate, a: Any, b: Any): Boolean = {
    val c = (a, b) match {
      case (x: Long, y: Long)       => java.lang.Long.compare(x, y)
      case (x: Double, y: Double)   => java.lang.Double.compare(x, y)
      case (x: Long, y: Double)     => java.lang.Double.compare(x.toDouble, y)
      case (x: Double, y: Long)     => java.lang.Double.compare(x, y.toDouble)
      case (x: String, y: String)   => x.compareTo(y)
      case (x: Boolean, y: Boolean) => java.lang.Boolean.compare(x, y)
      case other => sys.error(s"incomparable operands: $other")
    }
    pred match {
      case Predicate.LT  => c < 0
      case Predicate.GT  => c > 0
      case Predicate.LTE => c <= 0
      case Predicate.GTE => c >= 0
      case Predicate.EQ  => c == 0
      case Predicate.NEQ => c != 0
    }
  }
}

class StreamCompiler(
    sources: Map[String, DataFrame],
    sourceKinds: Map[String, ValueKind]) {

  import StreamCompiler.{asLong, cmp, keyOf}

  private implicit val updEnc: Encoder[SUpd] = Encoders.kryo[SUpd]
  private implicit val keyEnc: Encoder[String] = Encoders.STRING
  private implicit val cntEnc: Encoder[Long] = Encoders.scalaLong

  private final case class SRel(vars: Seq[Int], kinds: Seq[ValueKind], ds: Dataset[SUpd],
      // Pull paths with heterogeneous arity pack each tuple into ONE
      // array<variant> element (mirrors Rel.isPathArray on the batch side).
      isPathArray: Boolean = false) {
    def idx(v: Int): Int = {
      val i = vars.indexOf(v)
      require(i >= 0, s"variable $v not bound by stream over $vars")
      i
    }
  }

  // ------------------------------------------------------------- compile

  /** Compile to a streaming DataFrame with columns `c0..cn, t, diff`. */
  def compileToFrame(plan: Plan): DataFrame = {
    val rel = compile(plan)
    val fields = rel.kinds.zipWithIndex.map { case (k, i) =>
      val dt = if (rel.isPathArray)
        org.apache.spark.sql.types.ArrayType(graft.model.Variant.schema)
      else k.dataType
      StructField(s"c$i", dt, nullable = true)
    } ++ Seq(StructField("t", LongType, false), StructField("diff", LongType, false))
    val schema = StructType(fields)
    rel.ds.map(u => Row.fromSeq(u.tuple :+ u.t :+ u.diff))(Encoders.row(schema))
  }

  private def compile(plan: Plan): SRel = plan match {

    case P.MatchA(e, a, v) =>
      val src = sourceFrame(a)
      require(e != v, "MatchA(e, a, e) is not supported on streams")
      SRel(Seq(e, v), Seq(KEid, kindOf(a)), src)

    case P.MatchEA(eid, a, v) =>
      val src = sourceFrame(a)
      SRel(Seq(v), Seq(kindOf(a)),
        src.filter(_.tuple(0) == eid).map(u => u.copy(tuple = Vector(u.tuple(1)))))

    case P.MatchAV(e, a, value) =>
      val src = sourceFrame(a)
      val native = value.native
      SRel(Seq(e), Seq(KEid),
        src.filter(_.tuple(1) == native).map(u => u.copy(tuple = Vector(u.tuple(0)))))

    case P.Project(vs, p) =>
      val rel = compile(p)
      val idxs = vs.map(rel.idx)
      SRel(vs, idxs.map(rel.kinds), rel.ds.map(u =>
        u.copy(tuple = idxs.map(u.tuple).toVector)))

    case P.Negate(p) =>
      val rel = compile(p)
      rel.copy(ds = rel.ds.map(u => u.copy(diff = -u.diff)))

    case P.Filter(fvars, pred, p, consts) =>
      val rel = compile(p)
      val leftConst = consts.lift(0).flatten.map(_.native)
      val rightConst = consts.lift(1).flatten.map(_.native)
      val i0 = rel.idx(fvars(0))
      val cond: Vector[Any] => Boolean = (leftConst, rightConst) match {
        case (Some(k), _) => tup => cmp(pred, k, tup(i0))
        case (_, Some(k)) => tup => cmp(pred, tup(i0), k)
        case _ =>
          val i1 = rel.idx(fvars(1))
          tup => cmp(pred, tup(i0), tup(i1))
      }
      rel.copy(ds = rel.ds.filter(u => cond(u.tuple)))

    case P.Transform(tvars, resultVar, p, fn, consts) =>
      val rel = compile(p)
      val idxs = tvars.map(rel.idx)
      val constNums = consts.flatten.collect { case Value.VNumber(n) => n }
      val (f, kind): (Vector[Any] => Any, ValueKind) = fn match {
        case Fn.ADD =>
          (tup => idxs.map(i => asLong(tup(i))).sum + constNums.sum, KNumber)
        case Fn.SUBTRACT =>
          // Double-then-subtract-all, as the reference and the batch path
          // (src/plan/transform.rs:146-192).
          val minuendConst = consts.lift(0).flatten.collect { case Value.VNumber(m) => m }
          (tup => {
            val minuend = minuendConst.getOrElse(asLong(tup(idxs.head)))
            2 * minuend - idxs.map(i => asLong(tup(i))).sum - constNums.sum
          }, KNumber)
        case Fn.TRUNCATE =>
          val interval = consts.lift(1).flatten match {
            case Some(Value.VString(s)) => s
            case None                   => ":hour"
            case other => sys.error(s"TRUNCATE interval must be a string, got $other")
          }
          val modVal = interval match {
            case ":minute" => 60000L
            case ":hour"   => 3600000L
            case ":day"    => 86400000L
            case ":week"   => 604800000L
            case other     => sys.error(s"unknown TRUNCATE interval $other")
          }
          (tup => { val t = asLong(tup(idxs.head)); t - (t % modVal) }, KInstant)
      }
      SRel(rel.vars :+ resultVar, rel.kinds :+ kind,
        rel.ds.map(u => u.copy(tuple = u.tuple :+ f(u.tuple))))

    case P.Union(vs, ps) =>
      val projected = ps.map(p => compile(P.Project(vs, p)))
      val all = projected.map(_.ds).reduce(_ union _)
      // `concat.distinct()` — keyed support state over the whole tuple.
      projected.head.copy(ds = distinctTuples(all))

    case P.Join(target, l, r) =>
      val lr = compile(l)
      val rr = compile(r)
      joinRels(target, lr, rr)

    case P.Aggregate(outVars, p, fns, keyVars, aggVars, withVars) =>
      aggregateRel(compile(p), outVars, fns, keyVars, aggVars, withVars)

    case P.Antijoin(target, l, r) =>
      antijoinRels(target, compile(l), compile(r))

    case P.Hector(vs, bindings) =>
      compile(lowerHector(vs, bindings))

    case P.PullLevel(_, p, pullVar, pullAttrs, pathAttrs, cardMany) =>
      pullLevelRel(compile(p), pullVar, pullAttrs, pathAttrs, cardMany)

    case P.Pull(_, paths) =>
      // Heterogeneous-arity path union: pack each tuple into one
      // array<variant> element before the union (mirrors the batch
      // compiler / src/plan/pull.rs:239-284); multiset — no distinct.
      val packed = paths.map { p =>
        val rel = compile(p)
        val kinds = rel.kinds
        rel.ds.map { u =>
          val arr: Seq[Row] = u.tuple.toSeq.zip(kinds).map { case (x, k) =>
            Variant.rowOfNative(x, k)
          }
          u.copy(tuple = Vector(arr))
        }
      }
      SRel(Seq(-1), Seq(KVariant), packed.reduce(_ union _), isPathArray = true)

    case P.PullAll(_, pullAttrs) =>
      // [e a v] for every attribute — src/plan/pull.rs:288-358.
      val branches = pullAttrs.map { a =>
        val k = kindOf(a)
        sourceFrame(a).map(u => u.copy(tuple =
          Vector(u.tuple(0), a, Variant.rowOfNative(u.tuple(1), k))))
      }
      SRel(Seq(-1, -2, -3), Seq(KEid, KAid, KVariant),
        branches.reduce(_ union _))

    case other =>
      sys.error(s"plan not streamable (see StreamCompiler docs): $other")
  }

  /** Streaming PullLevel, mirroring the batch lowering
    * (`Compiler.pullLevel`, reference `src/plan/pull.rs:94-237`): one
    * incremental join per pulled attribute — the stream analog of the
    * reference's arrangement-per-attribute — then a stateless map to the
    * interleaved path shape `(parent path…, attr-name, variant value)`,
    * plus the synthetic `db__id` branch when a path prefix exists and
    * cardinality is one. Branch outputs union WITHOUT distinct (pull is
    * multiset; weights multiplied by the join). */
  private def pullLevelRel(input: SRel, pullVar: Int, pullAttrs: Seq[String],
      pathAttrs: Seq[String], cardMany: Boolean): SRel = {
    // interleave(values, constants) — src/plan/pull.rs:53-79.
    def interleave[A](vals: Seq[A], consts: Seq[A]): Seq[A] =
      if (vals.isEmpty || consts.isEmpty) vals
      else {
        val out = scala.collection.mutable.ArrayBuffer.empty[A]
        var (nv, nc) = (0, 0)
        (0 until vals.size + consts.size).foreach { i =>
          if (i % 2 == 0) { out += vals(nv); nv += 1 }
          else { out += consts(nc); nc += 1 }
        }
        out.toSeq
      }
    // Slots address the INPUT tuple: Left(position) or Right(constant).
    val slots: Seq[Either[Int, String]] = interleave(
      input.vars.indices.map(Left(_)), pathAttrs.map(Right(_)))
    val slotKinds: Seq[ValueKind] = interleave(
      input.kinds, pathAttrs.map(_ => KAid: ValueKind))

    if (pullAttrs.isEmpty) {
      if (pathAttrs.isEmpty) input
      else SRel(
        slots.indices.map(i => -(i + 1)), slotKinds,
        input.ds.map(u => u.copy(tuple = slots.map {
          case Left(i)  => u.tuple(i)
          case Right(s) => s
        }.toVector)))
    } else {
      val baseSlots = if (pathAttrs.isEmpty || cardMany) slots else slots.dropRight(1)
      val baseKinds = (if (pathAttrs.isEmpty || cardMany) slotKinds
                       else slotKinds.dropRight(1))
      val outKinds = baseKinds ++ Seq(KAid, KVariant)
      val outVars = outKinds.indices.map(i => -(i + 1))

      val branches: Seq[Dataset[SUpd]] = pullAttrs.zipWithIndex.map { case (a, bi) =>
        val fv = Int.MinValue / 2 - bi // fresh var, collision-free
        val attrRel = SRel(Seq(pullVar, fv), Seq(KEid, kindOf(a)), sourceFrame(a))
        val joined = joinRels(Seq(pullVar), input, attrRel)
        val basePos: Seq[Either[Int, String]] = baseSlots.map {
          case Left(i)  => Left(joined.idx(input.vars(i)))
          case Right(s) => Right(s)
        }
        val vPos = joined.idx(fv)
        val vKind = kindOf(a)
        joined.ds.map { u =>
          val base = basePos.map {
            case Left(i)  => u.tuple(i)
            case Right(s) => s
          }
          u.copy(tuple =
            (base :+ (a: Any) :+ (Variant.rowOfNative(u.tuple(vPos), vKind): Any)).toVector)
        }
      }
      val withDbId: Seq[Dataset[SUpd]] =
        if (pathAttrs.isEmpty || cardMany) branches
        else {
          // Synthetic db__id rows retain the child eid — src/plan/pull.rs:211-230.
          val eidSlot = slots.last
          val eidKind = slotKinds.last
          branches :+ input.ds.map { u =>
            val base = baseSlots.map {
              case Left(i)  => u.tuple(i)
              case Right(s) => s
            }
            val eidVariant = eidSlot match {
              case Left(i)  => Variant.rowOfNative(u.tuple(i), eidKind)
              case Right(s) => Variant.rowOfNative(s, KAid)
            }
            u.copy(tuple =
              (base :+ ("db__id": Any) :+ (eidVariant: Any)).toVector)
          }
        }
      SRel(outVars, outKinds, withDbId.reduce(_ union _))
    }
  }

  /** Lower a Hector conjunction to a Join/Filter chain for streaming:
    * attribute bindings become MatchA scans joined on shared variables
    * (connected order), Const bindings become EQ filters over bound
    * variables, BinaryPred bindings become Filters, and a Not over an
    * attribute binding becomes an Antijoin. Unsupported on streams:
    * const-only output variables and disconnected binding groups (a
    * cartesian product) — both fail loudly. */
  private def lowerHector(vs: Seq[Int], bindings: Seq[Binding]): Plan = {
    val attrs = bindings.collect { case a: Binding.Attr => a }
    val consts = bindings.collect { case c: Binding.Const => c }
    val preds = bindings.collect { case p: Binding.BinaryPred => p }
    val nots = bindings.collect { case n: Binding.Not => n }
    require(attrs.nonEmpty, "streaming Hector needs at least one attribute binding")

    // Connected join order over attribute bindings.
    val remaining = scala.collection.mutable.ArrayBuffer(attrs.tail: _*)
    var plan: Plan = P.MatchA(attrs.head.e, attrs.head.a, attrs.head.v)
    var bound = Set(attrs.head.e, attrs.head.v)
    while (remaining.nonEmpty) {
      val i = remaining.indexWhere(a => bound(a.e) || bound(a.v))
      require(i >= 0,
        s"streaming Hector requires a connected binding graph, got $bindings")
      val a = remaining.remove(i)
      val shared = Seq(a.e, a.v).filter(bound).distinct
      plan = P.Join(shared, plan, P.MatchA(a.e, a.a, a.v))
      bound ++= Seq(a.e, a.v)
    }
    // Attribute-bound Const vars filter directly; const-ONLY vars may feed
    // predicates as literal operands (the reference's const-then-predicate
    // idiom) but cannot appear in the output on a stream.
    val constMap = consts.map(c => c.variable -> c.value).toMap
    consts.filter(c => bound(c.variable)).foreach { c =>
      plan = P.Filter(Seq(c.variable), Predicate.EQ, plan, Seq(None, Some(c.value)))
    }
    consts.filterNot(c => bound(c.variable)).foreach { c =>
      require(!vs.contains(c.variable),
        s"streaming Hector cannot bind output variable ${c.variable} by constant only")
    }
    preds.foreach { p =>
      (bound(p.x), bound(p.y)) match {
        case (true, true) =>
          plan = P.Filter(Seq(p.x, p.y), p.predicate, plan, Seq(None, None))
        case (true, false) =>
          val k = constMap.getOrElse(p.y, sys.error(s"predicate over unbound variable in $p"))
          plan = P.Filter(Seq(p.x), p.predicate, plan, Seq(None, Some(k)))
        case (false, true) =>
          val k = constMap.getOrElse(p.x, sys.error(s"predicate over unbound variable in $p"))
          plan = P.Filter(Seq(p.y), p.predicate, plan, Seq(Some(k), None))
        case _ => sys.error(s"predicate over unbound variables in $p")
      }
    }
    nots.foreach {
      case Binding.Not(a: Binding.Attr) =>
        val shared = Seq(a.e, a.v).filter(bound).distinct
        require(shared.nonEmpty, s"negation shares no variable with the query: $a")
        plan = P.Antijoin(shared, plan,
          P.Project(shared, P.MatchA(a.e, a.a, a.v)))
      case other => sys.error(s"streaming Hector cannot negate $other")
    }
    P.Project(vs, plan)
  }

  // ------------------------------------------------------------- sources

  private def sourceFrame(a: String): Dataset[SUpd] = {
    val df = sources.getOrElse(a, sys.error(s"no source stream for attribute $a"))
    df.selectExpr("e", "v", "t", "diff").map { row =>
      SUpd("", Vector(row.get(0), row.get(1)), row.getLong(2), row.getLong(3))
    }
  }

  private def kindOf(a: String): ValueKind = sourceKinds.getOrElse(a, KString)

  // ----------------------------------------------------------- operators

  /** Set-distinct over whole tuples: +1 when support first turns positive,
    * -1 when it returns to zero (generalizes [[DatomStreams.distinctSet]]). */
  private def distinctTuples(ds: Dataset[SUpd]): Dataset[SUpd] =
    ds.map(u => u.copy(key = keyOf(u.tuple, u.tuple.indices)))
      .groupByKey(_.key)
      .flatMapGroupsWithState[Long, SUpd](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (_: String, it: Iterator[SUpd], state: GroupState[Long]) =>
          var support = state.getOption.getOrElse(0L)
          val out = scala.collection.mutable.ArrayBuffer.empty[SUpd]
          it.toSeq.sortBy(_.t).foreach { u =>
            val before = support
            support += u.diff
            if (before <= 0 && support > 0) out += u.copy(diff = 1L)
            else if (before > 0 && support <= 0) out += u.copy(diff = -1L)
          }
          state.update(support)
          StreamCompiler.consolidated(out)
      }

  /** Incremental equijoin on `target`: keyed two-sided (restTuple → weight)
    * multiset state, emitting the delta cross-product with multiplied
    * weights (generalizes [[DatomStreams.joinDiffs]] to arbitrary keys and
    * arities). Output layout matches the batch join: key ++ lRest ++ rRest. */
  private def joinRels(target: Seq[Int], l: SRel, r: SRel): SRel = {
    val lRest = l.vars.distinct.filterNot(target.contains)
    val rRest = r.vars.distinct.filterNot(target.contains)
    val outVars = target ++ lRest ++ rRest
    val outKinds = target.map(v => l.kinds(l.idx(v))) ++
      lRest.map(v => l.kinds(l.idx(v))) ++ rRest.map(v => r.kinds(r.idx(v)))

    val lKeyIdx = target.map(l.idx)
    val lRestIdx = lRest.map(l.idx)
    val rKeyIdx = target.map(r.idx)
    val rRestIdx = rRest.map(r.idx)

    // One grouping key per join key; the side tag rides in the tuple's
    // first slot, key values next, rest values after (rest multisets live
    // in state).
    val byKey =
      l.ds.map(u => SUpd(keyOf(u.tuple, lKeyIdx),
        ("l": Any) +: (lKeyIdx.map(u.tuple).toVector ++ lRestIdx.map(u.tuple)),
        u.t, u.diff)) union
      r.ds.map(u => SUpd(keyOf(u.tuple, rKeyIdx),
        ("r": Any) +: (rKeyIdx.map(u.tuple).toVector ++ rRestIdx.map(u.tuple)),
        u.t, u.diff))

    implicit val stateEnc: Encoder[(Map[Vector[Any], Long], Map[Vector[Any], Long])] =
      Encoders.kryo[(Map[Vector[Any], Long], Map[Vector[Any], Long])]

    val nKey = target.length
    val joined = byKey
      .groupByKey(_.key)
      .flatMapGroupsWithState[(Map[Vector[Any], Long], Map[Vector[Any], Long]), SUpd](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (_: String, it: Iterator[SUpd],
            state: GroupState[(Map[Vector[Any], Long], Map[Vector[Any], Long])]) =>
          var (ls, rs) = state.getOption
            .getOrElse((Map.empty[Vector[Any], Long], Map.empty[Vector[Any], Long]))
          val out = scala.collection.mutable.ArrayBuffer.empty[SUpd]
          it.toSeq.sortBy(_.t).foreach { u =>
            val side = u.tuple.head
            val keyVals = u.tuple.slice(1, 1 + nKey)
            val rest = u.tuple.drop(1 + nKey)
            if (side == "l") {
              rs.foreach { case (rRestVals, wb) =>
                val d = u.diff * wb
                if (d != 0L) out += SUpd("", keyVals ++ rest ++ rRestVals, u.t, d)
              }
              val nw = ls.getOrElse(rest, 0L) + u.diff
              ls = if (nw == 0L) ls - rest else ls.updated(rest, nw)
            } else {
              ls.foreach { case (lRestVals, wa) =>
                val d = wa * u.diff
                if (d != 0L) out += SUpd("", keyVals ++ lRestVals ++ rest, u.t, d)
              }
              val nw = rs.getOrElse(rest, 0L) + u.diff
              rs = if (nw == 0L) rs - rest else rs.updated(rest, nw)
            }
          }
          state.update((ls, rs))
          StreamCompiler.consolidated(out)
      }
    SRel(outVars, outKinds, joined)
  }

  /** Keyed diff-monoid aggregation (COUNT / SUM per function): state holds
    * per-key sums and support; each changed batch retracts the previous
    * output tuple and asserts the new one. Output offsets match the batch
    * aggregate (results re-inserted at their find positions). */
  /** Keyed aggregation with full batch parity minus nothing: COUNT/SUM
    * fold in the diff monoid; AVG/VARIANCE keep (s, ssq, cnt) and emit
    * exact gcd-reduced rationals (`src/plan/aggregate_neu.rs:206-239`);
    * MIN/MAX/MEDIAN keep the per-key value multiset and recompute the
    * order statistic over the positive-support set, MEDIAN over distinct
    * (value ++ :with) tuples (`aggregate_neu.rs:130-164`). Each changed
    * batch retracts the previous output tuple and asserts the new one;
    * keys whose support empties retract without re-asserting. Output
    * offsets match the batch aggregate. */
  private def aggregateRel(
      rel: SRel, outVars: Seq[Int], fns: Seq[AggregationFn],
      keyVars: Seq[Int], aggVars: Seq[Int], withVars: Seq[Int]): SRel = {
    import AggregationFn._
    val keyIdx = keyVars.map(rel.idx)
    val aggIdx = aggVars.map(rel.idx)
    val withIdx = withVars.map(rel.idx)

    // Output slots: each aggregation consumes the first unconsumed
    // occurrence of its variable (aggregate_neu.rs:108-120).
    val work = scala.collection.mutable.ArrayBuffer(outVars.map(Option(_)): _*)
    val posToAgg = scala.collection.mutable.Map.empty[Int, Int]
    for (i <- fns.indices) {
      val pos = work.indexOf(Some(aggVars(i)))
      require(pos >= 0, s"aggregation variable ${aggVars(i)} not in output $outVars")
      work(pos) = None
      posToAgg(pos) = i
    }
    val slots: Seq[Either[Int, Int]] = outVars.indices.map { j =>
      posToAgg.get(j).map(Right(_)).getOrElse(Left(keyVars.indexOf(outVars(j))))
    }
    val outKinds = slots.map {
      case Left(k)  => rel.kinds(keyIdx(k))
      case Right(i) => fns(i) match {
        case COUNT | SUM     => KNumber
        case AVG | VARIANCE  => KRational
        case _               => rel.kinds(aggIdx(i))
      }
    }

    // Per-fn scalar state (s, ssq, cnt) + per-fn value multiset
    // (MIN/MAX key on value; MEDIAN on value ++ withs) + net support.
    type AggState = (Vector[(Long, Long, Long)], Vector[Map[Vector[Any], Long]], Long)
    implicit val stateEnc: Encoder[AggState] = Encoders.kryo[AggState]
    val lt: (Any, Any) => Boolean = StreamCompiler.cmp(Predicate.LT, _, _)
    def ltVec(a: Vector[Any], b: Vector[Any]): Boolean = {
      val n = math.min(a.length, b.length)
      var i = 0
      while (i < n) {
        if (lt(a(i), b(i))) return true
        if (lt(b(i), a(i))) return false
        i += 1
      }
      a.length < b.length
    }

    val keyed = rel.ds.map(u => u.copy(key = keyOf(u.tuple, keyIdx)))
    val out = keyed
      .groupByKey(_.key)
      .flatMapGroupsWithState[AggState, SUpd](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (_: String, it: Iterator[SUpd], state: GroupState[AggState]) =>
          val updates = it.toSeq.sortBy(_.t)
          val keyVals = keyIdx.map(updates.head.tuple).toVector
          val (oldSums, oldSets, oldSupport) = state.getOption.getOrElse(
            (Vector.fill(fns.length)((0L, 0L, 0L)),
              Vector.fill(fns.length)(Map.empty[Vector[Any], Long]), 0L))
          var sums = oldSums
          var sets = oldSets
          var support = oldSupport
          var tMax = Long.MinValue
          updates.foreach { u =>
            fns.indices.foreach { i =>
              val (s0, q0, c0) = sums(i)
              fns(i) match {
                case COUNT => sums = sums.updated(i, (s0, q0, c0 + u.diff))
                case SUM =>
                  val v = asLong(u.tuple(aggIdx(i)))
                  sums = sums.updated(i, (s0 + v * u.diff, q0, c0))
                case AVG | VARIANCE =>
                  val v = asLong(u.tuple(aggIdx(i)))
                  sums = sums.updated(i,
                    (s0 + v * u.diff, q0 + v * v * u.diff, c0 + u.diff))
                case _ =>
                  val entry: Vector[Any] = fns(i) match {
                    case MEDIAN => u.tuple(aggIdx(i)) +: withIdx.map(u.tuple).toVector
                    case _      => Vector(u.tuple(aggIdx(i)))
                  }
                  val nw = sets(i).getOrElse(entry, 0L) + u.diff
                  sets = sets.updated(i,
                    if (nw == 0L) sets(i) - entry else sets(i).updated(entry, nw))
              }
            }
            support += u.diff
            if (u.t > tMax) tMax = u.t
          }
          state.update((sums, sets, support))
          def aggValue(ss: Vector[(Long, Long, Long)],
              ms: Vector[Map[Vector[Any], Long]], i: Int): Any = {
            val (sv, qv, cv) = ss(i)
            fns(i) match {
              case COUNT    => cv
              case SUM      => sv
              case AVG      => StreamCompiler.rationalRow(sv, cv)
              case VARIANCE => StreamCompiler.rationalRow(qv * cv - sv * sv, cv * cv)
              case f =>
                val entries = ms(i).collect { case (v, w) if w > 0 => v }.toSeq
                if (entries.isEmpty) null
                else f match {
                  case MIN => entries.map(_.head).reduce((a, b) => if (lt(a, b)) a else b)
                  case MAX => entries.map(_.head).reduce((a, b) => if (lt(a, b)) b else a)
                  case _ => // MEDIAN: sorted distinct (value ++ withs), [len/2]
                    val sorted = entries.sortWith(ltVec)
                    sorted(sorted.length / 2).head
                }
            }
          }
          def tupleOf(ss: Vector[(Long, Long, Long)],
              ms: Vector[Map[Vector[Any], Long]]): Vector[Any] =
            slots.map {
              case Left(k)  => keyVals(k)
              case Right(i) => aggValue(ss, ms, i)
            }.toVector
          val out = scala.collection.mutable.ArrayBuffer.empty[SUpd]
          val before = tupleOf(oldSums, oldSets)
          val after = tupleOf(sums, sets)
          if (before != after || (support > 0L) != (oldSupport > 0L)) {
            if (oldSupport > 0L) out += SUpd("", before, tMax, -1L)
            if (support > 0L) out += SUpd("", after, tMax, 1L)
          }
          out.iterator
      }
    SRel(outVars, outKinds, out)
  }

  /** Incremental antijoin on `target`: keyed state holds the left side's
    * distinct rest-tuple supports and the right side's key presence; right
    * presence transitions retract/assert every live left tuple for the key
    * (`src/plan/antijoin.rs:95-98` semantics — both sides distinct-ed,
    * output = key ++ leftRest at weight 1). */
  private def antijoinRels(target: Seq[Int], l: SRel, r: SRel): SRel = {
    val lRest = l.vars.distinct.filterNot(target.contains)
    val outVars = target ++ lRest
    val outKinds = target.map(v => l.kinds(l.idx(v))) ++
      lRest.map(v => l.kinds(l.idx(v)))
    val lKeyIdx = target.map(l.idx)
    val lRestIdx = lRest.map(l.idx)
    val rKeyIdx = target.map(r.idx)
    val rRestIdx = r.vars.distinct.filterNot(target.contains).map(r.idx)

    val byKey =
      l.ds.map(u => SUpd(keyOf(u.tuple, lKeyIdx),
        ("l": Any) +: (lKeyIdx.map(u.tuple).toVector ++ lRestIdx.map(u.tuple)),
        u.t, u.diff)) union
      r.ds.map(u => SUpd(keyOf(u.tuple, rKeyIdx),
        ("r": Any) +: (rKeyIdx.map(u.tuple).toVector ++ rRestIdx.map(u.tuple)),
        u.t, u.diff))

    implicit val stateEnc: Encoder[(Map[Vector[Any], Long], Map[Vector[Any], Long])] =
      Encoders.kryo[(Map[Vector[Any], Long], Map[Vector[Any], Long])]

    val nKey = target.length
    val out = byKey
      .groupByKey(_.key)
      .flatMapGroupsWithState[(Map[Vector[Any], Long], Map[Vector[Any], Long]), SUpd](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (_: String, it: Iterator[SUpd],
            state: GroupState[(Map[Vector[Any], Long], Map[Vector[Any], Long])]) =>
          var (ls, rs) = state.getOption
            .getOrElse((Map.empty[Vector[Any], Long], Map.empty[Vector[Any], Long]))
          val out = scala.collection.mutable.ArrayBuffer.empty[SUpd]
          it.toSeq.sortBy(_.t).foreach { u =>
            val side = u.tuple.head
            val keyVals = u.tuple.slice(1, 1 + nKey)
            val rest = u.tuple.drop(1 + nKey)
            val presentBefore = rs.valuesIterator.exists(_ > 0L)
            if (side == "l") {
              val before = ls.getOrElse(rest, 0L)
              val after = before + u.diff
              ls = if (after == 0L) ls - rest else ls.updated(rest, after)
              if (!presentBefore) {
                if (before <= 0L && after > 0L) out += SUpd("", keyVals ++ rest, u.t, 1L)
                else if (before > 0L && after <= 0L) out += SUpd("", keyVals ++ rest, u.t, -1L)
              }
            } else {
              val nw = rs.getOrElse(rest, 0L) + u.diff
              rs = if (nw == 0L) rs - rest else rs.updated(rest, nw)
              val presentAfter = rs.valuesIterator.exists(_ > 0L)
              if (presentBefore != presentAfter) {
                val d = if (presentAfter) -1L else 1L
                ls.foreach { case (lRestVals, w) =>
                  if (w > 0L) out += SUpd("", keyVals ++ lRestVals, u.t, d)
                }
              }
            }
          }
          state.update((ls, rs))
          StreamCompiler.consolidated(out)
      }
    SRel(outVars, outKinds, out)
  }

  // ------------------------------------------------------------- helpers

}
