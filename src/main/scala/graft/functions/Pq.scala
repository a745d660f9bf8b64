package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._

/** Product-quantization kernels as native Catalyst expressions.
  *
  * The composed form — per-(subspace, centroid) unrolled arithmetic over
  * `element_at` — is semantically identical but materializes an expression
  * tree of several thousand nodes (m·ksub·d terms), and Catalyst's
  * analyzer/optimizer passes walk that tree enough times to dominate query
  * time outright (~10s per query at m=8, ksub=16, d=8). These expressions
  * collapse each kernel to ONE tree node with a tight generated loop —
  * the same (b)-tier extension-ladder choice as [[DotProduct]], for the
  * same reason.
  */
object Pq {

  private val registered =
    java.util.Collections.newSetFromMap(
      new java.util.concurrent.ConcurrentHashMap[SparkSession, java.lang.Boolean])

  /** Register the three functions in a session's registry (idempotent). */
  def register(spark: SparkSession): Unit =
    if (registered.add(spark)) {
      val reg = spark.sessionState.functionRegistry
      reg.registerFunction(FunctionIdentifier("graft_pq_assign"),
        new ExpressionInfo(classOf[PqAssign].getName, "graft_pq_assign"),
        (c: Seq[Expression]) => PqAssign(c(0), c(1), c(2)))
      reg.registerFunction(FunctionIdentifier("graft_pq_luts"),
        new ExpressionInfo(classOf[PqLuts].getName, "graft_pq_luts"),
        (c: Seq[Expression]) => PqLuts(c(0), c(1), c(2)))
      reg.registerFunction(FunctionIdentifier("graft_pq_lookup"),
        new ExpressionInfo(classOf[PqLookup].getName, "graft_pq_lookup"),
        (c: Seq[Expression]) => PqLookup(c(0), c(1)))
      reg.registerFunction(FunctionIdentifier("graft_dot_argmax"),
        new ExpressionInfo(classOf[DotArgmax].getName, "graft_dot_argmax"),
        (c: Seq[Expression]) => DotArgmax(c(0), c(1)))
    }

  private def withReg(name: String, cols: Column*): Column = {
    SparkSession.getActiveSession.foreach(register)
    call_function(name, cols: _*)
  }

  /** codes(j) = argmin_c L2²(vec[j·d..], cb(c)[j·d..]), ties to lowest c. */
  def assign(vec: Column, cb: Column, m: Column): Column =
    withReg("graft_pq_assign", vec, cb, m)

  /** luts(j)(c) = dot(vec[j·d..], cb(c)[j·d..]). */
  def luts(vec: Column, cb: Column, m: Column): Column =
    withReg("graft_pq_luts", vec, cb, m)

  /** Σ_j luts(j)(codes(j)) — the ADC approximate dot. */
  def lookup(luts: Column, codes: Column): Column =
    withReg("graft_pq_lookup", luts, codes)

  /** struct(d, i): the max dot of `vec` against `cands(i)` and its index
    * (ties to the lowest index) — the IVF coarse-assignment kernel. */
  def argmaxDot(vec: Column, cands: Column): Column =
    withReg("graft_dot_argmax", vec, cands)

  private[functions] def checkVecCb(prettyName: String, vec: Expression,
      cb: Expression, m: Expression): TypeCheckResult = {
    val ok = vec.dataType.isInstanceOf[ArrayType] &&
      vec.dataType.asInstanceOf[ArrayType].elementType == LongType &&
      (cb.dataType match {
        case ArrayType(ArrayType(LongType, _), _) => true
        case _ => false
      }) && m.dataType == IntegerType && m.foldable
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<bigint>, array<array<bigint>>, foldable int)")
  }
}

/** PQ code assignment: one `array<long>` of `m` centroid indices per row. */
case class PqAssign(vec: Expression, cb: Expression, m: Expression)
    extends TernaryExpression {

  override def first: Expression = vec
  override def second: Expression = cb
  override def third: Expression = m
  override def prettyName: String = "graft_pq_assign"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    Pq.checkVecCb(prettyName, vec, cb, m)

  override def nullSafeEval(v: Any, c: Any, mv: Any): Any = {
    val vec = v.asInstanceOf[ArrayData]
    val cb = c.asInstanceOf[ArrayData]
    val m = mv.asInstanceOf[Int]
    val d = vec.numElements() / m
    val ksub = cb.numElements()
    val codes = new Array[Long](m)
    var j = 0
    while (j < m) {
      var best = Long.MaxValue
      var bestC = 0L
      var ci = 0
      while (ci < ksub) {
        val cent = cb.getArray(ci)
        var s = 0L
        var i = j * d
        val end = i + d
        while (i < end) {
          val diff = vec.getLong(i) - cent.getLong(i)
          s += diff * diff
          i += 1
        }
        if (s < best) { best = s; bestC = ci.toLong }
        ci += 1
      }
      codes(j) = bestC
      j += 1
    }
    new GenericArrayData(codes)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, c, mv) => {
      val j = ctx.freshName("j"); val ci = ctx.freshName("ci")
      val i = ctx.freshName("i"); val d = ctx.freshName("d")
      val ksub = ctx.freshName("ksub"); val codes = ctx.freshName("codes")
      val best = ctx.freshName("best"); val bestC = ctx.freshName("bestC")
      val s = ctx.freshName("s"); val cent = ctx.freshName("cent")
      val diff = ctx.freshName("diff"); val end = ctx.freshName("end")
      s"""
         |int $d = $v.numElements() / $mv;
         |int $ksub = $c.numElements();
         |long[] $codes = new long[$mv];
         |for (int $j = 0; $j < $mv; $j++) {
         |  long $best = Long.MAX_VALUE; long $bestC = 0L;
         |  for (int $ci = 0; $ci < $ksub; $ci++) {
         |    org.apache.spark.sql.catalyst.util.ArrayData $cent = $c.getArray($ci);
         |    long $s = 0L;
         |    int $end = ($j + 1) * $d;
         |    for (int $i = $j * $d; $i < $end; $i++) {
         |      long $diff = $v.getLong($i) - $cent.getLong($i);
         |      $s += $diff * $diff;
         |    }
         |    if ($s < $best) { $best = $s; $bestC = (long) $ci; }
         |  }
         |  $codes[$j] = $bestC;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($codes);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): PqAssign =
    copy(vec = f, cb = s, m = t)
}

/** IVF coarse assignment: argmax-by-dot of one quantized vector against
  * a broadcast candidate array — ONE tree node with a tight generated
  * loop, returning `struct(d: bigint, i: int)` (max dot, its index, ties
  * to the lowest index). The higher-order-function form
  * (`aggregate(transform(...))`) is semantically identical but
  * evaluates its lambdas interpreted and allocates a struct array per
  * row — measured ~10% slower end-to-end on the IVF search cell. */
case class DotArgmax(vec: Expression, cands: Expression)
    extends BinaryExpression {

  override def left: Expression = vec
  override def right: Expression = cands
  override def prettyName: String = "graft_dot_argmax"

  /** EVALUATE-ONCE pin, not actual nondeterminism: the kernel is a pure
    * function, but alias substitution (predicate pushdown of
    * constraint-inferred filters, project collapse) happily duplicates
    * the k·dim-multiply loop into join conditions — re-measured round 13:
    * flipping this to `true` puts FIVE argmax evaluations per corpus row
    * in the IVF search plan (constraint-inferred isnotnull/range filters
    * substitute the loop), vs exactly one pinned. The pin is load-bearing
    * and scoped by CONSUMER CONTRACT instead: every caller must bind the
    * result through a projection (`withColumn`/`select` alias) and have
    * downstream predicates read the COLUMN — never place this expression
    * directly in a join condition, window order, or aggregate, where
    * CheckAnalysis rejects nondeterminism loudly. `PlanShapeSpec` pins
    * the single-evaluation plan shape for each shipped consumer. */
  override lazy val deterministic: Boolean = false
  // NULL on an empty candidate array (empty corpus / cells<=0): callers
  // filter `isNotNull` on the MATERIALIZED column — the pin forbids
  // substituting that predicate below the project, so the guard stays
  // one cheap null check instead of re-deriving the assignment inside
  // constraint-inferred filter copies (measured 1.5-3x on the
  // assignment cell when the guard was a `when` over the index).
  override def nullable: Boolean = true
  override def dataType: DataType = StructType(Seq(
    StructField("d", LongType, false), StructField("i", IntegerType, false)))
  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = (vec.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    }) && (cands.dataType match {
      case ArrayType(ArrayType(LongType, _), _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<bigint>, array<array<bigint>>)")
  }

  override def nullSafeEval(v: Any, c: Any): Any = {
    val vec = v.asInstanceOf[ArrayData]
    val cands = c.asInstanceOf[ArrayData]
    val n = vec.numElements()
    var best = 0L; var bestI = -1
    var ci = 0
    val k = cands.numElements()
    while (ci < k) {
      val cent = cands.getArray(ci)
      var s = 0L
      var i = 0
      while (i < n) { s += vec.getLong(i) * cent.getLong(i); i += 1 }
      if (bestI < 0 || s > best) { best = s; bestI = ci }
      ci += 1
    }
    if (bestI < 0) null
    else org.apache.spark.sql.catalyst.InternalRow(best, bestI)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, c) => {
      val ci = ctx.freshName("ci"); val i = ctx.freshName("i")
      val n = ctx.freshName("n"); val k = ctx.freshName("k")
      val s = ctx.freshName("s"); val best = ctx.freshName("best")
      val bestI = ctx.freshName("bestI"); val cent = ctx.freshName("cent")
      s"""
         |int $n = $v.numElements();
         |int $k = $c.numElements();
         |long $best = 0L; int $bestI = -1;
         |for (int $ci = 0; $ci < $k; $ci++) {
         |  org.apache.spark.sql.catalyst.util.ArrayData $cent = $c.getArray($ci);
         |  long $s = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $s += $v.getLong($i) * $cent.getLong($i);
         |  }
         |  if ($bestI < 0 || $s > $best) { $best = $s; $bestI = $ci; }
         |}
         |if ($bestI < 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
         |    new Object[] { java.lang.Long.valueOf($best),
         |      java.lang.Integer.valueOf($bestI) });
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotArgmax =
    copy(vec = newLeft, cands = newRight)
}

/** Per-query ADC lookup tables: `array<array<long>>`, luts(j)(c) =
  * dot of the j-th subvectors. Query-side only (a handful of rows per
  * batch), so interpreted evaluation is fine. */
case class PqLuts(vec: Expression, cb: Expression, m: Expression)
    extends TernaryExpression with CodegenFallback {

  override def first: Expression = vec
  override def second: Expression = cb
  override def third: Expression = m
  override def prettyName: String = "graft_pq_luts"
  override def dataType: DataType =
    ArrayType(ArrayType(LongType, containsNull = false), containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    Pq.checkVecCb(prettyName, vec, cb, m)

  override def nullSafeEval(v: Any, c: Any, mv: Any): Any = {
    val vec = v.asInstanceOf[ArrayData]
    val cb = c.asInstanceOf[ArrayData]
    val m = mv.asInstanceOf[Int]
    val d = vec.numElements() / m
    val ksub = cb.numElements()
    val luts = new Array[Any](m)
    var j = 0
    while (j < m) {
      val row = new Array[Long](ksub)
      var ci = 0
      while (ci < ksub) {
        val cent = cb.getArray(ci)
        var s = 0L
        var i = j * d
        val end = i + d
        while (i < end) { s += vec.getLong(i) * cent.getLong(i); i += 1 }
        row(ci) = s
        ci += 1
      }
      luts(j) = new GenericArrayData(row)
      j += 1
    }
    new GenericArrayData(luts)
  }

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): PqLuts =
    copy(vec = f, cb = s, m = t)
}

/** ADC score: Σ_j luts(j)(codes(j)) — m array reads per candidate row. */
case class PqLookup(luts: Expression, codes: Expression)
    extends BinaryExpression {

  override def left: Expression = luts
  override def right: Expression = codes
  override def prettyName: String = "graft_pq_lookup"
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = (luts.dataType match {
      case ArrayType(ArrayType(LongType, _), _) => true
      case _ => false
    }) && (codes.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<array<bigint>>, array<bigint>)")
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val luts = l.asInstanceOf[ArrayData]
    val codes = r.asInstanceOf[ArrayData]
    val m = codes.numElements()
    var s = 0L
    var j = 0
    while (j < m) { s += luts.getArray(j).getLong(codes.getLong(j).toInt); j += 1 }
    s
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (l, r) => {
      val j = ctx.freshName("j"); val s = ctx.freshName("s")
      val m = ctx.freshName("m")
      s"""
         |int $m = $r.numElements();
         |long $s = 0L;
         |for (int $j = 0; $j < $m; $j++) {
         |  $s += $l.getArray($j).getLong((int) $r.getLong($j));
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqLookup =
    copy(luts = newLeft, codes = newRight)
}
