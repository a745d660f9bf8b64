package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native integer dot product over two `array<long>` columns.
  *
  * The composed form — `aggregate(zip_with(a, b, _ * _), 0, _ + _)` —
  * allocates an intermediate array and walks two higher-order-function
  * interpreters per row; on ANN workloads the dot product runs once per
  * candidate PAIR, so that allocation dominates. This expression code-
  * generates a bare multiply-accumulate loop over the unsafe array data —
  * the (b)-tier of the extension ladder: a custom Catalyst `Expression`
  * with `doGenCode`, preferred over any UDF.
  *
  * Semantics match the composed form for equal-length non-null arrays
  * (the only shape quantized embeddings produce): Σ a(i)·b(i).
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _                      => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<bigint> arguments, " +
        s"got ${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_dotq"

  /** EVALUATE-ONCE pin, not actual nondeterminism (the kernel is a pure
    * function): alias substitution duplicated the multiply-accumulate
    * loop wherever a dotq-threshold predicate could be folded into a
    * join condition — the embedding near-dup rep join evaluated the
    * SAME pair dot FOUR times per candidate (once in the project, once
    * for `dotq > 0`, twice for `dotq·dotq ≥ τ²·na·nb`). Declaring the
    * expression nondeterministic forbids substitution: the dot
    * materializes once per row and every predicate reads the column —
    * same fused whole-stage-codegen pipeline, no extra materialization
    * (the predicates could never push past the pair join anyway, since
    * they reference both sides). Same pin as [[DotArgmax]]. */
  override lazy val deterministic: Boolean = false

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var i = 0
    var s = 0L
    while (i < n) { s += a.getLong(i) * b.getLong(i); i += 1 }
    s
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $s = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getLong($i) * $b.getLong($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

object DotProduct {
  val name = "graft_dotq"

  private val registered =
    java.util.Collections.newSetFromMap(
      new java.util.concurrent.ConcurrentHashMap[SparkSession, java.lang.Boolean])

  /** Register the function in a session's registry (idempotent). */
  def register(spark: SparkSession): Unit =
    if (registered.add(spark)) {
      spark.sessionState.functionRegistry.registerFunction(
        FunctionIdentifier(name),
        new ExpressionInfo(classOf[DotProduct].getName, name),
        (children: Seq[Expression]) => DotProduct(children(0), children(1)))
    }

  /** Column API: registers on the active session on first use. */
  def apply(a: Column, b: Column): Column = {
    SparkSession.getActiveSession.foreach(register)
    call_function(name, a, b)
  }
}
