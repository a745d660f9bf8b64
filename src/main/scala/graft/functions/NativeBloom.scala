package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate

/** Session registration for Catalyst's NATIVE bloom-filter expressions —
  * `BloomFilterAggregate` (build over xxhash64 longs) and
  * `BloomFilterMightContain` (codegen'd probe) — the same machinery
  * Spark's injected runtime filters use
  * (`spark.sql.optimizer.runtime.bloomFilter.*`). Registered here so
  * pipeline operators can build a filter with one aggregate and probe it
  * map-side as a plan literal: no Scala UDF, no broadcast closure, and
  * the probe stays inside whole-stage codegen. */
object NativeBloom {
  val aggName = "graft_bloom_agg"
  val probeName = "graft_bloom_might_contain"

  private val registered =
    java.util.Collections.newSetFromMap(
      new java.util.concurrent.ConcurrentHashMap[SparkSession, java.lang.Boolean])

  /** Register both functions in a session's registry (idempotent). */
  def register(spark: SparkSession): Unit =
    if (registered.add(spark)) {
      val reg = spark.sessionState.functionRegistry
      reg.registerFunction(
        FunctionIdentifier(aggName),
        new ExpressionInfo(classOf[BloomFilterAggregate].getName, aggName),
        (children: Seq[Expression]) =>
          new BloomFilterAggregate(children(0), children(1), children(2))
            .toAggregateExpression())
      reg.registerFunction(
        FunctionIdentifier(probeName),
        new ExpressionInfo(classOf[BloomFilterMightContain].getName, probeName),
        (children: Seq[Expression]) =>
          BloomFilterMightContain(children(0), children(1)))
    }
}
