package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Portable._

/** Corpus-shaping operators: deterministic stratified sampling and top-k
  * selection per group — the "how much of each slice goes into the
  * training mix" stage of a data pipeline.
  */
object Sampling {

  /** Deterministic stratified Bernoulli sample: keep a row iff the
    * portable hash of its id falls under its stratum's per-mille rate.
    * Pure map-side filter — no shuffle, no RNG state, reproducible across
    * engines and runs, and rows can be re-derived (membership is a
    * function of the id alone). Strata absent from `ratesPerMille` fall
    * back to `defaultPerMille`.
    */
  def stratified(
      df: DataFrame,
      idCol: String,
      stratumCol: String,
      ratesPerMille: Map[String, Int],
      defaultPerMille: Int): DataFrame = {
    val rate = ratesPerMille.foldLeft(lit(defaultPerMille)) {
      case (acc, (stratum, r)) =>
        when(col(stratumCol) === stratum, lit(r)).otherwise(acc)
    }
    df.where(pmod(h64(col(idCol)), lit(1000)) < rate)
  }

  /** Top `k` rows per group by `order` descending, ties broken by `tie`
    * ascending — one hash shuffle plus a per-partition sort. For the
    * rank-only selection this does, a window beats a groupBy+heap
    * aggregation at every scale Spark runs: the sort is spillable and
    * whole-stage-codegen'd, and no per-group state materializes.
    */
  def topKPerGroup(df: DataFrame, groupCols: Seq[String], order: Column,
      tie: Column, k: Int): DataFrame = {
    require(!df.columns.contains("rank"),
      "topKPerGroup appends a 'rank' column; rename the input's existing one")
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(order.desc, tie.asc)
    df.withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
  }
}
