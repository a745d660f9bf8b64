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

  /** TOKEN-BUDGET selection per stratum — the data-mixture primitive
    * "take the best documents from each source until its token budget is
    * spent": within each stratum, rank by `order` descending (ties by
    * `tie` ascending) and keep rows while the RUNNING token total stays
    * within the stratum's budget. The running sum includes the current
    * row, so a row that would overflow the budget is dropped (and so is
    * everything ranked below it — deterministic, no knapsack fitting).
    *
    * One hash shuffle + one spillable per-partition sort (a single window
    * sweep); budgets ride as plan literals. Output keeps the input
    * columns plus `cumtokens`. */
  def tokenBudgetPerStratum(df: DataFrame, stratumCol: String,
      tokenCol: String, order: Column, tie: Column,
      budgets: Map[String, Long], defaultBudget: Long): DataFrame = {
    val budget = budgets.foldLeft(lit(defaultBudget)) {
      case (acc, (stratum, b)) =>
        when(col(stratumCol) === stratum, lit(b)).otherwise(acc)
    }
    val w = Window.partitionBy(col(stratumCol))
      .orderBy(order.desc, tie.asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("cumtokens", sum(col(tokenCol)).over(w))
      .where(col("cumtokens") <= budget)
  }

  /** SEQUENCE PACKING: assign documents to fixed-capacity token bins —
    * the "pack documents into context windows" step before tokenized
    * training. Documents pack GREEDILY IN `tie` ORDER within each shard
    * (stratum): bin = floor(running-total-before-doc / capacity), i.e. a
    * new bin starts whenever the running total crosses a capacity
    * boundary. Oversized documents (> capacity) occupy their span of
    * bins; the next doc starts after them — deterministic streaming
    * packing, no bin-fitting search, one window sweep per shard. At
    * 100 TB the shard key bounds the sequential region (each shard packs
    * independently in parallel); a global pack would serialize the
    * corpus. Output: input columns + `bin` (0-based per shard). */
  def packSequences(df: DataFrame, shardCol: String, tokenCol: String,
      tie: Column, capacity: Long): DataFrame = {
    require(capacity > 0, "capacity must be positive")
    val w = Window.partitionBy(col(shardCol))
      .orderBy(tie.asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // INTEGER div (not Column./, which is double division and drifts from
    // the oracle's // on large totals).
    df.withColumn("_cum", sum(col(tokenCol)).over(w))
      .withColumn("bin", expr(s"(_cum - $tokenCol) div ${capacity}L"))
      .drop("_cum")
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

  /** Deterministic training-shard shuffle: the "write the corpus out in
    * a fixed random order, split into N shards" step before training.
    * Each row's portable hash (`h64("shard:" ++ id)`) is both its shard
    * assignment (`h mod nShards`) and its sort key within the shard, so
    * the global order is a pure function of the ids — reproducible
    * across engines, runs, and cluster sizes, and any shard can be
    * re-derived independently (no RNG state, no global sort).
    *
    * Scale shape: the hash is map-side; the per-shard position is ONE
    * hash shuffle keyed by shard plus a spillable per-partition sort
    * (a single window sweep). nShards should be ≥ the write parallelism
    * wanted at the sink — each shard lands in one task's sorted run. */
  def shardShuffle(df: DataFrame, idCol: String, nShards: Int): DataFrame = {
    val h = h64(concat_ws(":", lit("shard"), col(idCol).cast("string")))
    df.select(col(idCol).cast("long").as("id"), h.as("h"))
      .withColumn("shard", pmod(col("h"), lit(nShards.toLong)))
      .withColumn("pos", row_number().over(
        Window.partitionBy(col("shard"))
          .orderBy(col("h").asc, col("id").asc)).cast("long"))
      .select(col("id"), col("shard"), col("pos"))
  }
}
