package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal joins for event/feature pipelines.
  *
  * The headline operator is the as-of join (point-in-time join): each left
  * row picks up the latest right row with `ts <= left.ts` for the same key
  * — the join behind feature stores ("value of X as the user saw it"),
  * trade/quote matching, and slowly-changing-dimension lookups.
  */
object Temporal {

  /** Gap-based sessionization: a new session starts whenever the gap to
    * the previous event of the same key exceeds `gap` (same time unit as
    * `tsCol`). One key shuffle, two window passes over the same sort
    * (lag + running sum — Catalyst reuses the sort), deterministic ties
    * by `tieCol`. Session ids are 0-based per key. */
  def sessionize(events: DataFrame, keyCol: String, tsCol: String,
      tieCol: String, gap: Long): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol).asc, col(tieCol).asc)
    val prev = lag(col(tsCol), 1).over(w)
    val newSession = when(prev.isNull || col(tsCol) - prev <= gap, 0L).otherwise(1L)
    events.withColumn("session",
      sum(newSession).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** Rolling last-`n`-rows statistics per key: count, sum, min, max of
    * `valCol` over the trailing `n` events ordered by (`tsCol`, `tieCol`).
    *
    * One hash shuffle by key, one sort, and all four aggregates share the
    * same window frame, so Catalyst plans a single `WindowExec` sweep —
    * the feature-engineering staple ("activity in the user's last 7
    * events") at one exchange regardless of how many stats ride along.
    * `valCol` should be integral (quantize floats first) so results are
    * exact across engines. */
  def rollingStats(events: DataFrame, keyCol: String, tsCol: String,
      tieCol: String, valCol: String, n: Int): DataFrame = {
    require(n >= 1, s"rolling frame needs n >= 1, got $n")
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol).asc, col(tieCol).asc)
      .rowsBetween(-(n - 1L), Window.currentRow)
    events
      .withColumn("rcount", count(lit(1)).over(w))
      .withColumn("rsum", sum(col(valCol)).over(w))
      .withColumn("rmin", min(col(valCol)).over(w))
      .withColumn("rmax", max(col(valCol)).over(w))
  }

  /** Time-based rolling statistics: count/sum/min/max of `valCol` over the
    * trailing `window` time units (inclusive of both frame ends), per key.
    * The range frame is defined by the `tsCol` VALUE, so no tie column is
    * needed — equal timestamps are peers and always share a frame. Same
    * single-sweep shape as [[rollingStats]]; the frame bound is the only
    * difference (ROWS vs RANGE). */
  def rollingStatsRange(events: DataFrame, keyCol: String, tsCol: String,
      valCol: String, window: Long): DataFrame = {
    require(window >= 0, s"rolling range window must be >= 0, got $window")
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol).asc)
      .rangeBetween(-window, Window.currentRow)
    events
      .withColumn("rcount", count(lit(1)).over(w))
      .withColumn("rsum", sum(col(valCol)).over(w))
      .withColumn("rmin", min(col(valCol)).over(w))
      .withColumn("rmax", max(col(valCol)).over(w))
  }

  /** As-of join, implemented as union + one window — NOT a range join.
    *
    * A range join (`l.key = r.key AND r.ts <= l.ts`) explodes to one row
    * per (left, earlier-right) pair before aggregation prunes it — at
    * 100 TB an O(n·m) intermediate per key. This shape shuffles each row
    * exactly once (hash by key), sorts within the partition, and sweeps
    * forward carrying the last seen right row: O(n + m) rows end to end,
    * one exchange, codegen-friendly window functions only.
    *
    * Right columns ride in ONE struct, so multi-column payloads are atomic
    * (all from the same matched row). Determinism: right rows sort before
    * left rows at equal `ts` (a right row AT the left timestamp matches
    * it), and ties among right rows break by `tieCol` — the greatest
    * (`ts`, `tieCol`) right row wins. Left rows with no earlier right row
    * keep nulls.
    *
    * Both inputs must share the `key`, `tsCol` and `tieCol` column names
    * (views over a common event table, or rename before the call).
    *
    * @param rightVals right columns carried onto the matched left row
    */
  def asOfJoin(
      left: DataFrame,
      right: DataFrame,
      key: Seq[String],
      tsCol: String,
      tieCol: String,
      rightVals: Seq[String]): DataFrame = {
    require(rightVals.nonEmpty, "asOfJoin needs at least one right value column")
    val leftCols = left.columns.toSeq
    val payload = struct(rightVals.map(col): _*)
    val metaCols = (key ++ Seq(tsCol, tieCol)).distinct
    val r = right.select(metaCols.map(col) :+ payload.as("_r"): _*)
    val rAligned = r.select(leftCols.map(c =>
      if (key.contains(c) || c == tsCol || c == tieCol) col(c)
      else lit(null).as(c)) ++ Seq(lit(0).as("_side"), col("_r")): _*)
    val lAligned = left.select(leftCols.map(col) ++
      Seq(lit(1).as("_side"), lit(null).cast(rAligned.schema("_r").dataType).as("_r")): _*)
    val w = Window.partitionBy(key.map(col): _*)
      .orderBy(col(tsCol).asc, col("_side").asc, col(tieCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lAligned.unionByName(rAligned)
      .withColumn("_m", last(col("_r"), ignoreNulls = true).over(w))
      .where(col("_side") === 1)
      .select(leftCols.map(col) ++
        rightVals.map(v => col(s"_m.$v").as(v)): _*)
  }
}
