package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.model._
import graft.model.Plan._
import graft.queries.Q

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry compiles a `graft.model.Plan` (the reference's operator
  * algebra) against the bulk-loaded TPC-H domain; `oracleSql` holds the
  * DuckDB-equivalent SQL the driver hash-compares against at sf0.01.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * orders joined to customer names through the engine's Hector
    * (conjunction) operator. */
  def entry(spark: SparkSession): DataFrame =
    queries("q_hector_join")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- scans (MatchA / MatchEA / MatchAV) ----
    "q_match_a" -> ((s, dir) =>
      Q.plan(s, dir, matchA(0, ":customer/name", 1), Seq("e", "v"))),
    "q_match_ea" -> ((s, dir) =>
      Q.plan(s, dir, matchEA(42L, ":customer/name", 0), Seq("v"))),
    "q_match_av" -> ((s, dir) =>
      Q.plan(s, dir, matchAV(0, ":customer/mktsegment", Value.str("BUILDING")),
        Seq("e"))),

    // ---- join / hector ----
    "q_hector_join" -> ((s, dir) =>
      Q.plan(s, dir,
        q(Seq(0, 1, 2), Seq(
          Binding.attribute(0, ":orders/custkey", 1),
          Binding.attribute(1, ":customer/name", 2))),
        Seq("o", "c", "n"))),

    // ---- aggregate ----
    "q_agg_sum" -> ((s, dir) =>
      Q.plan(s, dir,
        Aggregate(
          variables = Seq(8, 4),
          plan = Project(Seq(8, 4), lineitemRel),
          aggregationFns = Seq(AggregationFn.SUM),
          keyVariables = Seq(8),
          aggregationVariables = Seq(4),
          withVariables = Seq.empty),
        Seq("f", "sum_qty")))
  )

  /** `:lineitem` base relation with vars 0..10 in `LineitemCols` order:
    * orderkey partkey suppkey linenumber quantity extendedprice discount
    * tax returnflag linestatus shipdate. */
  private def lineitemRel: Plan = NameExpr(0 to 10, ":lineitem")

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "q_match_a" -> "SELECT c_custkey AS e, c_name AS v FROM customer",
    "q_match_ea" -> "SELECT c_name AS v FROM customer WHERE c_custkey = 42",
    "q_match_av" ->
      "SELECT c_custkey AS e FROM customer WHERE c_mktsegment = 'BUILDING'",
    "q_hector_join" ->
      ("SELECT o.o_orderkey AS o, o.o_custkey AS c, c.c_name AS n " +
        "FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey"),
    "q_agg_sum" ->
      ("SELECT l_returnflag AS f, CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) " +
        "AS sum_qty FROM lineitem GROUP BY 1")
  )
}
