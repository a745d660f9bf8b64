package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.domain.Domain
import graft.model.ValueKind
import graft.model.ValueKind._

/** Bulk-loads the driver's TPC-H-ish parquet tables (TESTDATA.md) into a
  * `Domain` as per-attribute `(e, v)` relations — the reference's
  * column-oriented data model (ADR 0002: one collection per attribute).
  *
  * Each attribute is a *lazy* 2-column projection of its parquet file, so a
  * `MatchA` compiles to a parquet scan that reads exactly the entity-key and
  * value columns (`PushedFilters`/`ReadSchema` stay minimal) — this is what
  * makes the EAV model viable at 100 TB: no unpivoted datom table ever
  * materializes.
  */
object TpchDomain {

  /** Positional column order (→ NameExpr variables) of the `:lineitem`
    * base relation. */
  val LineitemCols: Seq[String] = Seq(
    "orderkey", "partkey", "suppkey", "linenumber", "quantity",
    "extendedprice", "discount", "tax", "returnflag", "linestatus",
    "shipdate")

  def load(spark: SparkSession, sfDir: String): Domain = {
    val domain = new Domain(spark)

    def table(name: String): DataFrame =
      spark.read.parquet(s"$sfDir/$name.parquet")

    // One colocation group per table (one row per entity key): every
    // attribute still registers as its own pruned 2-column projection
    // (ADR 0002), and the compiler fuses same-entity conjunctions of
    // them back into a single multi-column scan of the table.
    def reg(tbl: String, ns: String, eCol: org.apache.spark.sql.Column,
        attrs: Seq[(String, org.apache.spark.sql.Column, ValueKind)]): Unit =
      domain.registerColocated(tbl, table(tbl), eCol,
        attrs.map { case (attr, vCol, kind) => (s":$ns/$attr", vCol, kind) })

    // Timestamps become ms-since-epoch longs (Value::Instant, src/lib.rs:98).
    // Parquet NTZ timestamps are interpreted in the session timezone (UTC).
    def ms(c: org.apache.spark.sql.Column) =
      unix_millis(c.cast("timestamp"))

    reg("region", "region", col("r_regionkey"), Seq(
      ("name", col("r_name"), KString)))

    reg("nation", "nation", col("n_nationkey"), Seq(
      ("name", col("n_name"), KString),
      ("regionkey", col("n_regionkey").cast("long"), KEid)))

    reg("customer", "customer", col("c_custkey"), Seq(
      ("name", col("c_name"), KString),
      ("nationkey", col("c_nationkey").cast("long"), KEid),
      ("acctbal", col("c_acctbal"), KReal),
      ("mktsegment", col("c_mktsegment"), KString)))

    reg("supplier", "supplier", col("s_suppkey"), Seq(
      ("name", col("s_name"), KString),
      ("nationkey", col("s_nationkey").cast("long"), KEid),
      ("acctbal", col("s_acctbal"), KReal)))

    reg("part", "part", col("p_partkey"), Seq(
      ("name", col("p_name"), KString),
      ("brand", col("p_brand"), KString),
      ("type", col("p_type"), KString),
      ("size", col("p_size").cast("long"), KNumber),
      ("retailprice", col("p_retailprice"), KReal)))

    reg("orders", "orders", col("o_orderkey"), Seq(
      ("custkey", col("o_custkey").cast("long"), KEid),
      ("orderstatus", col("o_orderstatus"), KString),
      ("totalprice", col("o_totalprice"), KReal),
      ("orderdate", ms(col("o_orderdate")), KInstant),
      ("orderpriority", col("o_orderpriority"), KString)))

    // lineitem has no unique natural key in this synthetic data (and a
    // synthesized row id would need a global sort at scale), so it stays a
    // native n-ary relation — the reference's `CollectionRelation` shape —
    // addressable via `NameExpr(vars, ":lineitem")` with columns in
    // `LineitemCols` order.
    domain.registerBase(":lineitem",
      table("lineitem").select(
        col("l_orderkey"),
        col("l_partkey"),
        col("l_suppkey"),
        col("l_linenumber").cast("long"),
        col("l_quantity").cast("long"),
        col("l_extendedprice"),
        col("l_discount"),
        col("l_tax"),
        col("l_returnflag"),
        col("l_linestatus"),
        ms(col("l_shipdate"))),
      Seq(KEid, KEid, KEid, KNumber, KNumber, KReal, KReal, KReal,
        KString, KString, KInstant))

    // events.ts is parquet TIMESTAMP(NANOS); with
    // spark.sql.legacy.parquet.nanosAsLong=true it scans as long nanos.
    // Integer division — ns values exceed double's 53-bit mantissa.
    val eventsTs =
      if (table("events").schema("ts").dataType ==
        org.apache.spark.sql.types.LongType) expr("ts div 1000000")
      else ms(col("ts"))
    reg("events", "events", col("event_id"), Seq(
      ("user", col("user_id"), KEid),
      ("type", col("event_type"), KString),
      ("value", col("value"), KReal),
      ("ts", eventsTs.cast("long"), KInstant)))

    reg("documents", "doc", col("doc_id"), Seq(
      ("text", col("text"), KString),
      ("lang", col("lang"), KString),
      ("source", col("source"), KString),
      ("nchars", col("n_chars"), KNumber)))

    domain
  }
}
