package graft.streaming

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions.{col, lit, sum}
import org.apache.spark.sql.types.{LongType, StructField, StructType}

import graft.compile.{Compiler, Rel}
import graft.domain.AttributeSource
import graft.model._

/** Incrementally maintained Hector (n-way conjunction) — the delta-rule
  * analog of the reference's per-binding delta pipelines
  * (`src/plan/hector.rs:497-928` + AltNeu, `src/timestamp/altneu.rs`):
  * the state kept across batches is ONLY the input relations (one weighted
  * `(e, v, _w)` table per Attr binding), never any intermediate join
  * result — exactly the state-linearity property the reference's
  * count/propose/validate pipelines exist for, re-expressed Spark-first.
  *
  * A conjunctive query is multilinear in its Attr bindings, so the exact
  * output change for a batch of signed input deltas is the standard delta
  * rule: with bindings `R_1 … R_n`,
  *
  *   Δout = Σ_i  Q(R'_1, …, R'_{i-1},  ΔR_i,  R_{i+1}, …, R_n)
  *
  * — binding `i` sees its delta, earlier bindings their POST-update state,
  * later ones their PRE-update state (the sequencing AltNeu encodes in
  * timestamps; any fixed order is exact, double counting cancels by
  * construction). Each term compiles through the batch Hector compiler —
  * the worst-case-optimal constant pushing, predicate placement, and join
  * ordering apply per term unchanged — against an [[AttributeSource]]
  * serving each binding the right version. Bindings over the SAME
  * attribute are independent coordinates of the multilinear form, so they
  * are renamed apart (`attr#i`) before compilation.
  *
  * Scale: per-batch work is Σ_i |ΔR_i ⋈ …| (delta-proportional); state is
  * the consolidated inputs, partitioned by Spark like any attribute
  * table. Retractions flow exactly (signed weights multiply through the
  * joins); `Not` bindings are rejected — negation needs
  * delete-and-rederive, the batch engine's job.
  */
class IncrementalHector(
    spark: SparkSession,
    vars: Seq[Int],
    bindings: Seq[Binding],
    kinds: Map[String, ValueKind]) {

  require(!bindings.exists(_.isInstanceOf[Binding.Not]),
    "IncrementalHector maintains the positive conjunctive core; " +
      "Not bindings need delete-and-rederive via the batch engine")

  private val attrBindings: Seq[Binding.Attr] =
    bindings.collect { case a: Binding.Attr => a }
  require(attrBindings.nonEmpty, "need at least one Attr binding")

  // Bindings renamed apart: binding i over attribute a becomes `a#i`, so
  // each coordinate of the multilinear form has its own name even when
  // several bindings scan one attribute.
  private def renamed(i: Int, a: Binding.Attr): Binding.Attr =
    a.copy(a = s"${a.a}#$i")
  private val renamedBindings: Seq[Binding] = {
    var idx = -1
    bindings.map {
      case a: Binding.Attr => idx += 1; renamed(idx, a)
      case other           => other
    }
  }
  private val plan = Plan.Hector(vars, renamedBindings)

  private def emptyState(a: Binding.Attr): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.emptyRDD[Row],
      StructType(Seq(
        StructField("e", LongType, false),
        StructField("v", kinds(a.a).dataType, true),
        StructField("_w", LongType, false))))

  // Consolidated (e, v, _w) state per binding index; stable snapshots
  // (localCheckpoint truncates lineage so batches never stack plans).
  private val state: mutable.ArrayBuffer[DataFrame] =
    mutable.ArrayBuffer.from(attrBindings.map(emptyState))

  /** Current consolidated state of binding `i` (tests / introspection). */
  def stateOf(i: Int): DataFrame = state(i)

  /** Output schema (c0..cn, _w), from one compile against current state. */
  private lazy val outputSchema: org.apache.spark.sql.types.StructType =
    new Compiler(sourceFor(state), Map.empty).compile(plan, Map.empty)
      .getOrElse(sys.error("hector compilation failed"))
      .df.schema

  private def sourceFor(tableOf: Int => DataFrame): AttributeSource =
    new AttributeSource {
      private val byName: Map[String, Int] =
        attrBindings.zipWithIndex.map { case (a, i) => s"${a.a}#$i" -> i }.toMap
      def has(name: String): Boolean = byName.contains(name)
      def kind(name: String): ValueKind =
        kinds(name.substring(0, name.lastIndexOf('#')))
      def unit(name: String): Boolean = false // weighted Z-set state
      def collection(name: String): DataFrame = tableOf(byName(name))
      override def version: (Long, Long) = (0L, Long.MaxValue)
    }

  /** Structured Streaming integration: drain a datom stream (columns
    * `a: string, e: long, v, t: long, diff: long`) through [[advance]] per
    * completed time; every Attr binding scanning attribute `a` receives
    * that attribute's delta. Each time's exact output diffs go to
    * `onDiffs(t, frame)`. */
  def attach(datoms: DataFrame, queryName: String)(
      onDiffs: (Long, DataFrame) => Unit): org.apache.spark.sql.streaming.StreamingQuery =
    datoms.writeStream
      .outputMode("append")
      .queryName(queryName)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batch.persist()
        try {
          val times = batch.select("t").distinct().collect().map(_.getLong(0)).sorted
          times.foreach { t =>
            val att = batch.where(col("t") === t)
            // One checkpointed delta per DISTINCT attribute (several
            // bindings usually scan one attribute), fanned out to binding
            // indices; checkpointing also keeps the delivered diff frame
            // valid after this micro-batch's source frame is released.
            val byAttr: Map[String, DataFrame] =
              attrBindings.map(_.a).distinct.flatMap { a =>
                val d = att.where(col("a") === a)
                  .select(col("e"), col("v"), col("diff"))
                if (d.isEmpty) None else Some(a -> d.localCheckpoint(true))
              }.toMap
            val deltas: Map[Int, DataFrame] =
              attrBindings.zipWithIndex.flatMap { case (b, i) =>
                byAttr.get(b.a).map(i -> _)
              }.toMap
            if (deltas.nonEmpty) onDiffs(t, advance(deltas))
          }
        } finally batch.unpersist()
      }
      .start()

  /** Apply one batch of signed deltas (binding index -> (e, v, diff) rows;
    * indices follow Attr-binding order) and return the EXACT output diffs
    * `(c0..cn, _w)` of the conjunction for this batch. */
  def advance(deltas: Map[Int, DataFrame]): DataFrame = {
    require(deltas.keySet.subsetOf(attrBindings.indices.toSet),
      s"delta keys ${deltas.keySet} must be Attr-binding indices " +
        s"0..${attrBindings.length - 1} (Attr-binding order, " +
        "not overall binding positions)")
    val deltaW: Map[Int, DataFrame] = deltas.map { case (i, df) =>
      i -> df.select(col("e"), col("v"), col("diff").cast("long").as("_w"))
    }
    val old: Seq[DataFrame] = state.toSeq
    val updated: Seq[DataFrame] = attrBindings.indices.map { i =>
      deltaW.get(i) match {
        case None    => old(i)
        case Some(d) =>
          old(i).union(d)
            .groupBy(col("e"), col("v")).agg(sum(col("_w")).as("_w"))
            .where(col("_w") =!= 0L)
            .localCheckpoint(true)
      }
    }
    val terms: Seq[DataFrame] = attrBindings.indices.flatMap { i =>
      deltaW.get(i).map { d =>
        val src = sourceFor(j =>
          if (j < i) updated(j) else if (j == i) d else old(j))
        new Compiler(src, Map.empty).compile(plan, Map.empty) match {
          case Some(rel) => rel.df
          case None      => sys.error("hector compilation failed for delta term")
        }
      }
    }
    attrBindings.indices.foreach(i => state(i) = updated(i))
    val n = vars.length
    val schema = (0 until n).map(Rel.c) :+ Rel.W
    terms match {
      case Seq() =>
        spark.createDataFrame(spark.sparkContext.emptyRDD[Row], outputSchema)
      case ts =>
        ts.map(_.toDF(schema: _*)).reduce(_ union _)
          .groupBy((0 until n).map(i => col(Rel.c(i))): _*)
          .agg(sum(col(Rel.W)).as(Rel.W))
          .where(col(Rel.W) =!= 0L)
    }
  }
}
