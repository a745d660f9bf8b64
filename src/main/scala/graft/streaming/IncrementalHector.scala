package graft.streaming

import scala.collection.mutable
import scala.jdk.CollectionConverters._

import org.apache.spark.HashPartitioner
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions.{col, sum}
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
  * Scale: per-batch work is Σ_i |ΔR_i ⋈ …| (delta-proportional), and so
  * are per-batch SHUFFLED bytes, on both paths that could touch state:
  *  - state maintenance: each binding's state is an indexed
  *    [[StateCell]] map hash-partitioned on (e, v); a batch's delta is
  *    reduced onto that partitioner (the only shuffle) then applied as
  *    O(delta) structural-sharing updates — no per-batch state rewrite.
  *  - delta terms: RDD-backed frames carry no Catalyst stats, so the
  *    source reports counted byte-gated deltas (and small states) as
  *    `small` — the compiler's join-site broadcast then streams the big
  *    state side through a broadcast hash join instead of re-shuffling
  *    it every batch (streaming smoke: 2.0M → 15k shuffled records per
  *    5k-row batch against 1M-row state, SCALE_NOTES.md).
  * Together these are the Spark analog of the arrangements the
  * reference keeps. Retractions flow exactly (signed weights multiply
  * through the joins); `Not` bindings are rejected — negation needs
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

  // ---- Per-binding state: a weighted (e, v) -> w index kept as ONE
  // immutable map per partition ([[StateCell]]): a batch's update is
  // O(delta) structural sharing, never the former full zipPartitions
  // rewrite. The delta terms still SCAN other bindings' states through
  // the compiler's broadcast-delta joins (the disclosed stream-side
  // read); the maintenance side no longer re-materializes state.
  private type Key = (Long, Any)
  private type KV = (Key, Long)
  private type HMap = scala.collection.immutable.HashMap[Key, Long]

  private val nPartitions =
    spark.conf.get("spark.sql.shuffle.partitions", "32").toInt
  private val part = new HashPartitioner(nPartitions)

  // Indexed state per binding; sizes alongside (the advance returns the
  // per-partition sizes): RDD-backed frames carry no Catalyst stats, so
  // these counts are the ONLY size signal the compiler gets for its
  // join-site broadcasts.
  private val stateCells: Seq[StateCell[HMap]] =
    attrBindings.map(_ => new StateCell[HMap](
      spark.sparkContext, nPartitions,
      () => scala.collection.immutable.HashMap.empty, _.size * 200L))
  private val stateCounts: mutable.ArrayBuffer[Long] =
    mutable.ArrayBuffer.from(attrBindings.map(_ => 0L))

  /** Shared byte gate: rows of a 3-column (e, v, _w) frame vs the
    * session's autoBroadcastJoinThreshold (the fixpoint loop's estimate). */
  private def broadcastable(rows: Long): Boolean = {
    val bcBytes = graft.kernel.RddKernel.broadcastThresholdBytes(spark)
    bcBytes > 0 && rows * (24L * 3 + 8L) <= bcBytes
  }

  private def stateSchema(i: Int): StructType = StructType(Seq(
    StructField("e", LongType, false),
    StructField("v", kinds(attrBindings(i).a).dataType, true),
    StructField("_w", LongType, false)))

  /** DataFrame view over a keyed state/delta RDD — a pure per-row map the
    * batch compiler consumes; no shuffle, no copy of the persisted state. */
  private def dfView(i: Int, rdd: RDD[KV]): DataFrame =
    spark.createDataFrame(
      rdd.map { case ((e, v), w) => Row(e, v, w) }, stateSchema(i))

  /** DataFrame view over binding `i`'s CURRENT index — iterates the
    * partition-resident maps lazily at each Catalyst scan; the view
    * pins the underlying checkpoint blocks for as long as it lives. */
  private def indexView(i: Int): DataFrame =
    dfView(i, stateCells(i).rdd.flatMap(_.iterator))

  // DataFrame views kept in sync with the cells (compiler + tests).
  private val state: mutable.ArrayBuffer[DataFrame] =
    mutable.ArrayBuffer.from(attrBindings.indices.map(indexView))

  /** Current consolidated state of binding `i` (tests / introspection). */
  def stateOf(i: Int): DataFrame = state(i)

  /** Output (vars, kinds) of the maintained conjunction — the relation
    * template composition layers ([[IncrementalQuery]]) bind deltas to. */
  lazy val outputVarsKinds: (Seq[Int], Seq[ValueKind]) = {
    val rel = new Compiler(sourceFor(state, _ => false), Map.empty)
      .compile(plan, Map.empty)
      .getOrElse(sys.error("hector compilation failed"))
    (rel.vars, rel.kinds)
  }

  /** Output schema (c0..cn, _w), from one compile against current state. */
  private lazy val outputSchema: org.apache.spark.sql.types.StructType =
    new Compiler(sourceFor(state, _ => false), Map.empty)
      .compile(plan, Map.empty)
      .getOrElse(sys.error("hector compilation failed"))
      .df.schema

  private def sourceFor(tableOf: Int => DataFrame,
      smallOf: Int => Boolean): AttributeSource =
    new AttributeSource {
      private val byName: Map[String, Int] =
        attrBindings.zipWithIndex.map { case (a, i) => s"${a.a}#$i" -> i }.toMap
      def has(name: String): Boolean = byName.contains(name)
      def kind(name: String): ValueKind =
        kinds(name.substring(0, name.lastIndexOf('#')))
      def unit(name: String): Boolean = false // weighted Z-set state
      def collection(name: String): DataFrame = tableOf(byName(name))
      // Counted frames behind the byte gate broadcast at join sites —
      // without this a 5k delta joining 1M-row state re-shuffles the
      // state every batch (RDD frames have no stats for Catalyst).
      override def small(name: String): Boolean = smallOf(byName(name))
      override def version: (Long, Long) = (0L, Long.MaxValue)
    }

  /** Indexed state merge: apply the co-partitioned delta to binding
    * `i`'s partition-resident map (zero-weight entries dropped) and
    * return the new TOTAL row count — the only per-batch state work is
    * O(delta) structural sharing plus a constant-size checkpoint. */
  private def mergeIdx(i: Int, delta: RDD[KV]): Long =
    stateCells(i).advance1(delta) { (s: HMap, dIt: Iterator[KV]) =>
      var m = s
      dIt.foreach { case (k, dw) =>
        val nw = m.getOrElse(k, 0L) + dw
        if (nw == 0L) m -= k else m = m.updated(k, nw)
      }
      (m, Array(m.size.toLong))
    }.fold(0L)(_ + _)

  // Processed-time frontier: per-time diffs are computed against state
  // that has absorbed every earlier time, so a regressing input time
  // would silently emit historically wrong diffs — fail loudly instead
  // (the batch BiEngine makes the same check).
  private var frontier: Long = Long.MinValue

  /** Structured Streaming integration: drain a datom stream (columns
    * `a: string, e: long, v, t: long, diff: long`) through [[advance]] per
    * completed time; every Attr binding scanning attribute `a` receives
    * that attribute's delta. Times must advance strictly across the whole
    * stream. Each time's exact output diffs go to `onDiffs(t, frame)`. */
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
            require(t > frontier,
              s"input time $t does not advance the processed frontier " +
                s"$frontier; per-time diffs against already-advanced state " +
                "would be historically wrong")
            frontier = t
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
    // Reduce each delta onto the state partitioner — the ONLY shuffle in
    // state maintenance, O(delta) bytes however large the state has grown
    // — and pin it (delta terms and the merge both read it, and the
    // delivered diffs must outlive the caller's source frame).
    // Materialize each delta once (the count doubles as its size signal).
    val deltaPairs: Map[Int, (RDD[KV], Long)] = deltas.map { case (i, df) =>
      val r = df
        .select(col("e"), col("v"), col("diff").cast("long").as("_w"))
        .rdd.map(r => ((r.getLong(0), r.get(1)), r.getLong(2)))
        .reduceByKey(part, _ + _)
        .localCheckpoint()
      i -> (r, r.count())
    }
    val deltaRdds: Map[Int, RDD[KV]] = deltaPairs.map { case (i, (r, _)) => i -> r }
    val deltaCounts: Map[Int, Long] = deltaPairs.map { case (i, (_, n)) => i -> n }
    // Every term reads only the PRE-update generation: the delta rule's
    // POST-update side for j < i is served as the multiset union
    // `old(j) ⊎ Δ(j)` (weights sum; a +w/−w pair from a net-zero key
    // cancels exactly through the joins), so the indexed merges can run
    // AFTER the terms materialize — StateCell drops the superseded
    // generation at its commit, and an un-materialized term reading a
    // dropped block would fail.
    val old: Seq[DataFrame] = state.toSeq
    val oldCounts: Seq[Long] = stateCounts.toSeq
    val deltaDfs: Map[Int, DataFrame] =
      deltaRdds.map { case (i, d) => i -> dfView(i, d) }
    val postView: Seq[DataFrame] = attrBindings.indices.map { i =>
      deltaDfs.get(i).map(old(i).union).getOrElse(old(i))
    }
    val postCounts: Seq[Long] = attrBindings.indices.map { i =>
      oldCounts(i) + deltaCounts.getOrElse(i, 0L)
    }
    val terms: Seq[DataFrame] = attrBindings.indices.flatMap { i =>
      deltaDfs.get(i).map { dDf =>
        val src = sourceFor(
          j => if (j < i) postView(j) else if (j == i) dDf else old(j),
          j => broadcastable(
            if (j < i) postCounts(j)
            else if (j == i) deltaCounts(i)
            else oldCounts(j)))
        new Compiler(src, Map.empty).compile(plan, Map.empty) match {
          case Some(rel) => rel.df
          case None      => sys.error("hector compilation failed for delta term")
        }
      }
    }
    val n = vars.length
    val schema = (0 until n).map(Rel.c) :+ Rel.W
    val result = terms match {
      case Seq() =>
        spark.createDataFrame(spark.sparkContext.emptyRDD[Row], outputSchema)
      case ts =>
        // Materialize the (delta-sized) diffs eagerly BEFORE the merges:
        // the checkpoint makes the delivered frame self-contained, so
        // dropping the superseded state generation below is safe even
        // while callers still hold earlier batches' diff frames.
        ts.map(_.toDF(schema: _*)).reduce(_ union _)
          .groupBy((0 until n).map(i => col(Rel.c(i))): _*)
          .agg(sum(col(Rel.W)).as(Rel.W))
          .where(col(Rel.W) =!= 0L)
          .localCheckpoint(true)
    }
    // O(delta) index merges; views and size signals follow.
    attrBindings.indices.foreach { i =>
      deltaRdds.get(i).foreach { d =>
        stateCounts(i) = mergeIdx(i, d)
        state(i) = indexView(i)
      }
    }
    result
  }
}
