package graft.streaming

import graft.kernel.Ckpt._

import org.apache.spark.HashPartitioner
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{LongType, StructField, StructType}

import graft.model.ValueKind

/** Storage seam for [[BiMaintained]]'s bitemporal datom history and its
  * maintained visible views. ONE store instance holds the FINE-grained
  * history shared by every Coarsen lane (lanes are view dimensions —
  * `transition`/`dump` take the lane id and window). Two siblings share
  * the [[BiVis]] state machine:
  *
  *  - [[DriverBiStore]] — ONE instance driver-side, for histories under
  *    the broadcast byte gate (the same small-side economics as the
  *    closure maintainer's gated driver index). Transitions are
  *    incremental here too — no O(history) rescan per completed time.
  *  - [[CellBiStore]] — the history hash-partitioned by view key across
  *    a [[StateCell]] (one [[BiVis]] per partition): ingest and
  *    transitions are per-partition structural-sharing updates, the
  *    driver holds only the time lattices — the reference's split,
  *    where frontier bookkeeping is worker-local but datoms live in
  *    distributed arrangements.
  *
  * A growing [[DriverBiStore]] migrates into a [[CellBiStore]] when its
  * estimated bytes cross the gate ([[BiMaintained]] owns the flip);
  * `-Dgraft.bi.distributed=on|off` forces either sibling for A/B.
  */
private[streaming] sealed trait BiStore {
  /** Append one transact batch of keyed datom records (FINE times). */
  def ingest(recs: Seq[(BiKey, BiRec)]): Unit

  /** Advance lane `lane`'s visible view to its completed coarse time
    * `t`, returning each attribute's signed view-transition frame
    * `(e, v, diff)`. `pruneUpTo` is the min processed bound across all
    * lanes — sys-index entries at or under it are dead for every
    * current lane. */
  def transition(lane: Int, win: Option[(Long, Long)],
      tPrev: Option[(Long, Long)], t: (Long, Long),
      sem: BiVisibility.Sem, pruneUpTo: Long,
      kindOf: String => ValueKind,
      // Caller-known single-attribute domains (Some(a) = every emitted
      // row is attribute `a`): lets the distributed sibling skip the
      // per-time distinct-attribute job — per-lattice-time job count is
      // the dominant cost of small advances on the cell store.
      attrHint: Option[String] = None,
      // Demanded attributes (round 17 — lazy per-attribute views): only
      // attributes some attached standing reads are aggregated and
      // tracked; None = maintain everything (the pre-r17 behavior,
      // kept for tests). A later standing over a skipped attribute is
      // served via [[backfill]].
      demand: Option[Set[String]] = None): BiStore.Frames

  /** Reconstruct lane `lane`'s emitted view for newly-demanded `attrs`
    * (skipped by earlier demand-filtered transitions) at its last
    * processed coarse time `t` — run BEFORE the late standing's replay
    * [[dump]]. */
  def backfill(lane: Int, win: Option[(Long, Long)], t: (Long, Long),
      sem: BiVisibility.Sem, attrs: Set[String]): Unit

  /** Lane `lane`'s full emitted view per attribute — replay for
    * late/rebuilt standing queries. */
  def dump(lane: Int, kindOf: String => ValueKind): BiStore.Frames

  /** Drop lane `lane`'s emitted view (lane teardown — its last interest
    * left). The shared history is untouched. */
  def dropLane(lane: Int): Unit

  /** Distinct coarse times of the ingested history under `win` —
    * lattice reconstruction for a lane attached after transacts. */
  def coarseTimes(win: Option[(Long, Long)]): Seq[(Long, Long)]

  /** Trace compaction behind `bound` — see [[BiVis.compact]]. */
  def compact(bound: Long, wins: Seq[Option[(Long, Long)]],
      sem: BiVisibility.Sem): Unit

  /** Resident datom records (shrinks at compaction). */
  def datomCount: Long

  def estimatedBytes: Long

  /** MEASURED resident bytes — a real SizeEstimator walk over the state
    * objects (smoke/test hook verifying the declared estimate). */
  def measuredResidentBytes: Long
}

private[streaming] object BiStore {
  /** Per-attribute transition/dump frames, each with its row count when
    * the store already knows it driver-side (the DriverBiStore builds
    * its frames from in-memory rows): a known count lets the standing's
    * `IncrementalQuery.advance` skip the per-attribute materialize+count
    * job whose only purpose is rediscovering the size. None = the frame
    * is RDD-backed distributed state (CellBiStore) — counting it would
    * itself cost the job the channel exists to avoid. */
  type Frames = Map[String, (DataFrame, Option[Long])]

  /** The plain per-attribute frame view of [[Frames]]. */
  def framesOnly(fs: Frames): Map[String, DataFrame] =
    fs.view.mapValues(_._1).toMap

  /** The known-count view of [[Frames]] (absent = unknown). */
  def knownCounts(fs: Frames): Map[String, Long] =
    fs.collect { case (a, (_, Some(n))) => a -> n }
  /** Demand Option → predicate, shared by both siblings. The returned
    * lambda captures only the Set (or nothing), so it is safe to ship
    * into executor closures. */
  def demandFn(demand: Option[Set[String]]): String => Boolean =
    demand.fold((_: String) => true)(s => s)

  /** Collect a distinct coarse-time lattice onto the driver behind the
    * loud `-Dgraft.bi.lattice.cap` guard (default 1M): a dense
    * WINDOWLESS history would otherwise collect a data-sized lattice —
    * the fix is a Coarsen granularity. Shared by the bulk-ingest
    * lattice pass and the late-attach replay. */
  def cappedLatticeCollect(lat0: RDD[(Long, Long)],
      win: Option[(Long, Long)], context: String): Array[(Long, Long)] = {
    val cap = sys.props.get("graft.bi.lattice.cap").map(_.toLong)
      .getOrElse(1000000L)
    val lat = lat0.distinct()
    lat.persist()
    try {
      val n = lat.count()
      require(n <= cap,
        s"$context time lattice has $n distinct coarse times on lane " +
          s"$win (cap $cap, -Dgraft.bi.lattice.cap): a dense history " +
          "needs a Coarsen granularity to bound the lattice")
      lat.collect()
    } finally { val _ = lat.unpersist(blocking = false) }
  }

  /** `(e, v, diff)` schema of a view-transition frame. */
  def schema(kind: ValueKind): StructType = StructType(Seq(
    StructField("e", LongType, false),
    StructField("v", kind.dataType, true),
    StructField("diff", LongType, false)))

  def frame(spark: SparkSession, kind: ValueKind,
      rows: Seq[Row]): DataFrame = {
    val nPart = math.max(1, math.min(
      spark.sparkContext.defaultParallelism, rows.size / 65536 + 1))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, nPart), schema(kind))
  }

  /** Group driver-side transition rows into per-attribute frames, each
    * carrying its (driver-known) row count. */
  def framesOf(spark: SparkSession, rows: Iterable[(String, Any, Any, Long)],
      kindOf: String => ValueKind): Frames =
    rows.groupBy(_._1).map { case (a, rs) =>
      val rws = rs.iterator.map { case (_, e, v, w) => Row(e, v, w) }.toSeq
      a -> ((frame(spark, kindOf(a), rws), Some(rws.size.toLong)))
    }
}

/** Driver-resident sibling: the whole history in one [[BiVis]].
  * Bounded by [[BiMaintained]]'s byte gate — past it the state migrates
  * into the distributed sibling. */
private[streaming] final class DriverBiStore(spark: SparkSession)
    extends BiStore {
  private[streaming] var vis: BiVis = BiVis.empty

  def ingest(recs: Seq[(BiKey, BiRec)]): Unit = vis = vis.ingest(recs)

  def transition(lane: Int, win: Option[(Long, Long)],
      tPrev: Option[(Long, Long)], t: (Long, Long),
      sem: BiVisibility.Sem, pruneUpTo: Long,
      kindOf: String => ValueKind,
      attrHint: Option[String] = None,
      demand: Option[Set[String]] = None): BiStore.Frames = {
    val t0 = System.nanoTime()
    val (next, rows) = vis.transition(lane, win, tPrev, t, sem, pruneUpTo,
      BiStore.demandFn(demand))
    vis = next
    val t1 = System.nanoTime()
    val out = BiStore.framesOf(spark, rows, kindOf)
    if (sys.env.contains("GRAFT_BI_DEBUG"))
      System.err.println(f"[bi-store] vis=${(t1 - t0) / 1e6}%.0fms " +
        f"frames=${(System.nanoTime() - t1) / 1e6}%.0fms rows=${rows.length}%d")
    out
  }

  def backfill(lane: Int, win: Option[(Long, Long)], t: (Long, Long),
      sem: BiVisibility.Sem, attrs: Set[String]): Unit =
    vis = vis.backfill(lane, win, t, sem, attrs)

  def dump(lane: Int, kindOf: String => ValueKind): BiStore.Frames =
    BiStore.framesOf(spark, vis.dumpEmitted(lane).toSeq, kindOf)

  def dropLane(lane: Int): Unit = vis = vis.dropLane(lane)

  def coarseTimes(win: Option[(Long, Long)]): Seq[(Long, Long)] =
    vis.coarseTimes(win).toSeq

  def compact(bound: Long, wins: Seq[Option[(Long, Long)]],
      sem: BiVisibility.Sem): Unit = vis = vis.compact(bound, wins, sem)

  def datomCount: Long = vis.datomCount

  def estimatedBytes: Long = vis.estimatedBytes

  def measuredResidentBytes: Long =
    org.apache.spark.util.GraftSizeOf.estimate(vis)
}

/** Distributed sibling: the history lives as one [[BiVis]] per
  * partition inside a [[StateCell]] (hash-partitioned by view key).
  * Per-batch narrow work is O(delta + touched keys); per-completed-time
  * transition work is O(candidate keys of the toggled time slabs), and
  * nothing data-sized ever lands on the driver — transition frames feed
  * the standing queries directly as RDD-backed DataFrames. */
private[streaming] final class CellBiStore(
    spark: SparkSession, partitions: Int) extends BiStore {
  private val sc = spark.sparkContext
  private val part = new HashPartitioner(partitions)
  private val cell = new StateCell[BiVis](
    sc, partitions, BiVis.maker(), _.estimatedBytes)
  private var count = 0L
  // MEASURED resident bytes, summed from the per-partition states'
  // actual structure on every ingest (the round-10 accounting fix: no
  // per-datom constant; transitions only grow the small emitted view,
  // refreshed at the next ingest).
  private var measuredBytes = 0L

  def ingest(recs: Seq[(BiKey, BiRec)]): Unit = {
    val _ = ingestRdd(sc.parallelize(recs, math.max(1, partitions / 4)))
  }

  /** DATA-SIZED ingest: one shuffle onto the view-key partitioning, then
    * the same per-partition structural-sharing [[BiVis.ingest]] the
    * control-sized path runs — the batch never exists on the driver.
    * Returns the ingested record count (summed from the partitions, no
    * extra job — it rides the advance's output channel). */
  private[streaming] def ingestRdd(recs: RDD[(BiKey, BiRec)]): Long = {
    val delta = recs.partitionBy(part)
    val stats = cell.advance1(delta) { (vis, it) =>
      var n = 0L
      val next = vis.ingest(it.map { r => n += 1L; r })
      (next, Array((next.estimatedBytes, n)))
    }.fold((0L, 0L))((a, b) => (a._1 + b._1, a._2 + b._2))
    measuredBytes = stats._1
    count += stats._2
    stats._2
  }

  /** Plant a split driver state into the cell partitions (gate flip). */
  private[streaming] def plant(parts: IndexedSeq[BiVis]): Unit = {
    require(parts.length == partitions)
    count += parts.iterator.map(_.datomCount).sum
    val maker = BiVis.maker()
    val delta = sc.parallelize(
        parts.zipWithIndex.map { case (s, i) => (i, s) }, 1)
      .partitionBy(new HashPartitioner(partitions)) // Int key i -> part i
    measuredBytes = cell.advance1(delta) { (_, it) =>
      val planted = it.toSeq.headOption.map(_._2).getOrElse(maker())
      (planted, Array(planted.estimatedBytes))
    }.fold(0L)(_ + _)
  }

  def transition(lane: Int, win: Option[(Long, Long)],
      tPrev: Option[(Long, Long)], t: (Long, Long),
      sem: BiVisibility.Sem, pruneUpTo: Long,
      kindOf: String => ValueKind,
      // Caller-known single-attribute domains (Some(a) = every emitted
      // row is attribute `a`): lets the distributed sibling skip the
      // per-time distinct-attribute job — per-lattice-time job count is
      // the dominant cost of small advances on the cell store.
      attrHint: Option[String] = None,
      demand: Option[Set[String]] = None): BiStore.Frames = {
    // Resolved on the driver — the lambda captures only the Set, so the
    // task closure stays free of the store's object graph.
    val dm = BiStore.demandFn(demand)
    val (out, n) = cell.advance1Counted(
        sc.parallelize(Seq.empty[Int], partitions)) { (vis, _) =>
      val (next, rows) = vis.transition(lane, win, tPrev, t, sem, pruneUpTo, dm)
      (next, rows)
    }
    // A singleton DEMAND set is as good an attribute hint as a
    // single-attribute domain: the transition only emitted demanded
    // attributes, so every row is provably the one demanded — the
    // per-time distinct-attribute job (the dominant cost of small
    // advances) is skipped for single-standing single-attribute lanes
    // regardless of how wide the registered catalog is.
    val hint = attrHint.orElse(demand.collect { case s if s.size == 1 => s.head })
    framesFrom(out, n, kindOf, hint)
  }

  def backfill(lane: Int, win: Option[(Long, Long)], t: (Long, Long),
      sem: BiVisibility.Sem, attrs: Set[String]): Unit =
    measuredBytes = cell.advance1(
        sc.parallelize(Seq.empty[Int], partitions)) { (vis, _) =>
      val next = vis.backfill(lane, win, t, sem, attrs)
      (next, Array(next.estimatedBytes))
    }.fold(0L)(_ + _)

  def dump(lane: Int, kindOf: String => ValueKind): BiStore.Frames = {
    val out = cell.rdd.flatMap(_.dumpEmitted(lane)).graftCheckpoint()
    framesFrom(out, out.count(), kindOf)
  }

  def dropLane(lane: Int): Unit =
    measuredBytes = cell.advance1(
        sc.parallelize(Seq.empty[Int], partitions)) { (vis, _) =>
      val next = vis.dropLane(lane)
      (next, Array(next.estimatedBytes))
    }.fold(0L)(_ + _)

  def coarseTimes(win: Option[(Long, Long)]): Seq[(Long, Long)] =
    BiStore.cappedLatticeCollect(
      cell.rdd.flatMap(_.coarseTimes(win)), win, "late-attach").toSeq

  def compact(bound: Long, wins: Seq[Option[(Long, Long)]],
      sem: BiVisibility.Sem): Unit = {
    val stats = cell.advance1(
        sc.parallelize(Seq.empty[Int], partitions)) { (vis, _) =>
      val next = vis.compact(bound, wins, sem)
      (next, Array((next.estimatedBytes, next.datomCount)))
    }.fold((0L, 0L))((a, b) => (a._1 + b._1, a._2 + b._2))
    measuredBytes = stats._1
    count = stats._2
  }

  def datomCount: Long = count

  /** Per-attribute typed frames over a checkpointed (a, e, v, w) RDD —
    * the only driver-sized read is the distinct attribute-name list. */
  private def framesFrom(out: RDD[(String, Any, Any, Long)], n: Long,
      kindOf: String => ValueKind,
      attrHint: Option[String] = None): BiStore.Frames =
    if (n == 0L) Map.empty
    else attrHint match {
      // Single-attribute output: every emitted row is provably the
      // hinted attribute, so `n` IS the frame's count — the consumer
      // skips its materialize+count job (the same per-time job economy
      // the hint already buys for the distinct-attribute pass).
      case Some(a) => Map(a -> ((spark.createDataFrame(
        out.map { case (_, e, v, w) => Row(e, v, w) },
        BiStore.schema(kindOf(a))), Some(n))))
      case None => out.map(_._1).distinct().collect().iterator.map { a =>
        a -> ((spark.createDataFrame(
          out.filter(_._1 == a).map { case (_, e, v, w) => Row(e, v, w) },
          BiStore.schema(kindOf(a))), None: Option[Long]))
      }.toMap
    }

  def estimatedBytes: Long = measuredBytes

  def measuredResidentBytes: Long =
    cell.rdd.map(v => org.apache.spark.util.GraftSizeOf.estimate(v))
      .fold(0L)(_ + _)

  /** Spec probe: the cell's live generation (the recoverability drill
    * target under the reliable-checkpoint dial). */
  private[graft] def liveGenerationProbe: org.apache.spark.rdd.RDD[_] =
    cell.liveGeneration
}
