package graft.streaming

import scala.collection.mutable

import org.apache.spark.{HashPartitioner, Partitioner}
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import org.apache.spark.storage.StorageLevel

import graft.kernel.RddKernel

/** Incrementally maintained transitive closure with a fully DISTRIBUTED
  * adjacency — the upgrade path [[IncrementalClosure]]'s class doc names
  * for edge relations past its broadcast gate: no driver edge set, no
  * broadcast reverse index, no `maxEdges` ceiling. Same maintenance
  * algebra (warm-started semi-naive for additions, delete-and-rederive
  * for retractions — the differential `iterate` + arrangement analog,
  * reference `src/lib.rs:943-1022`), same exact per-batch diffs.
  *
  * Where [[IncrementalClosure]] holds the adjacency as driver maps
  * shipped by broadcast, this class keeps everything as co-partitioned
  * persisted RDDs:
  *
  *  - `edges` `(src,dst)` keyed by TUPLE — membership (fresh-filter,
  *    retraction validation) via the kernel's narrow subtract/retain;
  *  - `revEdges` `(dst,src)` keyed by FIRST element — the reverse
  *    adjacency the semi-naive rounds expand through;
  *  - `fwdEdges` `(src,dst)` keyed by FIRST element — the forward
  *    adjacency DRed's rederivation probes walk;
  *  - closure totals as the usual tuple-hash chain PLUS one copy keyed
  *    by SOURCE (`totalsBySrc`) — the "second totals copy" arrangement
  *    that lets Δe∘C / Δd∘C run as a co-partitioned batch-side-hashed
  *    scan instead of a broadcast probe.
  *
  * Once per advance, the first-keyed edge copies are folded into
  * per-partition hash indexes (`indexOf`) probed by every fixpoint
  * round — the RDD analog of differential's arrangements: built in one
  * narrow O(|E|/p) pass per batch, probed at O(|frontier|) per round.
  *
  * Cost shape per batch: shuffles are O(delta) for ingest plus
  * O(frontier) per fixpoint round (each round re-keys its frontier by
  * destination — the distributed expansion cannot k-hop-batch inside a
  * task the way the broadcast kernel can, so deep graphs pay diameter
  * rounds); narrow work is O(state/p) per partition for the edge-copy
  * rebuild and index fold — the same per-batch narrow state rewrite
  * every RDD-backed maintainer here pays. Superseded state RDDs are
  * unpersisted once their replacement is materialized (checkpointed
  * replacements never re-read them).
  */
class DistributedClosure(spark: SparkSession, partitions: Int = 32) {

  private type Tup = (Long, Long)
  private val sc = spark.sparkContext
  private val part = new HashPartitioner(partitions)
  private val firstPart = new DistributedClosure.FirstPartitioner(partitions)
  private val maxChain = 16

  private def empty(p: Partitioner): RDD[(Tup, Null)] =
    sc.emptyRDD[(Tup, Null)].partitionBy(p)

  private var edges: RDD[(Tup, Null)] = empty(part)
  private var revEdges: RDD[(Tup, Null)] = empty(firstPart)
  private var fwdEdges: RDD[(Tup, Null)] = empty(firstPart)
  private var edgeCount = 0L

  private var totalParts: Vector[RDD[(Tup, Null)]] = Vector.empty
  private var totalsBySrc: RDD[(Tup, Null)] = empty(firstPart)

  /** Current closure size (tuples). */
  def size: Long = totalParts.map(_.count()).sum

  /** Current edge-relation size. */
  def edgeSize: Long = edgeCount

  // ------------------------------------------------------------ ingest

  /** Apply one batch of edge additions; returns the exact new closure
    * tuples as a DataFrame (src, dst, t, diff) — all diffs +1. */
  def advanceRdd(newEdges: RDD[(Long, Long)], t: Long): DataFrame = {
    val fresh = RddKernel.freshDelta(
      newEdges.map(e => (e: Tup, null)), part, Seq(edges))
    fresh.count()
    diffDf(addFresh(fresh), t, 1L)
  }

  /** Seq convenience wrapper over [[advanceRdd]]. */
  def advance(newEdges: Seq[(Long, Long)], t: Long): DataFrame =
    advanceRdd(sc.parallelize(newEdges, math.max(1, partitions / 4)), t)

  /** Apply one batch of SIGNED edge deltas (diff ∈ {+1, −1}) at time `t`;
    * returns the exact closure diffs (src, dst, t, diff), retractions
    * included. Deltas consolidate per edge first; deletions run DRed,
    * additions warm-start, and the two diff sets consolidate per tuple.
    * Retracting an absent edge fails loudly (distributed — nothing
    * data-sized ever lands on the driver on this path). */
  def advanceSignedRdd(deltas: RDD[((Long, Long), Long)], t: Long): DataFrame = {
    val net = deltas.reduceByKey(part, _ + _).filter(_._2 != 0L)
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val bad = net.filter { case (_, w) => w != 1L && w != -1L }.take(1)
      require(bad.isEmpty,
        s"consolidated edge diff must be ±1, got ${bad.headOption}")
      val dels = net.filter(_._2 < 0).mapPartitions(
        _.map { case (e, _) => (e, null: Null) }, preservesPartitioning = true)
      val adds = net.filter(_._2 > 0).mapPartitions(
        _.map { case (e, _) => (e, null: Null) }, preservesPartitioning = true)
      val missing = RddKernel.subtract(dels, Seq(edges)).take(1)
      require(missing.isEmpty,
        s"retraction of absent edges: ${missing.map(_._1).mkString(", ")}")

      val delsM = dels.localCheckpoint()
      val hasDels = delsM.take(1).nonEmpty
      val removed = if (!hasDels) empty(part) else deleteEdges(delsM)
      // Fresh-filter AFTER deletions: a deleted-then-re-added edge is
      // fresh again.
      val fresh = RddKernel.subtract(adds, Seq(edges)).localCheckpoint()
      fresh.count()
      val added = addFresh(fresh)
      val retr = RddKernel.subtract(removed, Seq(added))
      val asserted = RddKernel.subtract(added, Seq(removed))
      diffDf(retr, t, -1L).union(diffDf(asserted, t, 1L))
    } finally net.unpersist(blocking = false)
  }

  /** Seq convenience wrapper over [[advanceSignedRdd]]. */
  def advanceSigned(deltas: Seq[((Long, Long), Long)], t: Long): DataFrame =
    advanceSignedRdd(sc.parallelize(deltas, math.max(1, partitions / 4)), t)

  // --------------------------------------------------------- additions

  /** Mutate state with genuinely fresh additions (deduped, tuple-keyed,
    * materialized); return the new closure tuples, `part`-partitioned. */
  private def addFresh(fresh: RDD[(Tup, Null)]): RDD[(Tup, Null)] = {
    val nFresh = fresh.count()
    if (nFresh == 0L) return empty(part)
    edges = concat(edges, fresh, part)
    val freshRev = fresh.map { case ((s, d), _) => ((d, s): Tup, null: Null) }
    revEdges = concat(revEdges, freshRev, firstPart)
    fwdEdges = concat(fwdEdges, fresh, firstPart)
    edgeCount += nFresh

    val revIdx = indexOf(revEdges)
    try {
      // D1 = Δe ∪ Δe∘C: the src-keyed totals copy is scanned narrowly
      // against the batch hashed per partition — no broadcast, co-located
      // by the shared first-element partitioner.
      val viaOld = composeWithTotals(freshRev.partitionBy(firstPart))
      var newParts = Vector.empty[RDD[(Tup, Null)]]
      var delta = RddKernel.freshDelta(fresh.union(viaOld), part, totalParts)
      var n = delta.count()
      while (n > 0) {
        newParts = newParts :+ delta
        totalParts = totalParts :+ delta
        delta = RddKernel.freshDelta(expand(delta, revIdx), part, totalParts)
        n = delta.count()
      }
      if (totalParts.length > maxChain)
        totalParts = Vector(RddKernel.compact(totalParts))
      if (newParts.nonEmpty)
        totalsBySrc = concat(totalsBySrc, sc.union(newParts), firstPart)
      if (newParts.isEmpty) empty(part) else sc.union(newParts)
    } finally revIdx.unpersist(blocking = false)
  }

  // --------------------------------------------------------- deletions

  /** DRed under edge deletions (present, deduped, `part`-keyed,
    * materialized): overdelete through the OLD adjacency, rederive
    * against the updated edges, install `(C − O) ∪ R`, return `O − R`. */
  private def deleteEdges(dels: RDD[(Tup, Null)]): RDD[(Tup, Null)] = {
    // Overdeletion walks derivations of the OLD program: index the
    // adjacency before removing the deleted edges.
    val oldRevIdx = indexOf(revEdges)
    val nDels = dels.count()
    edges = subtractCk(edges, dels)
    val delsRev = dels.map { case ((s, d), _) => ((d, s): Tup, null: Null) }
      .partitionBy(firstPart).localCheckpoint()
    delsRev.count()
    revEdges = subtractCk(revEdges, delsRev)
    fwdEdges = subtractCk(fwdEdges, dels.partitionBy(firstPart))
    edgeCount -= nDels

    // --- overdelete: O = lfp of Δd ∪ Δd∘C ∪ E_old∘O -------------------
    // Candidates stay ⊆ C by construction, so no totals membership test.
    val direct = composeWithTotals(delsRev)
    var oChain = Vector.empty[RDD[(Tup, Null)]]
    var oDelta = RddKernel.freshDelta(dels.union(direct), part, oChain)
    var n = oDelta.count()
    while (n > 0) {
      oChain = oChain :+ oDelta
      oDelta = RddKernel.freshDelta(expand(oDelta, oldRevIdx), part, oChain)
      n = oDelta.count()
    }
    oldRevIdx.unpersist(blocking = false)
    if (oChain.isEmpty) return empty(part)

    val keep = RddKernel.subtract(
      RddKernel.compact(totalParts), oChain).localCheckpoint()
    keep.count()
    val oAll = sc.union(oChain)

    // --- rederive: R = lfp of (O∩E') ∪ (O ∩ E'∘keep) ∪ (O ∩ E'∘R) -----
    val newRevIdx = indexOf(revEdges)
    val fwdIdx = indexOf(fwdEdges)
    try {
      // Base: overdeleted facts that are themselves surviving edges.
      val r0a = RddKernel.retain(oAll, Seq(edges))
      // One step through the kept region: (x,z) ∈ O re-keyed by x walks
      // the forward index to probe keys (y,z), looked up in keep with a
      // co-partitioned narrow join — work ∝ |O| × degree, never ∝ |keep|.
      val probes = oAll.partitionBy(firstPart)
        .zipPartitions(fwdIdx) { (oIt, mIt) =>
          val m = mIt.next()
          oIt.flatMap { case ((x, z), _) =>
            m.get(x) match {
              case None     => Iterator.empty
              case Some(ys) => ys.iterator.map(y => ((y, z): Tup, (x, z): Tup))
            }
          }
        }
      val r0b = lookupHits(probes, Seq(keep))
      var rChain = Vector.empty[RDD[(Tup, Null)]]
      var rDelta = RddKernel.freshDelta(r0a.union(r0b), part, rChain)
      var rn = rDelta.count()
      while (rn > 0) {
        rChain = rChain :+ rDelta
        val inO = RddKernel.retain(
          RddKernel.dedup(expand(rDelta, newRevIdx), part), oChain)
        rDelta = RddKernel.subtract(inO, rChain).localCheckpoint()
        rn = rDelta.count()
      }
      val removed = RddKernel.subtract(oAll, rChain).localCheckpoint()
      removed.count()
      totalParts = Vector(keep) ++ rChain
      // R ⊆ O ⊆ C: rederived tuples were already in the src-keyed copy —
      // only the genuinely removed ones leave it.
      totalsBySrc = subtractCk(totalsBySrc, removed.partitionBy(firstPart))
      removed
    } finally {
      newRevIdx.unpersist(blocking = false)
      fwdIdx.unpersist(blocking = false)
    }
  }

  // ------------------------------------------------------------- steps

  /** Per-partition adjacency index over a first-keyed edge copy — the
    * arrangement the fixpoint rounds probe: one narrow O(|E|/p) fold per
    * advance, O(1) lookups per frontier tuple per round. */
  private def indexOf(byFirst: RDD[(Tup, Null)]): RDD[mutable.HashMap[Long, Array[Long]]] = {
    val idx = byFirst.mapPartitions { it =>
      val m = mutable.HashMap.empty[Long, mutable.ArrayBuffer[Long]]
      it.foreach { case ((a, b), _) =>
        m.getOrElseUpdate(a, mutable.ArrayBuffer.empty) += b
      }
      Iterator.single(m.map { case (k, v) => (k, v.toArray) })
    }.persist(StorageLevel.MEMORY_AND_DISK)
    idx.count() // materialize once; rounds only probe
    idx
  }

  /** One semi-naive expansion round: re-key the frontier by destination
    * (one O(frontier) shuffle — `part` and `firstPart` disagree, so this
    * is the price of the distributed adjacency) and probe the
    * per-partition reverse index: (y,z) → (x,z) for (x,y) ∈ E. */
  private def expand(delta: RDD[(Tup, Null)],
      revIdx: RDD[mutable.HashMap[Long, Array[Long]]]): RDD[(Tup, Null)] =
    delta.partitionBy(firstPart).zipPartitions(revIdx) { (dIt, mIt) =>
      val m = mIt.next()
      dIt.flatMap { case ((y, z), _) =>
        m.get(y) match {
          case None     => Iterator.empty
          case Some(xs) => xs.iterator.map(x => ((x, z): Tup, null: Null))
        }
      }
    }

  /** (x,y) ∈ batch (as (y,x), first-keyed), (y,z) ∈ totalsBySrc →
    * (x,z): hash the batch side per partition, scan the co-partitioned
    * src-keyed totals copy narrowly — the Δ∘C step without a broadcast. */
  private def composeWithTotals(batchByDst: RDD[(Tup, Null)]): RDD[(Tup, Null)] =
    batchByDst.zipPartitions(totalsBySrc) { (bIt, tIt) =>
      val m = mutable.HashMap.empty[Long, mutable.ArrayBuffer[Long]]
      bIt.foreach { case ((y, x), _) =>
        m.getOrElseUpdate(y, mutable.ArrayBuffer.empty) += x
      }
      if (m.isEmpty) Iterator.empty
      else tIt.flatMap { case ((y, z), _) =>
        m.get(y) match {
          case None     => Iterator.empty
          case Some(xs) => xs.iterator.map(x => ((x, z): Tup, null: Null))
        }
      }
    }

  /** For probes (key → origin) emit (origin, null) for every probe whose
    * key is present in the co-partitioned chain. Output is keyed by
    * origin — a DIFFERENT key — so partitioning is not claimed. */
  private def lookupHits(probes: RDD[(Tup, Tup)],
      chain: Seq[RDD[(Tup, Null)]]): RDD[(Tup, Null)] = {
    val p = probes.partitionBy(part)
    val hits = chain.map { link =>
      p.zipPartitions(link) { (a, b) =>
        val seen = new java.util.HashSet[Tup]()
        b.foreach(x => seen.add(x._1))
        a.collect { case (k, v) if seen.contains(k) => (v: Tup, null: Null) }
      }
    }
    if (hits.isEmpty) sc.emptyRDD[(Tup, Null)] else sc.union(hits)
  }

  /** Narrow concat + checkpoint of a state copy; the superseded RDD is
    * unpersisted once its replacement is materialized (the checkpointed
    * replacement never re-reads it). */
  private def concat(a: RDD[(Tup, Null)], b: RDD[(Tup, Null)],
      p: Partitioner): RDD[(Tup, Null)] = {
    val bb = if (b.partitioner.contains(p)) b else b.partitionBy(p)
    val r = a.zipPartitions(bb, preservesPartitioning = true)(_ ++ _)
      .localCheckpoint()
    r.count()
    a.unpersist(blocking = false)
    r
  }

  /** Narrow subtract + checkpoint of a state copy, same lifecycle. */
  private def subtractCk(a: RDD[(Tup, Null)],
      b: RDD[(Tup, Null)]): RDD[(Tup, Null)] = {
    val r = RddKernel.subtract(a, Seq(b)).localCheckpoint()
    r.count()
    a.unpersist(blocking = false)
    r
  }

  // --------------------------------------------------------- streaming

  // Processed-time frontier: regressing input times would stamp
  // historically wrong diffs — fail loudly instead.
  private var frontier: Long = Long.MinValue

  /** Structured Streaming integration — the [[IncrementalClosure.attach]]
    * contract with the distributed maintenance underneath. */
  def attach(edgeStream: DataFrame, queryName: String)(
      onDiffs: DataFrame => Unit): org.apache.spark.sql.streaming.StreamingQuery =
    edgeStream.writeStream
      .outputMode("append")
      .queryName(queryName)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        import org.apache.spark.sql.functions.col
        batch.persist(StorageLevel.MEMORY_AND_DISK)
        try {
          require(
            batch.where(!(col("diff") <=> 1L) && !(col("diff") <=> -1L)).isEmpty,
            "edge diffs must be ±1")
          val times = batch.select("t").distinct().collect()
            .map(_.getLong(0)).sorted
          times.foreach { t =>
            require(t > frontier,
              s"input time $t does not advance the processed frontier " +
                s"$frontier; diffs against already-advanced totals would " +
                "be historically wrong")
            frontier = t
            val es = batch.where(col("t") === t)
              .select("src", "dst", "diff").rdd
              .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2)))
            onDiffs(advanceSignedRdd(es, t))
          }
        } finally batch.unpersist()
      }
      .start()

  private val schema = StructType(Seq(
    StructField("src", LongType), StructField("dst", LongType),
    StructField("t", LongType), StructField("diff", LongType)))

  private def diffDf(rdd: RDD[(Tup, Null)], t: Long, diff: Long): DataFrame =
    spark.createDataFrame(
      rdd.map { case ((s, d), _) => Row(s, d, t, diff) }, schema)
}

object DistributedClosure {

  /** Partition a (Long, Long) key by its FIRST element — edge copies and
    * the src-keyed totals land where their join/probe key does. Top-level
    * so tasks never drag the operator (and its SparkSession) along. */
  private[streaming] final class FirstPartitioner(n: Int) extends Partitioner {
    def numPartitions: Int = n
    def getPartition(key: Any): Int = java.lang.Math.floorMod(
      java.lang.Long.hashCode(key.asInstanceOf[(Long, Long)]._1), n)
    override def equals(o: Any): Boolean = o match {
      case p: FirstPartitioner => p.numPartitions == n
      case _                   => false
    }
    override def hashCode: Int = n
  }
}
