package graft.pipeline

import graft.kernel.Ckpt._

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Portable._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Baseline: brute-force cosine top-k (exact, O(q·n) dot products — all
  * codegen'd array arithmetic, no UDFs). Scale path: random-hyperplane LSH
  * bucketing — deterministic pseudo-random hyperplanes derived from the
  * portable hash, so buckets are reproducible across engines and runs; at
  * 100 TB the bucket join replaces the all-pairs product.
  */
object Similarity {

  /** Cosine similarity between two equal-length float-array columns,
    * computed as an ordered left fold (deterministic summation order). */
  def cosine(a: Column, b: Column): Column = {
    def dot(x: Column, y: Column): Column =
      aggregate(zip_with(x, y, (p, q) => p * q.cast("double")),
        lit(0.0), (acc, v) => acc + v)
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))
  }

  /** Exact brute-force top-k neighbours for the query vectors, ranked by
    * cosine (rounded to `roundTo` decimals for deterministic ties) then id. */
  def bruteForceTopK(vectors: DataFrame, queries: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding",
      roundTo: Int = 6): DataFrame = {
    val q = queries.select(col(idCol).as("q"), col(vecCol).as("qv"))
    val v = vectors.select(col(idCol).as("nb"), col(vecCol).as("nv"))
    val scored = q.join(v, col("q") =!= col("nb"))
      .select(col("q"), col("nb"),
        round(cosine(col("qv"), col("nv")), roundTo).as("cos"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q")).orderBy(col("cos").desc, col("nb").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("q"), col("nb"), col("cos"), col("rank"))
  }

  /** Near-duplicate pairs within a blocking key (e.g. label): cosine above
    * `threshold`, ids ordered. The blocking key keeps the join from going
    * all-pairs; at scale, use [[lshBucket]] as the blocker instead. */
  def nearDupPairs(vectors: DataFrame, blockCol: String, threshold: Double,
      idCol: String = "vec_id", vecCol: String = "embedding",
      roundTo: Int = 6): DataFrame = {
    val l = vectors.select(col(blockCol).as("blk"), col(idCol).as("a"), col(vecCol).as("av"))
    val r = vectors.select(col(blockCol).as("blk"), col(idCol).as("b"), col(vecCol).as("bv"))
    l.join(r, Seq("blk"))
      .where(col("a") < col("b"))
      .select(col("a"), col("b"),
        round(cosine(col("av"), col("bv")), roundTo).as("cos"))
      .where(col("cos") >= threshold)
  }

  // ---- exact (quantized-integer) kernels -------------------------------
  //
  // Float dot products depend on summation order, which differs between
  // engines; quantizing components to integers makes every similarity
  // decision exact and portable (the DuckDB oracle reproduces it bit-for-
  // bit). Quantization at scale=100 bounds |dot| ≈ 64·10^4, so all the
  // integer arithmetic below stays far from Long overflow.

  /** Integer-quantized embedding: round(x · scale). */
  def quantize(vec: Column, scale: Int = 100): Column =
    transform(vec, x => round(x.cast("double") * scale).cast("long"))

  /** Per-group embedding centroids in exact integer form: one row per
    * (group, dimension) with the quantized component sum and the member
    * count (consumers divide; keeping the exact pair avoids cross-engine
    * rounding drift). posexplode + groupBy is one shuffle whose map-side
    * partial aggregation collapses each partition to |groups|·dims rows
    * before any data moves — at 100 TB the shuffle carries centroids, not
    * vectors. The classic use: IVF coarse quantizers and per-source "mean
    * embedding" drift monitors. */
  def centroids(vectors: DataFrame, groupCol: String,
      vecCol: String = "embedding", scale: Int = 100): DataFrame =
    vectors
      .select(col(groupCol).cast("long").as("label"),
        posexplode(quantize(col(vecCol), scale)))
      .groupBy(col("label"), col("pos").cast("long").as("dim"))
      .agg(sum(col("col")).as("csum"), count(lit(1)).as("n"))

  /** Deterministic ±1 random projection (Achlioptas-style) of quantized
    * embeddings to `k` dimensions: `p_j = Σ_i sign(j,i) · qv_i`, the sign
    * being the parity of the portable hash of `proj:j:i` — both engines
    * derive the SAME matrix from the formula, so projections are
    * integer-exact. The matrix rides as plan literals (no broadcast, no
    * shuffle); projection is one per-row arithmetic expression, so at
    * 100 TB this is a pure map over the scan. Dot products are preserved
    * in expectation (Johnson-Lindenstrauss) at k/d the width — the
    * standard pre-ANN dimensionality reduction. */
  def randomProjection(vectors: DataFrame, k: Int, dim: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val signs: Array[Array[Long]] = Array.tabulate(k, dim) { (j, i) =>
      if (graft.functions.Portable.h64Host(s"proj:$j:$i") % 2 == 0) 1L else -1L
    }
    val qv = quantize(col(vecCol))
    val cols = (0 until k).map { j =>
      val lits = array(signs(j).toIndexedSeq.map(lit): _*)
      aggregate(zip_with(qv, lits, (a, b) => a * b),
        lit(0L), (acc, x) => acc + x).as(s"p$j")
    }
    vectors.select(col(idCol).cast("long").as("id") +: cols: _*)
  }

  /** Exact integer dot product of two quantized vectors — a native
    * codegen expression (see [[graft.functions.DotProduct]]); the composed
    * `aggregate(zip_with(...))` form allocates per evaluation, which
    * dominates when the dot runs once per candidate pair. The expression
    * carries an EVALUATE-ONCE pin (declared nondeterministic so alias
    * substitution cannot duplicate the loop into join conditions) —
    * consequently bind it to a column (`.as(...)`/`withColumn`) before
    * using the result as a join/grouping/sort key. */
  def dotQ(a: Column, b: Column): Column =
    graft.functions.DotProduct(a, b)

  /** Near-duplicate pairs with cosine ≥ tauNum/tauDen decided exactly:
    * dot > 0 ∧ tauDen²·dot² ≥ tauNum²·|a|²·|b|². Output columns
    * (a, b, dotq, na, nb) are all exact integers.
    *
    * EXACT-FIRST under duplication (the text family / semdedup
    * discipline): every similarity decision is a pure function of the
    * quantized vector, so the blocked self-join runs over DISTINCT
    * (block, qv) groups — one representative per group — and pairs
    * expand back over the duplicate groups afterwards. Cross-group
    * output pairs inherit the rep pair's accepted (dotq, norms),
    * re-oriented to a < b; within-group (identical-vector) pairs pass
    * exactly when the identical pair passes the threshold (|x|² > 0 and
    * tauNum ≤ tauDen — an all-zero vector fails `dotq > 0` even against
    * its own copy). Under d-fold duplication the dot-product and
    * threshold work drops d²-fold; the expansion joins are
    * output-proportional, never re-evaluating a dot product. */
  def quantizedNearDup(vectors: DataFrame, blockCol: String,
      tauNum: Long, tauDen: Long,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    // ONE shuffle derives the whole duplicate-group structure: a window
    // over (block, quantized vector) tags every row with its group
    // representative (min id); the distinct-group table is the rep rows.
    // Materialized once — feeds the rep self-join and both expansions.
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("blk"), col("qv"))
    val m = vectors.select(col(blockCol).as("blk"),
        col(idCol).cast("long").as("id"), quantize(col(vecCol)).as("qv"))
      .withColumn("rep", min(col("id")).over(w))
      .withColumn("nrm", dotQ(col("qv"), col("qv")))
      .graftCheckpoint(true)
    val groups = m.where(col("id") === col("rep"))
    val members = m.select(col("blk"), col("rep"), col("id"))

    // Rep-level blocked self-join at distinct-vector size — the ONLY
    // pairwise dot-product evaluations in the operator.
    val l = groups.select(col("blk"), col("rep").as("ga"),
      col("qv").as("av"), col("nrm").as("na"))
    val r = groups.select(col("blk"), col("rep").as("gb"),
      col("qv").as("bv"), col("nrm").as("nb"))
    val repPairs = l.join(r, Seq("blk"))
      .where(col("ga") < col("gb"))
      .select(col("blk"), col("ga"), col("gb"),
        dotQ(col("av"), col("bv")).as("dotq"), col("na"), col("nb"))
      .where(col("dotq") > 0 &&
        lit(tauDen * tauDen) * col("dotq") * col("dotq") >=
          lit(tauNum * tauNum) * col("na") * col("nb"))

    // Cross-group expansion: every (x ∈ ga, y ∈ gb) member pair,
    // re-oriented to a < b (the norms swap with the orientation; dotq is
    // symmetric).
    val cross = repPairs
      .join(members.toDF("blk", "ga", "x"), Seq("blk", "ga"))
      .join(members.toDF("blk", "gb", "y"), Seq("blk", "gb"))
      .select(
        least(col("x"), col("y")).as("a"),
        greatest(col("x"), col("y")).as("b"),
        col("dotq"),
        when(col("x") < col("y"), col("na")).otherwise(col("nb")).as("na"),
        when(col("x") < col("y"), col("nb")).otherwise(col("na")).as("nb"))

    // Within-group (identical-vector) pairs: dot(x,x) = |x|² passes the
    // threshold iff |x|² > 0 and tauNum² ≤ tauDen² — the tau side is a
    // driver-side constant, so the whole branch drops when false.
    // Singleton groups vanish under x < y; no pair re-evaluates a dot.
    if (tauNum * tauNum <= tauDen * tauDen) {
      val within = m.select(col("blk"), col("rep"), col("id").as("x"),
          col("nrm"))
        .where(col("nrm") > 0L)
        .join(members.toDF("blk", "rep", "y"), Seq("blk", "rep"))
        .where(col("x") < col("y"))
        .select(col("x").as("a"), col("y").as("b"), col("nrm").as("dotq"),
          col("nrm").as("na"), col("nrm").as("nb"))
      cross.unionAll(within)
    } else cross
  }

  /** Exact brute-force top-k: rank key = trunc(10^6·dot²/(|a|²·|b|²)),
    * signed by the dot — integer-exact in both engines. */
  def quantizedTopK(vectors: DataFrame, queryPred: Column, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = vectors.select(col(idCol).cast("long").as("id"),
      quantize(col(vecCol)).as("qv"))
      .withColumn("nrm", dotQ(col("qv"), col("qv")))
    val queries = q.where(queryPred).toDF("q", "qqv", "nq")
    val scored = queries.join(q.toDF("nb", "nv", "nn"), col("q") =!= col("nb"))
      .select(col("q"), col("nb"), dotQ(col("qqv"), col("nv")).as("dotq"),
        col("nq"), col("nn"))
    val mag = expr("(1000000 * dotq * dotq) div (nq * nn)")
    val keyed = scored.select(col("q"), col("nb"),
      when(col("dotq") >= 0, mag).otherwise(-mag).as("key"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q")).orderBy(col("key").desc, col("nb").asc)
    keyed.withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
  }

  /** SHUFFLE-FREE centroid assignment: the centroids collapse to ONE
    * broadcast array row and the argmax-by-dot is a per-row expression —
    * transform to (dot, cell) structs, fold to the best, ties to the
    * lowest cell (the sort order of the collapsed row). No per-row k-way
    * expansion, no ranking window, no exchange of any kind: assignment
    * is a pure map over the scan, the shape that survives 100 TB.
    *
    * MEASURED AND REJECTED (round 12): the exact-first variant — argmax
    * once per DISTINCT quantized vector via a rep-tagging window, result
    * propagated through first(ignoreNulls) over the same partitioning —
    * was built and A/B'd on the 10× duplicate-replicated sf1 corpus:
    * q_ann_pq 0.37s → 1.21s (3.3×), q_ann_ivf 2.23s → 2.79s, q_semdedup
    * 4.42s → 4.74s. Shuffling a 64-long vector by the wide qv key costs
    * more than the ~1k integer ops of redundant argmin it saves, at
    * every scale — the window is only free where pair semantics already
    * demand it ([[quantizedNearDup]]). Returns `m.columns + (cell,
    * dotq)`. */
  private def assignCells(m: DataFrame, cents: DataFrame): DataFrame = {
    val ca = cents
      .agg(array_sort(collect_list(struct(
        col("cell").cast("long").as("cell"), col("cv").as("cv")))).as("_s"))
      .select(
        transform(col("_s"), e => e.getField("cell")).as("_cells"),
        transform(col("_s"), e => e.getField("cv")).as("_cvs"))
    m.crossJoin(org.apache.spark.sql.functions.broadcast(ca))
      .withColumn("_best",
        graft.functions.Pq.argmaxDot(col("qv"), col("_cvs")))
      // Empty centroid set (empty corpus or cells<=0): the argmax is
      // NULL — emit no assignment for the row (the pre-argmax
      // broadcast-join contract: empty centroids => empty result).
      // Filter on the MATERIALIZED column: the evaluate-once pin
      // forbids substituting this predicate below the project, so the
      // guard is one null check per row, not a re-derivation of the
      // assignment inside constraint-inferred filter copies.
      .where(col("_best").isNotNull)
      .withColumn("cell",
        element_at(col("_cells"), col("_best").getField("i") + 1))
      .withColumn("dotq", col("_best").getField("d"))
      .drop("_best", "_cells", "_cvs")
  }

  /** IVF-style coarse quantization: assign every vector to its
    * nearest-by-dot-product centroid cell; at scale, ANN search probes only
    * the query's cell(s) instead of the full corpus. Centroids here are the
    * quantized vectors of the `k` lowest ids — a deterministic, oracle-
    * portable stand-in for trained k-means centroids (swap in real ones by
    * replacing `cents`); they broadcast to every executor. Assignment is
    * a SHUFFLE-FREE per-row expression argmax over the collapsed
    * centroid row ([[assignCells]] — no ranking window, no exchange).
    * Output: (id, cell, dotq). */
  def ivfAssign(vectors: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = vectors.select(col(idCol).cast("long").as("id"),
      quantize(col(vecCol)).as("qv"))
    val cents = q.where(col("id") < k)
      .select(col("id").as("cell"), col("qv").as("cv"))
    assignCells(q, cents).select(col("id"), col("cell"), col("dotq"))
  }

  /** IVF SEARCH (the scale path [[quantizedTopK]] is the exact baseline
    * for): probe each query's `nprobe` nearest cells, then exact re-rank
    * within the probed cells only. Corpus vectors hash-shuffle by cell
    * once; queries and centroids broadcast; candidate scoring touches
    * ~|corpus|·nprobe/cells vectors instead of the full corpus. The rank
    * key is the same integer-exact expression as the brute-force baseline,
    * so recall loss vs exact search is precisely the neighbors whose cells
    * weren't probed — measurable, not noise. */
  def ivfTopK(vectors: DataFrame, queryPred: Column, k: Int, cells: Int,
      nprobe: Int, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions.broadcast
    // One corpus scan feeds assignment, probing, and scoring; the cell
    // assignment is the shuffle-free expression argmax ([[assignCells]]).
    // The eager checkpoint beats recompute-per-consumer: the no-ckpt
    // variant re-derived the quantized corpus under each broadcast
    // subtree and measured 1.25-1.3x slower at sf0.1 across a
    // same-session triple run (round-13 A/B).
    val m = vectors.select(col(idCol).cast("long").as("id"),
      quantize(col(vecCol)).as("qv"))
      .withColumn("nrm", dotQ(col("qv"), col("qv")))
      .graftCheckpoint(true) // shared by assignment, probing, and scoring
    val cents = m.where(col("id") < cells)
      .select(col("id").as("cell"), col("qv").as("cv"))
    val corpus = assignCells(m, cents)
      .select(col("cell"), col("id").as("nb"), col("qv").as("nv"),
        col("nrm").as("nn"))
    val wQ = Window.partitionBy(col("q"))
      .orderBy(col("dotc").desc, col("cell").asc)
    val probed = m.where(queryPred)
      .select(col("id").as("q"), col("qv").as("qqv"), col("nrm").as("nq"))
      .join(broadcast(cents))
      .select(col("q"), col("qqv"), col("nq"), col("cell"),
        dotQ(col("qqv"), col("cv")).as("dotc"))
      .withColumn("_rn", row_number().over(wQ)).where(col("_rn") <= nprobe)
      .select(col("q"), col("qqv"), col("nq"), col("cell"))
    val cand = corpus.join(broadcast(probed), Seq("cell"))
      .where(col("q") =!= col("nb"))
      .select(col("q"), col("nb"), dotQ(col("qqv"), col("nv")).as("dotq"),
        col("nq"), col("nn"))
    val mag = expr("(1000000 * dotq * dotq) div (nq * nn)")
    val keyed = cand.select(col("q"), col("nb"),
      when(col("dotq") >= 0, mag).otherwise(-mag).as("key"))
    val w = Window.partitionBy(col("q")).orderBy(col("key").desc, col("nb").asc)
    keyed.withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
  }

  // ------------------------------------------------------ product quantization

  /** The PQ codebook collapsed to ONE row: `cb` = the quantized vectors of
    * the `ksub` lowest-id corpus vectors, in id order — the deterministic,
    * oracle-portable stand-in for trained per-subspace k-means (swap in
    * trained centroids by replacing this frame). One row broadcasts for
    * free; no driver collect. */
  private def codebookRow(q: DataFrame, ksub: Int): DataFrame =
    q.where(col("id") < ksub)
      .agg(array_sort(collect_list(struct(col("id"), col("qv")))).as("s"))
      .select(transform(col("s"), e => e.getField("qv")).as("cb"))

  /** PRODUCT-QUANTIZATION codes: split each quantized vector into `m`
    * contiguous `dim/m`-dim subvectors and replace each with the id of its
    * nearest codebook centroid (exact integer L2, ties to the lowest
    * centroid id).
    *
    * This is the memory side of large-scale ANN: `m` small codes per
    * vector instead of `dim` floats, so a cluster holds the whole index
    * in RAM while [[pqTopK]] scans codes instead of vectors. Assignment
    * here is SHUFFLE-FREE — the codebook collapses to a single broadcast
    * row and the argmin is per-row expression arithmetic (an
    * `array_min` over (distance, centroid) structs), so the corpus scan
    * never exchanges. Output: (id, c0..c{m-1}). */
  def pqCodes(vectors: DataFrame, m: Int, ksub: Int, dim: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = vectors.select(col(idCol).cast("long").as("id"),
      quantize(col(vecCol)).as("qv"))
    pqCodesFromQ(q, codebookRow(q, ksub), m, ksub, dim)
  }

  /** [[pqCodes]] over a prepared `(id, qv)` table and codebook row, so
    * [[pqTopK]] shares ONE corpus scan and ONE codebook aggregation
    * between assignment and search. The assignment kernel is the native
    * [[graft.functions.PqAssign]] expression — one tree node with a tight
    * generated loop (the unrolled-`element_at` form was semantically
    * identical but its several-thousand-node tree made Catalyst analysis
    * the dominant query cost). */
  private def pqCodesFromQ(q: DataFrame, cbRow: DataFrame, m: Int,
      ksub: Int, dim: Int): DataFrame = {
    require(dim % m == 0, s"dim $dim must split into $m subvectors")
    withCodes(q, cbRow, m)
      .select(col("id") +:
        (0 until m).map(j => element_at(col("_codes"), j + 1).as(s"c$j")): _*)
  }

  /** `(id, qv, ..., _codes)` — corpus rows with their PQ code array:
    * one broadcast codebook row, one native [[graft.functions.PqAssign]]
    * expression per row — a pure map over the scan, no exchange (the
    * exact-first window variant was measured 3.3× slower even on the
    * duplicate-replicated sf1 corpus — see [[assignCells]]). */
  private def withCodes(q: DataFrame, cbRow: DataFrame, m: Int): DataFrame =
    q.crossJoin(broadcast(cbRow))
      .withColumn("_codes",
        graft.functions.Pq.assign(col("qv"), col("cb"), lit(m)))

  /** PQ SEARCH via asymmetric distance computation (ADC): queries keep
    * their exact quantized vectors; the corpus is scanned as codes. Each
    * query precomputes an m×ksub lookup table of subvector dot products
    * against the codebook, and a candidate's approximate dot is m table
    * lookups — no per-candidate vector arithmetic at all.
    *
    * Scale shape: the corpus-side work is a map-only scan of the code
    * table against broadcast (query, LUT) rows; the ONLY exchange is the
    * final per-query top-k window over scored candidates. Integer-exact
    * end to end, so the oracle reproduces ranks bit-for-bit. Output:
    * (q, nb, approx, rank ≤ k). */
  def pqTopK(vectors: DataFrame, queryPred: Column, k: Int, m: Int,
      ksub: Int, dim: Int, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(dim % m == 0, s"dim $dim must split into $m subvectors")
    // One corpus scan and one codebook aggregation feed assignment, LUT
    // build, and scoring (the ivfTopK sharing pattern).
    val q = vectors.select(col(idCol).cast("long").as("id"),
      quantize(col(vecCol)).as("qv"))
      .graftCheckpoint(true)
    val cbRow = codebookRow(q, ksub)
    val codes = withCodes(q, cbRow, m).select(col("id"), col("_codes"))
    val queries = q.where(queryPred).toDF("q", "qqv")
      .crossJoin(broadcast(cbRow))
      .select(col("q"),
        graft.functions.Pq.luts(col("qqv"), col("cb"), lit(m)).as("_luts"))
    val scored = codes.join(broadcast(queries), col("q") =!= col("id"))
      .select(col("q"), col("id").as("nb"),
        graft.functions.Pq.lookup(col("_luts"), col("_codes")).as("approx"))
    val w = Window.partitionBy(col("q")).orderBy(col("approx").desc, col("nb").asc)
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
  }

  /** SEMANTIC DEDUP (SemDeDup-style): cluster the corpus by embedding,
    * mark near-identical vectors within each cluster, keep one
    * representative per semantic group. Composition of the pipeline's
    * existing scale pieces:
    *
    *   1. coarse clustering — [[ivfAssign]] (broadcast centroids, map-side
    *      assignment, no shuffle);
    *   2. within-cell near-dup pairs — [[quantizedNearDup]] blocked on the
    *      cell (the self-join meets only inside a cell, never all-pairs);
    *   3. pair graph → groups — [[Dedup.connectedComponents]] (byte-gated
    *      driver union-find / distributed pointer-jumping kernel).
    *
    * Output: (id, cluster, keep) — the [[Dedup.connectedComponents]]
    * contract, every vector present. Cosine ≥ tauNum/tauDen is decided in
    * exact integer arithmetic, so the DuckDB oracle reproduces the groups
    * bit-for-bit. At 100 TB the cell count scales with the corpus (cells
    * ≈ √n in IVF practice) keeping cells bounded; duplication-heavy cells
    * are exactly the near-dup mass the operator exists to find. */
  def semanticDedup(vectors: DataFrame, cells: Int, tauNum: Long,
      tauDen: Long, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val assign = ivfAssign(vectors, cells, idCol, vecCol)
      .select(col("id").as("_aid"), col("cell"))
    val withCell = vectors.join(assign,
      col(idCol).cast("long") === col("_aid"))
    val pairs = quantizedNearDup(withCell, "cell", tauNum, tauDen,
      idCol, vecCol).select(col("a"), col("b"))
    graft.pipeline.Dedup.connectedComponents(pairs,
      vectors.select(col(idCol).cast("long").as("id")), "id")
  }

  /** EXACT-DEDUP-FIRST [[semanticDedup]] — the duplication-heavy-corpus
    * guard for embeddings, same composition as the text-side exact-first
    * family: cluster only DISTINCT (quantized) vectors — one
    * representative per quantized-vector group, the group-minimum id —
    * then expand labels over the groups. All similarity decisions are
    * pure functions of the quantized vector, so rep-level structure
    * expands exactly: identical vectors share cells and pair distances.
    *
    * One subtlety keeps the output IDENTICAL row for row to the direct
    * scan: same-group members glue to their representative only when the
    * pair predicate would actually accept the identical pair — i.e. the
    * group's squared norm is positive (an all-zero embedding has dot 0
    * with its own copy, so `dotq > 0` rejects it and the direct scan
    * leaves every copy a singleton) and tauNum ≤ tauDen. Under d-fold
    * duplication the within-cell self-join runs at distinct-vector size —
    * d² less pair work. */
  def semanticDedupExactFirst(vectors: DataFrame, cells: Int, tauNum: Long,
      tauDen: Long, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val v = vectors.select(col(idCol).cast("long").as("id"),
      quantize(col(vecCol)).as("qv"))
    val groups = v.groupBy(col("qv")).agg(min(col("id")).as("rep"))
      .graftCheckpoint(true) // feeds the rep filter AND the expansion
    val reps = vectors.join(groups.select(col("rep")),
      col(idCol).cast("long") === col("rep"), "left_semi")
    val repClusters = semanticDedup(reps, cells, tauNum, tauDen,
      idCol, vecCol)
    // Identical-pair glue: dot(x,x) = |x|² passes the threshold test iff
    // |x|² > 0 (and tauNum ≤ tauDen, which the caller's threshold is).
    val glue = dotQ(col("qv"), col("qv")) > 0 &&
      lit(tauDen * tauDen) >= lit(tauNum * tauNum)
    val expanded = v.join(groups, "qv")
      .select(col("id"), col("rep"), glue.as("_glue"))
      .join(repClusters.select(col("id").as("rep"), col("cluster")), "rep")
      .select(col("id"),
        when(col("_glue"), col("cluster")).otherwise(col("id")).as("cluster"))
    expanded.select(col("id"), col("cluster"),
      (col("id") === col("cluster")).as("keep"))
  }

  /** Random-hyperplane LSH bucket id (`bits`-bit signature) over the
    * quantized vector — integer dot products, so bucket assignment is
    * exact. Hyperplane component j,i is a deterministic pseudo-random
    * value in [-500, 499] derived from the portable hash. */
  def lshBucketQ(qvec: Column, dim: Int, bits: Int = 8): Column = {
    val bitCols = (0 until bits).map { j =>
      val plane = array((0 until dim).map(i =>
        lit(PortablePlanes.component(j, i))): _*)
      when(dotQ(qvec, plane) > 0, lit(1L << j)).otherwise(0L)
    }
    bitCols.reduce(_ + _)
  }
}

/** Deterministic hyperplane components shared with oracle SQL generation. */
object PortablePlanes {
  private val md = java.security.MessageDigest.getInstance("MD5")

  /** = h64("j:i") % 1000 - 500 (matches Portable.h64Seeded semantics). */
  def component(j: Int, i: Int): Long = synchronized {
    md.reset()
    val hex = md.digest(s"$j:$i".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.substring(0, 15)
    java.lang.Long.parseLong(hex, 16) % 1000 - 500
  }
}
