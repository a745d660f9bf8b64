package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.{CoreQueries, PipelineQueries}

/** Physical-plan regression guards: the properties that make these
  * operators viable at scale must survive refactoring — column-pruned
  * parquet scans, pushed filters, broadcast joins for dimension-sized
  * sides, no Python/Scala UDFs in hot paths. Checked against the
  * sf0.001 testdata (plan shape is scale-independent here; AQE re-plans
  * sizes at runtime). */
class PlanShapeSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def planOf(name: String): String = {
    val fn = (CoreQueries.queries ++ PipelineQueries.queries)(name)
    fn(spark, sf).queryExecution.executedPlan.toString
  }

  test("MatchA scan reads exactly the two referenced columns") {
    val plan = planOf("q_match_a")
    assert(plan.contains("ReadSchema: struct<c_custkey:bigint,c_name:string"),
      s"expected a pruned 2-column scan:\n$plan")
  }

  test("MatchAV pushes the value predicate into the scan") {
    val plan = planOf("q_match_av")
    assert(plan.contains("PushedFilters: [IsNotNull(c_mktsegment), EqualTo(c_mktsegment,BUILDING)]"),
      s"expected the constant filter pushed to parquet:\n$plan")
  }

  test("parquet-source attributes scan as pruned projections with pushed filters") {
    // The registered-source edge keeps the property that makes EAV
    // viable on a columnar lake: each attribute's scan reads its OWN
    // column (plus the eid), and a MatchAV constant reaches the reader.
    val plan = planOf("q_source_parquet")
    assert(plan.contains("ReadSchema: struct<doc_id:bigint,lang:string"),
      s"expected the lang branch pruned to (doc_id, lang):\n$plan")
    assert(plan.contains("ReadSchema: struct<doc_id:bigint,n_chars:bigint"),
      s"expected the n_chars branch pruned to (doc_id, n_chars):\n$plan")
    assert(plan.contains("EqualTo(lang,en)"),
      s"expected the language constant pushed to parquet:\n$plan")
  }

  test("hector predicate query broadcasts both dimension sides") {
    val plan = planOf("q_hector_pred")
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast joins:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"no shuffle join expected:\n$plan")
  }

  test("same-entity attribute pairs fuse into one scan (no EAV self-join)") {
    // q_hector_pred reads TWO orders attributes over one entity variable:
    // colocation fusion must collapse them into a single orders scan, so
    // the whole query is orders ⋈ customer — 2 scans, 1 join.
    val plan = planOf("q_hector_pred")
    def count(s: String, sub: String): Int = s.sliding(sub.length).count(_ == sub)
    assert(count(plan, "Scan parquet") == 2,
      s"expected exactly 2 parquet scans (fused orders + customer):\n$plan")
    assert(count(plan, "HashJoin") == 1,
      s"expected exactly 1 join after fusion:\n$plan")
  }

  test("IVF assignment broadcasts the centroid table") {
    val plan = planOf("q_ann_ivf")
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastHashJoin"),
      s"expected centroids broadcast:\n$plan")
  }

  test("minhash hashes each token once (projects not re-inlined, no UDFs)") {
    // Operator-level property on raw documents: token digests materialize
    // once in the bottom project ("AS _hp"); if CollapseProject re-inlined
    // them, md5 would appear once per window element (O(len^2) digests
    // per row).
    val docs = TestSpark.spark.read.parquet(s"$sf/documents.parquet")
    val opPlan = graft.pipeline.Dedup.minhash(docs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!opPlan.contains("BatchEvalPython") && !opPlan.contains("ScalaUDF"),
      s"hot path must not contain UDFs:\n$opPlan")
    assert(opPlan.contains("AS _hp"), s"expected materialized token hashes:\n$opPlan")
    val md5s = "md5\\(".r.findAllIn(opPlan).size
    assert(md5s <= 2, s"expected md5 only in the token-hash project, found $md5s:\n$opPlan")
    // Query-level property: the driver query reads the SHARED checkpointed
    // token-hash table — no md5 in its plan at all.
    val qPlan = planOf("q_dedup_minhash")
    assert(!"md5\\(".r.findAllIn(qPlan).hasNext,
      s"query should scan the shared token-hash table, not re-hash:\n$qPlan")
  }

  test("jaccard candidates come from LSH buckets, not length equality") {
    // Round-2 advice: a document-length blocker is a skewed low-cardinality
    // join key at scale — candidates must come from the banded LSH path.
    val plan = planOf("q_dedup_jaccard")
    assert(!plan.contains("n_chars"),
      s"no length-equality blocking join expected:\n$plan")
  }

  test("graphql-derived pull joins broadcast the dimension side") {
    val plan = planOf("q_graphql")
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast join:\n$plan")
    assert(!plan.contains("ScalaUDF") && !plan.contains("BatchEvalPython"),
      s"no UDFs expected:\n$plan")
  }

  test("IVF search broadcasts centroids and probes; no unbroadcast cartesian") {
    val plan = planOf("q_ann_ivf_search")
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastHashJoin"),
      s"expected centroid/probe broadcasts:\n$plan")
    assert(!plan.contains("CartesianProduct"),
      s"corpus-side joins must broadcast the small side:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"no shuffle joins expected (all small sides broadcast):\n$plan")
  }

  test("as-of join is a window sweep: one key exchange, no join operator") {
    val plan = planOf("q_asof_join")
    assert(!plan.contains("Join"),
      s"as-of must not lower to a (range) join:\n$plan")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 1, s"expected exactly one key shuffle, got $exchanges:\n$plan")
  }

  test("incremental dedup broadcasts the batch digest set over the corpus") {
    // The 100 TB property: the corpus scan is filtered map-side by a
    // broadcast semi-join — the corpus itself never shuffles.
    val plan = planOf("q_dedup_incremental")
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftSemi"),
      s"expected a broadcast left-semi digest filter on the corpus:\n$plan")
    assert(!plan.contains("ScalaUDF"),
      s"the bloom UDF belongs to the past-gate path only:\n$plan")
  }

  test("unit duplication is a single-consumer pipeline: one unit shuffle, no join-back") {
    // unitDuplication computes the cross-doc flag with a WINDOW over the
    // h-partitioned unit stream instead of a per-hash aggregate joined
    // back — so the unit table (an md5 per window position) is exploded
    // once, shuffled once, and never re-read. Runtime property on the
    // final adaptive plan: the direct form has NO join operator at all
    // and exactly two exchanges (unit hash, then doc id).
    def finalPlan(q: String): String = {
      val fn = (CoreQueries.queries ++ PipelineQueries.queries)(q)
      val df = fn(spark, sf)
      df.collect()
      df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    }
    val direct = finalPlan("q_dedup_paragraph")
    assert(!direct.contains("ScalaUDF") && !direct.contains("Join"),
      s"direct unit duplication must not join:\n$direct")
    assert("Exchange hashpartitioning".r.findAllIn(direct).size == 2,
      s"expected exactly 2 exchanges (h, id):\n$direct")
    assert("md5\\(".r.findAllIn(direct).size <= 1,
      s"expected one window-digest site:\n$direct")
    // Exact-first spans add the digest-group expansion joins but keep the
    // same single-consumer flag pipeline and one digest site.
    val ef = finalPlan("q_dedup_spans")
    assert(!ef.contains("ScalaUDF") && !ef.contains("CartesianProduct"),
      s"exact-first spans: hash joins only:\n$ef")
    assert("md5\\(".r.findAllIn(ef).size <= 1,
      s"exact-first spans: spans hash once, at distinct-text size:\n$ef")
  }

  test("semantic dedup broadcasts centroids; no cartesian pair join") {
    val plan = planOf("q_semdedup")
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastHashJoin"),
      s"expected the centroid broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct"),
      s"pairs must meet inside cells, never all-pairs:\n$plan")
  }

  test("tfidf aggregations are partial+final; ranking is integer division") {
    val plan = planOf("q_text_tfidf")
    assert("HashAggregate".r.findAllIn(plan).size >= 2,
      s"expected map-side combine before the term shuffle:\n$plan")
    assert(!plan.contains("ScalaUDF"), s"no UDFs expected:\n$plan")
  }

  test("rolling stats is one window sweep: one key exchange, one Window") {
    val plan = planOf("q_rolling")
    assert(!plan.contains("Join"), s"q_rolling: window sweep, not a join:\n$plan")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 1,
      s"q_rolling: expected exactly one key shuffle, got $exchanges:\n$plan")
    // All four stats share one frame -> a single Window operator.
    val windows = "\\bWindow\\b".r.findAllIn(plan).size
    assert(windows == 1, s"q_rolling: expected one Window operator, got $windows:\n$plan")
  }

  test("PQ code assignment never hash-shuffles the corpus") {
    // The codebook collapses to one broadcast row; assignment is per-row
    // native expression arithmetic. Only the codebook's own
    // SinglePartition collect appears — no hashpartitioning exchange
    // anywhere. (The exact-first rep-window variant was measured 3.3×
    // slower even on the duplicate-replicated sf1 corpus and rejected —
    // Similarity.assignCells doc.)
    val plan = planOf("q_ann_pq")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 0,
      s"q_ann_pq: expected a shuffle-free code scan, got $exchanges exchanges:\n$plan")
    assert(plan.contains("graft_pq_assign"), s"q_ann_pq: native assign missing:\n$plan")
  }

  test("PQ search shuffles only the per-query top-k window") {
    val plan = planOf("q_ann_pq_search")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 1,
      s"q_ann_pq_search: expected one top-k exchange, got $exchanges:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"q_ann_pq_search: candidate scoring must stay broadcast:\n$plan")
  }

  test("IVF assignment is a shuffle-free expression argmax (no ranking window)") {
    // Round 12: the per-row k-way broadcast-join + ranking-window
    // assignment (one n×k exchange) is replaced by a fold over the
    // collapsed centroid row — assignment must carry NO hashpartitioning
    // exchange and NO Window operator at all.
    val plan = planOf("q_ann_ivf")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 0,
      s"q_ann_ivf: expected shuffle-free assignment, got $exchanges exchanges:\n$plan")
    assert(!"\\bWindow\\b".r.findFirstIn(plan).isDefined,
      s"q_ann_ivf: no ranking window expected:\n$plan")
  }

  test("argmax evaluate-once pin holds in every shipped consumer plan") {
    // DotArgmax declares deterministic=false as an EVALUATE-ONCE pin
    // (Pq.scala): alias substitution would otherwise duplicate the
    // k·dim-multiply loop into constraint-inferred filters — measured
    // FIVE evaluations per corpus row in the IVF search plan with the
    // pin off (round 13). The pin's contract is per-consumer: the
    // argmax appears EXACTLY ONCE in each consumer's executed plan, and
    // downstream predicates read the aliased column.
    // (q_semdedup's assignment runs behind connectedComponents'
    // checkpoint, so its top-level plan shows no argmax to count.)
    for ((q, n) <- Seq("q_ann_ivf" -> 1, "q_ann_ivf_search" -> 1)) {
      val plan = planOf(q)
      val evals = "graft_dot_argmax".r.findAllIn(plan).size
      assert(evals == n,
        s"$q: expected $n graft_dot_argmax evaluation(s), got $evals:\n$plan")
    }
  }

  test("mixture and packing are single window sweeps: one shuffle, no join") {
    for (q <- Seq("q_mix_budget", "q_pack_sequences")) {
      val plan = planOf(q)
      assert(!plan.contains("Join"), s"$q: window sweep, not a join:\n$plan")
      val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
      assert(exchanges == 1,
        s"$q: expected exactly one stratum shuffle, got $exchanges:\n$plan")
    }
  }

  test("aggregation uses map-side partial aggregation on the unit path") {
    val plan = planOf("q_agg_sum")
    // two HashAggregates (partial + final) around a single exchange
    assert("HashAggregate".r.findAllIn(plan).size >= 2,
      s"expected partial+final hash aggregation:\n$plan")
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 1,
      s"expected exactly one shuffle:\n$plan")
  }

  test("shard shuffle is one hash exchange + one window; no join, no global sort") {
    // The training-shard permutation must stay a pure function of the
    // ids with per-shard locality: hash map-side, ONE shuffle keyed by
    // shard, one spillable per-partition sort — never a global sort
    // (rangepartitioning) and never a join-back.
    val plan = planOf("q_shard_shuffle")
    assert(plan.contains("Window"), s"expected the per-shard window:\n$plan")
    assert(!plan.contains("Join"), s"shard shuffle must not join:\n$plan")
    assert(!plan.contains("rangepartitioning"),
      s"shard shuffle must not global-sort:\n$plan")
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 1,
      s"expected exactly one shard-keyed shuffle:\n$plan")
  }

  test("unigram LM score scans (doc_id, text) once per side and joins on the token key") {
    // The vocabulary join must be a hash join on the token key (at
    // 100 TB the vocab is not broadcast-sized; at test SF AQE may
    // broadcast it — both are hash joins). The only nested-loop is the
    // broadcast ONE-ROW grand total.
    val plan = planOf("q_text_lm_score")
    assert(plan.contains("ReadSchema: struct<doc_id:bigint,text:string"),
      s"expected the scan pruned to (doc_id, text):\n$plan")
    val nlj = "BroadcastNestedLoopJoin".r.findAllIn(plan).size
    assert(nlj <= 1, s"only the one-row total may nested-loop:\n$plan")
  }

  test("GLOBAL sweep: no UDFs, no cartesian products, anywhere in the query surface") {
    // Engine-wide guarantee, not per-query: every driver query's
    // physical plan is UDF-free (whole-stage-codegen expressions only)
    // and never degrades to an unbroadcast cartesian. Building every
    // query executes the maintained-oracle engines at sf0.001 — cheap,
    // and exactly what Verify does per round.
    val qs = CoreQueries.queries ++ PipelineQueries.queries
    val offenders = qs.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val plan = fn(spark, sf).queryExecution.executedPlan.toString
      val bad = Seq("ScalaUDF", "BatchEvalPython", "CartesianProduct")
        .filter(plan.contains)
      if (bad.isEmpty) None else Some(s"$name: ${bad.mkString(",")}")
    }
    assert(offenders.isEmpty, s"plan offenders:\n${offenders.mkString("\n")}")
  }
}
