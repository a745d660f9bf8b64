package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Portable._

/** Text-analysis operators for document pipelines: token counting,
  * quality scoring, n-gram-heuristic language id, and content
  * fingerprinting. All integer/exact outputs (float-free) so results
  * hash-compare across engines; all Catalyst built-ins (no UDFs).
  */
object TextAnalysis {

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = {
    val ws = tokens(text)
    when(length(trim(text)) === 0, 0).otherwise(size(ws))
  }

  /** Integer quality facets: chars, tokens, distinct tokens, punctuation
    * marks, digits. Ratios are left to the consumer — keeping raw counts
    * exact avoids cross-engine float drift. */
  def qualityFacets(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    docs.select(
      col(idCol).as("id"),
      length(t).as("nchars"),
      tokenCount(t).as("ntokens"),
      size(array_distinct(tokens(t))).as("ndistinct"),
      (length(t) - length(regexp_replace(t, "[.,;:!?]", ""))).as("npunct"),
      (length(t) - length(regexp_replace(t, "[0-9]", ""))).as("ndigits"))
  }

  /** Stopword tables for the n-gram language heuristic. */
  val StopwordSets: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is"),
    "de" -> Seq("der", "die", "das", "und", "zu", "ist", "ein"),
    "fr" -> Seq("le", "la", "et", "les", "des", "un", "est"))

  /** Language id by stopword hits: emits per-language hit counts and the
    * argmax (ties and zero hits → "und"). */
  def languageId(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = tokens(lower(col(textCol)))
    val hitCols = StopwordSets.map { case (lang, words) =>
      size(filter(toks, t => t.isin(words.map(lit(_)): _*))).as(s"hits_$lang")
    }
    val withHits = docs.select((col(idCol).as("id") +: hitCols): _*)
    val langs = StopwordSets.map(_._1)
    val best = langs.map(l => col(s"hits_$l")).reduce((a, b) => greatest(a, b))
    val pred = langs.foldRight(lit("und"): Column) { (l, acc) =>
      when(col(s"hits_$l") === best && best > 0 &&
        langs.filter(_ != l).map(o => (col(s"hits_$o") === best).cast("int"))
          .reduce(_ + _) === 0, lit(l)).otherwise(acc)
    }
    withHits.withColumn("lang_pred", pred)
  }

  /** BPE-ish subword token count: alphabetic runs, single digits, and
    * individual punctuation marks — the shape of GPT-2-style pre-tokenizer
    * splits, kept to a regex class both engines implement identically. */
  val BpeishPattern = "[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]"

  def bpeishTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit(BpeishPattern), lit(0))).cast("long")

  /** DuckDB SQL fragment equivalent to [[bpeishTokenCount]] (DuckDB string
    * literals keep backslashes verbatim — no re-escaping). */
  def bpeishTokenCountSql(expr: String): String =
    s"CAST(len(regexp_extract_all($expr, '$BpeishPattern')) AS BIGINT)"

  /** Content fingerprint: portable 60-bit hash of the normalized text
    * (lowercase alnum) — a deterministic rolling-hash substitute. */
  def fingerprint(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("id"),
      h64(normalized(col(textCol))).as("fp"))

  /** Within-document repetition: total word n-gram windows vs distinct
    * ones — the "how much of this document is itself repeated" signal
    * used to filter boilerplate and degenerate generations. Pure per-row
    * arithmetic over the shared token-hash table (no shuffle, no strings). */
  def repetition(hp: DataFrame, n: Int): DataFrame = {
    val windows = shingleHashWindows(col("_hp"), n)
    hp.select(col("id"), windows.as("_w"))
      .select(col("id"),
        size(col("_w")).cast("long").as("nshingles"),
        (size(col("_w")) - size(array_distinct(col("_w")))).cast("long").as("nrepeated"))
  }

  /** Benchmark-contamination scan: for every (corpus doc, benchmark doc)
    * pair sharing at least one word `n`-gram, the count of shared distinct
    * n-grams plus the corpus doc's n-gram total (the consumer derives the
    * overlap ratio). The join is keyed by the n-gram HASH itself — work is
    * proportional to actual collisions, never |corpus| × |benchmark| — and
    * shingles ride as arithmetic hash pairs (one md5 per token, zero
    * shingle strings; see Portable.shingleHashWindows). The benchmark side
    * is dimension-sized in practice, so Catalyst broadcasts it.
    */
  def ngramOverlap(corpus: DataFrame, benchmark: DataFrame, idCol: String,
      textCol: String, n: Int): DataFrame =
    ngramOverlapFromHp(
      corpus.select(col(idCol).as("id"), tokenHashPairs(col(textCol)).as("_hp")),
      benchmark.select(col(idCol).as("id"), tokenHashPairs(col(textCol)).as("_hp")),
      n)

  /** EXACT-DEDUP-FIRST contamination scan: overlap depends only on text
    * content, so shingle and join only DISTINCT texts (one representative
    * per content digest, minimum id) and expand the rep-level pair table
    * over both sides' digest groups. Output is identical to
    * [[ngramOverlap]] row for row — a copy pair shares its reps' overlap —
    * but the shingle join runs once per distinct (corpus text, bench
    * text) pair: under d-fold duplication that is d² less join work, the
    * same quadratic guard [[graft.pipeline.Dedup.exactFirstClusters]]
    * gives clustering (SCALE_NOTES.md). */
  def ngramOverlapExactFirst(corpus: DataFrame, benchmark: DataFrame,
      idCol: String, textCol: String, n: Int): DataFrame = {
    def groups(df: DataFrame) = df
      .select(col(idCol).cast("long").as("id"), col(textCol).as("text"))
      .groupBy(md5(col("text")).as("digest"))
      .agg(min(col("id")).as("rep"), first(col("text")).as("text"))
      .select(col("digest"), col("rep"), tokenHashPairs(col("text")).as("_hp"))
    def members(df: DataFrame) = df
      .select(col(idCol).cast("long").as("id"), md5(col(textCol)).as("digest"))
    ngramOverlapExactFirstFromGroups(
      groups(corpus).localCheckpoint(true), members(corpus),
      groups(benchmark).localCheckpoint(true), members(benchmark), n)
  }

  /** [[ngramOverlapExactFirst]] over prepared digest-group tables —
    * `cg`/`bg` are `(digest, rep, _hp)` rows (one per distinct text, token
    * hashes precomputed), `corpusMembers`/`benchMembers` map docs
    * `(id, digest)` — so the exact-first family shares one checkpointed
    * token-hash pass (PipelineQueries' artifact cache). The rep ids only
    * key the internal expansion joins, so a GLOBAL digest-group table
    * works for both sides: restrict each side to its own digests and the
    * output rows are unchanged. */
  def ngramOverlapExactFirstFromGroups(cg: DataFrame, corpusMembers: DataFrame,
      bg: DataFrame, benchMembers: DataFrame, n: Int): DataFrame = {
    val repOverlap = ngramOverlapFromHp(
      cg.select(col("rep").as("id"), col("_hp")),
      bg.select(col("rep").as("id"), col("_hp")), n)
      .withColumnRenamed("corpus_id", "crep")
      .withColumnRenamed("bench_id", "brep")
    corpusMembers.toDF("corpus_id", "digest")
      .join(cg.select(col("digest"), col("rep").as("crep")), "digest")
      .drop("digest")
      .join(repOverlap, "crep")
      .join(bg.select(col("digest"), col("rep").as("brep")), "brep")
      .join(benchMembers.toDF("bench_id", "digest"), "digest")
      .select(col("corpus_id"), col("bench_id"), col("shared"), col("corpus_sz"))
  }

  /** [[ngramOverlap]] over prepared `(id, _hp)` token-hash-pair tables
    * (shared hash pass — see `Dedup.minhashFromHp`). */
  def ngramOverlapFromHp(corpusHp: DataFrame, benchHp: DataFrame,
      n: Int): DataFrame = {
    def shingleSet(hp: DataFrame, as: String): DataFrame = hp
      .select(col("id").as(as), explode(array_distinct(
        shingleHashWindows(col("_hp"), n))).as("s"))
    val c = shingleSet(corpusHp, "corpus_id").localCheckpoint(true)
    val b = shingleSet(benchHp, "bench_id")
    val sizes = c.groupBy(col("corpus_id")).agg(count(lit(1)).as("corpus_sz"))
    c.join(b, Seq("s"))
      .groupBy(col("corpus_id"), col("bench_id"))
      .agg(count(lit(1)).as("shared"))
      .join(sizes, Seq("corpus_id"))
  }
}
