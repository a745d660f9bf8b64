package graft.pipeline

import graft.kernel.Ckpt._

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

  /** Self-trained unigram language-model score per document — the
    * likelihood-based quality filter of a training-data pipeline ("drop
    * documents whose tokens the corpus itself finds improbable"),
    * expressed float-free so the result hash-compares across engines:
    * each token scores its corpus probability in ppm via exact integer
    * division (`cnt · 10⁶ div Σcnt`), and a document carries the SUM and
    * the MIN of its token scores (Σ is the quantized unnormalized
    * likelihood; MIN is the rarest-token facet rare-garbage filters cut
    * on) plus its token count for consumers that want the mean.
    *
    * Scale shape: one explode (map-side), one token-keyed count shuffle
    * for the vocabulary, one token-keyed shuffle join scoring the corpus
    * against it (vocabulary ≪ corpus but NOT broadcast-sized at 100 TB —
    * the join stays a hash join on the token key), one doc-keyed
    * aggregation. The grand total rides as a broadcast one-row frame. */
  def unigramLmScore(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    // Drop the empty pseudo-token (splitting an empty/whitespace-only
    // text yields [""] in both engines — sibling convention): an empty
    // document contributes nothing to the vocabulary and gets NO score
    // row, rather than a nonzero "likelihood" for the '' token.
    val toks = docs.select(col(idCol).cast("long").as("id"),
      explode(tokens(col(textCol))).as("tok"))
      .where(col("tok") =!= "")
    val vocab = toks.groupBy("tok").agg(count(lit(1)).as("cnt"))
    val total = vocab.agg(sum("cnt").as("total"))
    toks.join(vocab, "tok")
      .crossJoin(broadcast(total))
      .select(col("id"), expr("(cnt * 1000000L) DIV total").as("ppm"))
      .groupBy("id").agg(
        count(lit(1)).cast("long").as("ntokens"),
        sum("ppm").cast("long").as("lm_ppm_sum"),
        min("ppm").cast("long").as("lm_ppm_min"))
  }

  /** PII patterns, ordered most-specific-first so a match is consumed by
    * its own category (an SSN never half-matches as a phone, an email's
    * digits never match as a card number). Java-regex only — every rule
    * compiles to a native codegen `RegExpReplace`, no UDFs. */
  val PiiPatterns: Seq[(String, String, String)] = Seq(
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ssn", "\\b\\d{3}-\\d{2}-\\d{4}\\b", "<SSN>"),
    ("card", "\\b\\d(?:[ -]?\\d){12,15}\\b", "<CARD>"),
    ("phone", "(?<![\\d-])(?:\\+?\\d{1,2}[ .-])?(?:\\(\\d{3}\\)[ .]?|\\d{3}[ .-])\\d{3}[ .-]\\d{4}\\b", "<PHONE>"),
    ("ipv4", "\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b", "<IP>"))

  /** Redact PII in place: each category's matches are replaced with its
    * placeholder token, in [[PiiPatterns]] order. A chain of five native
    * `regexp_replace` expressions — one streaming pass per row inside
    * whole-stage codegen, no shuffle, trivially 100 TB-parallel. */
  def redactPii(text: Column): Column =
    PiiPatterns.foldLeft(text) { case (acc, (_, re, token)) =>
      regexp_replace(acc, re, token)
    }

  /** Synthetic PII corpus for the oracle cell: the real documents corpus
    * contains no PII-shaped text (a 0-match oracle would be vacuous), so
    * `q_text_pii` injects these rows keyed by real doc ids. The texts
    * deliberately avoid the one Java-regex feature DuckDB's RE2 lacks —
    * the phone pattern's lookbehind — by never placing a digit or hyphen
    * immediately before a phone-shaped run, so a lookbehind-free oracle
    * regex agrees on exactly these strings. No single quotes (the texts
    * embed into a SQL VALUES list verbatim). */
  val PiiSnippets: Seq[String] = Seq(
    "contact alice.smith+dev@example-corp.io for project details",
    "ssn on file 123-45-6789 confirmed by hr",
    "card 4111 1111 1111 1111 charged at checkout",
    "call (415) 555-2671 or 415-555-2671 before noon",
    "server at 192.168.10.254 responded to ping",
    "mixed row bob@x.org then 987-65-4320 then 10.0.0.1 done",
    "clean row with no identifiers at all")

  /** Redaction audit surface for the oracle cell: the redacted text plus
    * per-category hit counts DERIVED from the redacted text itself
    * (occurrences of each placeholder token, computed with plain
    * length/replace arithmetic) — the same counts are expressible in
    * DuckDB without regexp_count, so the oracle reproduces every column
    * exactly. Only sound when the input text cannot already contain a
    * placeholder token (true for [[PiiSnippets]]). */
  def piiAudit(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val counts = PiiPatterns.map { case (name, _, token) =>
      ((length(col("redacted")) -
        length(replace(col("redacted"), lit(token), lit("")))) /
        token.length).cast("long").as(s"n_$name")
    }
    docs.select(col(idCol).cast("long").as("id"),
        redactPii(col(textCol)).as("redacted"))
      .select(col("id") +: col("redacted") +: counts: _*)
  }

  /** Per-document PII hit counts, one column per category (the audit side
    * of [[redactPii]]: route documents to redaction/quarantine by count).
    * Counted on the same progressively-redacted text the replacement
    * chain sees, so categories never double-count each other's matches. */
  def piiCounts(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val (cols, _) = PiiPatterns.foldLeft(
      (Seq.empty[Column], col(textCol))) {
      case ((acc, t), (name, re, token)) =>
        (acc :+ regexp_count(t, lit(re)).cast("long").as(s"n_$name"),
          regexp_replace(t, re, token))
    }
    docs.select(col(idCol).as("id") +: cols: _*)
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

  /** Top-k terms per document by integer tf-idf: rank key =
    * `tf·10⁶ ÷ df` (integer division). The corpus size N scales every
    * key by the same constant, so it drops out of the RANKING — keeping
    * the key float-free and N-free (no extra count action / broadcast).
    * Ties break by term text. Output: (id, term, tf, df, rank), rank ≤ k.
    *
    * Plan: explode → groupBy(id, term) [map-side combine collapses
    * within-doc repeats before the shuffle] → term-keyed df aggregation
    * over the tf table [∝ distinct doc-term pairs, NOT tokens] → join
    * back by term → one windowed rank per doc. At 100 TB every shuffle
    * carries (id, term, count) triples, never raw text. */
  def tfidfTopK(docs: DataFrame, idCol: String, textCol: String,
      k: Int): DataFrame = {
    val tf = docs.select(col(idCol).as("id"),
        explode(tokens(col(textCol))).as("term"))
      .where(col("term") =!= "")
      .groupBy(col("id"), col("term")).agg(count(lit(1)).as("tf"))
      .graftCheckpoint(true) // feeds both the df agg and the final join
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    // INTEGER division (div, not /): Column./ is double division, whose
    // ordering near-ties would diverge from the oracle's integer `//`.
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("id"))
      .orderBy(expr("(tf * 1000000) div df").desc, col("term").asc)
    tf.join(df, Seq("term"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select(col("id"), col("term"), col("tf"), col("df"), col("rank"))
  }

  /** END-TO-END corpus cleaning verdict — the composition a training-data
    * pipeline actually ships: one row per document with the individual
    * filter verdicts and the final keep decision.
    *
    *  - `not_dup`: the doc is its exact-dedup group's keeper (minimum id
    *    per content digest — drop all other copies);
    *  - `len_ok`: token count within [minTokens, maxTokens];
    *  - `rep_ok`: repeated word `n`-gram windows are less than a third of
    *    all windows (degenerate/boilerplate filter);
    *  - `kept` = conjunction.
    *
    * Every verdict is a pure function of (id, text): the digest groupBy is
    * the only shuffle, everything else is per-row arithmetic — at 100 TB
    * this is one pass over the corpus plus a digest-keyed exchange. */
  def cleanVerdicts(docs: DataFrame, idCol: String, textCol: String,
      minTokens: Int, maxTokens: Int, ngramN: Int): DataFrame = {
    val d = docs.select(col(idCol).cast("long").as("id"), col(textCol).as("text"))
    // The keeper (min id per content digest) is ONE window over the
    // digest column — not a groupBy + self-join, which re-scanned the
    // corpus, re-digested every text on the keeper branch, AND let the
    // digest equi-join's inferred isnotnull(digest) substitute the md5
    // back into both scan filters (~3 full-text digests per row per
    // branch — round-12 plan audit; a shared-checkpoint variant was
    // measured 2× slower: materializing the token-hash arrays costs
    // more than the digests save). One scan, one exchange, one md5 per
    // row. Bind the token-hash column BEFORE windowing — an inline
    // tokenHashPairs inside the window lambdas would re-digest every
    // token per window (O(len²) md5s per document).
    val wd = org.apache.spark.sql.expressions.Window.partitionBy(col("digest"))
    d.select(col("id"), md5(col("text")).as("digest"),
        tokenCount(col("text")).as("_nt"),
        tokenHashPairs(col("text")).as("_hp"))
      .select(col("id"), col("digest"), col("_nt"),
        shingleHashWindows(col("_hp"), ngramN).as("_w"))
      .withColumn("_keeper", min(col("id")).over(wd))
      .select(col("id"),
        (col("id") === col("_keeper")).as("not_dup"),
        (col("_nt") >= minTokens && col("_nt") <= maxTokens).as("len_ok"),
        ((size(col("_w")) - size(array_distinct(col("_w")))) * 3 <
          size(col("_w"))).as("rep_ok"))
      .withColumn("kept", col("not_dup") && col("len_ok") && col("rep_ok"))
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
      groups(corpus).graftCheckpoint(true), members(corpus),
      groups(benchmark).graftCheckpoint(true), members(benchmark), n)
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
    val c = shingleSet(corpusHp, "corpus_id").graftCheckpoint(true)
    val b = shingleSet(benchHp, "bench_id")
    val sizes = c.groupBy(col("corpus_id")).agg(count(lit(1)).as("corpus_sz"))
    c.join(b, Seq("s"))
      .groupBy(col("corpus_id"), col("bench_id"))
      .agg(count(lit(1)).as("shared"))
      .join(sizes, Seq("corpus_id"))
  }
}
