package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, md5, min => smin, first}
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Portable
import graft.pipeline.{Dedup, Similarity}

/** Randomized equivalence properties for the exact-first family: every
  * exact-first composition must reproduce its direct (all-documents)
  * operator row for row on corpora with random duplication — the regime
  * the compositions exist for. Deterministic seeds; small corpora (each
  * case runs real Spark jobs).
  */
class ExactFirstPropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // Random corpora: words from a small vocabulary (forces shared spans /
  // close signatures), each doc replicated 1-3x as exact copies.
  private val genDoc: Gen[String] = for {
    n <- Gen.chooseNum(2, 12)
    ws <- Gen.listOfN(n, Gen.oneOf("alpha", "beta", "gamma", "delta",
      "epsilon", "zeta", "eta", "theta"))
  } yield ws.mkString(" ")

  private val genCorpus: Gen[Seq[(Long, String)]] = for {
    k <- Gen.chooseNum(3, 7)
    texts <- Gen.listOfN(k, genDoc)
    reps <- Gen.listOfN(k, Gen.chooseNum(1, 3))
  } yield texts.zip(reps).zipWithIndex.flatMap { case ((t, r), i) =>
    (0 until r).map(j => (i * 10L + j, t))
  }

  private def corpora(seed: Long, n: Int): Seq[Seq[(Long, String)]] =
    (0 until n).map(i =>
      genCorpus(Gen.Parameters.default, Seed(seed + i))
        .getOrElse(Seq((1L, "alpha beta"))))

  private def groupTables(docs: DataFrame): (DataFrame, DataFrame) = {
    val d = docs.select(col("doc_id").cast("long").as("id"), col("text"))
    val groups = d.groupBy(md5(col("text")).as("digest"))
      .agg(smin(col("id")).as("rep"), first(col("text")).as("text"))
      .select(col("digest"), col("rep"),
        Portable.tokenHashPairs(col("text")).as("_hp"))
    val members = d.select(col("id"), md5(col("text")).as("digest"))
    (groups, members)
  }

  test("span duplication: exact-first == direct on random replicated corpora") {
    corpora(41L, 6).foreach { corpus =>
      val docs = corpus.toDF("doc_id", "text")
      val hp = docs.select(col("doc_id").cast("long").as("id"),
        Portable.tokenHashPairs(col("text")).as("_hp"))
      val (groups, members) = groupTables(docs)
      def rows(df: DataFrame) =
        df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val direct = rows(Dedup.spanDuplicationFromHp(hp, 3))
      val ef = rows(Dedup.spanDuplicationFromGroups(groups, members, 3, 1,
        "nspans", "ndup"))
      assert(ef == direct, s"corpus: $corpus")
    }
  }

  test("LSH jaccard: exact-first == direct on random replicated corpora") {
    corpora(53L, 6).foreach { corpus =>
      val docs = corpus.toDF("doc_id", "text")
      val hp = docs.select(col("doc_id").cast("long").as("id"),
        Portable.tokenHashPairs(col("text")).as("_hp"))
      val (groups, members) = groupTables(docs)
      def rows(df: DataFrame) = df.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      val direct = rows(Dedup.ngramJaccardFromHp(hp,
        Dedup.candidatePairs(Dedup.lshBuckets(
          Dedup.minhashFromHp(hp, 3, 8), 8, 4)), 3))
      val ef = rows(Dedup.ngramJaccardExactFirstFromGroups(groups, members,
        3, 8, 4))
      assert(ef == direct, s"corpus: $corpus")
    }
  }

  test("simhash pairs: exact-first == direct on random replicated corpora") {
    corpora(43L, 6).foreach { corpus =>
      val docs = corpus.toDF("doc_id", "text")
      def rows(df: DataFrame) =
        df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val direct = rows(Dedup.simhashPairs(
        Dedup.simhash(docs, "doc_id", "text", 60), 60, 4, 3))
      val ef = rows(Dedup.simhashPairsExactFirst(docs, "doc_id", "text",
        60, 4, 3))
      assert(ef == direct, s"corpus: $corpus")
    }
  }

  test("semantic dedup: exact-first == direct on random replicated vectors") {
    val genVec: Gen[Array[Float]] = Gen.listOfN(4,
      Gen.oneOf(-1.0f, -0.5f, 0.0f, 0.5f, 1.0f)).map(_.toArray)
    val genVecs: Gen[Seq[(Long, Array[Float])]] = for {
      k <- Gen.chooseNum(4, 8)
      vs <- Gen.listOfN(k, genVec)
      reps <- Gen.listOfN(k, Gen.chooseNum(1, 3))
    } yield vs.zip(reps).zipWithIndex.flatMap { case ((v, r), i) =>
      (0 until r).map(j => (i * 10L + j, v))
    }
    (0 until 6).foreach { i =>
      val vecs = genVecs(Gen.Parameters.default, Seed(47L + i))
        .getOrElse(Seq((0L, Array(1.0f, 0f, 0f, 0f))))
        .toDF("vec_id", "embedding")
      def rows(df: DataFrame) =
        df.collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
      val direct = rows(Similarity.semanticDedup(vecs, cells = 2, 60, 100))
      val ef = rows(Similarity.semanticDedupExactFirst(vecs, cells = 2, 60, 100))
      assert(ef == direct, s"seed ${47L + i}")
    }
  }
}
