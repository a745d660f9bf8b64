package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming ingest dedup — the arrival-time form of the batch
  * `Dedup.incrementalExact` composition: as documents stream in, emit
  * only the FIRST occurrence of each content digest, optionally dropping
  * anything already present in a standing corpus.
  *
  * Built from Spark's own streaming primitives rather than custom state:
  *
  *  - the standing-corpus filter is a stream-static LEFT ANTI join on the
  *    digest — the static side is a digest projection the optimizer can
  *    broadcast, and it is re-planned per micro-batch, so a corpus table
  *    that grows between batches is picked up automatically;
  *  - within-stream first-occurrence is `dropDuplicates` on the digest —
  *    Spark's stateful dedup operator keeps one state row per distinct
  *    digest in the state store (RocksDB-backed on a real cluster). The
  *    anti join runs FIRST so corpus duplicates never enter that state.
  *
  * At 100 TB of accumulated stream the digest state store is the scale
  * bound: real deployments bound it with
  * `withWatermark + dropDuplicatesWithinWatermark` (first-occurrence per
  * watermark window) or periodically compact the stream into the standing
  * corpus and restart the query — both compose with this operator
  * unchanged (pass a watermarked frame in).
  *
  * Output: (id, digest) per surviving document, Append mode.
  */
object StreamingDedup {

  /** Within-stream first occurrence per content digest. */
  def firstOccurrence(stream: DataFrame, idCol: String,
      textCol: String): DataFrame =
    stream.select(col(idCol).cast("long").as("id"),
        md5(col(textCol)).as("digest"))
      .dropDuplicates("digest")

  /** First occurrence, excluding digests already in `corpus` (static). */
  def againstCorpus(stream: DataFrame, corpus: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val corpusD = corpus.select(md5(col(textCol)).as("digest")).distinct()
    stream.select(col(idCol).cast("long").as("id"),
        md5(col(textCol)).as("digest"))
      .join(corpusD, Seq("digest"), "left_anti")
      .select(col("id"), col("digest")) // using-join moved the key first
      .dropDuplicates("digest")
  }
}
