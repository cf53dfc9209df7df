package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The curation pipeline under Structured Streaming: the same per-document
  * column arithmetic the batch operators use ([[graft.text.TextOps]]),
  * composed into a continuous ingest plan — quality gate → in-horizon exact
  * dedup → per-window corpus ledger. This is the streaming twin of
  * [[graft.text.CorpusPipeline]]: a training-data firehose is curated AS IT
  * ARRIVES, and the nightly batch pass only handles what the horizon cannot
  * (long-range duplicates, corpus-wide statistics).
  *
  * Plan shape: the scoring stage is a narrow map (no state), dedup keeps
  * O(32 B) per distinct hash inside the watermark horizon, and the ledger is
  * a standard watermarked windowed aggregate — two chained stateful
  * operators, both bounded, both emitting in append mode on window close.
  */
object StreamingCuration {

  import StreamingDedup.Doc

  /** Gopher-style per-doc quality — THE batch formula, by construction:
    * [[graft.text.TextOps.qualityCol]] is the single shared definition.
    */
  def quality(content: Column): Column = graft.text.TextOps.qualityCol(content)

  def plan(
      docs: DataFrame,
      horizonSec: Int = 10,
      minQuality: Double = 0.5,
      windowSec: Int = 10): DataFrame =
    docs
      .withColumn("quality", quality(col("content")))
      .withColumn("n_tokens", size(split(col("content"), " ")).cast("long"))
      .filter(col("quality") >= minQuality)
      .withColumn("content_hash", md5(col("content")))
      .withWatermark("ts", s"$horizonSec seconds")
      .dropDuplicatesWithinWatermark("content_hash")
      .groupBy(window(col("ts"), s"$windowSec seconds"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum("n_tokens").as("n_tokens"),
        avg("quality").as("avg_quality"))
      .select(
        col("window.start").as("w_start"),
        col("n_docs"), col("n_tokens"), col("avg_quality"))

  // Doc is defined on StreamingDedup; re-exported for callers of this plan
  type IngestDoc = Doc

  /** Streaming contamination check — the stream-STATIC join mode: incoming
    * documents join against the static benchmark shingle set (tiny,
    * broadcast; the batch twin is [[graft.text.CurationOps.contamination]]).
    * A doc sharing ≥ `minOverlap` shingles with any benchmark doc is flagged
    * before it ever lands in the corpus. The static side is planned once and
    * broadcast to every micro-batch; the stream side is a narrow
    * explode→join→agg with no state beyond the in-flight batch.
    */
  def contaminationPlan(
      docs: DataFrame,
      benchShingles: DataFrame, // (bench_id, s) static
      minOverlap: Int = 3,
      shingleK: Int = 5,
      horizonSec: Int = 10): DataFrame = {
    val toks = split(col("content"), " ")
    val sh = docs
      .withColumn("toks", toks)
      .filter(size(col("toks")) >= shingleK)
      .select(col("ts"), col("docId"),
        explode(graft.dedup.DedupOps.shinglesFromToks(col("toks"), shingleK)).as("s"))
    // a document's shingles share its single event time, so the tumbling
    // window closes with the doc and the watermark bounds aggregation state
    // (a bare groupBy(docId) would hold state for every doc ever seen)
    sh.withWatermark("ts", s"$horizonSec seconds")
      .join(broadcast(benchShingles), "s")
      .groupBy(window(col("ts"), s"$horizonSec seconds"), col("docId"), col("bench_id"))
      .agg(count(lit(1)).as("n_overlap"))
      .filter(col("n_overlap") >= minOverlap)
      .select("docId", "bench_id", "n_overlap")
  }
}
