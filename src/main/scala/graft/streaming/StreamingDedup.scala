package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming ingest-time deduplication — the stage a training-data pipeline
  * runs where the reference runs its Kafka→Druid ingestion
  * (`/root/reference/stream_processing/duty_cycle_avro.py`): documents arrive
  * continuously and exact duplicates must be dropped before they reach the
  * corpus store.
  *
  * Uses `dropDuplicatesWithinWatermark` keyed on the content hash: unlike
  * plain `dropDuplicates` (whose state grows with the corpus forever — fatal
  * on an unbounded 100 TB/day stream), the watermark bounds state to the
  * dedup horizon. Duplicates farther apart than the horizon fall through to
  * the batch [[graft.dedup.DedupOps.exactDedup]] pass — the standard
  * streaming/batch split (streaming catches the bursty near-in-time copies,
  * the nightly batch catches the long tail).
  */
object StreamingDedup {

  case class Doc(ts: Timestamp, docId: Long, content: String)

  /** First-seen docs within the watermark horizon, keyed by content hash.
    * The hash (not the content) is the state key, so per-key state is O(32
    * bytes) no matter the document size.
    */
  def plan(docs: DataFrame, horizonSec: Int = 10): DataFrame =
    docs
      .withColumn("content_hash", md5(col("content")))
      .withWatermark("ts", s"$horizonSec seconds")
      .dropDuplicatesWithinWatermark("content_hash")
}
