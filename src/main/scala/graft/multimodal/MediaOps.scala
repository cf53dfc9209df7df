package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Multimodal column plumbing: image/audio/video payloads as opaque `binary`
  * columns with typed metadata, and a batched partition-level decode /
  * feature-extract stage.
  *
  * The decode step itself is STUBBED (this container has no image/audio
  * codecs): [[FakeDecoder.decode]] derives deterministic pseudo-features from
  * the byte length. Everything around it is the real Spark shape a production
  * pipeline needs: a typed `Dataset`, `mapPartitions` batching (the Scala
  * analogue of `mapInPandas` — one iterator per partition, no per-row
  * overhead), and schema/partitioning that survive a 1000-executor scale-up
  * (media rows are value-heavy, so the stage is a narrow map with no shuffle).
  */
object MediaOps {

  case class MediaRecord(doc_id: Long, media_type: String, content: Array[Byte])
  case class MediaFeatures(
      doc_id: Long,
      media_type: String,
      n_bytes: Long,
      width: Int,
      height: Int,
      duration_s: Double)

  /** Stand-in decoder: replace with a real codec binding in production.
    * Deterministic on byte length so tests and the oracle can pin it.
    */
  object FakeDecoder {
    def decode(r: MediaRecord): MediaFeatures = {
      val n = r.content.length.toLong
      MediaFeatures(
        r.doc_id,
        r.media_type,
        n,
        width = (64 + n % 640).toInt,
        height = (64 + n % 480).toInt,
        duration_s = (n % 3600).toDouble / 10.0)
    }
  }

  /** Synthesize a media table from `documents`: UTF-8 bytes as the opaque
    * payload, media_type cycling by doc_id.
    */
  def mediaTable(spark: SparkSession, sfDir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    Tables.documents(spark, sfDir)
      .select(
        col("doc_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")), (col("doc_id") % 3 + 1).cast("int"))
          .as("media_type"),
        encode(col("text"), "UTF-8").as("content"))
      .as[MediaRecord]
  }

  /** The batched decode stage: one decoder instance per partition, iterator
    * in / iterator out — the `mapInPandas` shape in Scala.
    */
  def decodeFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition setup (a real decoder would open codecs here, once)
      rows.map(FakeDecoder.decode)
    }
  }

  /** Metadata-only path (no decode): byte length + content digest via native
    * column functions — stays in whole-stage codegen.
    */
  def mediaMeta(spark: SparkSession, sfDir: String): DataFrame =
    mediaTable(spark, sfDir).toDF()
      .select(
        col("doc_id"),
        col("media_type"),
        length(col("content")).as("n_bytes"),
        sha2(col("content"), 256).as("digest"))
      .orderBy("doc_id")

  val mediaMetaSql: String =
    """SELECT doc_id,
      |       ['image', 'audio', 'video'][CAST(doc_id % 3 AS INT) + 1] AS media_type,
      |       CAST(octet_length(encode(text)) AS INT) AS n_bytes,
      |       sha256(text) AS digest
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Decoded feature table through the mapPartitions stage. */
  def mediaFeatures(spark: SparkSession, sfDir: String): DataFrame =
    decodeFeatures(mediaTable(spark, sfDir)).toDF().orderBy("doc_id")

  val mediaFeaturesSql: String =
    """SELECT doc_id,
      |       ['image', 'audio', 'video'][CAST(doc_id % 3 AS INT) + 1] AS media_type,
      |       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
      |       CAST(64 + octet_length(encode(text)) % 640 AS INT) AS width,
      |       CAST(64 + octet_length(encode(text)) % 480 AS INT) AS height,
      |       CAST(octet_length(encode(text)) % 3600 AS DOUBLE) / 10.0 AS duration_s
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Resize planning: aspect-preserving fit of each decoded frame into a
    * `box`×`box` target (the long side lands exactly on `box`), in pure
    * integer arithmetic so both engines agree bit-for-bit. In production the
    * dimension plan computed here drives the batched resize kernel inside
    * the same [[decodeFeatures]] mapPartitions stage; the plan itself is
    * column arithmetic and stays in whole-stage codegen.
    */
  val ResizeBox = 224

  def mediaResize(spark: SparkSession, sfDir: String): DataFrame =
    decodeFeatures(mediaTable(spark, sfDir)).toDF()
      .select(col("doc_id"), col("media_type"), col("width"), col("height"))
      .withColumn("long_side", greatest(col("width"), col("height")))
      .withColumn("out_w", expr(s"CAST((width * $ResizeBox) div long_side AS INT)"))
      .withColumn("out_h", expr(s"CAST((height * $ResizeBox) div long_side AS INT)"))
      .withColumn("out_bytes", col("out_w") * col("out_h") * 3)
      .select("doc_id", "media_type", "width", "height", "out_w", "out_h", "out_bytes")
      .orderBy("doc_id")

  val mediaResizeSql: String =
    s"""WITH f AS (
       |  SELECT doc_id,
       |         ['image', 'audio', 'video'][CAST(doc_id % 3 AS INT) + 1] AS media_type,
       |         CAST(64 + octet_length(encode(text)) % 640 AS INT) AS width,
       |         CAST(64 + octet_length(encode(text)) % 480 AS INT) AS height
       |  FROM documents),
       |g AS (SELECT *, greatest(width, height) AS long_side FROM f)
       |SELECT doc_id, media_type, width, height,
       |       CAST((width * $ResizeBox) // long_side AS INT) AS out_w,
       |       CAST((height * $ResizeBox) // long_side AS INT) AS out_h,
       |       CAST((width * $ResizeBox) // long_side AS INT)
       |         * CAST((height * $ResizeBox) // long_side AS INT) * 3 AS out_bytes
       |FROM g ORDER BY doc_id""".stripMargin

  /** Frame sampling for video payloads: up to `maxFrames` stride-spaced
    * frames per clip (the uniform-sampling policy video training pipelines
    * use before batched frame decode). The frame count derives from the
    * decoded duration (fps × seconds); each sampled frame gets a
    * deterministic fingerprint in place of decoded pixels. One
    * filter→explode pass, fanout ≤ maxFrames per video row — the frame
    * table a production pipeline would feed to the decode stage.
    */
  val FrameFps = 10
  val MaxFrames = 8

  def frameSample(spark: SparkSession, sfDir: String): DataFrame =
    mediaTable(spark, sfDir).toDF()
      .filter(col("media_type") === "video")
      .select(
        col("doc_id"),
        (length(col("content")) % 3600).cast("int").as("n_frames"),
        sha2(col("content"), 256).as("digest"))
      .filter(col("n_frames") > 0)
      .withColumn("stride", expr(s"CAST((n_frames + ${MaxFrames - 1}) div $MaxFrames AS INT)"))
      .select(
        col("doc_id"),
        col("n_frames"),
        explode(expr("sequence(0, n_frames - 1, stride)")).as("frame_idx"),
        col("digest"))
      .select(
        col("doc_id"),
        col("n_frames"),
        col("frame_idx"),
        (col("frame_idx").cast("double") / FrameFps).as("frame_ts"),
        md5(concat(col("digest"), lit("_"), col("frame_idx").cast("string"))).as("frame_fp"))
      .orderBy("doc_id", "frame_idx")

  val frameSampleSql: String =
    s"""WITH v AS (
       |  SELECT doc_id,
       |         CAST(octet_length(encode(text)) % 3600 AS INT) AS n_frames,
       |         sha256(text) AS digest
       |  FROM documents
       |  WHERE CAST(doc_id % 3 AS INT) + 1 = 3
       |    AND octet_length(encode(text)) % 3600 > 0),
       |s AS (SELECT *, CAST((n_frames + ${MaxFrames - 1}) // $MaxFrames AS INT) AS stride FROM v)
       |SELECT doc_id, n_frames,
       |       CAST(unnest(generate_series(0, n_frames - 1, stride)) AS INT) AS frame_idx,
       |       CAST(unnest(generate_series(0, n_frames - 1, stride)) AS DOUBLE) / $FrameFps AS frame_ts,
       |       md5(digest || '_' || CAST(unnest(generate_series(0, n_frames - 1, stride)) AS VARCHAR)) AS frame_fp
       |FROM s ORDER BY doc_id, frame_idx""".stripMargin

  /** Audio segmentation: fixed 30 s windows at 16 kHz over each audio
    * payload — the speech-pipeline front-end (Whisper, wav2vec pretraining
    * batches audio exactly this way), with the final short segment padded to
    * the window length and the pad accounted per segment. The sample count
    * derives deterministically from the payload (0.1 s duration units ×
    * 16 000 Hz — same derivation as [[decodeFeatures]]' duration), so the
    * segment ledger is oracle-exact. One filter→explode pass, fanout bounded
    * by ceil(duration / 30 s) per clip; each segment carries a deterministic
    * fingerprint standing in for its decoded waveform slice.
    */
  val AudioRate = 16000
  val SegmentSec = 30
  private val SegLen = AudioRate * SegmentSec // samples per segment

  def audioSegments(spark: SparkSession, sfDir: String): DataFrame =
    mediaTable(spark, sfDir).toDF()
      .filter(col("media_type") === "audio")
      .select(
        col("doc_id"),
        ((length(col("content")) % 3600) * (AudioRate / 10)).cast("long").as("n_samples"),
        sha2(col("content"), 256).as("digest"))
      .filter(col("n_samples") > 0)
      .withColumn("n_segs", expr(s"CAST((n_samples + ${SegLen - 1}) div $SegLen AS INT)"))
      .select(
        col("doc_id"), col("n_samples"),
        explode(expr("sequence(0, n_segs - 1)")).as("seg_idx"),
        col("digest"))
      .select(
        col("doc_id"),
        col("seg_idx"),
        (col("seg_idx") * SegmentSec).cast("int").as("start_s"),
        least(lit(SegLen.toLong), col("n_samples") - col("seg_idx") * SegLen).as("seg_samples"),
        (lit(SegLen.toLong) - least(lit(SegLen.toLong), col("n_samples") - col("seg_idx") * SegLen))
          .as("pad_samples"),
        md5(concat(col("digest"), lit("_s"), col("seg_idx").cast("string"))).as("seg_fp"))
      .orderBy("doc_id", "seg_idx")

  val audioSegmentsSql: String =
    s"""WITH a AS (
       |  SELECT doc_id,
       |         CAST((octet_length(encode(text)) % 3600) * ${AudioRate / 10} AS BIGINT) AS n_samples,
       |         sha256(text) AS digest
       |  FROM documents
       |  WHERE CAST(doc_id % 3 AS INT) + 1 = 2
       |    AND octet_length(encode(text)) % 3600 > 0),
       |s AS (SELECT *, CAST((n_samples + ${SegLen - 1}) // $SegLen AS INT) AS n_segs FROM a),
       |e AS (SELECT doc_id, n_samples, digest,
       |             CAST(unnest(generate_series(0, n_segs - 1)) AS INT) AS seg_idx
       |      FROM s)
       |SELECT doc_id, seg_idx,
       |       CAST(seg_idx * $SegmentSec AS INT) AS start_s,
       |       least($SegLen, n_samples - seg_idx * $SegLen) AS seg_samples,
       |       $SegLen - least($SegLen, n_samples - seg_idx * $SegLen) AS pad_samples,
       |       md5(digest || '_s' || CAST(seg_idx AS VARCHAR)) AS seg_fp
       |FROM e ORDER BY doc_id, seg_idx""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_media_meta" -> (mediaMeta(_, _)),
    "q_media_features" -> (mediaFeatures(_, _)),
    "q_media_resize" -> (mediaResize(_, _)),
    "q_frame_sample" -> (frameSample(_, _)),
    "q_audio_segments" -> (audioSegments(_, _))
  )

  def oracle: Map[String, String] = Map(
    "q_media_meta" -> mediaMetaSql,
    "q_media_features" -> mediaFeaturesSql,
    "q_media_resize" -> mediaResizeSql,
    "q_frame_sample" -> frameSampleSql,
    "q_audio_segments" -> audioSegmentsSql
  )
}
