package graft.dedup

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Durable hamming-space fingerprint index — [[LshIndex]]'s discipline
  * (materialize once, probe per batch, replay-idempotent `batch=<id>`
  * segments) applied to 64-bit perceptual/semantic fingerprints: image
  * aHashes ([[graft.multimodal.MediaOps.imageAHash]]), text SimHashes, or
  * any (id, fp_hi, fp_lo) relation of two 32-bit words.
  *
  * Candidates come from a pigeonhole band equi-join: the 64 bits split into
  * [[NBands]] disjoint bytes, and any pair within hamming distance
  * [[NBands]]−1 must agree exactly on ≥ 1 byte — candidate volume scales
  * with rows × bands, never rows². A pair agreeing on k bands would surface
  * k times; keeping only the FIRST agreeing band (computable from the xor
  * words row-wise) emits each pair exactly once with NO distinct() — the
  * probe plan is scan → broadcast join → codegen'd filter, zero shuffles.
  *
  * The 8-bit band alphabet (256 buckets per band) is the standard
  * multi-index-hashing trade: at larger corpora, use wider fingerprints
  * (e.g. 256-bit pHash) with 16-bit bands for flat bucket occupancy — every
  * shape here is parameterized by the band list alone.
  */
object FingerprintIndex {

  val NBands = 8

  /** Pigeonhole-guaranteed distance bound for [[NBands]] disjoint bands. */
  val MaxDist: Int = NBands - 1

  /** Band k of a fingerprint: bytes 0..3 of fp_lo, then bytes 0..3 of fp_hi
    * — the same order [[bandVal]] and the first-agreeing-band filter use.
    */
  private val Bands: Seq[(String, Int)] =
    (0 until 4).map(k => ("fp_lo", 8 * k)) ++ (0 until 4).map(k => ("fp_hi", 8 * k))

  private def bandVal(word: Column, off: Int): Column =
    shiftright(word, off).bitwiseAND(255).cast("int")

  /** One row per (id, band): id, fp_hi, fp_lo, band_idx, band_val. */
  def bandTable(fps: DataFrame): DataFrame =
    fps.select(
      col("id"), col("fp_hi"), col("fp_lo"),
      explode(array(Bands.zipWithIndex.map { case ((word, off), b) =>
        struct(lit(b).as("band_idx"), bandVal(col(word), off).as("band_val"))
      }: _*)).as("b"))
      .select(col("id"), col("fp_hi"), col("fp_lo"), col("b.band_idx"), col("b.band_val"))

  /** Keep exactly the row whose band_idx is the pair's first agreeing band.
    * `xhi`/`xlo` are the xor words of the joined pair, so "band j agrees" is
    * a row-wise bit test — no lookup, no distinct.
    */
  private def isFirstAgreeingBand: Column = {
    def agreesAt(j: Int): Column = {
      val (word, off) = Bands(j)
      val x = if (word == "fp_lo") col("xlo") else col("xhi")
      shiftright(x, off).bitwiseAND(255) === 0
    }
    Bands.indices.map { b =>
      val noEarlier = (0 until b).map(j => !agreesAt(j)).reduceOption(_ && _).getOrElse(lit(true))
      (col("band_idx") === b) && noEarlier
    }.reduce(_ || _)
  }

  /** One-shot near-dup pairs within a fingerprint relation (id, fp_hi,
    * fp_lo): hamming ≤ maxDist, each unordered pair once as id_a < id_b.
    */
  def pairsWithin(fps: DataFrame, maxDist: Int = MaxDist): DataFrame = {
    require(maxDist <= MaxDist, s"pigeonhole over $NBands bands covers distance ≤ $MaxDist")
    val blocks = bandTable(fps)
    blocks.as("a").join(
        blocks.as("b"),
        col("a.band_idx") === col("b.band_idx") &&
          col("a.band_val") === col("b.band_val") &&
          col("a.id") < col("b.id"))
      .select(
        col("a.id").as("id_a"), col("b.id").as("id_b"), col("a.band_idx").as("band_idx"),
        expr("a.fp_hi ^ b.fp_hi").as("xhi"), expr("a.fp_lo ^ b.fp_lo").as("xlo"))
      .withColumn("hamming", (bit_count(col("xhi")) + bit_count(col("xlo"))).cast("int"))
      .filter(col("hamming") <= maxDist && isFirstAgreeingBand)
      .select("id_a", "id_b", "hamming")
  }

  /** Full build: fingerprint relation into segment 0. */
  def materialize(spark: SparkSession, fps: DataFrame, indexPath: String): Unit =
    appendBatch(spark, indexPath, fps, batchId = 0L)

  /** Absorb `fps` as the `batch=<id>` segment — overwritten whole, so a
    * checkpoint-replayed batch rewrites the same rows (ingest idempotency).
    * band_idx is the partition column: probe joins on it are DPP-prunable
    * and [[compactSegments]] keeps the layout.
    */
  def appendBatch(
      spark: SparkSession, indexPath: String, fps: DataFrame, batchId: Long): Unit =
    bandTable(fps)
      .write.mode("overwrite")
      .partitionBy("band_idx")
      .parquet(s"$indexPath/batch=$batchId")

  def compactSegments(
      spark: SparkSession, indexPath: String, protectLatest: Boolean = true): Int =
    graft.sources.Segments.compact(spark, indexPath, Seq("band_idx"), protectLatest)

  def read(spark: SparkSession, indexPath: String): DataFrame =
    spark.read.option("basePath", indexPath).parquet(indexPath).drop("batch")

  /** Snapshot read — the index exactly as of `maxBatch` (the reproducibility
    * pin, [[graft.sources.Segments.readAsOf]] contract).
    */
  def readAsOf(spark: SparkSession, indexPath: String, maxBatch: Long): DataFrame =
    graft.sources.Segments.readAsOf(spark, indexPath, maxBatch)

  /** Near-dup candidates of a probe fingerprint batch against the stored
    * index: (probe_id, index_id, hamming), each pair once (first-agreeing-
    * band emission — no distinct, so the probe plan has zero shuffles when
    * the batch broadcasts). `excludeSegment`/`asOf` compose as in
    * [[LshIndex.candidates]]: replay determinism and snapshot pinning, both
    * partition-pruned on `batch`.
    */
  def candidates(
      spark: SparkSession,
      indexPath: String,
      probeFps: DataFrame,
      maxDist: Int = MaxDist,
      broadcastQuery: Boolean = true,
      excludeSegment: Option[Long] = None,
      asOf: Option[Long] = None): DataFrame = {
    require(maxDist <= MaxDist, s"pigeonhole over $NBands bands covers distance ≤ $MaxDist")
    val probe0 = bandTable(probeFps).select(
      col("id").as("probe_id"), col("fp_hi").as("p_hi"), col("fp_lo").as("p_lo"),
      col("band_idx"), col("band_val"))
    val probe = if (broadcastQuery) broadcast(probe0) else probe0
    val index = (asOf, excludeSegment) match {
      case (None, None) => read(spark, indexPath)
      case _ =>
        val snap = asOf
          .map(graft.sources.Segments.readAsOf(spark, indexPath, _, dropBatch = false))
          .getOrElse(spark.read.option("basePath", indexPath).parquet(indexPath))
        excludeSegment.map(id => snap.filter(col("batch") =!= id)).getOrElse(snap)
          .drop("batch")
    }
    index
      .join(probe, Seq("band_idx", "band_val"))
      .filter(col("id") =!= col("probe_id"))
      .select(
        col("probe_id"), col("id").as("index_id"), col("band_idx"),
        expr("p_hi ^ fp_hi").as("xhi"), expr("p_lo ^ fp_lo").as("xlo"))
      .withColumn("hamming", (bit_count(col("xhi")) + bit_count(col("xlo"))).cast("int"))
      .filter(col("hamming") <= maxDist && isFirstAgreeingBand)
      .select("probe_id", "index_id", "hamming")
  }

  /** Segment-id offset for streaming batches (see
    * [[LshIndex.StreamingSegmentBase]]).
    */
  val StreamingSegmentBase = 1000000000L

  /** Streaming ingest: each micro-batch of fingerprints is probed against
    * the stored index (candidates to `candOut/batch=<segment>`) then
    * absorbed as its own segment. Probe-before-absorb + own-segment
    * exclusion keep both writes deterministic under checkpoint replay.
    */
  def streamingAbsorb(
      fpStream: DataFrame, indexPath: String, candOut: String, checkpoint: String)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    fpStream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val segment = StreamingSegmentBase + batchId
        val cand =
          if (hasSegments(spark, indexPath))
            candidates(spark, indexPath, batch, excludeSegment = Some(segment))
          else
            spark.createDataFrame(
              spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
              org.apache.spark.sql.types.StructType(Seq(
                org.apache.spark.sql.types.StructField("probe_id", org.apache.spark.sql.types.LongType),
                org.apache.spark.sql.types.StructField("index_id", org.apache.spark.sql.types.LongType),
                org.apache.spark.sql.types.StructField("hamming", org.apache.spark.sql.types.IntegerType))))
        cand.write.mode("overwrite").parquet(s"$candOut/batch=$segment")
        appendBatch(spark, indexPath, batch, segment)
      }

  private def hasSegments(spark: SparkSession, indexPath: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(indexPath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(p) && fs.listStatus(p)
      .exists(s => s.isDirectory && s.getPath.getName.startsWith("batch="))
  }
}
