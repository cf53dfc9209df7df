package graft.ann

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions
import SimilarityOps.{probeCells, withCentroidAssignment, withNorm}

/** Durable IVF index — the similarity-search analogue of the rollup table's
  * materialization discipline: a 100 TB embedding corpus is assigned to its
  * cells ONCE, persisted PARTITIONED BY `centroid_id`, and every search
  * touches only the probed cells' partitions.
  *
  * Index schema: (vec_id, v double-array, nn squared norm, centroid_id),
  * laid out `batch=<id>/centroid_id=<k>/` — incoming embedding batches are
  * assigned in isolation (the centroid set is fixed and deterministic, so
  * assignments computed at different times agree bit-for-bit) and absorbed
  * as replay-idempotent segments, the same discipline as
  * [[graft.dedup.LshIndex]] and the rollup's streaming writer.
  *
  * Search shape at scale: the query batch is small — its per-query nprobe
  * cell list BROADCASTS, and Spark's dynamic partition pruning turns the
  * broadcast into a `centroid_id` partition filter on the index scan, so a
  * 2-of-8 probe reads ~1/4 of the index and shuffles nothing but the final
  * per-query top-k. Norms are precomputed at index time; search evaluates
  * one codegen'd dot product per (query, candidate).
  */
object IvfIndex {

  def materialize(spark: SparkSession, embeddings: DataFrame, indexPath: String): Unit =
    appendBatch(spark, indexPath, embeddings, batchId = 0L)

  /** Assign ONLY `embeddings` (vec_id, embedding) and absorb them as the
    * `batch=<id>` segment — overwritten whole, so replays are idempotent.
    */
  def appendBatch(
      spark: SparkSession, indexPath: String, embeddings: DataFrame, batchId: Long): Unit = {
    VectorFunctions.register(spark)
    withCentroidAssignment(withNorm(embeddings, "vec_id", "v", "nn"), "v")
      .select(col("vec_id"), col("v"), col("nn"), col("centroid_id"))
      .write.mode("overwrite")
      .partitionBy("centroid_id")
      .parquet(s"$indexPath/batch=$batchId")
  }

  def read(spark: SparkSession, indexPath: String): DataFrame =
    spark.read.option("basePath", indexPath).parquet(indexPath).drop("batch")

  /** Bound the segment count accreted by incremental absorbs — same
    * crash-safe protocol as the rollup's compactor, repartitioned so each
    * cell directory holds one file per run.
    */
  def compactSegments(
      spark: SparkSession, indexPath: String, protectLatest: Boolean = true): Int =
    graft.sources.Segments.compact(spark, indexPath, Seq("centroid_id"), protectLatest)

  /** Segment ids the streaming absorber writes under (see
    * [[graft.dedup.LshIndex.StreamingSegmentBase]] — same discipline).
    */
  val StreamingSegmentBase = 1000000000L

  /** Streaming semantic search over a growing corpus: every micro-batch of
    * embeddings is probed against the stored index for its cosine top-k
    * (written to `neighborsOut/batch=<segment>`) and then absorbed as index
    * segment `StreamingSegmentBase + batchId`. Probe-before-absorb plus
    * own-segment exclusion keeps checkpoint replays deterministic.
    */
  def streamingAbsorb(
      embStream: DataFrame, indexPath: String, neighborsOut: String, checkpoint: String,
      k: Int = 3, nprobe: Int = 2)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    embStream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val segment = StreamingSegmentBase + batchId
        val out =
          if (hasSegments(spark, indexPath))
            search(spark, indexPath, batch, k, nprobe, excludeSegment = Some(segment))
          else
            spark.createDataFrame(
              spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
              org.apache.spark.sql.types.StructType(Seq(
                org.apache.spark.sql.types.StructField("qid", org.apache.spark.sql.types.LongType),
                org.apache.spark.sql.types.StructField("rank", org.apache.spark.sql.types.IntegerType),
                org.apache.spark.sql.types.StructField("cid", org.apache.spark.sql.types.LongType))))
        out.write.mode("overwrite").parquet(s"$neighborsOut/batch=$segment")
        appendBatch(spark, indexPath, batch, segment)
      }

  private def hasSegments(spark: SparkSession, indexPath: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(indexPath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(p) && fs.listStatus(p)
      .exists(s => s.isDirectory && s.getPath.getName.startsWith("batch="))
  }

  /** Cosine top-k over the probed cells for a query batch (vec_id,
    * embedding): identical results to the one-shot
    * [[SimilarityOps.ivfTopKMultiProbe]] (same centroids, same tie-breaks),
    * but the corpus side is the stored index — no re-assignment, no norm
    * recomputation. Self-matches (a query vector already absorbed) drop.
    */
  def search(
      spark: SparkSession,
      indexPath: String,
      queries: DataFrame,
      k: Int = 3,
      nprobe: Int = 2,
      excludeSegment: Option[Long] = None): DataFrame = {
    VectorFunctions.register(spark)
    val probes = probeCells(withNorm(queries, "qid", "qv", "qn"), nprobe)
    val w = Window.partitionBy("qid").orderBy(desc("cos"), asc("vec_id"))
    val index = excludeSegment match {
      // probe-before-absorb determinism under checkpoint replay (see
      // [[streamingAbsorb]]): a replayed batch must not match itself
      case Some(id) => spark.read.option("basePath", indexPath).parquet(indexPath)
        .filter(col("batch") =!= id).drop("batch")
      case None => read(spark, indexPath)
    }
    index
      .join(broadcast(probes),
        col("probe") === col("centroid_id") && col("qid") =!= col("vec_id"))
      .withColumn("cos",
        SimilarityOps.dot("qv", "v") / (sqrt(col("qn")) * sqrt(col("nn"))))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("vec_id").as("cid"))
      .orderBy("qid", "rank")
  }
}
