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
  def compactSegments(spark: SparkSession, indexPath: String): Int =
    graft.sources.Segments.compact(spark, indexPath, Seq("centroid_id"))

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
      nprobe: Int = 2): DataFrame = {
    VectorFunctions.register(spark)
    val probes = probeCells(withNorm(queries, "qid", "qv", "qn"), nprobe)
    val w = Window.partitionBy("qid").orderBy(desc("cos"), asc("vec_id"))
    read(spark, indexPath)
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
