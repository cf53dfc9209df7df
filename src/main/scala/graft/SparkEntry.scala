package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.{Behavioral, Dashboard, Extended, GraphOps, Grid, QualityChecks, Relational}
import graft.text.{CorpusPipeline, CurationOps, FilterRules, QualityClassifier, TextOps}
import graft.dedup.DedupOps
import graft.ann.SimilarityOps
import graft.multimodal.MediaOps
import graft.sources.ZOrderLayout

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each entry in [[queries]] is one operator from SURVEY.md §2 (or a
  * north-star pipeline operator); [[oracleSql]] carries its DuckDB twin over
  * the same parquet tables, with column names aligned for the driver's
  * sorted-column hash compare.
  */
object SparkEntry {

  private val modules: Seq[(Map[String, (SparkSession, String) => DataFrame], Map[String, String])] =
    Seq(
      (Grid.queries, Grid.oracle),
      (Dashboard.queries, Dashboard.oracle),
      (Relational.queries, Relational.oracle),
      (Extended.queries, Extended.oracle),
      (Behavioral.queries, Behavioral.oracle),
      (GraphOps.queries, GraphOps.oracle),
      (QualityChecks.queries, QualityChecks.oracle),
      (TextOps.queries, TextOps.oracle),
      (CorpusPipeline.queries, CorpusPipeline.oracle),
      (CurationOps.queries, CurationOps.oracle),
      (FilterRules.queries, FilterRules.oracle),
      (QualityClassifier.queries, QualityClassifier.oracle),
      (DedupOps.queries, DedupOps.oracle),
      (SimilarityOps.queries, SimilarityOps.oracle),
      (MediaOps.queries, MediaOps.oracle),
      (ZOrderLayout.queries, ZOrderLayout.oracle)
    )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Grid.dutyCycle(spark, "/root/testdata/sf0.001")

  /** One per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = {
    val all = modules.map(_._1)
    val merged = all.reduce(_ ++ _)
    require(merged.size == all.map(_.size).sum, "duplicate query names across modules")
    merged
  }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = modules.map(_._2).reduce(_ ++ _)
}
