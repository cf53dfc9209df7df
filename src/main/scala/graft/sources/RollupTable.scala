package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

import graft.operators.Grid

/** The durable SECOND-granularity rollup table — our materialization of the
  * Druid ingest-time rollup (`Druid_conf_power_raw_avro:8-26`, SURVEY.md A4).
  *
  * Layout mirrors Druid's segment discipline: parquet partitioned by
  * `date/hour` (HOUR segmentGranularity), so every dashboard/history query
  * with a time predicate prunes partitions at planning time. At 100 TB the
  * writer runs as a streaming job (`StreamingDutyCycle.rollupPlan` +
  * foreachBatch appends) with periodic compaction; here the batch twin
  * materializes the identical table.
  */
object RollupTable {

  /** Build and persist the rollup, partitioned by (date, hour). Keeps BOTH
    * the exact decimal sum (re-aggregation and the RollupRewrite rule stay
    * exact) and its double rendering (presentation queries).
    */
  def materialize(spark: SparkSession, sfDir: String, outPath: String): Unit =
    Grid.rollup1s(spark, sfDir)
      .withColumn("sum_power", col("sum_power_dec").cast(DoubleType))
      .withColumn("date", to_date(timestamp_seconds(col("epoch_s"))))
      .withColumn("hour", (expr("epoch_s div 3600") % 24).cast("int"))
      .repartition(col("date")) // one writer task per partition dir, no tiny files
      .write
      .mode("overwrite")
      .partitionBy("date", "hour")
      .parquet(outPath)

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** The history batch query (A5+A6) served from the materialized rollup —
    * the reference's Druid-query path collapsed to one partition-pruned scan.
    * Result is identical to [[Grid.historyAvg]] computed from raw events.
    */
  def historyFromRollup(spark: SparkSession, path: String): DataFrame = {
    val inInterval = Grid.historyIntervals
      .map { case (s, e) => col("epoch_s") >= s && col("epoch_s") < e }
      .reduce(_ || _)
    // partition-level predicate so pruning needs no per-row epoch_s scan.
    // The `date` partition column was derived under session timezone UTC, so
    // the predicate must render in UTC too — java.sql.Date#toString uses the
    // JVM default zone and shifts a day on UTC+12..+14 hosts.
    val dates = Grid.historyIntervals
      .map { case (s, _) =>
        java.time.Instant.ofEpochSecond(s).atZone(java.time.ZoneOffset.UTC).toLocalDate.toString
      }
    read(spark, path)
      .filter(col("date").isin(dates: _*))
      .filter(inInterval)
      .groupBy("house_id", "appliance_id")
      .agg(
        sum("cnt").as("count_w"),
        sum("sum_power_dec").cast("double").as("sum_power_w"))
      .select(
        col("house_id"),
        col("appliance_id"),
        col("count_w"),
        col("sum_power_w"),
        (col("sum_power_w") / col("count_w")).as("avg_power"))
      .orderBy("appliance_id")
  }
}
