package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Z-order (Morton-curve) file layout — the engine's analog of the
  * reference's per-dimension Druid bitmap indexes
  * (`/root/reference/druid/Druid_conf_power_raw_avro:143-151`): instead of a
  * secondary index structure, interleave the bits of the two most-filtered
  * dimensions and lay files out along the curve, so parquet min/max footer
  * stats become tight on BOTH dimensions at once and the ordinary
  * predicate-pushdown scan skips the same row groups a bitmap index would.
  *
  * At 100 TB this is a one-shuffle write-side operation
  * (`repartitionByRange` on the z-value + an in-partition sort); the read
  * side needs nothing new — Spark's parquet scan already prunes on footer
  * stats, and `.explain` shows the same PushedFilters either way.
  *
  * All bit arithmetic is plain integer column math (codegen'd, no UDF), and
  * identical in the DuckDB oracle, which pins the interleave cross-engine.
  */
object ZOrderLayout {

  /** 2024-01-01 00:00:00 UTC — the fixture's epoch origin; keeps the scaled
    * time coordinate inside 16 bits (30 days ÷ 64 s ≈ 40 500 < 65 536).
    */
  val Epoch0 = 1704067200L
  val TimeShift = 6 // 64-second time cells

  /** Spread the low 16 bits of `c` to even bit positions (Morton part1by1):
    * classic mask-and-shift ladder, 4 steps, pure int arithmetic.
    */
  def spread16(c: Column): Column = {
    val x0 = c.bitwiseAND(lit(0xFFFFL))
    val x1 = x0.bitwiseOR(shiftleft(x0, 8)).bitwiseAND(lit(0x00FF00FFL))
    val x2 = x1.bitwiseOR(shiftleft(x1, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    val x3 = x2.bitwiseOR(shiftleft(x2, 2)).bitwiseAND(lit(0x33333333L))
    x3.bitwiseOR(shiftleft(x3, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** 32-bit Morton interleave of two 16-bit coordinates (a → even bits). */
  def zvalue(a: Column, b: Column): Column =
    spread16(a).bitwiseOR(shiftleft(spread16(b), 1))

  /** Z-clustered write: range-partition on the z-value and sort inside each
    * partition, so each output file covers one compact curve segment (= a
    * small rectangle in (a, b) space). `numFiles` sizes the files; at scale
    * it derives from target file size, not a constant.
    */
  def layout(df: DataFrame, a: Column, b: Column, numFiles: Int): DataFrame = {
    val z = zvalue(a, b).as("__graft_z")
    df.withColumn("__graft_z", z)
      .repartitionByRange(numFiles, col("__graft_z"))
      .sortWithinPartitions("__graft_z")
      .drop("__graft_z")
  }

  /** Z-curve locality ledger on events: map each event to a 16-bit
    * (user, 64 s-cell) coordinate pair, bucket the 32-bit z-value into 64
    * curve segments, and emit each segment's row count and per-dimension
    * bounding box. Tight boxes (versus the global 1500 × 40 500 extent) are
    * the property that makes footer-stat pruning work; the oracle pins the
    * interleave arithmetic bit-for-bit.
    */
  def zorderStats(spark: SparkSession, sfDir: String): DataFrame = {
    val u = col("user_id").cast("long")
    val t = (expr("ts div 1000000000") - Epoch0).cast("long")
    val t16 = shiftright(t, TimeShift)
    Tables.events(spark, sfDir)
      .select(u.as("u"), t16.as("t16"), zvalue(u, t16).as("z"))
      .groupBy(shiftright(col("z"), 26).as("z_bucket"))
      .agg(
        count(lit(1)).as("n"),
        min("u").as("u_min"), max("u").as("u_max"),
        min("t16").as("t_min"), max("t16").as("t_max"))
      .orderBy("z_bucket")
  }

  /** DuckDB twin: the same 4-step mask ladder, written once per dimension
    * with lateral column aliases (each step refers to the previous alias).
    */
  val zorderStatsSql: String = {
    def ladder(src: String, p: String): String =
      s"""(($src & 65535) | (($src & 65535) << 8)) & 16711935 AS ${p}1,
         |         (${p}1 | (${p}1 << 4)) & 252645135 AS ${p}2,
         |         (${p}2 | (${p}2 << 2)) & 858993459 AS ${p}3,
         |         (${p}3 | (${p}3 << 1)) & 1431655765 AS ${p}4""".stripMargin
    s"""WITH coords AS (
       |  SELECT CAST(user_id AS BIGINT) AS u,
       |         ((epoch_ns(ts) // 1000000000) - $Epoch0) >> $TimeShift AS t16
       |  FROM events),
       |zvals AS (
       |  SELECT u, t16,
       |         ${ladder("u", "ua")},
       |         ${ladder("t16", "ta")},
       |         (ua4 | (ta4 << 1)) AS z
       |  FROM coords)
       |SELECT (z >> 26) AS z_bucket, count(*) AS n,
       |       min(u) AS u_min, max(u) AS u_max,
       |       min(t16) AS t_min, max(t16) AS t_max
       |FROM zvals GROUP BY 1 ORDER BY z_bucket""".stripMargin
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_zorder_stats" -> (zorderStats(_, _))
  )

  def oracle: Map[String, String] = Map(
    "q_zorder_stats" -> zorderStatsSql
  )
}
