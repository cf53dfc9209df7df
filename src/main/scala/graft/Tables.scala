package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, lit, unix_micros}
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}

/** Loaders for the driver-generated TESTDATA tables plus session tuning.
  *
  * All runtime-settable confs are (re)applied on every load so the queries
  * behave identically whether the session was built by [[GraftSession]], the
  * driver's `Verify`/`Bench` mains, or a test suite.
  */
object Tables {

  /** Runtime session tuning — all dynamic SQLConf keys, safe to set on an
    * already-built session. Scale posture: AQE on (runtime re-plan, skew-join
    * splitting, partition coalescing), generous broadcast threshold for the
    * small dimension tables of the star schema.
    */
  def tune(spark: SparkSession): SparkSession = {
    val c = spark.conf
    // TESTDATA events.parquet stores TIMESTAMP(NANOS) which Spark's parquet
    // reader rejects; read it as raw nanosecond longs instead (exact).
    c.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    c.set("spark.sql.session.timeZone", "UTC")
    c.set("spark.sql.adaptive.enabled", "true")
    c.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    c.set("spark.sql.adaptive.skewJoin.enabled", "true")
    c.set("spark.sql.autoBroadcastJoinThreshold", (64L * 1024 * 1024).toString)
    spark
  }

  def read(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    tune(spark)
    spark.read.parquet(s"$sfDir/$name.parquet")
  }

  // TPC-H-ish star schema
  def region(s: SparkSession, d: String): DataFrame   = read(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame   = read(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = read(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = read(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = read(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame   = read(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = read(s, d, "lineitem")

  /** Event stream table, normalized so `ts` is ALWAYS an epoch-nanosecond
    * LongType regardless of how the parquet stores it. Generations of the
    * TESTDATA have shipped `ts` as TIMESTAMP(NANOS) (which Spark's reader
    * surfaces as a raw long via [[tune]]'s `nanosAsLong`) and as
    * TIMESTAMP(MICROS) (surfaced as TIMESTAMP_NTZ). Downstream operators and
    * every DuckDB oracle (`epoch_ns(ts)`) assume the nanosecond instant, so
    * the micros case is widened here — exact, no precision caveat, and the
    * extra Project costs one codegen'd multiply per row. Queries that want a
    * parquet-pushable time-range filter should filter on the NATIVE column
    * first (see [[graft.operators.Grid.recentRange]]) because a predicate on
    * the derived long cannot reach the scan.
    */
  def events(s: SparkSession, d: String): DataFrame = events(s, d, Nil)

  /** [[events]] with epoch-second `[start, end)` intervals applied to the
    * NATIVE `ts` column — the predicate sits below the normalizing Project,
    * so it reaches the parquet scan as a pushed filter (row-group min/max
    * pruning; at cluster scale, partition pruning) in every storage
    * generation. A predicate on the derived nanosecond long is row-equivalent
    * but can never push past the `unix_micros` compute.
    */
  def events(s: SparkSession, d: String, tsIntervals: Seq[(Long, Long)]): DataFrame = {
    val df = read(s, d, "events")
    def filtered(tsLit: Long => Column): DataFrame =
      if (tsIntervals.isEmpty) df
      else df.filter(tsIntervals.map { case (a, b) =>
        col("ts") >= tsLit(a) && col("ts") < tsLit(b)
      }.reduce(_ || _))
    df.schema("ts").dataType match {
      case TimestampNTZType =>
        filtered(sec => lit(java.time.LocalDateTime.ofEpochSecond(sec, 0, java.time.ZoneOffset.UTC)))
          .withColumn("ts", unix_micros(col("ts").cast(TimestampType)) * 1000L)
      case TimestampType =>
        filtered(sec => lit(java.time.Instant.ofEpochSecond(sec)))
          .withColumn("ts", unix_micros(col("ts").cast(TimestampType)) * 1000L)
      case _ => filtered(sec => lit(sec * 1000000000L))
    }
  }

  // LLM-pipeline tables
  def documents(s: SparkSession, d: String): DataFrame  = read(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = read(s, d, "embeddings")

  val AllTables: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders", "lineitem",
    "events", "documents", "embeddings")

  /** Register every table as a temp view plus the engine's canonical `power`
    * view, so a session is fully queryable through `spark.sql` — the pure-SQL
    * surface (with `dot_arrays` injected by [[GraftSession]]'s extensions,
    * the whole oracle dialect minus DuckDB-isms runs as-is).
    */
  def registerViews(spark: SparkSession, sfDir: String): Unit = {
    AllTables.foreach(t => read(spark, sfDir, t).createOrReplaceTempView(t))
    graft.operators.Grid.powerReadings(spark, sfDir).createOrReplaceTempView("power")
  }
}
