package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

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

  /** Event stream table; `ts` is epoch-nanosecond LongType (see [[tune]]). */
  def events(s: SparkSession, d: String): DataFrame = read(s, d, "events")

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
