package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.Tables
import Grid.{dsum, dsumSql}

/** Beyond-parity operators rounding out the engine: semi-structured JSON
  * extraction, skew-safe two-stage aggregation, exact percentiles,
  * sessionization, and sketch aggregates.
  */
object Extended {

  /** JSON payload extraction from the events `props` column — the
    * semi-structured projection path. Stays codegen'd via get_json_object.
    */
  def propsExtract(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .select(
        col("event_type"),
        get_json_object(col("props"), "$.k").cast("int").as("k"))
      .groupBy(col("event_type"), expr("k div 10").cast("int").as("k_bucket"))
      .agg(count(lit(1)).as("n"), sum("k").as("sum_k"))
      .orderBy("event_type", "k_bucket")

  val propsExtractSql: String =
    """SELECT event_type,
      |       CAST(CAST(json_extract_string(props, '$.k') AS INT) // 10 AS INT) AS k_bucket,
      |       count(*) AS n,
      |       CAST(sum(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS sum_k
      |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** Two-stage salted aggregation: the skew-mitigation pattern for hot keys
    * (house_id has only a handful of values — at 100 TB a single reducer
    * would take a whole house). Stage 1 aggregates on (key, salt) spreading
    * each hot key over 16 reducers; stage 2 merges the partials. The result
    * is provably identical to the direct groupBy — the oracle checks exactly
    * that.
    */
  def saltedPowerByHouse(spark: SparkSession, sfDir: String, saltBuckets: Int = 16): DataFrame =
    Grid.powerReadings(spark, sfDir)
      .withColumn("salt", (col("event_id") % saltBuckets).cast("int"))
      .groupBy("house_id", "salt")
      .agg(
        count(lit(1)).as("n_part"),
        sum(col("power").cast(org.apache.spark.sql.types.DecimalType(18, 2))).as("sum_part"))
      .groupBy("house_id")
      .agg(
        sum("n_part").as("n"),
        sum("sum_part").cast("double").as("sum_power"))
      .orderBy("house_id")

  val saltedPowerByHouseSql: String =
    s"""WITH ${Grid.PowerCte}
       |SELECT house_id, count(*) AS n, ${dsumSql("power")} AS sum_power
       |FROM power GROUP BY 1 ORDER BY 1""".stripMargin

  /** Exact percentiles over integer cents: interpolation between integers is
    * exact in double arithmetic, so Spark's percentile() and DuckDB's
    * quantile_cont() agree bit-for-bit.
    */
  def valuePercentiles(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .select(col("event_type"), round(col("value") * 100).cast("long").as("cents"))
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n"),
        min("cents").as("min_cents"),
        expr("percentile(cents, 0.5)").as("median_cents"),
        expr("percentile(cents, 0.95)").as("p95_cents"),
        max("cents").as("max_cents"))
      .orderBy("event_type")

  val valuePercentilesSql: String =
    """WITH c AS (SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents FROM events)
      |SELECT event_type, count(*) AS n,
      |       min(cents) AS min_cents,
      |       quantile_cont(cents, 0.5) AS median_cents,
      |       quantile_cont(cents, 0.95) AS p95_cents,
      |       max(cents) AS max_cents
      |FROM c GROUP BY 1 ORDER BY 1""".stripMargin

  /** Sessionization: a session break is a >1h gap between a user's events;
    * session ids come from a cumulative sum over an analytic window — the
    * batch twin of streaming session windows.
    */
  def sessionize(spark: SparkSession, sfDir: String): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ts")
    val cum = Window.partitionBy("user_id").orderBy("ts")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(spark, sfDir)
      .select(col("user_id"), col("ts"))
      .withColumn("gap_ns", col("ts") - lag("ts", 1).over(byUser))
      .withColumn("is_break", when(col("gap_ns") > 3600L * 1000000000L, 1L).otherwise(0L))
      .withColumn("session_idx", sum("is_break").over(cum))
      .groupBy("user_id")
      .agg(
        (max("session_idx") + 1).as("n_sessions"),
        count(lit(1)).as("n_events"))
      .orderBy("user_id")
  }

  val sessionizeSql: String =
    """WITH g AS (
      |  SELECT user_id, ts,
      |         epoch_ns(ts) - lag(epoch_ns(ts)) OVER (PARTITION BY user_id ORDER BY ts) AS gap_ns
      |  FROM events),
      |s AS (
      |  SELECT user_id,
      |         SUM(CASE WHEN gap_ns > 3600000000000 THEN 1 ELSE 0 END)
      |           OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS session_idx
      |  FROM g)
      |SELECT user_id,
      |       CAST(max(session_idx) + 1 AS BIGINT) AS n_sessions,
      |       count(*) AS n_events
      |FROM s GROUP BY 1 ORDER BY 1""".stripMargin

  /** Sketch aggregates (HLL distinct count). The sketch itself is not
    * SQL-reproducible, so the checkable contract is: the exact distinct count
    * (oracle-able in any engine) plus `approx_ok` = the HLL estimate landed
    * within 3× its configured relative standard deviation — a boolean the
    * oracle asserts as a literal `true`. The sketch still runs in the plan.
    */
  val ApproxRsd = 0.01

  def approxDistinct(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .groupBy("event_type")
      .agg(
        approx_count_distinct("user_id", ApproxRsd).as("approx_users"),
        countDistinct("user_id").as("exact_users"))
      .select(
        col("event_type"),
        col("exact_users"),
        (abs(col("approx_users") - col("exact_users")) / col("exact_users")
          <= 3 * ApproxRsd).as("approx_ok"))
      .orderBy("event_type")

  val approxDistinctSql: String =
    """SELECT event_type,
      |       count(DISTINCT user_id) AS exact_users,
      |       true AS approx_ok
      |FROM events GROUP BY 1 ORDER BY 1""".stripMargin

  /** Quantile sketch with a rank-error contract, same shape as
    * [[approxDistinct]]: the exact interpolated median is oracle-able (the
    * formula [[valuePercentiles]] proved engine-exact), and `approx_ok`
    * asserts the KLL-style `approx_percentile` estimate landed inside the
    * exact p45–p55 band — a ±0.05 rank-error bound, orders of magnitude
    * looser than the sketch's configured 1/accuracy guarantee. At 100 TB the
    * sketch is the only viable path (exact quantiles need a global sort);
    * here it runs in-plan while the exact values anchor the check.
    */
  val QuantileAccuracy = 10000

  def approxQuantiles(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .select(col("event_type"), round(col("value") * 100).cast("long").as("cents"))
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n"),
        expr("percentile(cents, 0.5)").as("exact_median"),
        expr(s"approx_percentile(cents, 0.5, $QuantileAccuracy)").as("approx_median"),
        expr("percentile(cents, 0.45)").as("p45"),
        expr("percentile(cents, 0.55)").as("p55"))
      .select(
        col("event_type"),
        col("n"),
        col("exact_median"),
        (col("approx_median") >= col("p45") && col("approx_median") <= col("p55"))
          .as("approx_ok"))
      .orderBy("event_type")

  val approxQuantilesSql: String =
    """WITH c AS (SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents FROM events)
      |SELECT event_type, count(*) AS n,
      |       quantile_cont(cents, 0.5) AS exact_median,
      |       true AS approx_ok
      |FROM c GROUP BY 1 ORDER BY 1""".stripMargin

  /** Pivot (long→wide): per-house power split into one column per event
    * type — the inverse of the GREEND unpivot. Spark's `.pivot` with
    * explicit values plans the same conditional aggregation the SQL twin
    * spells out, and stays a single shuffle.
    */
  val PivotTypes = Seq("click", "error", "purchase", "signup", "view")

  def pivotPower(spark: SparkSession, sfDir: String): DataFrame =
    Grid.powerReadings(spark, sfDir)
      .groupBy("house_id")
      .pivot("appliance_name", PivotTypes)
      .agg(Grid.dsum(col("power")))
      .na.fill(0.0, PivotTypes)
      .orderBy("house_id")

  val pivotPowerSql: String = {
    val cols = PivotTypes.map { t =>
      s"COALESCE(CAST(SUM(CASE WHEN appliance_name = '$t' THEN CAST(power AS DECIMAL(18,2)) END) AS DOUBLE), 0.0) AS $t"
    }.mkString(",\n       ")
    s"""WITH ${Grid.PowerCte}
       |SELECT house_id,
       |       $cols
       |FROM power GROUP BY 1 ORDER BY 1""".stripMargin
  }

  /** Collection aggregation: the distinct appliance set per house as a sorted,
    * comma-joined string (collect_set + array_sort + array_join —
    * order-independent, so deterministic under any shuffle schedule, and a
    * scalar string so any downstream consumer can hash it directly).
    */
  def applianceSets(spark: SparkSession, sfDir: String): DataFrame =
    Grid.powerReadings(spark, sfDir)
      .groupBy("house_id")
      .agg(
        array_join(array_sort(collect_set(col("appliance_id"))), ",").as("appliances"),
        countDistinct("appliance_id").as("n_appliances"))
      .orderBy("house_id")

  val applianceSetsSql: String =
    s"""WITH ${Grid.PowerCte}
       |SELECT house_id,
       |       array_to_string(list_sort(list(DISTINCT appliance_id)), ',') AS appliances,
       |       count(DISTINCT appliance_id) AS n_appliances
       |FROM power GROUP BY 1 ORDER BY 1""".stripMargin

  /** Rolling 3-reading window frame per appliance: exact decimal sum over the
    * frame, algebraic average — deterministic regardless of how either engine
    * evaluates the frame internally (running vs re-scan vs segment tree).
    */
  def movingAvg(spark: SparkSession, sfDir: String): DataFrame = {
    val frame = Window.partitionBy("appliance_id").orderBy("ts_ns", "event_id")
      .rowsBetween(-2, Window.currentRow)
    Grid.powerReadings(spark, sfDir)
      .select(col("event_id"), col("appliance_id"), col("ts_ns"), col("power"))
      .withColumn("n_window",
        count(lit(1)).over(frame))
      .withColumn("sum_window",
        sum(col("power").cast(org.apache.spark.sql.types.DecimalType(18, 2))).over(frame)
          .cast("double"))
      .withColumn("moving_avg", col("sum_window") / col("n_window"))
      .select("event_id", "appliance_id", "n_window", "sum_window", "moving_avg")
      .orderBy("appliance_id", "ts_ns", "event_id")
  }

  val movingAvgSql: String =
    s"""WITH ${Grid.PowerCte}
       |SELECT event_id, appliance_id,
       |       count(*) OVER w AS n_window,
       |       CAST(SUM(CAST(power AS DECIMAL(18,2))) OVER w AS DOUBLE) AS sum_window,
       |       CAST(SUM(CAST(power AS DECIMAL(18,2))) OVER w AS DOUBLE) / count(*) OVER w AS moving_avg
       |FROM power
       |WINDOW w AS (PARTITION BY appliance_id ORDER BY ts_ns, event_id
       |             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
       |ORDER BY appliance_id, ts_ns, event_id""".stripMargin

  /** Rule-based anomaly detection: flag readings above the appliance's own
    * p99 — the per-entity adaptive threshold a grid-monitoring layer derives
    * from history (a fixed global threshold misfires across appliance
    * classes). The percentile computes as a whole-partition window aggregate
    * over the integer cents domain (interpolation of exact ints is the same
    * IEEE double in both engines), so the flags — int-vs-double compares —
    * are engine-exact, never a float-tolerance judgment. One shuffle on the
    * appliance key, one sort, flags and ledger in the same pass.
    */
  def anomalyFlags(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy("appliance_id")
    Grid.powerReadings(spark, sfDir)
      .select(col("appliance_id"), round(col("power") * 100).cast("long").as("cents"))
      .withColumn("p99", expr("percentile(cents, 0.99)").over(w))
      .groupBy("appliance_id")
      .agg(
        count(lit(1)).as("n"),
        first(col("p99")).as("p99_cents"),
        sum(when(col("cents") > col("p99"), 1L).otherwise(0L)).as("n_anomalies"),
        max("cents").as("max_cents"))
      .orderBy("appliance_id")
  }

  val anomalyFlagsSql: String =
    s"""WITH ${Grid.PowerCte},
       |c AS (
       |  SELECT appliance_id, CAST(round(power * 100) AS BIGINT) AS cents,
       |         quantile_cont(CAST(round(power * 100) AS BIGINT), 0.99)
       |           OVER (PARTITION BY appliance_id) AS p99
       |  FROM power)
       |SELECT appliance_id, count(*) AS n,
       |       any_value(p99) AS p99_cents,
       |       CAST(sum(CASE WHEN cents > p99 THEN 1 ELSE 0 END) AS BIGINT) AS n_anomalies,
       |       max(cents) AS max_cents
       |FROM c GROUP BY 1 ORDER BY 1""".stripMargin

  /** Time-RANGE window frame: per-event trailing 5-second aggregate over the
    * VALUE of the ordering column, not a row count — the frame every reading
    * in the same nanosecond shares identically (peer rows), which makes the
    * result deterministic under ties where a ROWS frame would not be. The
    * physical plan is the same single sort per appliance partition as the
    * ROWS-frame [[movingAvg]]; only the frame-boundary bookkeeping differs.
    */
  def rangeMovingAgg(spark: SparkSession, sfDir: String): DataFrame = {
    val frame = Window.partitionBy("appliance_id").orderBy("ts_ns")
      .rangeBetween(-5000000000L, Window.currentRow)
    Grid.powerReadings(spark, sfDir)
      .select(col("event_id"), col("appliance_id"), col("ts_ns"), col("power"))
      .withColumn("n_5s", count(lit(1)).over(frame))
      .withColumn("sum_5s",
        sum(col("power").cast(org.apache.spark.sql.types.DecimalType(18, 2))).over(frame)
          .cast("double"))
      .select("event_id", "appliance_id", "n_5s", "sum_5s")
      .orderBy("appliance_id", "ts_ns", "event_id")
  }

  val rangeMovingAggSql: String =
    s"""WITH ${Grid.PowerCte}
       |SELECT event_id, appliance_id,
       |       count(*) OVER w AS n_5s,
       |       CAST(SUM(CAST(power AS DECIMAL(18,2))) OVER w AS DOUBLE) AS sum_5s
       |FROM power
       |WINDOW w AS (PARTITION BY appliance_id ORDER BY ts_ns
       |             RANGE BETWEEN 5000000000 PRECEDING AND CURRENT ROW)
       |ORDER BY appliance_id, ts_ns, event_id""".stripMargin

  /** Ranking-function family over exact per-appliance totals. */
  def rankFunctions(spark: SparkSession, sfDir: String): DataFrame = {
    val totals = Grid.powerReadings(spark, sfDir)
      .groupBy("house_id", "appliance_id")
      .agg(Grid.dsum(col("power")).as("sum_power"))
    val w = Window.partitionBy("house_id").orderBy(desc("sum_power"), asc("appliance_id"))
    totals
      .select(
        col("house_id"),
        col("appliance_id"),
        rank().over(w).as("rnk"),
        dense_rank().over(w).as("drnk"),
        ntile(4).over(w).as("quartile"))
      .orderBy("house_id", "rnk", "appliance_id")
  }

  val rankFunctionsSql: String =
    s"""WITH ${Grid.PowerCte},
       |totals AS (
       |  SELECT house_id, appliance_id, ${dsumSql("power")} AS sum_power
       |  FROM power GROUP BY 1, 2)
       |SELECT house_id, appliance_id,
       |       CAST(rank() OVER w AS INT) AS rnk,
       |       CAST(dense_rank() OVER w AS INT) AS drnk,
       |       CAST(ntile(4) OVER w AS INT) AS quartile
       |FROM totals
       |WINDOW w AS (PARTITION BY house_id ORDER BY sum_power DESC, appliance_id)
       |ORDER BY house_id, rnk, appliance_id""".stripMargin

  /** Regex extraction on the semi-structured props column (digit capture —
    * a pattern subset where Java regex and RE2 agree).
    */
  def regexExtract(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .select(
        col("event_id"),
        regexp_extract(col("props"), "([0-9]+)", 1).as("k_str"))
      .withColumn("k", col("k_str").cast("int"))
      .groupBy((col("k") % 7).cast("int").as("k_mod"))
      .agg(count(lit(1)).as("n"), sum("k").as("sum_k"))
      .orderBy("k_mod")

  val regexExtractSql: String =
    """WITH x AS (
      |  SELECT event_id, CAST(regexp_extract(props, '([0-9]+)', 1) AS INT) AS k
      |  FROM events)
      |SELECT CAST(k % 7 AS INT) AS k_mod, count(*) AS n, CAST(sum(k) AS BIGINT) AS sum_k
      |FROM x GROUP BY 1 ORDER BY 1""".stripMargin

  /** Canonical text normalization: lowercase, strip non [a-z0-9 ] chars,
    * collapse runs of whitespace — the cleanup stage ahead of hashing.
    * DuckDB's regexp_replace needs the 'g' flag to match Spark's
    * replace-all default.
    */
  def textNormalize(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .select(
        col("doc_id"),
        md5(regexp_replace(
          regexp_replace(lower(col("text")), "[^a-z0-9 ]", ""),
          " +", " ")).as("norm_fp"),
        length(regexp_replace(
          regexp_replace(lower(col("text")), "[^a-z0-9 ]", ""),
          " +", " ")).as("norm_len"))
      .orderBy("doc_id")

  val textNormalizeSql: String =
    """SELECT doc_id,
      |       md5(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g')) AS norm_fp,
      |       CAST(length(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g')) AS INT) AS norm_len
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Histogram bucket width (value units). */
  val HistWidth = 25L

  /** Equi-width histogram of the measure — the data-profiling primitive
    * behind every dashboard distribution tile: one grouped aggregate on the
    * integer bucket key `floor(value / w)`, carrying count and exact integer
    * min/max (cents) per bucket. Never a global sort; at 100 TB this is a
    * single partial-aggregated shuffle on a small key space.
    */
  def valueHistogram(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .select(
        floor(col("value") / HistWidth).cast("long").as("bucket"),
        round(col("value") * 100).cast("long").as("cents"))
      .groupBy("bucket")
      .agg(
        count(lit(1)).as("n"),
        min("cents").as("min_cents"),
        max("cents").as("max_cents"))
      .orderBy("bucket")

  val valueHistogramSql: String =
    s"""WITH c AS (
       |  SELECT CAST(floor(value / $HistWidth) AS BIGINT) AS bucket,
       |         CAST(round(value * 100) AS BIGINT) AS cents
       |  FROM events)
       |SELECT bucket, count(*) AS n,
       |       min(cents) AS min_cents, max(cents) AS max_cents
       |FROM c GROUP BY 1 ORDER BY 1""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_value_histogram" -> (valueHistogram(_, _)),
    "q_moving_avg" -> (movingAvg(_, _)),
    "q_rank_functions" -> (rankFunctions(_, _)),
    "q_regex_extract" -> (regexExtract(_, _)),
    "q_text_normalize" -> (textNormalize(_, _)),
    "q_pivot_power" -> (pivotPower(_, _)),
    "q_appliance_sets" -> (applianceSets(_, _)),
    "q_props_extract" -> (propsExtract(_, _)),
    "q_salted_agg" -> (saltedPowerByHouse(_, _)),
    "q_value_percentiles" -> (valuePercentiles(_, _)),
    "q_sessionize" -> (sessionize(_, _)),
    "q_approx_distinct" -> (approxDistinct(_, _)),
    "q_approx_quantiles" -> (approxQuantiles(_, _)),
    "q_range_frame" -> (rangeMovingAgg(_, _)),
    "q_anomaly_flags" -> (anomalyFlags(_, _))
  )

  def oracle: Map[String, String] = Map(
    "q_value_histogram" -> valueHistogramSql,
    "q_moving_avg" -> movingAvgSql,
    "q_rank_functions" -> rankFunctionsSql,
    "q_regex_extract" -> regexExtractSql,
    "q_text_normalize" -> textNormalizeSql,
    "q_pivot_power" -> pivotPowerSql,
    "q_appliance_sets" -> applianceSetsSql,
    "q_props_extract" -> propsExtractSql,
    "q_salted_agg" -> saltedPowerByHouseSql,
    "q_value_percentiles" -> valuePercentilesSql,
    "q_sessionize" -> sessionizeSql,
    "q_approx_distinct" -> approxDistinctSql,
    "q_approx_quantiles" -> approxQuantilesSql,
    "q_range_frame" -> rangeMovingAggSql,
    "q_anomaly_flags" -> anomalyFlagsSql
  )
}
