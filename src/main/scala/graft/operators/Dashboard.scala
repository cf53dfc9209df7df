package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The Imply-Pivot dashboard (`frontend/dashboard-iGridDemo.json`) as a Spark
  * SQL layer: the three datasources become temp views and every tile is a
  * plain `spark.sql` query — the same Catalyst plans as the DataFrame
  * versions in [[Grid]], entered through SQL text (SURVEY.md §3.3).
  */
object Dashboard {

  /** Register the dashboard datasources for a scale-factor directory:
    * `powerraw` (the SECOND rollup), `dutycycle`, `history`.
    */
  def registerViews(spark: SparkSession, sfDir: String): Unit = {
    Grid.qRollup1s(spark, sfDir).createOrReplaceTempView("powerraw")
    Grid.dutyCycle(spark, sfDir).createOrReplaceTempView("dutycycle")
    Grid.historyAvg(spark, sfDir).createOrReplaceTempView("history")
  }

  /** The six tiles (dashboard-iGridDemo.json), keyed by tile name. Relative
    * time filters use the deterministic `now` (Grid.NowEpoch).
    */
  val tiles: Map[String, String] = Map(
    // :19-41 "Current Total Power" — A7
    "total_power" ->
      "SELECT sum(sum_power) AS total_power FROM powerraw",
    // :42-72 "Top 10 appliance category" — A8+W5
    "top10_appliance_names" ->
      """SELECT appliance_name, sum(sum_power) AS p FROM powerraw
        |GROUP BY 1 ORDER BY p DESC, appliance_name LIMIT 10""".stripMargin,
    // :73-104 "Top 10 households" — A8+W5
    "top10_houses" ->
      """SELECT house_id, sum(sum_power) AS p FROM powerraw
        |GROUP BY 1 ORDER BY p DESC, house_id LIMIT 10""".stripMargin,
    // :105-136 "Top 10 appliances" — A8+W5
    "top10_appliances" ->
      """SELECT appliance_id, sum(sum_power) AS p FROM powerraw
        |GROUP BY 1 ORDER BY p DESC, appliance_id LIMIT 10""".stripMargin,
    // :137-193 duty cycle per appliance, one house, recent window — A9+P11+P12
    "duty_cycle_house" ->
      s"""SELECT appliance_id, sum(duty_cycle) AS sum_duty_cycle FROM dutycycle
         |WHERE house_id = '1_1_0' AND window_start >= ${Grid.NowEpoch - 86400L}
         |GROUP BY 1 ORDER BY sum_duty_cycle DESC, appliance_id""".stripMargin,
    // :194-230 global power trend, PT5S buckets — A11+W3
    "power_trend_5s" ->
      """SELECT (epoch_s div 5) * 5 AS bucket_s, sum(sum_power) AS p FROM powerraw
        |GROUP BY 1 ORDER BY bucket_s""".stripMargin,
    // :231-287 history avg power per appliance, one house — A10
    "history_house" ->
      """SELECT appliance_id, sum(avg_power) AS sum_avg_power FROM history
        |WHERE house_id = '1_1_0'
        |GROUP BY 1 ORDER BY sum_avg_power DESC, appliance_id""".stripMargin,
    // :329-394 per-house per-appliance PT1S series — A11
    "house_series_1s" ->
      """SELECT epoch_s, appliance_id, sum(sum_power) AS p FROM powerraw
        |WHERE house_id = '1_1_0'
        |GROUP BY 1, 2 ORDER BY epoch_s, appliance_id""".stripMargin
  )

  def tile(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    registerViews(spark, sfDir)
    spark.sql(tiles(name))
  }
}
