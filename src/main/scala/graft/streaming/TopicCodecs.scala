package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** JSON codecs for the reference's derived topics — the Druid-side JSON
  * ingest specs (`Druid_conf_duty_cycle:26-52`, `Druid_conf_history:26-45`,
  * SURVEY.md S12) re-expressed as `from_json` readers, so any key/value
  * source (Kafka, files, memory) yields the typed frames back.
  */
object TopicCodecs {

  /** dutycycle topic rows (duty_cycle_avro.py:83 field order). */
  val DutyCycleSchema: StructType = StructType(Seq(
    StructField("time_end", TimestampType),
    StructField("house_id", StringType),
    StructField("appliance_id", StringType),
    StructField("duty_cycle", DoubleType)))

  /** history topic rows (druid_batch.py:110-113 + spliced timestamp). */
  val HistorySchema: StructType = StructType(Seq(
    StructField("house_id", StringType),
    StructField("appliance_id", StringType),
    StructField("avg_power", DoubleType),
    StructField("timestamp", LongType)))

  def decodeDutyCycle(records: DataFrame): DataFrame =
    records
      .select(from_json(col("value"), DutyCycleSchema).as("r"))
      .select("r.time_end", "r.house_id", "r.appliance_id", "r.duty_cycle")

  def decodeHistory(records: DataFrame): DataFrame =
    records
      .select(from_json(col("value"), HistorySchema).as("r"))
      .select("r.house_id", "r.appliance_id", "r.avg_power", "r.timestamp")
}
