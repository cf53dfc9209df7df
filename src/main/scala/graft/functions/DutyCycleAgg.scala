package graft.functions

import org.apache.spark.sql.{Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Duty cycle as a first-class typed aggregate (SURVEY.md §7.3): the
  * (count_all, count_active) pair is the merge-able buffer, the ratio is the
  * finishing step — exactly the partial/final split Spark plans around the
  * exchange, so the shuffle carries two longs per group.
  *
  * The composed form (`count(when(...))/count(...)`, [[graft.operators.Grid.dutyCycle]])
  * stays the headline path because it rides whole-stage codegen; this
  * Aggregator is the reusable-API packaging of the same metric
  * (`duty_cycle_avro.py:77-78`).
  */
case class DutyBuffer(var all: Long, var active: Long)

class DutyCycleAggregator(threshold: Double) extends Aggregator[Double, DutyBuffer, Double] {
  override def zero: DutyBuffer = DutyBuffer(0L, 0L)
  override def reduce(b: DutyBuffer, power: Double): DutyBuffer = {
    b.all += 1
    if (power > threshold) b.active += 1
    b
  }
  override def merge(a: DutyBuffer, b: DutyBuffer): DutyBuffer = {
    a.all += b.all
    a.active += b.active
    a
  }
  override def finish(b: DutyBuffer): Double = b.active.toDouble / b.all
  override def bufferEncoder: Encoder[DutyBuffer] = Encoders.product[DutyBuffer]
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}

object DutyCycleAgg {
  /** Register `duty_cycle_agg(power)` for the session (idempotent). */
  def register(spark: SparkSession, threshold: Double = 5.0): Unit =
    spark.udf.register("duty_cycle_agg", udaf(new DutyCycleAggregator(threshold)))
}
