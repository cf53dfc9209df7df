package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import StreamingDutyCycle.PowerReading

/** Custom stateful streaming: per-appliance ON-session detection with
  * `flatMapGroupsWithState` — the state-machine shape the reference's
  * windowed aggregation cannot express (SURVEY §2.8 T8 lists stateful ops as
  * the built-in-window-only gap; this is the beyond-parity extension).
  *
  * An appliance is ON while `power > threshold`; when it drops to ≤ threshold
  * (or the event-time timeout fires after `gapTimeoutSec` of silence), one
  * session row is emitted with duration and energy statistics. State is one
  * small case class per appliance, bounded by the watermark-driven timeout —
  * at 10k appliances that's kilobytes, and the shuffle is keyed by
  * appliance_id exactly like the duty-cycle aggregation.
  */
object ApplianceSessions {

  case class OpenRun(
      startMs: Long,
      lastOnMs: Long,
      energySum: Double,
      nReadings: Long)

  case class OnSession(
      appliance_id: String,
      start: Timestamp,
      end: Timestamp,
      duration_s: Long,
      n_readings: Long,
      avg_power: Double)

  /** The same gap-bounded grouping as Spark's NATIVE session windows:
    * `session_window(time, gap)` merges readings into variable-length
    * windows that extend while events arrive within `gap` of the previous
    * one and close at the watermark. This is the built-in path for the
    * plain "aggregate per activity burst" shape — [[detect]] remains the
    * richer state machine (threshold crossings, in-flight energy stats)
    * that session_window cannot express. Both shuffle once on the grouping
    * key; session merging happens inside the state store.
    */
  def sessionWindowAgg(
      readings: Dataset[PowerReading],
      gap: String = "60 seconds"): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    readings
      .withWatermark("time", "2 seconds")
      .groupBy(col("appliance_id"), session_window(col("time"), gap))
      .agg(
        count(lit(1)).as("n_readings"),
        sum("power").as("energy_sum"))
      .select(
        col("appliance_id"),
        col("session_window.start").as("start"),
        col("session_window.end").as("end"),
        col("n_readings"),
        col("energy_sum"))
  }

  def detect(
      readings: Dataset[PowerReading],
      threshold: Double = 5.0,
      gapTimeoutSec: Long = 60L): Dataset[OnSession] = {
    import readings.sparkSession.implicits._
    readings
      .withWatermark("time", "2 seconds")
      .groupByKey(_.appliance_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        process(threshold, gapTimeoutSec))
  }

  private def close(app: String, run: OpenRun): OnSession =
    OnSession(
      app,
      new Timestamp(run.startMs),
      new Timestamp(run.lastOnMs),
      (run.lastOnMs - run.startMs) / 1000L,
      run.nReadings,
      run.energySum / run.nReadings)

  private def process(threshold: Double, gapTimeoutSec: Long)(
      app: String,
      rows: Iterator[PowerReading],
      state: GroupState[OpenRun]): Iterator[OnSession] = {
    if (state.hasTimedOut) {
      val out = state.getOption.map(close(app, _)).iterator
      state.remove()
      return out
    }
    val sorted = rows.toSeq.sortBy(_.time.getTime)
    var run = state.getOption
    val out = Seq.newBuilder[OnSession]
    sorted.foreach { r =>
      val t = r.time.getTime
      if (r.power > threshold) {
        run = run match {
          case None => Some(OpenRun(t, t, r.power, 1L))
          case Some(o) => Some(o.copy(lastOnMs = math.max(o.lastOnMs, t),
            energySum = o.energySum + r.power, nReadings = o.nReadings + 1))
        }
      } else {
        run.foreach(o => out += close(app, o))
        run = None
      }
    }
    run match {
      case Some(o) =>
        state.update(o)
        state.setTimeoutTimestamp(o.lastOnMs + gapTimeoutSec * 1000L)
      case None =>
        if (state.exists) state.remove()
    }
    out.result().iterator
  }
}
