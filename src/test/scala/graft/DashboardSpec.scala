package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dashboard, Grid}
import graft.streaming.{StreamingDutyCycle, TopicCodecs}

class DashboardSpec extends AnyFunSuite with SharedSpark {

  test("all dashboard tiles run and return rows") {
    Dashboard.tiles.keys.foreach { name =>
      val df = Dashboard.tile(spark, sfDir, name)
      assert(df.count() > 0, s"tile $name empty")
    }
  }

  test("SQL tile equals the DataFrame-API dashboard query") {
    val sqlTop = Dashboard.tile(spark, sfDir, "top10_appliances")
      .collect().map(r => (r.getString(0), r.getDouble(1)))
    val dfTop = Grid.top10Appliances(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getDouble(1)))
    assert(sqlTop.map(_._1).sameElements(dfTop.map(_._1)))
  }

  test("tile total equals the raw-table total (rollup losslessness via SQL)") {
    val tileTotal = Dashboard.tile(spark, sfDir, "total_power").head().getDouble(0)
    val rawTotal = Grid.totalPower(spark, sfDir).head().getDouble(1)
    // the tile sums already-cast doubles (presentation path) — tolerance, not
    // bit-equality like the decimal-backed oracle path
    assert(math.abs(tileTotal - rawTotal) < 1e-6 * math.abs(rawTotal))
  }

  test("dutycycle JSON topic round-trips through from_json (S8 → S12)") {
    val dc = Grid.dutyCycle(spark, sfDir)
      .withColumn("time_end", timestamp_seconds(col("window_start") + 25))
      .select("time_end", "house_id", "appliance_id", "duty_cycle")
      .limit(100)
    val encoded = StreamingDutyCycle.toJsonRecords(dc)
    val decoded = TopicCodecs.decodeDutyCycle(encoded)
    val a = dc.orderBy("time_end", "appliance_id").collect()
    val b = decoded.orderBy("time_end", "appliance_id").collect()
    assert(a.sameElements(b))
  }

  test("history JSON topic round-trips through from_json (S10 → S12)") {
    val jobTime = 123456789L
    val encoded = graft.streaming.HistoryJob.run(spark, sfDir, jobTime)
    val decoded = TopicCodecs.decodeHistory(encoded)
    val rows = decoded.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getLong(3) == jobTime))
    val direct = Grid.historyAvg(spark, sfDir).count()
    assert(rows.length == direct)
  }
}
