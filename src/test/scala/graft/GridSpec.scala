package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Grid

class GridSpec extends AnyFunSuite with SharedSpark {

  test("duty_cycle values are ratios in [0,1] and consistent with counts") {
    val rows = Grid.dutyCycle(spark, sfDir)
      .select("c_all", "c_duty", "duty_cycle")
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (all, duty, dc) = (r.getLong(0), r.getLong(1), r.getDouble(2))
      assert(duty <= all)
      assert(dc >= 0.0 && dc <= 1.0)
      assert(dc == duty.toDouble / all)
    }
  }

  test("sliding window emits each reading into exactly window/slide windows") {
    val nReadings = Grid.powerReadings(spark, sfDir).count()
    val totalWindowed = Grid.dutyCycle(spark, sfDir).agg(sum("c_all")).first().getLong(0)
    assert(totalWindowed == nReadings * 5) // 25s window / 5s slide
  }

  test("rollup is lossless: re-aggregated sums equal raw aggregate") {
    val raw = Grid.totalPower(spark, sfDir).first()
    val viaRollup = Grid.rollup1s(spark, sfDir)
      .agg(
        sum("cnt").as("n"),
        sum("sum_power_dec").cast("double").as("total_power"))
      .first()
    assert(raw.getLong(0) == viaRollup.getLong(0))
    assert(raw.getDouble(1) == viaRollup.getDouble(1))
  }

  test("history algebraic average equals direct average over the intervals") {
    val pred = Grid.historyIntervals
      .map { case (s, e) => col("epoch_s") >= s && col("epoch_s") < e }
      .reduce(_ || _)
    val direct = Grid.powerReadings(spark, sfDir)
      .filter(pred)
      .groupBy("appliance_id")
      .agg(avg("power").as("direct_avg"))
    val algebraic = Grid.historyAvg(spark, sfDir).select(col("appliance_id"), col("avg_power"))
    val joined = algebraic.join(direct, "appliance_id").collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      assert(math.abs(r.getAs[Double]("avg_power") - r.getAs[Double]("direct_avg")) < 1e-9)
    }
  }

  test("union of replay sources preserves total row count") {
    val n = Tables.events(spark, sfDir).count()
    val unioned = Grid.unionReplay(spark, sfDir).agg(sum("n")).first().getLong(0)
    assert(unioned == n)
  }

  test("top-10 appliances is the prefix of the full ordering") {
    val top = Grid.top10Appliances(spark, sfDir).collect().map(_.getString(0))
    val full = Grid.powerReadings(spark, sfDir)
      .groupBy("appliance_id")
      .agg(Grid.dsum(col("power")).as("sum_power"))
      .orderBy(desc("sum_power"), asc("appliance_id"))
      .limit(10)
      .collect()
      .map(_.getString(0))
    assert(top.sameElements(full))
  }

  test("label join falls back to 'unknown' for the excluded label") {
    val labels = Grid.labelJoin(spark, sfDir).collect().map(_.getString(0)).toSet
    assert(labels.contains("unknown"))
    assert(!labels.contains("ERROR")) // 'error' readings must not get a label
  }

  test("per-group top-k never exceeds k rows per house") {
    val counts = Grid.topkPerHouse(spark, sfDir)
      .groupBy("house_id").count().collect()
    assert(counts.nonEmpty)
    counts.foreach(r => assert(r.getLong(1) <= 3))
  }

  test("gap fill emits a dense per-appliance grid with forward-filled values") {
    val rows = Grid.gapFill(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getBoolean(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3))))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (app, rs) =>
      val sorted = rs.sortBy(_._2)
      // dense, contiguous grid
      assert(sorted.length == 600, s"$app grid size ${sorted.length}")
      assert(sorted.map(_._2).toSeq == (sorted.head._2 until sorted.head._2 + 600).toSeq)
      // forward fill: a filled second carries the previous value (or NULL
      // before the first reading); an observed second is non-null
      sorted.sliding(2).foreach {
        case Array((_, s, true, v), _*) if s == sorted.head._2 =>
          assert(v.isEmpty, s"$app leading filled second must be NULL")
        case Array((_, _, _, prev), (_, _, true, v)) =>
          assert(v == prev, s"$app filled second must copy previous value")
        case Array((_, _, _, _), (_, _, false, v)) =>
          assert(v.nonEmpty)
        case _ => ()
      }
    }
    // the fixture as a whole exercises both paths (a single appliance may
    // legitimately be all-filled if it has no readings inside the window)
    assert(rows.exists(_._3) && rows.exists(!_._3))
  }
}
