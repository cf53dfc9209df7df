package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Grid
import graft.plans.RollupRewrite
import graft.sources.RollupTable

class RollupRewriteSpec extends AnyFunSuite with SharedSpark {

  private lazy val rollupDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("rw_rollup").toString
    RollupTable.materialize(spark, sfDir, dir)
    dir
  }

  private def raw = Grid.powerReadings(spark, sfDir)

  test("aggregates over the raw view are routed to the rollup scan") {
    RollupRewrite.install(spark, rollupDir)
    try {
      val q = raw.groupBy("house_id")
        .agg(count(lit(1)).as("n"), sum("power").as("p"))
        .orderBy("house_id")
      val plan = q.queryExecution.optimizedPlan.toString
      // routed plans aggregate the rollup's partial-agg columns
      assert(plan.contains("cnt") && plan.contains("sum_power_dec"),
        s"expected rollup routing, got:\n$plan")
      assert(!plan.contains("user_id"), s"raw events scan still present:\n$plan")
      // results identical to the unrewritten query
      val rewritten = q.collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      RollupRewrite.uninstall(spark)
      val direct = raw.groupBy("house_id")
        .agg(count(lit(1)).as("n"), sum("power").as("p"))
        .orderBy("house_id")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      assert(rewritten.map(t => (t._1, t._2)).sameElements(direct.map(t => (t._1, t._2))))
      rewritten.zip(direct).foreach { case (a, b) =>
        assert(math.abs(a._3 - b._3) < 1e-6 * math.max(1.0, math.abs(b._3)))
      }
    } finally RollupRewrite.uninstall(spark)
  }

  test("queries outside the proven mapping are left untouched") {
    RollupRewrite.install(spark, rollupDir)
    try {
      // a filter between aggregate and scan → no rewrite (raw scan remains)
      val filtered = raw.filter(col("power") > 100)
        .groupBy("house_id").agg(count(lit(1)).as("n"))
      assert(filtered.queryExecution.optimizedPlan.toString.contains("user_id"))
      // an aggregate the rollup can't serve (max) → no rewrite
      val maxq = raw.groupBy("house_id").agg(max("power").as("m"))
      assert(maxq.queryExecution.optimizedPlan.toString.contains("user_id"))
      // grouping by a non-rollup column → no rewrite
      val byEvent = raw.groupBy("event_id").agg(count(lit(1)).as("n"))
      assert(byEvent.queryExecution.optimizedPlan.toString.contains("event_id#"))
      assert(!byEvent.queryExecution.optimizedPlan.toString.contains("cnt"))
    } finally RollupRewrite.uninstall(spark)
  }

  test("rewrite keeps exact sums (decimal-backed rollup)") {
    RollupRewrite.install(spark, rollupDir)
    try {
      val total = raw.agg(sum("power").as("p")).head().getDouble(0)
      val expected = Grid.totalPower(spark, sfDir).head().getDouble(1)
      assert(total == expected) // exact: both paths sum DECIMAL(18,2)
    } finally RollupRewrite.uninstall(spark)
  }
}
