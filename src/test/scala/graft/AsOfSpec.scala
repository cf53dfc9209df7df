package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Relational
import graft.plans.{AsOf, AsOfJoinExec, AsOfJoinPlan}

class AsOfSpec extends AnyFunSuite with SharedSpark {

  test("native as-of join equals the union+window composition row-for-row") {
    val native = Relational.asofNative(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), if (r.isNullAt(2)) -1L else r.getLong(2)))
    val composed = Relational.asofPrevPurchase(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), if (r.isNullAt(2)) -1L else r.getLong(2)))
    assert(native.nonEmpty && native.sameElements(composed))
  }

  test("as-of physical plan: merge exec, one shuffle per side, no window, no BNLJ") {
    val df = Relational.asofNative(spark, sfDir)
    df.collect()
    val plan = df.queryExecution.executedPlan
    val planStr = plan.toString
    assert(planStr.contains("AsOfJoin "), s"native exec missing:\n$planStr")
    assert(!planStr.contains("Window"), "composition leaked a window")
    assert(!planStr.contains("BroadcastNestedLoopJoin") && !planStr.contains("CartesianProduct"))
    // count exchanges on the unwrapped adaptive plan (the string render
    // repeats initial+final AQE sections): one hash exchange per side plus
    // the final presentation orderBy's range exchange, nothing else
    val audit = graft.plans.PlanAudit.audit(df).collect()
    val hashShuffles = audit.count(r => r.getString(1) == "shuffle" && r.getString(2).startsWith("hashpartitioning"))
    assert(hashShuffles == 2, s"expected one hash exchange per side, audit:\n${audit.mkString("\n")}")
  }

  test("strict flag: equal timestamps match only under non-strict semantics") {
    import spark.implicits._
    val left = Seq((1L, 100L, "l1"), (1L, 200L, "l2"), (2L, 50L, "l3"))
      .toDF("k", "t", "l_tag")
    val right = Seq((1L, 100L, "r_at_100"), (1L, 150L, "r_at_150"), (3L, 10L, "r_other"))
      .toDF("rk", "rt", "r_tag")
    def run(strict: Boolean): Map[String, String] =
      AsOf.join(left, right, Seq("k" -> "rk"), "t", "rt",
          rightTiebreak = Seq("r_tag"), strict = strict)
        .collect()
        .map(r => r.getString(2) -> (if (r.isNullAt(5)) null else r.getString(5)))
        .toMap
    val strictRes = run(strict = true)
    assert(strictRes("l1") == null, "strict: rt == lt must not match")
    assert(strictRes("l2") == "r_at_150")
    assert(strictRes("l3") == null, "no right rows for key 2")
    val lenient = run(strict = false)
    assert(lenient("l1") == "r_at_100", "non-strict: rt == lt matches")
    assert(lenient("l2") == "r_at_150")
  }

  test("mismatched key or time types fail fast instead of miscomparing") {
    import spark.implicits._
    // no implicit-cast pass runs over the native node, so an INT-vs-BIGINT
    // key would compare raw values of different widths — must throw, not run
    val left = Seq((1L, 100L)).toDF("k", "t")
    val rightIntKey = Seq((1, 50L)).toDF("rk", "rt")
    val e1 = intercept[IllegalArgumentException] {
      AsOf.join(left, rightIntKey, Seq("k" -> "rk"), "t", "rt")
    }
    assert(e1.getMessage.contains("key types must match"))
    val rightIntTime = Seq((1L, 50)).toDF("rk", "rt")
    val e2 = intercept[IllegalArgumentException] {
      AsOf.join(left, rightIntTime, Seq("k" -> "rk"), "t", "rt")
    }
    assert(e2.getMessage.contains("time types must match"))
    // explicit cast on the narrow side restores the join
    val fixed = AsOf.join(left, rightIntKey.withColumn("rk", col("rk").cast("long")),
      Seq("k" -> "rk"), "t", "rt").collect()
    assert(fixed.length == 1 && fixed.head.getLong(3) == 50L)
  }

  test("forward direction picks the earliest later row with min-tiebreak") {
    import spark.implicits._
    val left = Seq((1L, 100L, "l1"), (2L, 50L, "l2")).toDF("k", "t", "tag")
    val right = Seq(
      (1L, 100L, "at"), (1L, 150L, "soon_a"), (1L, 150L, "soon_b"), (1L, 900L, "late"))
      .toDF("rk", "rt", "r_tag")
    val res = AsOf.join(left, right, Seq("k" -> "rk"), "t", "rt",
        rightTiebreak = Seq("r_tag"), strict = true, forward = true)
      .collect()
      .map(r => r.getString(2) -> (if (r.isNullAt(5)) null else r.getString(5))).toMap
    assert(res("l1") == "soon_a", "earliest later row, min tiebreak among equal times")
    assert(res("l2") == null)
    // non-strict: the equal-time row wins
    val lenient = AsOf.join(left, right, Seq("k" -> "rk"), "t", "rt",
        rightTiebreak = Seq("r_tag"), strict = false, forward = true)
      .collect()
      .map(r => r.getString(2) -> (if (r.isNullAt(5)) null else r.getString(5))).toMap
    assert(lenient("l1") == "at")
    // real-data sanity: forward matches are strictly later than the error
    val ev = Tables.events(spark, sfDir)
    val pTimes = ev.filter(col("event_type") === "purchase")
      .select("event_id", "ts").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val eTimes = ev.filter(col("event_type") === "error")
      .select("event_id", "ts").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val native = Relational.asofForward(spark, sfDir).collect()
    assert(native.nonEmpty && native.exists(!_.isNullAt(2)))
    native.filter(!_.isNullAt(2)).foreach { r =>
      assert(pTimes(r.getLong(2)) > eTimes(r.getLong(1)),
        s"next_purchase not strictly later: $r")
    }
  }

  test("null keys and null timestamps never match") {
    import spark.implicits._
    val left = Seq(
      (Option(1L), Option(100L), "ok"),
      (Option.empty[Long], Option(100L), "null_key"),
      (Option(1L), Option.empty[Long], "null_time"))
      .toDF("k", "t", "tag")
    val right = Seq((Option(1L), Option(10L), "m"), (Option.empty[Long], Option(5L), "null_r"))
      .toDF("rk", "rt", "rtag")
    val res = AsOf.join(left, right, Seq("k" -> "rk"), "t", "rt").collect()
      .map(r => r.getString(2) -> (if (r.isNullAt(5)) null else r.getString(5))).toMap
    assert(res("ok") == "m")
    assert(res("null_key") == null)
    assert(res("null_time") == null)
  }

  test("extension-injected strategy plans the node without the experimental hook") {
    // newSession: fresh experimental hooks, same static extensions
    // (spark.sql.extensions is context-static — the STATE.md gotcha)
    val s2 = spark.newSession()
    assert(!s2.experimental.extraStrategies.contains(graft.plans.AsOfJoinStrategy))
    import s2.implicits._
    val l = Seq((1L, 10L, "a")).toDF("k", "t", "tag")
    val r = Seq((1L, 5L, "hit")).toDF("rk", "rt", "rtag")
    val node = AsOfJoinPlan(
      l.queryExecution.analyzed, r.queryExecution.analyzed,
      Seq(l.queryExecution.analyzed.output.head), Seq(r.queryExecution.analyzed.output.head),
      l.queryExecution.analyzed.output(1), r.queryExecution.analyzed.output(1),
      Nil, strict = true, forward = false)
    val out = org.apache.spark.sql.graft.GraftSqlShim.ofRows(s2, node).collect()
    assert(out.length == 1 && out.head.getString(5) == "hit")
    assert(!s2.experimental.extraStrategies.contains(graft.plans.AsOfJoinStrategy),
      "the extension path must not depend on the experimental fallback")
  }

  test("as-of join over bucketed tables plans with zero shuffle exchanges") {
    // the planner contract (requiredChildDistribution) must let Catalyst
    // elide the exchanges when the children are already co-partitioned —
    // the claim that makes the operator cheap on a bucketed 100 TB layout
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val ev = Tables.events(spark, sfDir)
    spark.sql("DROP TABLE IF EXISTS b_errors")
    spark.sql("DROP TABLE IF EXISTS b_purchases")
    ev.filter(col("event_type") === "error")
      .select(col("user_id"), col("event_id").as("error_id"), col("ts").as("err_ts"))
      .write.bucketBy(8, "user_id").sortBy("user_id", "err_ts").saveAsTable("b_errors")
    ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("event_id").as("purchase_id"), col("ts").as("p_ts"))
      .write.bucketBy(8, "p_user").sortBy("p_user", "p_ts").saveAsTable("b_purchases")
    try {
      val joined = AsOf.join(
        spark.table("b_errors"), spark.table("b_purchases"),
        Seq("user_id" -> "p_user"), "err_ts", "p_ts",
        rightTiebreak = Seq("purchase_id"), strict = true)
      joined.collect()
      val shuffles = joined.queryExecution.executedPlan.collect {
        case e: ShuffleExchangeExec => e
      }
      assert(shuffles.isEmpty,
        s"bucketed as-of must not exchange:\n${joined.queryExecution.executedPlan}")
      // and it computes the same pairs as the parquet-scan plan
      val viaBuckets = joined
        .select(col("error_id"), col("purchase_id")).collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
      val direct = Relational.asofNative(spark, sfDir).collect()
        .map(r => r.getLong(1) -> (if (r.isNullAt(2)) -1L else r.getLong(2))).toMap
      assert(viaBuckets == direct)
    } finally {
      spark.sql("DROP TABLE IF EXISTS b_errors")
      spark.sql("DROP TABLE IF EXISTS b_purchases")
    }
  }

  test("as-of exec streams with O(1) state on a single hot key") {
    import spark.implicits._
    // 200k right rows on ONE key: a buffering implementation would hold the
    // whole group; the merge must stream it with a single retained row
    val left = Seq((7L, 199999L, "probe")).toDF("k", "t", "tag")
    val right = spark.range(200000).select(
      lit(7L).as("rk"), col("id").as("rt"), concat(lit("r"), col("id")).as("rtag"))
    val res = AsOf.join(left, right, Seq("k" -> "rk"), "t", "rt").collect()
    assert(res.length == 1 && res.head.getString(5) == "r199998")
  }
}
