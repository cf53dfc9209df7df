package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.IntervalJoin

class IntervalSpec extends AnyFunSuite with SharedSpark {

  private def pairs(
      left: Seq[(Long, Long, Long, String)],
      right: Seq[(Long, Long, Long, String)]): Set[(String, String)] = {
    import spark.implicits._
    val l = left.toDF("k", "s", "e", "tag")
    val r = right.toDF("rk", "rs", "re", "rtag")
    IntervalJoin.join(l, r, Seq("k" -> "rk"), ("s", "e"), ("rs", "re"))
      .select("tag", "rtag").collect().map(x => (x.getString(0), x.getString(1))).toSet
  }

  test("interval join emits exactly the overlapping same-key pairs") {
    val got = pairs(
      left = Seq((1L, 0L, 10L, "l1"), (1L, 20L, 30L, "l2"), (2L, 0L, 100L, "l3")),
      right = Seq((1L, 5L, 25L, "rA"), (1L, 30L, 40L, "rB"), (2L, 99L, 100L, "rC"),
        (3L, 0L, 50L, "rD")))
    // half-open: l2 [20,30) meets rA [5,25) and NOT rB [30,40); rD is another key
    assert(got == Set(("l1", "rA"), ("l2", "rA"), ("l3", "rC")))
  }

  test("non-monotone left ends: a long interval must not leak into a short one") {
    // the regression the snapshot-and-refilter guards: L1 pulls rs in [0,100)
    // into the buffer; L2 [1,5) must re-check start < its OWN end
    val got = pairs(
      left = Seq((1L, 0L, 100L, "long"), (1L, 1L, 5L, "short")),
      right = Seq((1L, 50L, 60L, "mid"), (1L, 2L, 3L, "tiny")))
    assert(got == Set(("long", "mid"), ("long", "tiny"), ("short", "tiny")))
  }

  test("the contract is the pairwise condition; nulls and out-of-range never match") {
    import spark.implicits._
    // semantics = l.s < r.e && r.s < l.e, identical to the composed theta
    // join and the SQL oracle. A degenerate zero-width interval INSIDE the
    // other follows the formula (matches); one at the boundary doesn't.
    val l = Seq(
      (Option(1L), Option(0L), Option(10L), "ok"),
      (Option(1L), Option(5L), Option(5L), "zero_inside"),
      (Option(1L), Option(6L), Option(6L), "zero_at_edge"),
      (Option.empty[Long], Option(0L), Option(10L), "nullkey"),
      (Option(1L), Option.empty[Long], Option(10L), "nullstart"))
      .toDF("k", "s", "e", "tag")
    val r = Seq((Option(1L), Option(4L), Option(6L), "win")).toDF("rk", "rs", "re", "rtag")
    val got = IntervalJoin.join(l, r, Seq("k" -> "rk"), ("s", "e"), ("rs", "re"))
      .select("tag").collect().map(_.getString(0)).toSet
    assert(got == Set("ok", "zero_inside"))
  }

  test("mismatched key or range types fail fast instead of miscomparing") {
    import spark.implicits._
    val l = Seq((1L, 0L, 10L)).toDF("k", "s", "e")
    val rIntKey = Seq((1, 4L, 6L)).toDF("rk", "rs", "re")
    val e1 = intercept[IllegalArgumentException] {
      IntervalJoin.join(l, rIntKey, Seq("k" -> "rk"), ("s", "e"), ("rs", "re"))
    }
    assert(e1.getMessage.contains("key types must match"))
    val rIntRange = Seq((1L, 4, 6)).toDF("rk", "rs", "re")
    val e2 = intercept[IllegalArgumentException] {
      IntervalJoin.join(l, rIntRange, Seq("k" -> "rk"), ("s", "e"), ("rs", "re"))
    }
    assert(e2.getMessage.contains("range types must match"))
  }

  test("native interval join equals the composed theta join on real spans") {
    import graft.operators.Relational
    val native = Relational.intervalNative(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val spans = Tables.orders(spark, sfDir)
      .join(
        Tables.lineitem(spark, sfDir)
          .groupBy("l_orderkey").agg(max("l_shipdate").as("ship_end")),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("custkey"), col("o_orderkey").as("okey"),
        col("o_orderdate").as("start"), col("ship_end").as("end"))
    val b = spans.select(col("custkey").as("b_ck"), col("okey").as("b_ok"),
      col("start").as("b_s"), col("end").as("b_e"))
    val composed = spans.join(b,
        col("custkey") === col("b_ck") && col("okey") < col("b_ok") &&
          col("start") < col("b_e") && col("b_s") < col("end"))
      .groupBy("custkey").agg(count(lit(1)).as("n")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(native.nonEmpty && native == composed)
  }

  test("interval plan: sweep-line exec, one hash exchange per side") {
    import graft.operators.Relational
    val df = Relational.intervalNative(spark, sfDir)
    df.collect()
    val planStr = df.queryExecution.executedPlan.toString
    assert(planStr.contains("IntervalJoin "), s"native exec missing:\n$planStr")
    val audit = graft.plans.PlanAudit.audit(df).collect()
    val hashShuffles = audit.count(r =>
      r.getString(1) == "shuffle" && r.getString(2).startsWith("hashpartitioning"))
    assert(hashShuffles == 2, s"expected one hash exchange per side:\n${audit.mkString("\n")}")
  }
}
