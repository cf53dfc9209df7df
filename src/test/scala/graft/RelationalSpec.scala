package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.operators.{Extended, Relational}

class RelationalSpec extends AnyFunSuite with SharedSpark {

  test("full outer churn covers all three null regions consistently") {
    val rows = Relational.fullOuterChurn(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    rows.foreach { case (ck, a, b, status) =>
      status match {
        case "gained"   => assert(a == 0L && b > 0L, s"custkey $ck")
        case "churned"  => assert(a > 0L && b == 0L, s"custkey $ck")
        case "retained" => assert(a > 0L && b > 0L, s"custkey $ck")
      }
    }
    // row set = union of the two yearly aggregates, computed independently
    def keys(y: Int) = Tables.orders(spark, sfDir)
      .filter(year(col("o_orderdate")) === y)
      .select("o_custkey").distinct().collect().map(_.getLong(0)).toSet
    val (k95, k96) = (keys(1995), keys(1996))
    assert(rows.map(_._1).toSet == (k95 ++ k96))
    assert(rows.count(_._4 == "churned") == (k95 -- k96).size)
    assert(rows.count(_._4 == "gained") == (k96 -- k95).size)
    assert(rows.exists(_._4 == "gained") && rows.exists(_._4 == "churned"),
      "fixture should exercise both unmatched sides")
  }

  test("approx quantile sketch lands inside the exact p45-p55 band everywhere") {
    val rows = Extended.approxQuantiles(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getBoolean(3), s"${r.getString(0)}: sketch outside rank-error band")
      assert(r.getLong(1) > 0)
    }
  }
}
