package graft

import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalacheck.Prop.forAll
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Property-based invariants (SURVEY.md §5.3) over generated readings:
  * duty-cycle bounds, rollup losslessness, algebraic-vs-direct average, the
  * count(when) null semantics pinned in §7.4, and unpivot cardinality.
  */
object GridProps extends Properties("grid") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10)

  private lazy val spark = SharedSpark.spark
  import spark.implicits._

  private val genReading: Gen[(Long, String, Option[Double])] = for {
    sec <- Gen.choose(0L, 120L)
    app <- Gen.oneOf("a0", "a1", "a2")
    power <- Gen.frequency(
      9 -> Gen.choose(0.0, 400.0).map(v => Some(math.rint(v * 100) / 100)),
      1 -> Gen.const(Option.empty[Double]))
  } yield (sec, app, power)

  private val genBatch: Gen[List[(Long, String, Option[Double])]] = Gen.nonEmptyListOf(genReading)

  property("duty cycle is a valid ratio and respects null-power semantics") =
    forAll(genBatch) { rs =>
      val df = rs.toDF("sec", "app", "power")
      val out = df.groupBy("app")
        .agg(
          count("power").as("c_all"), // non-null readings only (A1)
          count(when(col("power") > 5.0, true)).as("c_duty"), // §7.4 A2 pin
          sum(when(col("power") > 5.0, 1).otherwise(0)).as("naive"),
          count(lit(1)).as("c_rows"))
        .collect()
      out.forall { r =>
        val (cAll, cDuty, naive, cRows) =
          (r.getAs[Long]("c_all"), r.getAs[Long]("c_duty"),
            r.getAs[Long]("naive"), r.getAs[Long]("c_rows"))
        // count(when) counts only true conditions; null power rows are in
        // c_rows but not c_all; the naive sum agrees on the numerator because
        // null conditions fall into otherwise(0)
        cDuty <= cAll && cAll <= cRows && cDuty == naive &&
          (cAll == 0L || (cDuty.toDouble / cAll >= 0.0 && cDuty.toDouble / cAll <= 1.0))
      }
    }

  property("rollup re-aggregation is lossless for exact decimal sums") =
    forAll(genBatch) { rs =>
      val df = rs.toDF("sec", "app", "power").filter(col("power").isNotNull)
      val direct = df.agg(
        count(lit(1)).as("n"),
        sum(col("power").cast(DecimalType(18, 2))).cast("double").as("s")).head()
      // coalesce on the re-aggregated count: a batch whose rows are ALL
      // filtered leaves zero rollup groups, where sum(cnt) is NULL but the
      // direct count is 0 — the exact count-vs-sum-on-empty divergence the
      // engine's RollupRewrite guards with Coalesce (ADVICE r2); the
      // re-aggregation contract includes that guard
      val viaRollup = df.groupBy("sec", "app")
        .agg(count(lit(1)).as("cnt"), sum(col("power").cast(DecimalType(18, 2))).as("sp"))
        .agg(coalesce(sum("cnt"), lit(0L)).as("n"), sum("sp").cast("double").as("s")).head()
      direct.getLong(0) == viaRollup.getLong(0) &&
        (direct.getLong(0) == 0L || direct.getDouble(1) == viaRollup.getDouble(1))
    }

  property("algebraic average from rollup equals the direct average") =
    forAll(genBatch) { rs =>
      val df = rs.toDF("sec", "app", "power").filter(col("power").isNotNull)
      if (df.isEmpty) true
      else {
        val direct = df.groupBy("app").agg(avg("power").as("a"))
          .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
        val algebraic = df.groupBy("sec", "app")
          .agg(count(lit(1)).as("cnt"), sum("power").as("sp"))
          .groupBy("app")
          .agg((sum("sp") / sum("cnt")).as("a"))
          .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
        direct.keySet == algebraic.keySet &&
          direct.forall { case (k, v) => math.abs(v - algebraic(k)) <= 1e-9 * math.max(1.0, math.abs(v)) }
      }
    }

  property("unpivot emits rows x columns") =
    forAll(Gen.nonEmptyListOf(Gen.choose(0.0, 10.0))) { xs =>
      val df = xs.zipWithIndex.map { case (v, i) => (i.toLong, v, v + 1, v + 2) }
        .toDF("id", "m1", "m2", "m3")
      val long = df.select(col("id"),
        expr("stack(3, 'm1', m1, 'm2', m2, 'm3', m3) AS (metric, value)"))
      long.count() == df.count() * 3
    }

  property("z-order interleave is a bijection on 16-bit coordinate pairs") =
    forAll(Gen.choose(0L, 65535L), Gen.choose(0L, 65535L)) { (a, b) =>
      val z = Seq((a, b)).toDF("a", "b")
        .select(graft.sources.ZOrderLayout.zvalue(col("a"), col("b")).as("z"))
        .head().getLong(0)
      // invert by gathering even/odd bits
      def gather(x: Long, off: Int): Long =
        (0 until 16).map(i => ((x >> (2 * i + off)) & 1L) << i).sum
      gather(z, 0) == a && gather(z, 1) == b && z >= 0 && z < (1L << 32)
    }

  property("sliding window multiplicity is window/slide for every reading") =
    forAll(genBatch) { rs =>
      val df = rs.toDF("sec", "app", "power")
        .withColumn("time", timestamp_seconds(col("sec") + 1000000000L))
      val n = df.count()
      val windowed = df.groupBy(window(col("time"), "25 seconds", "5 seconds"), col("app"))
        .agg(count(lit(1)).as("c"))
        .agg(sum("c")).head().getLong(0)
      windowed == n * 5
    }
}
