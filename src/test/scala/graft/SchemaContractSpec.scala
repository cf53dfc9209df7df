package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Pin the NORMALIZED schema contract [[Tables]] presents to every operator,
  * against the REAL driver-generated testdata.
  *
  * The driver regenerates `/root/testdata` between rounds and has already
  * changed a physical type once (events.ts: TIMESTAMP(NANOS) → TIMESTAMP
  * (MICROS) at round 6), which silently killed 34 of 131 correctness rows for
  * a full round — every events query failed analysis inside the driver's
  * Verify while `sbt test` stayed green on synthesized fixtures. This suite
  * makes the next such drift a LOUD local failure: it asserts the
  * post-normalization dtypes operators rely on, for every table, plus the
  * value-level equivalence of the ts widening (ns long ≡ DuckDB `epoch_ns`).
  */
class SchemaContractSpec extends AnyFunSuite with SharedSpark {

  private def fields(name: String): Map[String, DataType] = {
    val df = name match {
      case "events" => Tables.events(spark, sfDir)
      case other    => Tables.read(spark, sfDir, other)
    }
    df.schema.fields.map(f => f.name -> f.dataType).toMap
  }

  test("events normalizes to the operator contract: ts is epoch-ns LongType") {
    val f = fields("events")
    assert(f("ts") == LongType, s"events.ts must normalize to LongType, got ${f("ts")}")
    assert(f("event_id") == LongType && f("user_id") == LongType)
    assert(f("event_type") == StringType && f("props") == StringType)
    assert(f("value") == DoubleType)
  }

  test("events ts normalization is value-exact (plausible epoch range, µs-aligned)") {
    import org.apache.spark.sql.functions._
    val row = Tables.events(spark, sfDir)
      .agg(min("ts"), max("ts"), sum((col("ts") % 1000L).cast("long"))).head()
    val (lo, hi) = (row.getLong(0), row.getLong(1))
    // 2000-01-01..2100-01-01 in epoch ns: a unit slip (s/ms/µs read as ns)
    // lands orders of magnitude outside this band
    assert(lo > 946684800L * 1000000000L && hi < 4102444800L * 1000000000L,
      s"events.ts outside plausible epoch-ns range: [$lo, $hi]")
    // the widening multiplies µs by 1000 — sub-µs residue means the
    // normalization no longer matches DuckDB's epoch_ns view of the column
    assert(row.getLong(2) == 0L, "events.ts carries sub-microsecond residue")
  }

  test("documents / embeddings keep the LLM-pipeline contract") {
    val d = fields("documents")
    assert(d("doc_id") == LongType && d("text") == StringType &&
      d("lang") == StringType && d("source") == StringType && d("n_chars") == LongType)
    val e = fields("embeddings")
    assert(e("vec_id") == LongType && e("label") == IntegerType)
    assert(e("embedding") == ArrayType(FloatType, containsNull = true) ||
      e("embedding") == ArrayType(FloatType, containsNull = false),
      s"embeddings.embedding must be array<float>, got ${e("embedding")}")
  }

  test("star-schema keys keep their join dtypes") {
    def isTs(t: DataType) = t == TimestampType || t == TimestampNTZType
    val li = fields("lineitem")
    assert(li("l_orderkey") == LongType && li("l_partkey") == LongType &&
      li("l_suppkey") == LongType)
    assert(li("l_quantity") == DoubleType, s"l_quantity dtype ${li("l_quantity")}")
    assert(isTs(li("l_shipdate")), s"l_shipdate dtype ${li("l_shipdate")}")
    val o = fields("orders")
    assert(o("o_orderkey") == LongType && o("o_custkey") == LongType)
    assert(isTs(o("o_orderdate")), s"o_orderdate dtype ${o("o_orderdate")}")
    val c = fields("customer")
    assert(c("c_custkey") == LongType && c("c_nationkey") == IntegerType)
    assert(fields("part")("p_partkey") == LongType)
    val s = fields("supplier")
    assert(s("s_suppkey") == LongType && s("s_nationkey") == IntegerType)
    assert(fields("nation")("n_nationkey") == IntegerType)
    assert(fields("region")("r_regionkey") == IntegerType)
  }
}
