package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.text.TextOps
import graft.multimodal.MediaOps

class TextAndMediaSpec extends AnyFunSuite with SharedSpark {

  test("token stats agree with a driver-side recount on a sample") {
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text")
      .limit(20).collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val stats = TextOps.tokenStats(spark, sfDir)
      .filter(org.apache.spark.sql.functions.col("doc_id") < 20)
      .collect()
    stats.foreach { r =>
      val text = docs(r.getLong(0))
      assert(r.getInt(1) == text.split(" ").length)
      assert(r.getInt(2) == text.split(" ").distinct.length)
      assert(r.getInt(3) == text.length)
    }
  }

  test("quality score stays in (0, 1]") {
    TextOps.qualityScore(spark, sfDir).collect().foreach { r =>
      val q = r.getDouble(4)
      assert(q > 0.0 && q <= 1.0)
    }
  }

  test("lang id is deterministic and total") {
    val n = Tables.documents(spark, sfDir).count()
    val preds = TextOps.langId(spark, sfDir).collect()
    assert(preds.length == n)
    val langs = TextOps.LangMarkers.map(_._1).toSet
    preds.foreach(r => assert(langs.contains(r.getString(2))))
  }

  test("bag fingerprint is word-order insensitive, content fingerprint is not") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = Seq(
      (1L, "alpha beta gamma"),
      (2L, "gamma beta alpha"),
      (3L, "alpha beta delta")).toDF("doc_id", "text")
    df.createOrReplaceTempView("tmp_docs")
    val fps = df.select(
      col("doc_id"),
      md5(col("text")).as("content_fp"),
      md5(array_join(array_sort(array_distinct(split(col("text"), " "))), " ")).as("bag_fp"))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getString(2))).toMap
    assert(fps(1L)._2 == fps(2L)._2)
    assert(fps(1L)._1 != fps(2L)._1)
    assert(fps(1L)._2 != fps(3L)._2)
  }

  test("media decode stage is deterministic and schema-complete") {
    val a = MediaOps.mediaFeatures(spark, sfDir).collect()
    val b = MediaOps.mediaFeatures(spark, sfDir).collect()
    assert(a.sameElements(b))
    assert(a.nonEmpty)
    a.foreach { r =>
      val nBytes = r.getLong(2)
      assert(r.getInt(3) == 64 + (nBytes % 640).toInt)
      assert(r.getInt(4) == 64 + (nBytes % 480).toInt)
    }
  }

  test("media table partitioning survives the decode stage (narrow map, no shuffle)") {
    val media = MediaOps.mediaTable(spark, sfDir)
    val decoded = MediaOps.decodeFeatures(media)
    assert(decoded.rdd.getNumPartitions == media.rdd.getNumPartitions)
  }
}
