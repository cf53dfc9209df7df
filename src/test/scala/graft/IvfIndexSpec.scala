package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ann.{IvfIndex, SimilarityOps}

class IvfIndexSpec extends AnyFunSuite with SharedSpark {

  private def embs = Tables.embeddings(spark, sfDir).select("vec_id", "embedding")
  private def queries(n: Int) = embs.filter(col("vec_id") < n)

  private def rows(df: org.apache.spark.sql.DataFrame): Array[(Long, Int, Long)] =
    df.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))

  test("index search reproduces the one-shot multi-probe results exactly") {
    val dir = java.nio.file.Files.createTempDirectory("ivf_idx").toString
    IvfIndex.materialize(spark, embs, dir)
    val viaIndex = rows(IvfIndex.search(spark, dir, queries(10), k = 3, nprobe = 2))
    val oneShot = rows(SimilarityOps.ivfTopKMultiProbe(spark, sfDir, nQueries = 10, k = 3, nprobe = 2))
    assert(viaIndex.nonEmpty && viaIndex.sameElements(oneShot),
      s"index search diverged: ${viaIndex.take(3).mkString(",")} vs ${oneShot.take(3).mkString(",")}")
  }

  test("incrementally absorbed segments answer like a one-shot build") {
    val dir = java.nio.file.Files.createTempDirectory("ivf_idx_inc").toString
    IvfIndex.materialize(spark, embs.filter(col("vec_id") % 4 =!= 0), dir)
    IvfIndex.appendBatch(spark, dir, embs.filter(col("vec_id") % 4 === 0), batchId = 1L)
    val viaSegments = rows(IvfIndex.search(spark, dir, queries(10), k = 3, nprobe = 2))
    val oneShot = rows(SimilarityOps.ivfTopKMultiProbe(spark, sfDir, nQueries = 10, k = 3, nprobe = 2))
    assert(viaSegments.sameElements(oneShot), "segmented index diverged from one-shot build")
    // replay of the increment is idempotent
    val n1 = IvfIndex.read(spark, dir).count()
    IvfIndex.appendBatch(spark, dir, embs.filter(col("vec_id") % 4 === 0), batchId = 1L)
    assert(IvfIndex.read(spark, dir).count() == n1, "replayed segment duplicated rows")
  }

  test("index compaction bounds files per cell and preserves search results") {
    val dir = java.nio.file.Files.createTempDirectory("ivf_idx_compact").toString
    (0 until 3).foreach(i =>
      IvfIndex.appendBatch(spark, dir, embs.filter(col("vec_id") % 3 === i), i.toLong))
    val before = rows(IvfIndex.search(spark, dir, queries(10), k = 3, nprobe = 2))
    // replay-safe default: batches 0,1 fold into batch=1; the newest stays
    assert(IvfIndex.compactSegments(spark, dir) == 2)
    val seg = new java.io.File(dir).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("batch="))
    assert(seg.map(_.getName).sorted.toSeq == Seq("batch=1", "batch=2"))
    // one file per centroid_id dir in the compacted segment
    seg.find(_.getName == "batch=1").get.listFiles().filter(_.isDirectory).foreach { cell =>
      assert(cell.listFiles().count(_.getName.endsWith(".parquet")) == 1,
        s"cell ${cell.getName} must hold one compacted file")
    }
    assert(rows(IvfIndex.search(spark, dir, queries(10), k = 3, nprobe = 2))
      .sameElements(before), "compaction changed search results")
  }

  test("streaming absorb: each batch's top-k equals a direct build over the corpus so far") {
    import java.nio.file.Files
    val base = Files.createTempDirectory("ivf_stream").toString
    val (src, idx, out, ckpt) = (s"$base/src", s"$base/idx", s"$base/out", s"$base/ckpt")
    // bootstrap with the %4 >= 2 slice
    IvfIndex.materialize(spark, embs.filter(col("vec_id") % 4 >= 2), idx)
    docsToSrc(embs.filter(col("vec_id") % 4 === 0), src)
    val schema = spark.read.parquet(src).schema
    def start() = IvfIndex.streamingAbsorb(
      spark.readStream.schema(schema).parquet(src), idx, out, ckpt).start()
    val q1 = start()
    q1.processAllAvailable()
    q1.stop()
    // reference: same probe computed against a one-shot index of the
    // bootstrap corpus only
    val refDir = Files.createTempDirectory("ivf_stream_ref").toString
    IvfIndex.materialize(spark, embs.filter(col("vec_id") % 4 >= 2), refDir)
    val seg0 = rows(spark.read
      .option("basePath", out).parquet(s"$out/batch=${IvfIndex.StreamingSegmentBase}")
      .drop("batch").orderBy("qid", "rank"))
    val ref0 = rows(IvfIndex.search(spark, refDir, embs.filter(col("vec_id") % 4 === 0)))
    assert(seg0.nonEmpty && seg0.sameElements(ref0), "batch-0 neighbors diverged")
    // second batch lands while the query is down; restart from checkpoint
    docsToSrc(embs.filter(col("vec_id") % 4 === 1), src)
    val q2 = start()
    q2.processAllAvailable()
    q2.stop()
    // reference for batch 1: bootstrap ∪ batch-0 corpus
    val refDir2 = Files.createTempDirectory("ivf_stream_ref2").toString
    IvfIndex.materialize(spark, embs.filter(col("vec_id") % 4 =!= 1), refDir2)
    val seg1 = rows(spark.read
      .option("basePath", out).parquet(s"$out/batch=${IvfIndex.StreamingSegmentBase + 1}")
      .drop("batch").orderBy("qid", "rank"))
    val ref1 = rows(IvfIndex.search(spark, refDir2, embs.filter(col("vec_id") % 4 === 1)))
    assert(seg1.sameElements(ref1), "batch-1 neighbors diverged from direct build")
  }

  private def docsToSrc(df: org.apache.spark.sql.DataFrame, src: String): Unit =
    df.write.mode("append").parquet(src)

  test("search broadcasts the query cells and prunes index partitions") {
    val dir = java.nio.file.Files.createTempDirectory("ivf_idx_plan").toString
    IvfIndex.materialize(spark, embs, dir)
    val q = IvfIndex.search(spark, dir, queries(5), k = 3, nprobe = 2)
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"query cells must broadcast:\n$plan")
    // the index side must arrive partition-pruned: the probed cells are only
    // known at runtime, so the scan needs a dynamicpruning expression on the
    // centroid_id partition column
    assert(plan.toLowerCase.contains("dynamicpruning"),
      s"expected dynamic partition pruning on centroid_id:\n$plan")
  }
}
