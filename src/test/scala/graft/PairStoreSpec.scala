package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.dedup.{DedupOps, PairStore}

class PairStoreSpec extends AnyFunSuite with SharedSpark {

  private def pairRows(rows: Seq[(Long, Long)]) = {
    import spark.implicits._
    rows.toDF("id_a", "id_b")
      .withColumn("inter", lit(1L)).withColumn("n_a", lit(1L))
      .withColumn("n_b", lit(1L)).withColumn("jaccard", lit(1.0))
  }

  test("stored corpus pairs and labels equal the one-shot derivations") {
    val dir = java.nio.file.Files.createTempDirectory("ps_eq").toString
    PairStore.materialize(spark, DedupOps.ngramJaccardPairs(spark, sfDir), dir)
    PairStore.refreshLabels(spark, dir)
    val storedPairs = PairStore.readPairs(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(5))).sorted.toSeq
    val onePairs = DedupOps.ngramJaccardPairs(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(5))).sorted.toSeq
    assert(storedPairs.nonEmpty && storedPairs == onePairs)
    val storedLabels = PairStore.readLabels(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val oneLabels = DedupOps.nearDupLabels(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(storedLabels == oneLabels, "stored labels diverged from the direct fixpoint")
  }

  test("absorbing a bridging batch merges components only after refreshLabels; asOf pins the old view") {
    val dir = java.nio.file.Files.createTempDirectory("ps_merge").toString
    // two separate components
    PairStore.appendPairs(spark, dir, pairRows(Seq(1L -> 2L, 10L -> 11L)), 0L)
    val w0 = PairStore.refreshLabels(spark, dir)
    assert(w0 == 0L)
    val before = PairStore.readLabels(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(before == Map(1L -> 1L, 2L -> 1L, 10L -> 10L, 11L -> 10L))
    // a new batch bridges them
    PairStore.appendPairs(spark, dir, pairRows(Seq(2L -> 10L)), 1L)
    // labels are a published snapshot: still the old view until refreshed...
    assert(PairStore.labelsWatermark(spark, dir).contains(0L))
    // ...and the freshness guard names the staleness instead of serving it
    val stale = intercept[IllegalArgumentException] {
      PairStore.readLabels(spark, dir, requireFresh = true)
    }
    assert(stale.getMessage.contains("stale"), stale.getMessage)
    val w1 = PairStore.refreshLabels(spark, dir)
    assert(w1 == 1L)
    val after = PairStore.readLabels(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(after == Map(1L -> 1L, 2L -> 1L, 10L -> 1L, 11L -> 1L),
      s"bridge did not merge: $after")
    // the pre-bridge decision set stays reproducible
    val pinned = PairStore.readLabels(spark, dir, asOf = Some(0L))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(pinned == before, "asOf snapshot must reproduce the pre-bridge labels")
    // pair snapshot pinning composes the same way
    assert(PairStore.readPairs(spark, dir, asOf = Some(0L)).count() == 2L)
    assert(PairStore.readPairs(spark, dir).count() == 3L)
  }

  test("replayed segment overwrites idempotently; compaction preserves the pair set") {
    val dir = java.nio.file.Files.createTempDirectory("ps_compact").toString
    PairStore.appendPairs(spark, dir, pairRows(Seq(1L -> 2L)), 0L)
    PairStore.appendPairs(spark, dir, pairRows(Seq(3L -> 4L)), 1L)
    PairStore.appendPairs(spark, dir, pairRows(Seq(5L -> 6L)), 2L)
    // checkpoint replay of batch 2 rewrites the same segment, not a dup
    PairStore.appendPairs(spark, dir, pairRows(Seq(5L -> 6L)), 2L)
    val before = PairStore.readPairs(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(before == Seq(1L -> 2L, 3L -> 4L, 5L -> 6L))
    assert(PairStore.compactPairs(spark, dir) == 2)
    val after = PairStore.readPairs(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(after == before, "compaction changed the pair set")
    // labels refresh over the compacted layout still works
    PairStore.refreshLabels(spark, dir)
    assert(PairStore.readLabels(spark, dir).count() == 6L)
  }

  test("label-snapshot pruning keeps the newest views; collapsed asOf pins fail loudly") {
    val dir = java.nio.file.Files.createTempDirectory("ps_prune").toString
    (0L to 3L).foreach { i =>
      PairStore.appendPairs(spark, dir, pairRows(Seq((10 * i + 1) -> (10 * i + 2))), i)
      PairStore.refreshLabels(spark, dir)
    }
    assert(PairStore.pruneLabelSnapshots(spark, dir, keep = 2) == 2)
    // newest two survive and still read
    assert(PairStore.readLabels(spark, dir).count() == 8L)
    assert(PairStore.readLabels(spark, dir, asOf = Some(2L)).count() == 6L)
    // a pin below the surviving history must fail loudly, never serve less
    val e = intercept[IllegalArgumentException] {
      PairStore.readLabels(spark, dir, asOf = Some(1L))
    }
    assert(e.getMessage.contains("snapshot"), e.getMessage)
  }

  test("incremental absorbs reach the one-shot CC fixpoint exactly") {
    // timeline: the corpus starts as docs with doc_id % 5 != 0 (their pairs
    // are segment 0); the % 5 == 0 docs arrive as one batch whose pairs
    // come from the EXACT incremental generator. Union of segments = the
    // one-shot pair set, so refreshed labels must equal the full fixpoint.
    val dir = java.nio.file.Files.createTempDirectory("ps_incr").toString
    val full = DedupOps.ngramJaccardPairs(spark, sfDir)
    PairStore.appendPairs(spark, dir,
      full.filter(col("id_a") % 5 =!= 0 && col("id_b") % 5 =!= 0), 0L)
    PairStore.appendPairs(spark, dir,
      DedupOps.ngramJaccardPairsIncremental(spark, sfDir, _ % 5 === 0), 1L)
    PairStore.refreshLabels(spark, dir)
    val stored = PairStore.readPairs(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val oneShot = full.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(stored == oneShot, "segment union must equal the one-shot pair set, each pair once")
    val viaStore = PairStore.readLabels(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val direct = DedupOps.nearDupLabels(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaStore == direct, "incremental fixpoint diverged from the one-shot labels")
  }

  test("a refresh that died mid-write is invisible: markerless snapshots are never served (ADVICE r8)") {
    val dir = java.nio.file.Files.createTempDirectory("ps_partial").toString
    PairStore.appendPairs(spark, dir, pairRows(Seq(1L -> 2L)), 0L)
    PairStore.refreshLabels(spark, dir)
    // pairs advance, then a refresh "crashes": a batch=1 labels dir exists
    // but carries no _SUCCESS (partial parquet debris)
    PairStore.appendPairs(spark, dir, pairRows(Seq(3L -> 4L)), 1L)
    val root = new org.apache.hadoop.fs.Path(s"$dir/labels/batch=1")
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(root)
    val junk = fs.create(new org.apache.hadoop.fs.Path(root, "part-00000.parquet"), true)
    junk.write("not parquet".getBytes("UTF-8")); junk.close()
    // the partial snapshot is NOT the watermark and NOT served
    assert(PairStore.labelsWatermark(spark, dir).contains(0L),
      "a markerless snapshot dir must not become the served watermark")
    assert(PairStore.readLabels(spark, dir).count() == 2L)
    // freshness still reports honestly: the only COMPLETE snapshot is stale
    val e = intercept[IllegalArgumentException] {
      PairStore.readLabels(spark, dir, requireFresh = true)
    }
    assert(e.getMessage.contains("stale"), e.getMessage)
    // a successful re-refresh replaces the debris and serves
    assert(PairStore.refreshLabels(spark, dir) == 1L)
    assert(PairStore.labelsWatermark(spark, dir).contains(1L))
    assert(PairStore.readLabels(spark, dir, requireFresh = true).count() == 4L)
    // pruning collects markerless debris without spending the keep budget
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$dir/labels/batch=99"))
    assert(PairStore.pruneLabelSnapshots(spark, dir, keep = 2) == 1)
    assert(PairStore.labelsWatermark(spark, dir).contains(1L))
  }

  test("ensure() rebuilds when the corpus under the same path changes (ADVICE r8 staleness guard)") {
    val base = java.nio.file.Files.createTempDirectory("ps_stale").toString
    // a private corpus copy this test can rewrite in place
    graft.Tables.documents(spark, sfDir)
      .write.mode("overwrite").parquet(s"$base/documents.parquet")
    val store1 = PairStore.ensure(spark, base)
    assert(store1 == PairStore.ensure(spark, base), "unchanged corpus must hit the memo")
    val pairs1 = PairStore.pairsFor(spark, base).count()
    // the corpus is rewritten IN PLACE: half the docs vanish
    val kept = graft.Tables.documents(spark, sfDir).filter(col("doc_id") % 2 === 0)
    val tmp = s"$base/docs_tmp"
    kept.write.mode("overwrite").parquet(tmp)
    val fs = new org.apache.hadoop.fs.Path(base)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(s"$base/documents.parquet"), true)
    fs.rename(new org.apache.hadoop.fs.Path(tmp),
      new org.apache.hadoop.fs.Path(s"$base/documents.parquet"))
    // same path, new content: the fingerprint key forces a fresh build
    val store2 = PairStore.ensure(spark, base)
    assert(store2 != store1,
      "a rewritten corpus must not be served from the old store")
    val pairs2 = PairStore.pairsFor(spark, base).count()
    val direct = DedupOps.ngramJaccardPairs(spark, base).count()
    assert(pairs2 == direct,
      s"store must reflect the live corpus: served $pairs2, direct $direct (old corpus: $pairs1)")
    PairStore.invalidate(base)
    assert(PairStore.ensure(spark, base) != store2, "invalidate must drop the memo")
  }

  test("streaming pair absorb lands idempotent segments and refreshes labels on cadence") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("ps_stream").toString
    val (dir, ckpt) = (s"$base/store", s"$base/ckpt")
    implicit val sc = spark.sqlContext
    val stream = MemoryStream[(Long, Long)]
    val pairs = stream.toDF().toDF("id_a", "id_b")
      .withColumn("inter", lit(1L)).withColumn("n_a", lit(1L))
      .withColumn("n_b", lit(1L)).withColumn("jaccard", lit(1.0))
    val q = PairStore.streamingAbsorb(pairs, dir, ckpt, refreshEvery = 2).start()
    stream.addData((1L, 2L)); q.processAllAvailable()    // batch 0: no refresh yet
    assert(PairStore.readPairs(spark, dir).count() == 1L)
    assert(PairStore.labelsWatermark(spark, dir).isEmpty,
      "labels must refresh on cadence, not per trigger")
    stream.addData((2L, 3L)); q.processAllAvailable()    // batch 1: refresh fires
    q.stop()
    assert(PairStore.labelsWatermark(spark, dir)
      .contains(PairStore.StreamingSegmentBase + 1L))
    val labels = PairStore.readLabels(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels == Map(1L -> 1L, 2L -> 1L, 3L -> 1L),
      s"streamed pairs must merge transitively: $labels")
  }
}
