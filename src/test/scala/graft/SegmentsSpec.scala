package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Segments

/** The segment compactor's failure-mode contract: replay of the newest
  * (possibly uncommitted) streaming batch, a concurrent batch landing
  * mid-compaction, a crash inside the commit window, and compactor-vs-
  * compactor exclusion via the lease.
  */
class SegmentsSpec extends AnyFunSuite with SharedSpark {

  private def seg(dir: String, id: Long, ids: Range): Unit = {
    import spark.implicits._
    ids.map(i => (i.toLong, s"v$i", (i % 3).toString)).toDF("id", "v", "p")
      .write.mode("overwrite").partitionBy("p").parquet(s"$dir/batch=$id")
  }

  private def table(dir: String): DataFrame =
    spark.read.option("basePath", dir).parquet(dir).drop("batch")

  private def contents(dir: String): Set[(Long, String, String)] =
    // partition discovery infers p as int — normalize through toString
    table(dir).collect().map(r => (r.getLong(0), r.getString(1), r.get(2).toString)).toSet

  private def deleteRec(f: java.io.File): Unit = {
    if (f.isDirectory) f.listFiles().foreach(deleteRec)
    f.delete(); ()
  }

  private def segNames(dir: String): Seq[String] =
    new java.io.File(dir).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("batch="))
      .map(_.getName).sorted.toSeq

  test("replayed newest batch cannot clobber the compacted segment (ADVICE r4)") {
    val dir = java.nio.file.Files.createTempDirectory("seg_replay").toString
    seg(dir, 0, 0 until 10)
    seg(dir, 1, 10 until 20)
    seg(dir, 2, 20 until 30)
    seg(dir, 3, 30 until 40) // the stream's last batch — offset may be uncommitted
    val before = contents(dir)
    // default compaction protects batch=3: absorbs 0..2 into batch=2
    assert(Segments.compact(spark, dir, Seq("p")) == 3)
    assert(segNames(dir) == Seq("batch=2", "batch=3"))
    assert(contents(dir) == before)
    // the crash-restart replay rewrites batch=3 whole; only batch 3's own
    // rows are touched, the compacted index survives
    seg(dir, 3, 30 until 40)
    assert(contents(dir) == before,
      "replay of the newest segment lost compacted rows")
  }

  test("a batch landing mid-compaction survives: snapshot isolation") {
    val dir = java.nio.file.Files.createTempDirectory("seg_interleave").toString
    seg(dir, 0, 0 until 10)
    seg(dir, 1, 10 until 20)
    seg(dir, 2, 20 until 30)
    // simulate the commit-window crash state the protocol defines: the temp
    // dir holds a COMPLETE copy (parquet _SUCCESS) of batches 0 and 1 plus
    // the _ABSORBED manifest, batch=0 already deleted, batch=1 still present
    // — and a concurrent writer has meanwhile landed batch=9
    val tmp = s"$dir/.compact_tmp"
    table(s"$dir/batch=0").union(
        spark.read.option("basePath", s"$dir/batch=1").parquet(s"$dir/batch=1"))
      .select("id", "v", "p")
      .write.mode("overwrite").partitionBy("p").parquet(tmp)
    java.nio.file.Files.writeString(java.nio.file.Paths.get(tmp, "_ABSORBED"), "0\n1")
    assert(new java.io.File(s"$tmp/_SUCCESS").exists(), "parquet job must leave _SUCCESS")
    deleteRec(new java.io.File(s"$dir/batch=0"))
    seg(dir, 9, 90 until 95)
    val expected = ((0L until 30L) ++ (90L until 95L))
      .map(i => (i, s"v$i", (i % 3).toString)).toSet
    // recovery finishes the interrupted commit from the manifest: deletes
    // exactly {0,1}, promotes the temp dir to batch=1 — batch=2 and the
    // newly-landed batch=9 are untouched
    assert(Segments.compact(spark, dir, Seq("p")) == 2)
    assert(segNames(dir) == Seq("batch=1", "batch=2", "batch=9"))
    assert(contents(dir) == expected, "recovery lost or duplicated rows")
  }

  test("an in-flight segment (no _SUCCESS yet) is never absorbed: its absorb can retry safely") {
    val dir = java.nio.file.Files.createTempDirectory("seg_inflight").toString
    seg(dir, 0, 0 until 10)
    seg(dir, 1, 10 until 20)
    seg(dir, 2, 20 until 30)
    // an absorb's parquet write is mid-flight when this compaction starts:
    // data files exist under batch=3, the _SUCCESS marker does not. If the
    // compactor ingested it, its rows would live in the compacted segment
    // AND in the absorb's post-abort retry — duplicated forever.
    seg(dir, 3, 30 until 40)
    new java.io.File(s"$dir/batch=3/_SUCCESS").delete()
    assert(Segments.compact(spark, dir, Seq("p"), protectLatest = false) == 3)
    // only the committed segments folded; the in-flight dir is untouched
    assert(segNames(dir) == Seq("batch=2", "batch=3"))
    val committed = (0L until 30L).map(i => (i, s"v$i", (i % 3).toString)).toSet
    assert(contents(s"$dir/batch=2") ==
      committed.map { case (i, v, p) => (i, v, p) },
      "compacted rows must be exactly the committed segments")
  }

  test("incomplete temp dir (no manifest) is discarded; sources intact") {
    val dir = java.nio.file.Files.createTempDirectory("seg_incomplete").toString
    seg(dir, 0, 0 until 10)
    seg(dir, 1, 10 until 20)
    seg(dir, 2, 20 until 30)
    val before = contents(dir)
    // crash BEFORE the manifest write: temp dir may even carry _SUCCESS, but
    // no source was deleted yet — the run must start over, losing nothing
    table(s"$dir/batch=0").select("id", "v", "p")
      .write.mode("overwrite").partitionBy("p").parquet(s"$dir/.compact_tmp")
    assert(Segments.compact(spark, dir, Seq("p")) == 2) // fresh run absorbs 0,1
    assert(segNames(dir) == Seq("batch=1", "batch=2"))
    assert(contents(dir) == before)
  }

  test("lease: a live compactor excludes a second; a stale lease is broken") {
    val dir = java.nio.file.Files.createTempDirectory("seg_lease").toString
    seg(dir, 0, 0 until 5)
    seg(dir, 1, 5 until 10)
    seg(dir, 2, 10 until 15)
    val lease = new java.io.File(s"$dir/.compact_lease")
    assert(lease.createNewFile())
    val ex = intercept[IllegalStateException](Segments.compact(spark, dir, Seq("p")))
    assert(ex.getMessage.contains("lease"))
    assert(segNames(dir) == Seq("batch=0", "batch=1", "batch=2"), "excluded run must not touch segments")
    // a holder that died leaves a stale lease: older than ttl ⇒ broken and taken over
    assert(lease.setLastModified(System.currentTimeMillis() - 60000))
    assert(Segments.compact(spark, dir, Seq("p"), leaseTtlMs = 30000) == 2)
    assert(segNames(dir) == Seq("batch=1", "batch=2"))
    assert(!lease.exists(), "lease must be released after the run")
  }

  test("stale-lease takeover is atomic: concurrent claimants, exactly one wins") {
    val dir = java.nio.file.Files.createTempDirectory("seg_race").toString
    seg(dir, 0, 0 until 5)
    seg(dir, 1, 5 until 10)
    seg(dir, 2, 10 until 15)
    val before = contents(dir)
    val lease = new java.io.File(s"$dir/.compact_lease")
    assert(lease.createNewFile())
    assert(lease.setLastModified(System.currentTimeMillis() - 60000)) // stale
    // Two claimants race the takeover. The rename-based claim admits exactly
    // one; the loser must throw WITHOUT touching any segment.
    val results = (0 until 2).map { _ =>
      new java.util.concurrent.FutureTask[Either[Throwable, Int]](() =>
        try Right(Segments.compact(spark, dir, Seq("p"), leaseTtlMs = 30000))
        catch { case e: IllegalStateException => Left(e) })
    }
    val threads = results.map(new Thread(_))
    threads.foreach(_.start()); threads.foreach(_.join(60000))
    val outcomes = results.map(_.get())
    // Right(0) is a harmless no-op sweep (a latecomer that acquired a free
    // lease after the winner released and found nothing left to absorb) —
    // only a positive count is a commit
    val wins = outcomes.collect { case Right(n) if n > 0 => n }
    val losses = outcomes.collect { case Left(e) => e }
    // both may lose only if they interleaved such that each saw the other as
    // a live holder — then the stale lease was still consumed by one rename;
    // a second sweep must succeed. Never two winners.
    assert(wins.length <= 1, s"two compactors both committed: $outcomes")
    losses.foreach(e => assert(e.getMessage.contains("lease"), s"unexpected: $e"))
    if (wins.isEmpty) {
      if (lease.exists()) // an orphaned loser lease: age it out and sweep again
        assert(lease.setLastModified(System.currentTimeMillis() - 60000))
      assert(Segments.compact(spark, dir, Seq("p"), leaseTtlMs = 30000) == 2)
    }
    assert(contents(dir) == before, "takeover race lost rows")
    assert(segNames(dir) == Seq("batch=1", "batch=2"))
    assert(!lease.exists(), "lease must be released")
  }

  test("compacted table keeps one file per partition dir and identical rows") {
    val dir = java.nio.file.Files.createTempDirectory("seg_files").toString
    (0 until 5).foreach(b => seg(dir, b, b * 10 until (b + 1) * 10))
    val before = contents(dir)
    assert(Segments.compact(spark, dir, Seq("p"), protectLatest = false) == 5)
    assert(segNames(dir) == Seq("batch=4"))
    new java.io.File(s"$dir/batch=4").listFiles().filter(_.isDirectory).foreach { pDir =>
      assert(pDir.listFiles().count(_.getName.endsWith(".parquet")) == 1,
        s"${pDir.getName} must hold one compacted file")
    }
    assert(contents(dir) == before)
    assert(table(dir).filter(col("p") === "1").count() == before.count(_._3 == "1"))
  }

  test("readAsOf serves any live snapshot bit-for-bit; collapsed history fails loudly") {
    val dir = java.nio.file.Files.createTempDirectory("seg_asof").toString
    // non-contiguous ids (a stream whose trigger skipped empty batches)
    Seq(0L, 2L, 5L, 7L).zipWithIndex.foreach { case (id, i) =>
      seg(dir, id, i * 10 until (i + 1) * 10)
    }
    def snapSet(df: DataFrame): Set[(Long, String, String)] =
      df.collect().map(r => (r.getLong(0), r.getString(1), r.get(2).toString)).toSet
    val upTo2 = snapSet(Segments.readAsOf(spark, dir, 2L))
    assert(upTo2 == (0 until 20).map(i => (i.toLong, s"v$i", (i % 3).toString)).toSet)
    // a snapshot point between live ids floors to the last committed batch
    assert(snapSet(Segments.readAsOf(spark, dir, 4L)) == upTo2)
    val full = snapSet(Segments.readAsOf(spark, dir, 7L))
    assert(full == contents(dir))
    // the snapshot read prunes at the batch partition: only ≤-maxBatch
    // segment files appear in the scanned paths
    val scanned = Segments.readAsOf(spark, dir, 2L)
      .queryExecution.executedPlan.collectLeaves().map(_.toString).mkString("\n")
    assert(!scanned.contains("batch=5") && !scanned.contains("batch=7"),
      s"snapshot scan must prune later segments:\n$scanned")
    // compaction folds 0,2,5 into batch=5 (7 protected): pins at ≥ 5 survive,
    // a pin below the fold is GONE and must fail — never silently partial
    assert(Segments.compact(spark, dir, Seq("p")) == 3)
    assert(snapSet(Segments.readAsOf(spark, dir, 5L)) == upTo2 ++
      (20 until 30).map(i => (i.toLong, s"v$i", (i % 3).toString)).toSet)
    assert(snapSet(Segments.readAsOf(spark, dir, 7L)) == full)
    val err = intercept[IllegalArgumentException](Segments.readAsOf(spark, dir, 2L))
    assert(err.getMessage.contains("compaction"), err.getMessage)
    intercept[IllegalArgumentException](
      Segments.readAsOf(spark, java.nio.file.Files.createTempDirectory("seg_empty").toString, 0L))
  }
}
