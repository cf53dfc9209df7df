package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.dedup.{DedupOps, LshIndex}

class LshIndexSpec extends AnyFunSuite with SharedSpark {

  private def docs = Tables.documents(spark, sfDir).select("doc_id", "text")

  test("full-corpus index probe reproduces the one-shot LSH pair set exactly") {
    val dir = java.nio.file.Files.createTempDirectory("lsh_idx_full").toString
    LshIndex.materialize(spark, docs, dir)
    val viaIndex = LshIndex.candidates(spark, dir, docs)
      .filter(col("probe_id") < col("index_id"))
      .select(col("probe_id").as("id_a"), col("index_id").as("id_b"),
        col("n_eq"), col("est_sim"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
      .sortBy(t => (t._1, t._2))
    val oneShot = DedupOps.minhashLshPairs(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
      .sortBy(t => (t._1, t._2))
    assert(viaIndex.nonEmpty, "TESTDATA plants near-dups — the pair set must not be empty")
    assert(viaIndex.sameElements(oneShot),
      s"index path diverged: ${viaIndex.take(3).mkString(",")} vs ${oneShot.take(3).mkString(",")}")
  }

  test("batch probe against a partial index finds exactly the cross pairs") {
    val dir = java.nio.file.Files.createTempDirectory("lsh_idx_part").toString
    val corpus = docs.filter(col("doc_id") % 5 =!= 0)
    val batch = docs.filter(col("doc_id") % 5 === 0)
    LshIndex.materialize(spark, corpus, dir)
    val got = LshIndex.candidates(spark, dir, batch)
      .select("probe_id", "index_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // expected: the one-shot pairs with exactly one endpoint in the batch,
    // oriented probe→index
    val full = DedupOps.minhashLshPairs(spark, sfDir)
      .select("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val expected = full.flatMap { case (a, b) =>
      (a % 5 == 0, b % 5 == 0) match {
        case (true, false) => Some((a, b))
        case (false, true) => Some((b, a))
        case _ => None
      }
    }.toSet
    assert(got == expected, s"got ${got.size} cross pairs, expected ${expected.size}")

    // absorb the batch; re-probing now also surfaces batch-internal pairs
    // (as probe→index in both orientations) and never a self pair
    LshIndex.appendBatch(spark, dir, batch, batchId = 1L)
    val after = LshIndex.candidates(spark, dir, batch)
      .select("probe_id", "index_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(after.forall { case (p, i) => p != i }, "self pairs must be dropped")
    val batchInternal = full.filter { case (a, b) => a % 5 == 0 && b % 5 == 0 }
    val afterSet = after.toSet
    batchInternal.foreach { case (a, b) =>
      assert(afterSet.contains((a, b)) && afterSet.contains((b, a)),
        s"absorbed batch pair ($a,$b) missing from re-probe")
    }
  }

  test("as-of probe reproduces a past run's candidate set after the index grew") {
    val dir = java.nio.file.Files.createTempDirectory("lsh_idx_asof").toString
    val corpus = docs.filter(col("doc_id") % 5 =!= 0)
    val later = docs.filter(col("doc_id") % 5 === 0)
    val probe = docs.filter(col("doc_id") % 7 === 0)
    LshIndex.materialize(spark, corpus, dir)
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("probe_id", "index_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val runX = pairs(LshIndex.candidates(spark, dir, probe))
    LshIndex.appendBatch(spark, dir, later, batchId = 1L)
    // the snapshot pin replays run X exactly; an unpinned probe sees more
    assert(pairs(LshIndex.candidates(spark, dir, probe, asOf = Some(0L))) == runX,
      "asOf=0 must reproduce the pre-absorb candidate set")
    assert(pairs(LshIndex.candidates(spark, dir, probe)).size > runX.size,
      "the grown index must surface new candidates without the pin")
    // readAsOf serves the signed band rows of the pinned corpus only
    assert(LshIndex.readAsOf(spark, dir, 0L).select("doc_id").distinct().count() ==
      corpus.count())
  }

  test("appendBatch is replay-idempotent (same segment id overwrites)") {
    val dir = java.nio.file.Files.createTempDirectory("lsh_idx_replay").toString
    val batch = docs.filter(col("doc_id") < 50)
    LshIndex.appendBatch(spark, dir, batch, batchId = 7L)
    val n1 = LshIndex.read(spark, dir).count()
    LshIndex.appendBatch(spark, dir, batch, batchId = 7L) // checkpoint replay
    assert(LshIndex.read(spark, dir).count() == n1, "replayed batch duplicated rows")
    LshIndex.appendBatch(spark, dir, docs.filter(col("doc_id") >= 50 && col("doc_id") < 60), 8L)
    assert(LshIndex.read(spark, dir).count() > n1, "a new segment must add rows")
  }

  test("streaming absorb: per-batch probe+append, deterministic under restart") {
    import java.nio.file.Files
    val base = Files.createTempDirectory("lsh_stream").toString
    val (src, idx, cand, ckpt) = (s"$base/src", s"$base/idx", s"$base/cand", s"$base/ckpt")
    // bootstrap index with the 60% corpus (doc_id % 5 in 2,3,4)
    LshIndex.materialize(spark, docs.filter(col("doc_id") % 5 >= 2), idx)
    val full = DedupOps.minhashLshPairs(spark, sfDir)
      .select("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // stream file 1: the %5==0 slice
    docs.filter(col("doc_id") % 5 === 0).write.mode("append").parquet(src)
    val schema = spark.read.parquet(src).schema
    def start() = LshIndex.streamingAbsorb(
      spark.readStream.schema(schema).parquet(src), idx, cand, ckpt).start()
    val q1 = start()
    q1.processAllAvailable()
    q1.stop()
    val seg0 = spark.read.option("basePath", cand).parquet(s"$cand/batch=${LshIndex.StreamingSegmentBase}")
      .select("probe_id", "index_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected0 = full.flatMap { case (a, b) =>
      (a % 5 == 0, b % 5 >= 2, b % 5 == 0, a % 5 >= 2) match {
        case (true, true, _, _) => Some((a, b))
        case (_, _, true, true) => Some((b, a))
        case _ => None
      }
    }.toSet
    assert(seg0 == expected0, s"batch-0 candidates: got ${seg0.size}, expected ${expected0.size}")
    // stream file 2 lands while the query is down; restart from checkpoint
    docs.filter(col("doc_id") % 5 === 1).write.mode("append").parquet(src)
    val q2 = start()
    q2.processAllAvailable()
    q2.stop()
    // batch 1 probes against bootstrap ∪ batch-0 segments
    val seg1 = spark.read.option("basePath", cand).parquet(s"$cand/batch=${LshIndex.StreamingSegmentBase + 1}")
      .select("probe_id", "index_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected1 = full.flatMap { case (a, b) =>
      (a % 5 == 1, b % 5 != 1) match {
        case (true, true) => Some((a, b))
        case _ => (b % 5 == 1 && a % 5 != 1, ()) match {
          case (true, _) => Some((b, a))
          case _ => None
        }
      }
    }.toSet
    assert(seg1 == expected1, s"batch-1 candidates: got ${seg1.size}, expected ${expected1.size}")
    // the index now carries every segment: a fresh probe of all docs matches
    // the one-shot pair set (both orientations, no self pairs)
    val probeAll = LshIndex.candidates(spark, idx, docs)
      .filter(col("probe_id") < col("index_id"))
      .select("probe_id", "index_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(probeAll == full.toSet, "absorbed index must reproduce the one-shot pair set")
  }

  test("index compaction bounds segments and preserves every candidate") {
    val dir = java.nio.file.Files.createTempDirectory("lsh_idx_compact").toString
    (0 until 3).foreach(i =>
      LshIndex.appendBatch(spark, dir, docs.filter(col("doc_id") % 3 === i), i.toLong))
    def probe() = LshIndex.candidates(spark, dir, docs.filter(col("doc_id") < 50))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sortBy(t => (t._1, t._2))
    val before = probe()
    // default is replay-safe: the newest segment (a stream's possibly
    // uncommitted batch) is never absorbed, so 2 of 3 fold into batch=1
    assert(LshIndex.compactSegments(spark, dir) == 2)
    val segs = new java.io.File(dir).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("batch="))
    assert(segs.map(_.getName).sorted.toSeq == Seq("batch=1", "batch=2"),
      "absorbed segments merge below the protected newest one")
    assert(probe().sameElements(before), "compaction changed candidates")
    assert(LshIndex.compactSegments(spark, dir) == 0,
      "one compacted + one protected segment: nothing left to do")
    // a quiesced index (stream's last batch provably committed) may fold the
    // tail in too
    assert(LshIndex.compactSegments(spark, dir, protectLatest = false) == 2)
    val segsQ = new java.io.File(dir).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("batch="))
    assert(segsQ.map(_.getName).toSeq == Seq("batch=2"))
    assert(probe().sameElements(before), "full compaction changed candidates")
  }

  test("probe plan broadcasts the batch side; the index scan does not shuffle") {
    val dir = java.nio.file.Files.createTempDirectory("lsh_idx_plan").toString
    LshIndex.materialize(spark, docs, dir)
    val probe = LshIndex.candidates(spark, dir, docs.filter(col("doc_id") < 20))
    probe.collect() // finalize the adaptive plan
    val s = graft.plans.PlanAudit.summary(probe).head()
    assert(s.getAs[Int]("n_broadcasts") >= 1, "batch side must broadcast")
    val plan = probe.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast join:\n$plan")
    // legitimate shuffles: the probe batch's own signature aggregation
    // (inside the broadcast subtree, batch-sized) and the de-collision
    // distinct. The INDEX side must feed the join straight from its scan —
    // no exchange may hash-partition on the band keys.
    assert(s.getAs[Int]("n_shuffles") <= 2, s"unexpected extra shuffles:\n$plan")
    val bandKeyShuffles = graft.plans.PlanAudit.audit(probe)
      .filter(col("kind") === "shuffle")
      .collect().map(_.getAs[String]("detail"))
      .filter(d => d.contains("band_idx") || d.contains("k0"))
    assert(bandKeyShuffles.isEmpty,
      s"index side shuffled on band keys: ${bandKeyShuffles.mkString("; ")}\n$plan")
  }

  test("occupancy cap drops a planted hot stored bucket; in-cap matches survive (r11)") {
    // a boilerplate-heavy slice absorbed into the index: 20 identical docs
    // share every band bucket (occupancy 20 > cap 8), so EVERY probe that
    // hashes into those buckets would otherwise emit 20 candidates per band,
    // every micro-batch, forever — the FingerprintIndex.candidates
    // discipline applied to minhash space
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("lsh_hot").toString
    val hotText = "alpha beta gamma delta epsilon zeta"
    val stored = ((0L until 20L).map(i => (i, hotText)) :+
      (100L, "one two three four five six seven")).toDF("doc_id", "text")
    LshIndex.materialize(spark, stored, dir)
    // probe: one doc matching the hot bucket, one matching the in-cap doc
    val probe = Seq((500L, hotText), (501L, "one two three four five six seven"))
      .toDF("doc_id", "text")
    val capped = LshIndex.candidates(
        spark, dir, probe, occupancyCap = Some(graft.dedup.DedupOps.lshBucketCap(21)))
      .select("probe_id", "index_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!capped.exists(_._1 == 500L),
      s"hot-bucket candidates survived the cap: ${capped.filter(_._1 == 500L).take(3)}")
    assert(capped.contains((501L, 100L)), s"in-cap match lost (got $capped)")
    // uncapped, the hot probe emits all 20 — the volume the cap exists to bound
    val uncapped = LshIndex.candidates(spark, dir, probe)
      .filter(col("probe_id") === 500L).count()
    assert(uncapped == 20L, s"setup: expected 20 hot candidates, got $uncapped")
  }
}
