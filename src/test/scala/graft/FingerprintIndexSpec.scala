package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.dedup.FingerprintIndex
import graft.multimodal.MediaOps

class FingerprintIndexSpec extends AnyFunSuite with SharedSpark {

  // sf0.01's image corpus has a non-empty hamming-≤7 pair set (sf0.001's
  // images are all far apart), so equivalence checks are non-vacuous
  private val dataDir = "/root/testdata/sf0.01"
  private def fps = MediaOps.imageFingerprints(spark, dataDir)

  private def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select("probe_id", "index_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("full-corpus index probe reproduces the one-shot near-dup pair set exactly") {
    val dir = java.nio.file.Files.createTempDirectory("fp_idx_full").toString
    FingerprintIndex.materialize(spark, fps, dir)
    val viaIndex = FingerprintIndex.candidates(spark, dir, fps)
      .filter(col("probe_id") < col("index_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val oneShot = MediaOps.imageNearDup(spark, dataDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(oneShot.nonEmpty, "test corpus must contain near-dup images")
    assert(viaIndex == oneShot)
  }

  test("batch probe against a partial index finds exactly the cross pairs; absorb surfaces the rest") {
    val dir = java.nio.file.Files.createTempDirectory("fp_idx_part").toString
    val corpus = fps.filter(col("id") % 5 =!= 0)
    val batch = fps.filter(col("id") % 5 === 0)
    FingerprintIndex.materialize(spark, corpus, dir)
    val got = pairSet(FingerprintIndex.candidates(spark, dir, batch))
    val full = MediaOps.imageNearDup(spark, dataDir)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val expected = full.flatMap { case (a, b) =>
      (a % 5 == 0, b % 5 == 0) match {
        case (true, false) => Some((a, b))
        case (false, true) => Some((b, a))
        case _ => None
      }
    }.toSet
    assert(got == expected, s"got ${got.size} cross pairs, expected ${expected.size}")
    FingerprintIndex.appendBatch(spark, dir, batch, batchId = 1L)
    val after = pairSet(FingerprintIndex.candidates(spark, dir, batch))
    assert(after.forall { case (p, i) => p != i }, "self pairs must be dropped")
    full.filter { case (a, b) => a % 5 == 0 && b % 5 == 0 }.foreach { case (a, b) =>
      assert(after.contains((a, b)) && after.contains((b, a)),
        s"absorbed batch pair ($a,$b) missing from re-probe")
    }
  }

  test("as-of probe replays a past run after the index grew; appendBatch is replay-idempotent") {
    val dir = java.nio.file.Files.createTempDirectory("fp_idx_asof").toString
    val corpus = fps.filter(col("id") % 5 =!= 0)
    FingerprintIndex.materialize(spark, corpus, dir)
    val probe = fps.filter(col("id") % 7 === 0)
    val runX = pairSet(FingerprintIndex.candidates(spark, dir, probe))
    FingerprintIndex.appendBatch(spark, dir, fps.filter(col("id") % 5 === 0), batchId = 1L)
    assert(pairSet(FingerprintIndex.candidates(spark, dir, probe, asOf = Some(0L))) == runX,
      "asOf=0 must reproduce the pre-absorb candidate set")
    assert(pairSet(FingerprintIndex.candidates(spark, dir, probe)).size >= runX.size)
    val n1 = FingerprintIndex.read(spark, dir).count()
    FingerprintIndex.appendBatch(spark, dir, fps.filter(col("id") % 5 === 0), batchId = 1L)
    assert(FingerprintIndex.read(spark, dir).count() == n1, "replayed batch duplicated rows")
  }

  test("streaming absorb probes each micro-batch deterministically, then indexes it") {
    import java.nio.file.Files
    val base = Files.createTempDirectory("fp_stream").toString
    val (src, idx, cand, ckpt) = (s"$base/src", s"$base/idx", s"$base/cand", s"$base/ckpt")
    FingerprintIndex.materialize(spark, fps.filter(col("id") % 5 >= 2), idx)
    val full = MediaOps.imageNearDup(spark, dataDir)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    fps.filter(col("id") % 5 === 0).write.mode("append").parquet(src)
    val schema = spark.read.parquet(src).schema
    def start() = FingerprintIndex.streamingAbsorb(
      spark.readStream.schema(schema).parquet(src), idx, cand, ckpt).start()
    val q1 = start(); q1.processAllAvailable(); q1.stop()
    val seg0 = spark.read
      .option("basePath", cand)
      .parquet(s"$cand/batch=${FingerprintIndex.StreamingSegmentBase}")
      .select("probe_id", "index_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected0 = full.flatMap { case (a, b) =>
      if (a % 5 == 0 && b % 5 >= 2) Some((a, b))
      else if (b % 5 == 0 && a % 5 >= 2) Some((b, a))
      else None
    }.toSet
    assert(seg0 == expected0, s"batch-0 candidates: got ${seg0.size}, expected ${expected0.size}")
    // second file lands while the query is down; restart resumes from ckpt
    fps.filter(col("id") % 5 === 1).write.mode("append").parquet(src)
    val q2 = start(); q2.processAllAvailable(); q2.stop()
    val probeAll = pairSet(
      FingerprintIndex.candidates(spark, idx, fps)
        .filter(col("probe_id") < col("index_id")))
    assert(probeAll == full.toSet, "fully absorbed index must reproduce the one-shot pair set")
  }

  test("probe plan broadcasts the batch and runs with ZERO shuffles (no distinct pass)") {
    val dir = java.nio.file.Files.createTempDirectory("fp_idx_plan").toString
    FingerprintIndex.materialize(spark, fps, dir)
    val probe = FingerprintIndex.candidates(spark, dir, fps.filter(col("id") < 60))
    probe.collect()
    val s = graft.plans.PlanAudit.summary(probe).head()
    assert(s.getAs[Int]("n_broadcasts") >= 1, "batch side must broadcast")
    // first-agreeing-band emission replaces the pair distinct(): the whole
    // candidate path is scan -> broadcast join -> row-wise filter
    assert(s.getAs[Int]("n_shuffles") == 0,
      s"probe must not shuffle:\n${probe.queryExecution.executedPlan}")
  }

  test("compaction bounds segments and preserves every candidate") {
    val dir = java.nio.file.Files.createTempDirectory("fp_idx_compact").toString
    (0 until 3).foreach(i =>
      FingerprintIndex.appendBatch(spark, dir, fps.filter(col("id") % 3 === i), i.toLong))
    def probe() = FingerprintIndex.candidates(spark, dir, fps.filter(col("id") < 60))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sortBy(t => (t._1, t._2))
    val before = probe()
    assert(FingerprintIndex.compactSegments(spark, dir) == 2)
    assert(probe().sameElements(before), "compaction changed candidates")
    assert(FingerprintIndex.compactSegments(spark, dir, protectLatest = false) == 2)
    assert(probe().sameElements(before), "full compaction changed candidates")
  }

  test("wide-shape (256-bit, 16-bit bands) index probe matches one-shot pairs, zero shuffles") {
    import graft.dedup.FpShape
    val dir = java.nio.file.Files.createTempDirectory("fp_idx_wide").toString
    val wide = MediaOps.imageWideFingerprints(spark, dataDir)
    FingerprintIndex.materialize(spark, wide, dir, FpShape.Fp256)
    val probe = FingerprintIndex.candidates(
      spark, dir, wide, maxDist = MediaOps.WideMaxDist, shape = FpShape.Fp256)
    val viaIndex = probe.filter(col("probe_id") < col("index_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val oneShot = MediaOps.imageNearDupWideband(spark, dataDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(oneShot.nonEmpty, "test corpus must contain wide-hash near-dup images")
    assert(viaIndex == oneShot)
    // the wide shape keeps the zero-shuffle broadcast-probe plan
    probe.collect()
    val s = graft.plans.PlanAudit.summary(probe).head()
    assert(s.getAs[Int]("n_broadcasts") >= 1 && s.getAs[Int]("n_shuffles") == 0,
      s"wide probe must broadcast and not shuffle:\n${probe.queryExecution.executedPlan}")
  }

  test("occupancy skew reads ~1 on spread fingerprints and flags a planted hot bucket") {
    import spark.implicits._
    // spread: distinct values in every band
    val spreadDir = java.nio.file.Files.createTempDirectory("fp_occ_spread").toString
    val spread = (0 until 64).map { i =>
      val v = (i.toLong * 0x01010101L) & 0xffffffffL
      (i.toLong, v, (v ^ 0xffffffffL) & 0xffffffffL)
    }.toDF("id", "fp_hi", "fp_lo")
    FingerprintIndex.materialize(spark, spread, spreadDir)
    val flat = FingerprintIndex.occupancySkew(spark, spreadDir)
    // hot: every fingerprint identical -> each bucket holds all 64 rows, but
    // only 8 of the 8×256 possible buckets are occupied... occupancy skew is
    // max/mean over OCCUPIED buckets, so identical fps read as uniform-full;
    // the operational hot case is MOST rows constant + a spread tail
    val hotDir = java.nio.file.Files.createTempDirectory("fp_occ_hot").toString
    val hot = (0 until 64).map { i =>
      if (i < 48) (i.toLong, 0L, 0L) // constant region: black frames
      else {
        val v = (i.toLong * 0x01010101L) & 0xffffffffL
        (i.toLong, v, (v ^ 0xffffffffL) & 0xffffffffL)
      }
    }.toDF("id", "fp_hi", "fp_lo")
    FingerprintIndex.materialize(spark, hot, hotDir)
    val skewed = FingerprintIndex.occupancySkew(spark, hotDir)
    assert(flat < 2.0, s"spread corpus should be near-uniform, got $flat")
    assert(skewed > 5.0, s"planted hot bucket must dominate, got $skewed")
    assert(skewed > flat * 2)
  }

  test("occupancy cap drops degenerate-region candidates, keeps all other pairs exactly once") {
    import spark.implicits._
    import graft.dedup.FpShape
    // 40 constant fingerprints (black frames: every band bucket hot) + 24
    // spread ones, of which 59/60 and 61/62 are genuine near-dup pairs
    def spreadFp(i: Long): (Long, Long, Long) = {
      val v = (i * 0x01010101L) & 0xffffffffL
      (i, v, (v ^ 0x55aa55aaL) & 0xffffffffL)
    }
    val rows =
      (0L until 40L).map(i => (i, 0L, 0L)) ++
        (40L until 64L).map {
          case 60L => val (_, h, l) = spreadFp(59L); (60L, h, l ^ 1L) // dist 1 from 59
          case 62L => val (_, h, l) = spreadFp(61L); (62L, h ^ 2L, l) // dist 1 from 61
          case i => spreadFp(i)
        }
    val fps = rows.toDF("id", "fp_hi", "fp_lo")
    val uncapped = graft.dedup.FingerprintIndex.pairsWithin(fps)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // all 40×39/2 constant pairs + the planted spread pairs, plus the two
    // incidental distance-7 pairs the ^1/^2 perturbations create with their
    // byte neighbours (58^59=1 and 61^63=2 leave one band agreeing)
    val spreadPairs = Set((58L, 60L), (59L, 60L), (61L, 62L), (62L, 63L))
    assert(uncapped.size == 40 * 39 / 2 + spreadPairs.size, s"got ${uncapped.size}")
    assert(spreadPairs.subsetOf(uncapped))
    val capped = graft.dedup.FingerprintIndex
      .pairsWithin(fps, occupancyCap = Some(8))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped == spreadPairs,
      s"cap must keep exactly the non-degenerate pairs: $capped")
    // emitted exactly once each (no first-band double emission under caps)
    val cappedRows = graft.dedup.FingerprintIndex
      .pairsWithin(fps, occupancyCap = Some(8)).collect()
    assert(cappedRows.length == spreadPairs.size)
    // the capped probe path agrees with the capped one-shot
    val dir = java.nio.file.Files.createTempDirectory("fp_cap_idx").toString
    graft.dedup.FingerprintIndex.materialize(spark, fps, dir)
    val viaIdx = graft.dedup.FingerprintIndex
      .candidates(spark, dir, fps, occupancyCap = Some(8))
      .filter(org.apache.spark.sql.functions.col("probe_id")
        < org.apache.spark.sql.functions.col("index_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(viaIdx == capped)
  }

  test("streaming absorb publishes the occupancy-skew health metric per batch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("fp_health").toString
    val (idx, cand, ckpt, metrics) =
      (s"$base/idx", s"$base/cand", s"$base/ckpt", s"$base/metrics")
    FingerprintIndex.materialize(spark, fps.filter(col("id") % 5 =!= 0), idx)
    implicit val sc = spark.sqlContext
    val stream = MemoryStream[(Long, Long, Long)]
    val q = FingerprintIndex.streamingAbsorb(
      stream.toDF().toDF("id", "fp_hi", "fp_lo"), idx, cand, ckpt,
      healthMetricsOut = Some(metrics)).start()
    val batch = fps.filter(col("id") % 5 === 0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    stream.addData(batch.toSeq)
    q.processAllAvailable(); q.stop()
    val m = spark.read.option("basePath", metrics).parquet(metrics)
      .select("segment", "occupancy_skew").collect()
    assert(m.length == 1 && m(0).getLong(0) == FingerprintIndex.StreamingSegmentBase)
    val skew = m(0).getDouble(1)
    assert(skew >= 1.0 && skew == FingerprintIndex.occupancySkew(spark, idx),
      s"published skew $skew must equal the recomputed index skew")
  }

  test("occupancy ledger fires exactly past the cap, with the suppressed-candidate count (r13 #5)") {
    import spark.implicits._
    // a 10-row VALUE MASS (the indivisible degenerate region: identical
    // fingerprints agree on every band under any banding) + 5 benign rows
    // whose band values (every byte = id) never collide with the mass's zero
    // buckets
    val fps = ((1L to 10L).map(i => (i, 0L, 0L)) ++
      (11L to 15L).map(i => (i, i * 0x01010101L, i * 0x01010101L)))
      .toDF("id", "fp_hi", "fp_lo")
    // boundary: occupancy == cap must NOT fire; cap − 1 fires on every band
    assert(FingerprintIndex.occupancyLedger(fps, 10).count() == 0,
      "occupancy equal to the cap must not read as over-cap")
    val led = FingerprintIndex.occupancyLedger(fps, 9).collect()
    assert(led.length == FingerprintIndex.NBands,
      s"the value mass must fire once per band, got ${led.length}")
    led.foreach { r =>
      assert(r.getAs[Int]("band_val") == 0)
      assert(r.getAs[Long]("occupancy") == 10L)
      assert(r.getAs[Long]("dropped_candidate_pairs") == 45L,
        "suppressed candidates must read occ·(occ−1)/2")
    }
    // the stored-index form sees the same buckets
    val idxDir = java.nio.file.Files.createTempDirectory("fp_ledger_idx").toString
    FingerprintIndex.materialize(spark, fps, idxDir)
    val ledIdx = FingerprintIndex.occupancyLedgerOf(spark, idxDir, 9).collect()
    assert(ledIdx.map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSeq ==
      led.map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSeq,
      "stored-index ledger diverged from the relation form")
    // consistency with the cap's actual behavior: under a cap the ledger
    // says is breached, pairsWithin suppresses the mass's pairs (no
    // surviving agreeing band) while benign pairs are untouched
    val capped = FingerprintIndex.pairsWithin(fps, occupancyCap = Some(9))
    assert(capped.filter(col("id_a") <= 10 && col("id_b") <= 10).count() == 0,
      "every agreeing band of the value mass is ledgered hot — its pairs must be suppressed")
  }
}
