package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.dedup.{AdmissionPipeline, DedupOps, PairStore, ShingleIndex}

class AdmissionPipelineSpec extends AnyFunSuite with SharedSpark {

  import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

  private def corpus = {
    import spark.implicits._
    Seq((1L, "p q r s t u"), (2L, "p q r s t v"), (3L, "w1 w2 w3 w4 w5 w6"))
      .toDF("doc_id", "text")
  }

  test("generational root: init, rebuild, current-by-completion, prune") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("adm_gen").toString + "/idx"
    ShingleIndex.initGenerations(spark, root, corpus)
    assert(ShingleIndex.currentGeneration(spark, root) == 0L)
    val g1 = ShingleIndex.rebuildGeneration(spark, root,
      corpus.union(Seq((9L, "m n o p q r")).toDF("doc_id", "text")))
    assert(g1 == 1L && ShingleIndex.currentGeneration(spark, root) == 1L)
    // an INCOMPLETE generation (no batch=0/_SUCCESS) is invisible to serving
    // and does not block numbering: debris from a crashed rebuild
    new java.io.File(s"$root/gen=2/batch=0").mkdirs()
    assert(ShingleIndex.currentGeneration(spark, root) == 1L,
      "an incomplete generation must never become current")
    val g3 = ShingleIndex.rebuildGeneration(spark, root, corpus)
    assert(g3 == 3L, "rebuild numbering must skip crash debris")
    // prune keeps the newest `keep` complete generations and sweeps debris
    val dropped = ShingleIndex.pruneGenerations(spark, root, keep = 1)
    assert(dropped == 3 && ShingleIndex.currentGeneration(spark, root) == 3L,
      s"prune must drop gens 0,1 and the debris dir (dropped=$dropped)")
  }

  test("admission staleness: unseen vs over-cap shingles are told apart") {
    import spark.implicits._
    // corpus at cap=2: "z1..z5" boilerplate (df 3) is OVER-CAP
    val c = Seq(
      (1L, "p q r s t u"), (2L, "p q r s t v"),
      (3L, "z1 z2 z3 z4 z5"), (4L, "z1 z2 z3 z4 z5"), (5L, "z1 z2 z3 z4 z5"))
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("adm_stale").toString + "/idx"
    ShingleIndex.materializeDocs(spark, c, dir, cap = 2)
    // batch shingles: "p q r s t" (stored), "z1 z2 z3 z4 z5" (over-cap),
    // "a b c d e" (unseen) → n=3, unseen 1/3, overcap 1/3
    val batch = Seq(
      (101L, "p q r s t"), (102L, "z1 z2 z3 z4 z5"), (103L, "a b c d e"))
      .toDF("doc_id", "text")
    val (n, unseen, over) = ShingleIndex.admissionStaleness(spark, dir, batch)
    assert(n == 3L && math.abs(unseen - 1.0 / 3) < 1e-9 && math.abs(over - 1.0 / 3) < 1e-9,
      s"got n=$n unseen=$unseen over=$over")
    // an all-short batch (no shingles) reads as zero staleness, not NaN
    val (n0, u0, o0) = ShingleIndex.admissionStaleness(
      spark, dir, Seq((104L, "a b")).toDF("doc_id", "text"))
    assert(n0 == 0L && u0 == 0.0 && o0 == 0.0)
    // plan shape: the BATCH broadcasts, the store streams (one column-pruned
    // scan, no store bytes shuffled per batch — the probePairs rule)
    val plan = ShingleIndex.admissionStalenessCounts(spark, dir, batch)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && !plan.contains("SortMergeJoin"),
      s"the staleness aggregate must broadcast the batch, never shuffle the store:\n$plan")
  }

  test("per-doc staleness: integer-exact split per batch document, batch broadcasts") {
    import spark.implicits._
    val c = Seq(
      (1L, "p q r s t u"), (2L, "p q r s t v"),
      (3L, "z1 z2 z3 z4 z5"), (4L, "z1 z2 z3 z4 z5"), (5L, "z1 z2 z3 z4 z5"))
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("adm_stale_doc").toString + "/idx"
    ShingleIndex.materializeDocs(spark, c, dir, cap = 2)
    val batch = Seq(
      (101L, "p q r s t"),            // 1 shingle, stored
      (102L, "z1 z2 z3 z4 z5"),       // 1 shingle, over-cap
      (103L, "a b c d e f"),          // 2 shingles, both unseen
      (104L, "a b"))                  // under ShingleK: no shingles, no row
      .toDF("doc_id", "text")
    val rows = ShingleIndex.admissionStalenessByDoc(spark, dir, batch)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.toSeq == Seq(
      (101L, 1L, 0L, 0L), (102L, 1L, 0L, 1L), (103L, 2L, 2L, 0L)),
      s"got: ${rows.toSeq}")
    // the doc-level drift counter the pipeline trips on
    assert(ShingleIndex.admissionDocDrift(spark, dir, batch, band = 0.9) == (3L, 1L))
    // plan shape: the batch broadcasts, the store streams (the probePairs rule)
    val plan = ShingleIndex.admissionStalenessByDoc(spark, dir, batch)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && !plan.contains("SortMergeJoin"),
      s"the per-doc staleness split must broadcast the batch, never shuffle the store:\n$plan")
  }

  test("doc-level drift trips the rebuild the diluted aggregate misses, catch-up closes the pairs") {
    import spark.implicits._
    // 7 stable docs (all shingles stored) + 3 new-vocabulary docs, two of
    // them identical: the batch aggregate reads 4 unseen / 9 distinct
    // shingles ≈ 0.44 — under the 0.6 aggregate threshold — while 3/10 docs
    // are fully drifted, exactly the dilution the per-doc signal exists for
    val batchRows = Seq(
      (101L, "p q r s t u"), (102L, "p q r s t v"), (103L, "w1 w2 w3 w4 w5 w6"),
      (104L, "p q r s t u"), (105L, "p q r s t v"), (106L, "w1 w2 w3 w4 w5 w6"),
      (107L, "p q r s t u"),
      (501L, "n1 n2 n3 n4 n5 n6"), (502L, "n1 n2 n3 n4 n5 n6"),
      (503L, "m1 m2 m3 m4 m5 m6"))
    def run(band: Option[Double]): (Long, String, Set[(Long, Long, String)]) = {
      val base = java.nio.file.Files.createTempDirectory("adm_docdrift").toString
      val (genRoot, lsh, retain, ps, ckpt, ledger) =
        (s"$base/gen", s"$base/lsh", s"$base/docs", s"$base/pairs", s"$base/ckpt", s"$base/ledger")
      ShingleIndex.initGenerations(spark, genRoot, corpus)
      implicit val sc = spark.sqlContext
      val stream = MemoryStream[(Long, String)]
      val q = AdmissionPipeline.streamingTwoTier(
        stream.toDF().toDF("doc_id", "text"),
        genRoot, lsh, retain, ps, ckpt, baseDocs = corpus,
        refreshEvery = 1,
        stalenessThreshold = Some(0.6),
        docStalenessBand = band, docDriftFracThreshold = 0.3,
        rebuildCooldownBatches = 5,
        ledgerOut = Some(ledger)).start()
      try {
        stream.addData(batchRows)
        q.processAllAvailable()
      } finally q.stop()
      val led = spark.read.option("basePath", ledger).parquet(ledger).head()
      val tiered = AdmissionPipeline.readPairsTiered(spark, ps)
        .select("id_a", "id_b", "tier")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
      (ShingleIndex.currentGeneration(spark, genRoot),
        led.getAs[String]("trip"), tiered)
    }
    // aggregate-only config: the diluted batch sails under the threshold
    val (genAgg, tripAgg, _) = run(band = None)
    assert(genAgg == 0L && tripAgg == "none",
      s"the aggregate signal alone must miss the 30%-drifted batch (gen=$genAgg trip=$tripAgg)")
    // doc-level config: the same batch trips, and the rebuild's exact
    // catch-up closes the in-window pair between the two drifted twins
    val (genDoc, tripDoc, tiered) = run(band = Some(0.9))
    assert(genDoc == 1L && tripDoc == "doc",
      s"the doc-level signal must trip on the same batch (gen=$genDoc trip=$tripDoc)")
    assert(tiered.contains((501L, 502L, "rebuild")),
      s"the catch-up must close the drifted twins' pair with exact semantics: $tiered")
  }

  test("governed compaction bounds segment counts and preserves tiers and rows") {
    import spark.implicits._
    // same 8-batch stream twice: compacting pipeline vs uncompacted twin —
    // identical pair rows (tier included) is the determinism claim
    val batches = (0 until 8).map { i =>
      Seq((200L + i * 2, "p q r s t u"), (201L + i * 2, "w1 w2 w3 w4 w5 w6"))
    }
    def run(threshold: Int): (String, Set[(Long, Long, String, Double)]) = {
      val base = java.nio.file.Files.createTempDirectory("adm_compact").toString
      ShingleIndex.initGenerations(spark, s"$base/gen", corpus)
      implicit val sc = spark.sqlContext
      val stream = MemoryStream[(Long, String)]
      val q = AdmissionPipeline.streamingTwoTier(
        stream.toDF().toDF("doc_id", "text"),
        s"$base/gen", s"$base/lsh", s"$base/docs", s"$base/pairs", s"$base/ckpt",
        baseDocs = corpus, refreshEvery = 3,
        ledgerOut = Some(s"$base/ledger"),
        compactSegmentThreshold = threshold).start()
      try batches.foreach { rows => stream.addData(rows); q.processAllAvailable() }
      finally q.stop()
      val rows = AdmissionPipeline.readPairsTiered(spark, s"$base/pairs")
        .select("id_a", "id_b", "tier", "jaccard")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3)))
        .toSet
      (base, rows)
    }
    val (plain, plainRows) = run(threshold = 0)
    val (gov, govRows) = run(threshold = 9)
    // 8 batches × 2 pair segments accrete 16 uncompacted; the governed run
    // compacted at the threshold and stays bounded
    val plainSegs = graft.sources.Segments.segmentIds(spark, s"$plain/pairs/pairs").length
    val govSegs = graft.sources.Segments.segmentIds(spark, s"$gov/pairs/pairs").length
    assert(plainSegs == 16, s"uncompacted twin should hold 16 segments, got $plainSegs")
    assert(govSegs < 12, s"governed run must stay bounded, got $govSegs")
    val govLsh = graft.sources.Segments.segmentIds(spark, s"$gov/lsh").length
    assert(govLsh < 8, s"LSH index segments must compact too, got $govLsh")
    // every pair row — values AND tier — identical to the uncompacted twin
    assert(govRows == plainRows,
      s"compaction must preserve rows and tiers: missing=${plainRows -- govRows} extra=${govRows -- plainRows}")
    // the ledger still tells the whole 8-batch story (its own segments
    // compact, rows carry their identity)
    val led = spark.read.option("basePath", s"$gov/ledger").parquet(s"$gov/ledger")
      .orderBy("segment").select("compacted_segments", "pair_segments_before")
      .collect()
    assert(led.length == 8, s"ledger must keep one row per batch, got ${led.length}")
    assert(led.exists(_.getInt(0) > 0), "at least one batch must have compacted")
  }

  test("retained batches fold into the base snapshot on rebuild; the next rebuild reaches the same fixpoint") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("adm_fold").toString
    val (genRoot, lsh, retain, ps, ckpt, ledger) =
      (s"$base/gen", s"$base/lsh", s"$base/docs", s"$base/pairs", s"$base/ckpt", s"$base/ledger")
    ShingleIndex.initGenerations(spark, genRoot, corpus)
    implicit val sc = spark.sqlContext
    val stream = MemoryStream[(Long, String)]
    val q = AdmissionPipeline.streamingTwoTier(
      stream.toDF().toDF("doc_id", "text"),
      genRoot, lsh, retain, ps, ckpt, baseDocs = corpus,
      refreshEvery = 1,
      stalenessThreshold = Some(0.6), rebuildCooldownBatches = 2,
      ledgerOut = Some(ledger)).start()
    val fed = scala.collection.mutable.ArrayBuffer.empty[(Long, String)]
    def feed(rows: Seq[(Long, String)]): Unit = {
      fed ++= rows; stream.addData(rows); q.processAllAvailable()
    }
    try {
      feed(Seq((101L, "p q r s t u")))                       // stable
      feed(Seq((201L, "d1 d2 d3 d4 d5 d6"), (202L, "d1 d2 d3 d4 d5 d6"))) // drift → rebuild 1
      assert(ShingleIndex.currentGeneration(spark, genRoot) == 1L)
      // the fold: retained batch dirs cleared, corpus snapshot published
      assert(graft.sources.Segments.segmentIds(spark, retain).isEmpty,
        "retained batch dirs must clear after the fold")
      assert(new java.io.File(s"$retain/_base/gen=1/_SUCCESS").exists(),
        "the folded base snapshot must be published complete")
      feed(Seq((102L, "p q r s t v")))                       // stable (cooldown ticks)
      feed(Seq((103L, "w1 w2 w3 w4 w5 w6")))                 // stable
      feed(Seq((301L, "e1 e2 e3 e4 e5 e6"), (302L, "e1 e2 e3 e4 e5 e6"))) // drift → rebuild 2
      assert(ShingleIndex.currentGeneration(spark, genRoot) == 2L,
        "the second drift (past the cooldown) must rebuild again")
    } finally q.stop()
    // rebuild 2 ran from snapshot + window, and must equal the from-scratch
    // fixpoint over corpus ∪ every document ever streamed
    val refDir = java.nio.file.Files.createTempDirectory("adm_fold_ref").toString + "/idx"
    ShingleIndex.materializeDocs(spark,
      corpus.unionByName(fed.toSeq.toDF("doc_id", "text")), refDir)
    val expected = ShingleIndex.allPairs(spark, refDir)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = ShingleIndex.allPairs(
      spark, ShingleIndex.currentGenerationPath(spark, genRoot))
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == expected,
      s"folded rebuild must reach the from-scratch fixpoint: got=$got expected=$expected")
    // exact tiers cover it (superset — the lagging-view contract)
    val exact = AdmissionPipeline.readPairsExact(spark, ps)
      .select("id_a", "id_b").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(expected.subsetOf(exact), s"missing: ${expected -- exact}")
    // superseded snapshot pruned, newest kept
    assert(!new java.io.File(s"$retain/_base/gen=1").exists() &&
      new java.io.File(s"$retain/_base/gen=2/_SUCCESS").exists(),
      "fold must keep exactly the newest base snapshot")
  }

  test("cooldown survives a driver restart: recovered from the rebuild-tier segments") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("adm_cooldown").toString
    val (genRoot, lsh, retain, ps, ckpt, ledger) =
      (s"$base/gen", s"$base/lsh", s"$base/docs", s"$base/pairs", s"$base/ckpt", s"$base/ledger")
    ShingleIndex.initGenerations(spark, genRoot, corpus)
    implicit val sc = spark.sqlContext
    val stream = MemoryStream[(Long, String)]
    val q = AdmissionPipeline.streamingTwoTier(
      stream.toDF().toDF("doc_id", "text"),
      genRoot, lsh, retain, ps, ckpt, baseDocs = corpus,
      refreshEvery = 1,
      stalenessThreshold = Some(0.6), rebuildCooldownBatches = 5,
      ledgerOut = Some(ledger)).start()
    try {
      stream.addData(Seq((201L, "d1 d2 d3 d4 d5 d6")))       // drift → rebuild at batch 0
      q.processAllAvailable()
      assert(ShingleIndex.currentGeneration(spark, genRoot) == 1L)
      // simulate a driver restart: the in-memory cooldown state is gone
      AdmissionPipeline.forgetCooldown(genRoot)
      assert(AdmissionPipeline.recoverLastRebuilt(spark, ps).contains(0L),
        "the last rebuild's batchId must be recoverable from the store")
      stream.addData(Seq((301L, "e1 e2 e3 e4 e5 e6")))       // still-drifting, in-window
      q.processAllAvailable()
      assert(ShingleIndex.currentGeneration(spark, genRoot) == 1L,
        "a restart during sustained drift must not fire a second rebuild inside the cooldown")
      val led = spark.read.option("basePath", ledger).parquet(ledger)
        .orderBy("segment").select("rebuilt").collect().map(_.getBoolean(0)).toSeq
      assert(led == Seq(true, false), s"got: $led")
    } finally q.stop()
  }

  test("two-tier pipeline: LSH tier catches the in-window flood, breach rebuilds once, exact tiers converge") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("adm_pipe").toString
    val (genRoot, lsh, retain, ps, ckpt, ledger) =
      (s"$base/gen", s"$base/lsh", s"$base/docs", s"$base/pairs", s"$base/ckpt", s"$base/ledger")
    ShingleIndex.initGenerations(spark, genRoot, corpus)
    implicit val sc = spark.sqlContext
    val stream = MemoryStream[(Long, String)]
    val q = AdmissionPipeline.streamingTwoTier(
      stream.toDF().toDF("doc_id", "text"),
      genRoot, lsh, retain, ps, ckpt, baseDocs = corpus,
      refreshEvery = 1,
      stalenessThreshold = Some(0.6), rebuildCooldownBatches = 5,
      ledgerOut = Some(ledger)).start()
    try {
      // batch 0: one corpus near-dup (exact tier fires) + one NOVEL doc —
      // unseen 2/4 = 0.5 < 0.6, no rebuild
      stream.addData(Seq((101L, "p q r s t u"), (201L, "m n o p q r")))
      q.processAllAvailable()
      assert(ShingleIndex.currentGeneration(spark, genRoot) == 0L,
        "a half-novel batch under the threshold must not rebuild")
      // batch 1: the flood — 201's duplicate. Exact tier is structurally
      // blind (201 never entered the posting store); unseen 1.0 ≥ 0.6 trips
      // the rebuild, whose catch-up closes the gap exactly
      stream.addData(Seq((202L, "m n o p q r")))
      q.processAllAvailable()
      assert(ShingleIndex.currentGeneration(spark, genRoot) == 1L,
        "the breach batch must have rebuilt the next generation")
      // batch 2: novel again, but inside the cooldown — signal-only
      stream.addData(Seq((301L, "z8 z9 za zb zc zd")))
      q.processAllAvailable()
      assert(ShingleIndex.currentGeneration(spark, genRoot) == 1L,
        "the cooldown must suppress a second in-window rebuild")
    } finally q.stop()
    // default prune (keep 2) leaves the superseded generation on disk for
    // in-flight readers — deferred eviction, never an eager delete
    assert(new java.io.File(ShingleIndex.generationPath(genRoot, 0L)).exists(),
      "the superseded generation must survive the rebuild's prune window")

    val tiered = AdmissionPipeline.readPairsTiered(spark, ps)
      .select("id_a", "id_b", "tier", "jaccard")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    // the in-window pair surfaced through the LSH tier DURING the window...
    assert(tiered.contains((201L, 202L, "lsh")),
      s"the flood pair must surface in-window with tier=lsh: $tiered")
    // ...and the rebuild's catch-up re-admitted it with exact semantics
    assert(tiered.contains((201L, 202L, "rebuild")), s"got: $tiered")
    assert(tiered.contains((1L, 101L, "exact")), s"got: $tiered")

    // exact-tier union == the current generation's full fixpoint
    val exact = AdmissionPipeline.readPairsExact(spark, ps)
      .select("id_a", "id_b").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val fixpoint = ShingleIndex.allPairs(
      spark, ShingleIndex.currentGenerationPath(spark, genRoot))
      .select("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact == fixpoint,
      s"exact tiers must converge to the rebuilt fixpoint: exact=$exact fixpoint=$fixpoint")
    // ...and the published labels reflect it
    val labels = PairStore.readLabels(spark, ps)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels.get(202L).contains(201L) && labels.get(101L).contains(1L),
      s"got: $labels")

    // the ledger tells the story batch by batch
    val led = spark.read.option("basePath", ledger).parquet(ledger)
      .orderBy("segment")
      .select("unseen_frac", "rebuilt", "gen", "gen_after", "catchup_pairs")
      .collect().map(r => (math.round(r.getDouble(0) * 100), r.getBoolean(1),
        r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(led.toSeq == Seq(
      (50L, false, 0L, 0L, -1L),
      (100L, true, 0L, 1L, 1L),
      (100L, false, 1L, 1L, -1L)), s"got: ${led.toSeq}")
  }

  test("stable stream: the signal publishes every batch, the generation never moves") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("adm_stable").toString
    val (genRoot, lsh, retain, ps, ckpt, ledger) =
      (s"$base/gen", s"$base/lsh", s"$base/docs", s"$base/pairs", s"$base/ckpt", s"$base/ledger")
    ShingleIndex.initGenerations(spark, genRoot, corpus)
    implicit val sc = spark.sqlContext
    val stream = MemoryStream[(Long, String)]
    val q = AdmissionPipeline.streamingTwoTier(
      stream.toDF().toDF("doc_id", "text"),
      genRoot, lsh, retain, ps, ckpt, baseDocs = corpus,
      refreshEvery = 1,
      stalenessThreshold = Some(0.3), rebuildCooldownBatches = 0,
      ledgerOut = Some(ledger)).start()
    try {
      stream.addData(Seq((101L, "p q r s t u")))
      q.processAllAvailable()
      stream.addData(Seq((102L, "p q r s t v")))
      q.processAllAvailable()
    } finally q.stop()
    assert(ShingleIndex.currentGeneration(spark, genRoot) == 0L,
      "corpus-vocabulary batches must never trip a rebuild")
    val led = spark.read.option("basePath", ledger).parquet(ledger)
      .select("unseen_frac", "rebuilt").collect()
    assert(led.length == 2 && led.forall(r => r.getDouble(0) == 0.0 && !r.getBoolean(1)),
      s"got: ${led.toSeq}")
  }
}
