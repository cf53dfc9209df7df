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
