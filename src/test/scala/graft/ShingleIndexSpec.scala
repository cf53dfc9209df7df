package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.dedup.{DedupOps, PairStore, ShingleIndex}

class ShingleIndexSpec extends AnyFunSuite with SharedSpark {

  private def pairsOf(df: org.apache.spark.sql.DataFrame) =
    df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .sorted.toSeq

  test("stored incremental pairs equal the live derivation for several batch shapes") {
    val dir = java.nio.file.Files.createTempDirectory("shidx_eq").toString
    ShingleIndex.materialize(spark, sfDir, dir)
    val preds: Seq[(String, Column => Column)] = Seq(
      ("every 5th", _ % 5 === 0),
      ("2% batch", _ % 50 === 0),
      ("id range", id => id >= 10 && id < 40))
    preds.foreach { case (name, pred) =>
      val stored = pairsOf(ShingleIndex.incrementalPairs(spark, dir, pred))
      val live = pairsOf(DedupOps.ngramJaccardPairsIncremental(spark, sfDir, pred))
      assert(stored.nonEmpty, s"$name produced no pairs — fixture too small to pin anything")
      assert(stored == live, s"stored-path pairs diverged from the live derivation ($name)")
    }
  }

  test("stored posting lists are df-bounded, bucket-consistent and carry the live statistics") {
    val dir = java.nio.file.Files.createTempDirectory("shidx_cols").toString
    ShingleIndex.materialize(spark, sfDir, dir)
    val store = ShingleIndex.read(spark, dir)
    // the partition bucket must be a pure function of the shingle — a drifted
    // bucket would break compaction layout and partition pruning
    assert(store.filter(
      pmod(hash(col("s")), lit(ShingleIndex.NumBuckets)) =!= col("sb")).count() == 0)
    // the df cap bounds EVERY stored row: no posting list can exceed it, so
    // the per-row pair expansion is ≤ cap² by construction
    assert(store.filter(size(col("postings")) > DedupOps.RawDfCap).count() == 0,
      "a posting list exceeded the df cap — the bounded-row contract is broken")
    // per-doc size is constant across a doc's postings and equals the capped
    // set size (sum of multiplicities)
    val perDoc = store.select(explode(col("postings")).as("p"))
      .select(col("p.doc_id").as("doc_id"), col("p.c").as("c"),
        col("p.n_shingles").as("n_shingles"))
    val bad = perDoc.groupBy("doc_id")
      .agg(sum("c").as("sz"), min("n_shingles").as("lo"), max("n_shingles").as("hi"))
      .filter(col("sz") =!= col("lo") || col("lo") =!= col("hi"))
      .count()
    assert(bad == 0, "stored n_shingles disagrees with the capped per-doc multiplicity sum")
  }

  test("admission plan: one stored scan, no join of any kind") {
    val dir = java.nio.file.Files.createTempDirectory("shidx_plan").toString
    ShingleIndex.materialize(spark, sfDir, dir)
    val plan = ShingleIndex.incrementalPairs(spark, dir, _ % 50 === 0)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join") && !plan.contains("CartesianProduct"),
      s"admission must be join-free (pairs expand inside the bounded posting list):\n$plan")
    assert(plan.split("Scan parquet").length - 1 == 1,
      s"admission must read the store exactly once:\n$plan")
  }

  test("stored-path batches absorb into a PairStore reaching the one-shot fixpoint") {
    // the PairStoreSpec incremental timeline, with the STORED admission path
    // generating the batch's pairs
    val psDir = java.nio.file.Files.createTempDirectory("shidx_ps").toString
    val idxDir = java.nio.file.Files.createTempDirectory("shidx_ps_idx").toString
    ShingleIndex.materialize(spark, sfDir, idxDir)
    val full = DedupOps.ngramJaccardPairs(spark, sfDir)
    PairStore.appendPairs(spark, psDir,
      full.filter(col("id_a") % 5 =!= 0 && col("id_b") % 5 =!= 0), 0L)
    PairStore.appendPairs(spark, psDir,
      ShingleIndex.incrementalPairs(spark, idxDir, _ % 5 === 0), 1L)
    PairStore.refreshLabels(spark, psDir)
    val stored = PairStore.readPairs(spark, psDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val oneShot = full.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(stored == oneShot, "segment union must equal the one-shot pair set, each pair once")
  }

  test("served full pair set equals the live one-shot derivation, join-free") {
    val dir = java.nio.file.Files.createTempDirectory("shidx_all").toString
    ShingleIndex.materialize(spark, sfDir, dir)
    val served = pairsOf(ShingleIndex.allPairs(spark, dir))
    val live = pairsOf(DedupOps.ngramJaccardPairs(spark, sfDir))
    assert(served.nonEmpty && served == live,
      "served full pairs diverged from the live derivation")
    val plan = ShingleIndex.allPairs(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join") && plan.split("Scan parquet").length - 1 == 1,
      s"full pair serving must stay a join-free single scan:\n$plan")
  }

  test("served containment pairs equal the live derivation, join-free") {
    val dir = java.nio.file.Files.createTempDirectory("shidx_cont").toString
    ShingleIndex.materializeDocs(spark,
      Tables.documents(spark, sfDir).select(col("doc_id"), col("text")), dir)
    def contRows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4),
        math.round(r.getDouble(5) * 1e9), math.round(r.getDouble(6) * 1e9)))
        .sorted.toSeq
    val served = contRows(ShingleIndex.containmentPairsStored(spark, dir))
    val live = contRows(DedupOps.containmentPairs(spark, sfDir))
    assert(served.nonEmpty && served == live,
      "served containment pairs diverged from the live derivation")
    val plan = ShingleIndex.containmentPairsStored(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join") && plan.split("Scan parquet").length - 1 == 1,
      s"containment serving must stay a join-free single scan:\n$plan")
  }

  test("admission probe: over-cap vocabulary drops both sides, unseen shingles count toward size") {
    import spark.implicits._
    // corpus (exactly-5/6-token texts → 1-2 shingles each), built at cap=2:
    //   d1/d2 share shingle "p q r s t" (df 2 — survives)
    //   d3/d4/d5 are the boilerplate "z1..z5" (df 3 > 2 — OVER-CAP, dropped)
    val corpus = Seq(
      (1L, "p q r s t u"), (2L, "p q r s t v"),
      (3L, "z1 z2 z3 z4 z5"), (4L, "z1 z2 z3 z4 z5"), (5L, "z1 z2 z3 z4 z5"))
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("shidx_probe").toString
    ShingleIndex.materializeDocs(spark, corpus, dir, cap = 2)
    val batch = Seq(
      (101L, "p q r s t u"),        // = d1: both shingles match
      (102L, "z1 z2 z3 z4 z5 w"),   // boilerplate (capped) + unseen: NO pair
      (103L, "p q r s t u w"))      // 2 matching + 1 unseen (counts in size)
      .toDF("doc_id", "text")
    val got = ShingleIndex.probePairs(spark, dir, batch)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), math.round(r.getDouble(5) * 1000)))
      .toSet
    // 101↔d1: inter 2, sizes 2/2 → jaccard 1.0
    // 103↔d1: inter 2, n_probe 3 (the unseen shingle counts) → 2/3
    // 101↔d2 (1/3) and 103↔d2 (0.25) fall under the threshold;
    // 102 matches NOTHING — its boilerplate shingle is capped vocabulary on
    // both sides, exactly as it was for the stored d3-d5
    assert(got == Set(
      (101L, 1L, 2L, 2L, 2L, 1000L),
      (103L, 1L, 2L, 3L, 2L, 667L)), s"got: $got")
  }

  test("streaming admission: micro-batches probe the store and absorb into a PairStore with labels") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    val corpus = Seq(
      (1L, "p q r s t u"), (2L, "p q r s t v"),
      (3L, "z1 z2 z3 z4 z5"), (4L, "z1 z2 z3 z4 z5"), (5L, "z1 z2 z3 z4 z5"))
      .toDF("doc_id", "text")
    val base = java.nio.file.Files.createTempDirectory("shidx_stream").toString
    val (idx, ps, ckpt) = (s"$base/idx", s"$base/pairs", s"$base/ckpt")
    ShingleIndex.materializeDocs(spark, corpus, idx, cap = 2)
    implicit val sc = spark.sqlContext
    val stream = MemoryStream[(Long, String)]
    val q = ShingleIndex.streamingAdmission(
      stream.toDF().toDF("doc_id", "text"), idx, ps, ckpt, refreshEvery = 1).start()
    try {
      stream.addData(Seq((101L, "p q r s t u"), (102L, "z1 z2 z3 z4 z5 w")))
      q.processAllAvailable()
      stream.addData(Seq((103L, "p q r s t u w")))
      q.processAllAvailable()
    } finally q.stop()
    // each segment holds exactly its batch's probe pairs, oriented id_a < id_b
    val seg0 = PairStore.readPairs(spark, ps, asOf = Some(PairStore.StreamingSegmentBase))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(seg0 == Set((1L, 101L)),
      s"batch 0 must admit only the 101↔1 near-dup (102 is capped boilerplate): $seg0")
    val all = PairStore.readPairs(spark, ps)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(all == Set((1L, 101L), (1L, 103L)), s"got: $all")
    // the cadenced refresh published labels reaching the cross-batch fixpoint:
    // 1, 101 and 103 share one component, rooted at the min id
    val labels = PairStore.readLabels(spark, ps, requireFresh = true)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels == Map(1L -> 1L, 101L -> 1L, 103L -> 1L), s"got: $labels")
  }

  test("two-tier admission: the LSH tier catches the in-window flood the exact tier defers to rebuild") {
    import spark.implicits._
    // the exact tier's documented boundary: stream-vs-stream pairs within
    // one rebuild window are NOT generated by probePairs (the store cannot
    // absorb); the LSH tier (per-doc signatures, absorbable per batch) is
    // the in-window companion, and the rebuild closes the gap exactly
    val corpus = Seq(
      (1L, "p q r s t u"), (2L, "p q r s t v"), (3L, "w1 w2 w3 w4 w5 w6"))
      .toDF("doc_id", "text")
    val base = java.nio.file.Files.createTempDirectory("shidx_twotier").toString
    ShingleIndex.materializeDocs(spark, corpus, s"$base/exact")
    graft.dedup.LshIndex.materialize(spark, corpus, s"$base/lsh")
    // window batch 1: a NEW doc X; batch 2: its near-duplicate X'
    val batch1 = Seq((201L, "m n o p q r")).toDF("doc_id", "text")
    val batch2 = Seq((202L, "m n o p q r")).toDF("doc_id", "text")
    // exact tier sees neither X-vs-corpus nor X'-vs-X: X matches no corpus
    // doc, and X is not in the store when X' arrives
    assert(ShingleIndex.probePairs(spark, s"$base/exact", batch1).count() == 0)
    graft.dedup.LshIndex.appendBatch(spark, s"$base/lsh", batch1, batchId = 1L)
    assert(ShingleIndex.probePairs(spark, s"$base/exact", batch2).count() == 0,
      "the exact tier must NOT see the in-window pair — that is its boundary")
    // the LSH tier, having absorbed batch 1, catches X' ↔ X in-window
    val lshHits = graft.dedup.LshIndex.candidates(spark, s"$base/lsh", batch2)
      .filter(col("index_id") === 201L).collect()
    assert(lshHits.length == 1 && lshHits.head.getAs[Double]("est_sim") == 1.0,
      s"the LSH tier must catch the in-window duplicate: ${lshHits.toSeq}")
    // the next-generation rebuild covers the stream-vs-stream pair EXACTLY
    ShingleIndex.materializeDocs(spark,
      corpus.union(batch1).union(batch2), s"$base/exact_gen2")
    val rebuilt = ShingleIndex.allPairs(spark, s"$base/exact_gen2")
      .filter(col("id_a") === 201L && col("id_b") === 202L).collect()
    assert(rebuilt.length == 1 && rebuilt.head.getAs[Double]("jaccard") == 1.0,
      "the rebuild's full pair set must close the in-window gap exactly")
  }

  test("an empty build fails loudly and leaves no unreadable store behind") {
    import spark.implicits._
    // every text under ShingleK tokens → zero capped postings
    val tiny = Seq((1L, "a b"), (2L, "c")).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("shidx_empty").toString + "/idx"
    // unrelated content beside the store-to-be: the refusal must only remove
    // the build's OWN artifacts, never the directory root (ADVICE r14 —
    // pointing indexPath at a dir holding logs/a sibling store and building
    // from an all-short-doc corpus must not destroy that data)
    new java.io.File(dir).mkdirs()
    val bystander = new java.io.File(dir, "unrelated.txt")
    java.nio.file.Files.write(bystander.toPath, "keep me".getBytes("UTF-8"))
    val e = intercept[IllegalArgumentException](
      ShingleIndex.materializeDocs(spark, tiny, dir))
    assert(e.getMessage.contains("zero rows"), e.getMessage)
    assert(!new java.io.File(dir, "batch=0").exists() &&
      !new java.io.File(dir, "_overcap").exists(),
      "refusal must delete the build's own dataless artifacts")
    assert(bystander.exists() &&
      new String(java.nio.file.Files.readAllBytes(bystander.toPath), "UTF-8") == "keep me",
      "refusal must leave unrelated content beside the store untouched")
    // a real build on the same path succeeds afterwards
    ShingleIndex.materializeDocs(spark, Seq((1L, "p q r s t u")).toDF("doc_id", "text"), dir)
    assert(ShingleIndex.read(spark, dir).count() == 2) // two shingles of the 6-token doc
    // ...and a rebuild ONTO the now-populated path refuses UP FRONT — the
    // refusal can never destroy a generation that was serving probes
    // (stores rebuild into fresh paths per corpus generation)
    val e2 = intercept[IllegalArgumentException](
      ShingleIndex.materializeDocs(spark, tiny, dir))
    assert(e2.getMessage.contains("fresh path"), e2.getMessage)
    assert(ShingleIndex.read(spark, dir).count() == 2,
      "the up-front refusal must leave the existing store untouched")
  }

  test("ensure memoizes per corpus content and the catalog row serves from it") {
    val p1 = ShingleIndex.ensure(spark, sfDir)
    val p2 = ShingleIndex.ensure(spark, sfDir)
    assert(p1 == p2, "same corpus content must reuse the built store")
    assert(ShingleIndex.qJaccardIncrementalStored(spark, sfDir).count() ==
      DedupOps.qJaccardIncremental(spark, sfDir).count())
  }
}
