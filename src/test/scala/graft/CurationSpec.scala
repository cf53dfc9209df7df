package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.text.CurationOps

class CurationSpec extends AnyFunSuite with SharedSpark {

  test("group split never straddles a source across splits and covers the corpus") {
    val rows = graft.text.CorpusPipeline.groupSplit(spark, sfDir).collect()
    assert(rows.nonEmpty)
    // the no-leakage invariant: one split per source, by construction
    rows.foreach(r => assert(r.getLong(1) == 1L, s"source ${r.getString(0)} straddles splits"))
    // coverage: per-source doc counts add back up to the corpus
    val total = Tables.documents(spark, sfDir).count()
    assert(rows.map(_.getLong(3)).sum == total)
    assert(rows.map(_.getString(2)).toSet.subsetOf(Set("train", "val", "test")))
  }

  test("pii scrub finds every planted email/phone and redacts them all") {
    val rows = CurationOps.piiScrub(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getLong(0)
      assert(r.getInt(1) == (if (id % 3 == 0) 1 else 0), s"email count for doc $id")
      assert(r.getInt(2) == (if (id % 4 == 0) 1 else 0), s"phone count for doc $id")
    }
    // scrubbed text no longer matches either pattern: redacting the already
    // scrubbed text must be a fixpoint (fp of scrub(scrub(x)) == fp of scrub(x))
    val t = Tables.documents(spark, sfDir)
      .select(concat(col("text"), lit(" reach user7@example.com and 555-123-4567")).as("t"))
      .select(
        regexp_replace(regexp_replace(col("t"), CurationOps.EmailPattern, "<EMAIL>"),
          CurationOps.PhonePattern, "<PHONE>").as("s"))
      .select(
        regexp_count(col("s"), lit(CurationOps.EmailPattern)).as("e"),
        regexp_count(col("s"), lit(CurationOps.PhonePattern)).as("p"))
      .agg(sum("e"), sum("p")).head()
    assert(t.getLong(0) == 0 && t.getLong(1) == 0)
  }

  test("repetition stats are internally consistent") {
    CurationOps.repetitionStats(spark, sfDir).collect().foreach { r =>
      val (nTok, nDis, topTok) = (r.getInt(1), r.getInt(2), r.getInt(3))
      val (topBg, nDisBg) = (r.getInt(4), r.getInt(5))
      assert(nDis <= nTok && topTok >= 1 && topTok <= nTok - nDis + 1)
      assert(nDisBg <= nTok - 1 && topBg >= 1)
    }
  }

  test("shared shingles: planted near-dup docs share most of their shingles") {
    val rows = CurationOps.sharedShingles(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2))).toMap
    // TESTDATA plants near-identical doc pairs; those docs must have a high
    // shared fraction while the corpus median stays lower
    val fracs = rows.values.map { case (n, s) => s.toDouble / n }.toSeq.sorted
    assert(fracs.last > 0.8, s"no doc shares >80% shingles — planted dups missed")
  }

  test("contamination detects an overlap only above the threshold, join-shaped") {
    val df = CurationOps.contamination(spark, sfDir)
    df.collect().foreach { r =>
      assert(r.getLong(0) >= CurationOps.BenchmarkMaxId)
      assert(r.getLong(1) < CurationOps.BenchmarkMaxId)
      assert(r.getInt(2) >= CurationOps.ContaminationMinOverlap)
    }
    val physical = df.queryExecution.executedPlan.toString
    assert(!physical.contains("CartesianProduct") &&
      !physical.contains("BroadcastNestedLoopJoin"),
      s"contamination must be an equi-join:\n$physical")
  }

  test("sequence packing: bins are dense per shard and token-bounded") {
    val rows = CurationOps.seqPacking(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    val maxDocTokens = Tables.documents(spark, sfDir)
      .select(max(size(split(col("text"), " ")))).head().getInt(0).toLong
    rows.groupBy(_._1).foreach { case (src, bins) =>
      val ids = bins.map(_._2).sorted
      assert(ids.zipWithIndex.forall { case (v, i) => v == i }, s"bins not dense in $src")
      // a bin closes only when it crosses PackBinTokens, so it can exceed it
      // by at most one document
      bins.foreach { case (_, _, _, tokens) =>
        assert(tokens < CurationOps.PackBinTokens + maxDocTokens, s"oversized bin in $src")
      }
    }
  }

  test("mixture weights rebalance every domain to the uniform token share") {
    val rows = CurationOps.mixtureWeights(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.length > 1)
    val total = rows.map(_._3).sum
    val share = total.toDouble / rows.length
    rows.foreach { case (src, _, nTok, ppm) =>
      // weighted token mass of each domain hits the uniform share
      // (up to integer-division truncation of the ppm weight)
      val weighted = ppm * nTok / 1e6
      assert(math.abs(weighted - share) / share < 0.001, s"domain $src off: $weighted vs $share")
    }
    // smaller domains must get larger weights (strict monotonicity)
    val byTok = rows.sortBy(_._3)
    byTok.sliding(2).foreach { case Array(a, b) =>
      assert(a._4 >= b._4, s"weight not monotone: $a vs $b")
    }
  }

  test("corpus delta admits fresh docs and blocks cross-split near-dups") {
    val rows = CurationOps.corpusDelta(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2), r.getInt(3))).toMap
    assert(rows.nonEmpty)
    rows.foreach { case (id, (ex, near, adm)) =>
      assert(adm == (if (ex == 0 && near == 0) 1 else 0), s"ledger inconsistent for $id")
    }
    // planted near-dups whose base sits in the historical half must be
    // blocked as near-dups; fully fresh docs must be admitted
    val split = CurationOps.DeltaSplitId
    val nearExpected = Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
      .filter { case (id, t) => id >= split && t.split(" ").contains("dup") }
      .map(_._1)
    // (dup docs whose base is ALSO in the fresh half still share shingles
    // with it — near-dup detection is against hist only, so only assert on
    // docs whose stripped base exists below the split)
    val texts = Tables.documents(spark, sfDir).select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    val histTexts = texts.filter(_._1 < split).values.toSet
    nearExpected.foreach { id =>
      val base = texts(id).split(" ").filter(_ != "dup").mkString(" ")
      if (histTexts.contains(base)) {
        assert(rows(id)._2 == 1, s"near-dup $id (historical base) not blocked")
        assert(rows(id)._3 == 0)
      }
    }
    assert(rows.values.count(_._3 == 1) > 0, "no doc admitted — ledger degenerate")
  }

  test("chunking covers every token with stride-aligned overlapping windows") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val chunks = CurationOps.chunkDocs(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3)))
    val byDoc = chunks.groupBy(_._1)
    assert(byDoc.keySet == docs.keySet)
    byDoc.view.filterKeys(_ < 30).foreach { case (id, rs) =>
      val toks = docs(id).split(" ", -1)
      val expStarts = 1 to toks.length by CurationOps.ChunkStride
      assert(rs.map(_._2).sorted.toSeq == expStarts.indices.toSeq, s"doc $id chunk idxs")
      rs.foreach { case (_, idx, n, fp) =>
        val slice = toks.slice(idx * CurationOps.ChunkStride,
          idx * CurationOps.ChunkStride + CurationOps.ChunkSize)
        assert(n == slice.length, s"doc $id chunk $idx size")
        val md = java.security.MessageDigest.getInstance("MD5")
        val expFp = md.digest(slice.mkString(" ").getBytes("UTF-8"))
          .map(b => f"${b & 0xff}%02x").mkString
        assert(fp == expFp, s"doc $id chunk $idx fingerprint")
      }
      // every token position is inside at least one chunk
      val covered = rs.flatMap { case (_, idx, n, _) =>
        (idx * CurationOps.ChunkStride) until (idx * CurationOps.ChunkStride + n)
      }.toSet
      assert(covered == toks.indices.toSet, s"doc $id coverage")
    }
  }

  test("importance sample keep decisions match a driver-side recompute") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("lang"), col("text")).collect()
    def md5hex8(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      java.lang.Long.parseLong(
        md.digest(s.getBytes("UTF-8")).take(4).map(b => f"${b & 0xff}%02x").mkString, 16)
    }
    val expected = docs.groupBy(_.getString(1)).view.mapValues { rs =>
      val decisions = rs.map { r =>
        val id = r.getLong(0); val toks = r.getString(2).split(" ")
        val q = toks.distinct.length.toDouble / toks.length * 0.7 +
          (1.0 - toks.count(t => t == "the" || t == "a").toDouble / toks.length) * 0.3
        val keep = md5hex8(id.toString).toDouble / 4294967296.0 < q
        (keep, if (keep) md5hex8(s"is_$id") else 0L)
      }
      (rs.length.toLong, decisions.count(_._1).toLong, decisions.map(_._2).sum)
    }.toMap
    val got = CurationOps.importanceSample(spark, sfDir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got == expected)
    assert(got.values.exists(v => v._2 > 0 && v._2 < v._1),
      "sample should be non-degenerate (some kept, some dropped)")
  }

  test("stratified sample keeps strata at their configured rates") {
    CurationOps.stratifiedSample(spark, sfDir).collect().foreach { r =>
      val (lang, total, kept) = (r.getString(0), r.getLong(1), r.getLong(2))
      val rate = if (lang == "en") 0.50 else 0.90
      assert(kept <= total)
      // md5-uniform keep decision: observed rate within ±15pp of target
      assert(math.abs(kept.toDouble / total - rate) < 0.15,
        s"$lang kept $kept/$total, want ~$rate")
    }
  }
  test("oov rate: vocab tokens are the corpus-frequent ones; counts consistent") {
    val rows = CurationOps.oovRate(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nTok, nOov, ppm) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(nOov <= nTok && ppm == nOov * 1000000L / nTok, s"inconsistent row $r")
    }
    // total OOV mass must be the corpus total minus the top-V token mass
    val freq = Tables.documents(spark, sfDir)
      .select(explode(split(col("text"), " ")).as("t"))
      .groupBy("t").count().collect().map(r => r.getString(0) -> r.getLong(1))
    val inVocabMass = freq.sortBy { case (t, c) => (-c, t) }
      .take(CurationOps.OovVocabSize).map(_._2).sum
    val totalMass = freq.map(_._2).sum
    assert(rows.map(_.getLong(2)).sum == totalMass - inVocabMass)
  }

  test("dedup lines drops exactly the repeated chunks and keeps order") {
    val rows = CurationOps.dedupLines(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1), s"kept more than present: $r")
      assert(r.getLong(2) >= 1)
    }
    // spot-check one doc against a driver-side reference implementation
    val doc = Tables.documents(spark, sfDir)
      .filter(col("doc_id") === 1L).head().getAs[String]("text")
    val chunks = doc.split(" ").grouped(CurationOps.LineChunk).map(_.mkString(" ")).toSeq
    val kept = chunks.foldLeft(Vector.empty[String]) {
      (acc, c) => if (acc.contains(c)) acc else acc :+ c
    }
    val got = rows.find(_.getLong(0) == 1L).get
    assert(got.getLong(1) == chunks.length && got.getLong(2) == kept.length)
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(kept.mkString(" ").getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(got.getString(3) == md)
  }

  test("cross-doc chunk dedup keeps each distinct chunk exactly once, at its first occurrence") {
    val rows = CurationOps.lineDedupCross(spark, sfDir).collect()
    assert(rows.nonEmpty)
    // global dedup is at least as strict as the intra-doc form, per doc
    val intra = CurationOps.dedupLines(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1), s"kept more than present: $r")
      assert(r.getLong(2) <= intra(r.getLong(0)), s"looser than intra-doc dedup: $r")
    }
    // every distinct chunk in the corpus survives exactly once
    val distinctChunks = Tables.documents(spark, sfDir)
      .select(col("text"), explode(expr(
        s"sequence(1, size(split(text, ' ')), ${CurationOps.LineChunk})")).as("start"))
      .select(expr(s"array_join(slice(split(text, ' '), start, ${CurationOps.LineChunk}), ' ')"))
      .distinct().count()
    assert(rows.map(_.getLong(2)).sum == distinctChunks)
    // the first doc (lowest doc_id) always keeps its full chunk list
    val firstDoc = rows.minBy(_.getLong(0))
    assert(firstDoc.getLong(2) == firstDoc.getLong(1))
  }

  test("curation funnel ledger is consistent with the standalone stage operators") {
    val rows = graft.text.CorpusPipeline.curationFunnel(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(rows.map(_._1).toSeq == (0 to 4), "one row per stage, ordered")
    // survivors monotonically decrease, tokens move with docs
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b._3 <= a._3 && b._4 <= a._4, s"funnel not monotone: $a -> $b")
    }
    // stage 0 is the corpus; stage 1 drops exactly the non-representative
    // near-dup cluster members
    assert(rows(0)._3 == Tables.documents(spark, sfDir).count())
    val clusterExtra = graft.dedup.DedupOps.nearDupClusters(spark, sfDir).collect()
      .map(r => r.getLong(1) - 1).sum
    assert(rows(0)._3 - rows(1)._3 == clusterExtra,
      s"near-dup stage dropped ${rows(0)._3 - rows(1)._3}, clusters imply $clusterExtra")
    // decontamination removes at least the benchmark slice itself
    assert(rows(2)._3 - rows(3)._3 >= 0)
    // the cap binds: no source exceeds the quota afterwards
    assert(rows(4)._3 <= rows(3)._3)
    val nSources = Tables.documents(spark, sfDir).select("source").distinct().count()
    assert(rows(4)._3 <= nSources * graft.text.CurationOps.SourceCap)
  }

  test("negative samples are deterministic and never a self or near-dup positive") {
    val rows = CurationOps.negativeSamples(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(rows.nonEmpty)
    rows.foreach { case (a, j, n) =>
      assert(a != n, s"self draw survived: $a")
      assert(j >= 1 && j <= CurationOps.NegSamplesPerAnchor)
    }
    rows.groupBy(_._1).foreach { case (a, rs) =>
      assert(rs.length <= CurationOps.NegSamplesPerAnchor, s"anchor $a over-drew")
    }
    // rejection really fires against the near-dup pair set
    val positives = graft.dedup.DedupOps.ngramJaccardPairs(spark, sfDir).collect()
      .flatMap(r => Seq((r.getLong(0), r.getLong(1)), (r.getLong(1), r.getLong(0)))).toSet
    rows.foreach { case (a, _, n) =>
      assert(!positives.contains((a, n)), s"near-dup ($a,$n) emitted as a negative")
    }
    // bit-for-bit reproducible across runs
    val again = CurationOps.negativeSamples(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(rows.sameElements(again))
  }

  test("source cap never admits more than the quota and binds on big sources") {
    val rows = CurationOps.sourceCap(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) <= CurationOps.SourceCap, s"quota violated: $r")
      assert(r.getLong(2) == math.min(r.getLong(1), CurationOps.SourceCap))
    }
  }

  test("budget select is the greedy quality-first prefix under the token budget") {
    val rows = CurationOps.budgetSelect(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getLong(3) <= CurationOps.TokenBudget, s"budget blown: $r"))
    // reference greedy on the driver for one source
    val docs = Tables.documents(spark, sfDir)
      .filter(col("source") === "src0")
      .select(col("doc_id"), col("text")).collect()
      .map { r =>
        val toks = r.getString(1).split(" ")
        val nDis = toks.distinct.length.toDouble
        val nStop = toks.count(t => t == "the" || t == "a").toDouble
        val q = nDis / toks.length * 0.7 + (1.0 - nStop / toks.length) * 0.3
        (r.getLong(0), toks.length.toLong, q)
      }
      .sortBy { case (id, _, q) => (-q, id) }
    var cum = 0L; var kept = 0L; var keptToks = 0L
    docs.foreach { case (_, n, _) =>
      cum += n
      if (cum <= CurationOps.TokenBudget) { kept += 1; keptToks += n }
    }
    val got = rows.find(_.getString(0) == "src0").get
    assert(got.getLong(2) == kept && got.getLong(3) == keptToks)
  }

  test("novelty: doc 0 is fully novel and totals match the distinct shingle count") {
    val rows = CurationOps.noveltyScore(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val first = rows.minBy(_.getLong(0))
    assert(first.getLong(2) == first.getLong(1), "the earliest doc must be 100% novel")
    // every shingle is novel in exactly one doc: sum(n_novel) == distinct shingles
    val distinctShingles = Tables.documents(spark, sfDir)
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .filter(size(col("toks")) >= graft.dedup.DedupOps.ShingleK)
      .select(explode(graft.dedup.DedupOps.shinglesFromToks(col("toks"))).as("s"))
      .distinct().count()
    assert(rows.map(_.getLong(2)).sum == distinctShingles)
  }

  test("infra health card detects stale labels and recovers; index rows report fresh stores (VERDICT r8 #9)") {
    import graft.text.CorpusPipeline
    val base = java.nio.file.Files.createTempDirectory("health_card").toString
    // pair store: absorbed pairs, labels refreshed → lag 0
    val ps = s"$base/pairs"
    graft.dedup.PairStore.appendPairs(spark,
      ps, graft.dedup.DedupOps.ngramJaccardPairs(spark, sfDir), 0L)
    graft.dedup.PairStore.refreshLabels(spark, ps)
    def metric(df: org.apache.spark.sql.DataFrame, m: String): Long =
      df.filter(col("metric") === m).head().getLong(1)
    val fresh = CorpusPipeline.dataCardHealth(spark, pairStore = Some(ps))
    assert(metric(fresh, "pair_label_lag_batches") == 0L)
    assert(metric(fresh, "pair_watermark") == 0L && metric(fresh, "label_watermark") == 0L)
    // pairs absorbed past the snapshot: the card must SAY so
    graft.dedup.PairStore.appendPairs(spark, ps,
      graft.dedup.DedupOps.ngramJaccardPairsIncremental(spark, sfDir, _ % 7 === 0), 1L)
    val stale = CorpusPipeline.dataCardHealth(spark, pairStore = Some(ps))
    assert(metric(stale, "pair_label_lag_batches") == 1L,
      "absorbed-but-unlabeled pairs must surface as positive lag")
    graft.dedup.PairStore.refreshLabels(spark, ps)
    assert(metric(CorpusPipeline.dataCardHealth(spark, pairStore = Some(ps)),
      "pair_label_lag_batches") == 0L)
    // index + lattice rows: freshly built stores read healthy (skew ≥ 1e6
    // by construction, drift ≈ 1e6 right after fit, lattice lag 0 when the
    // rollup covers the whole corpus)
    graft.dedup.FingerprintIndex.materialize(spark,
      graft.multimodal.MediaOps.imageFingerprints(spark, sfDir), s"$base/fp")
    graft.ann.IvfIndex.materialize(spark,
      Tables.embeddings(spark, sfDir).select(col("vec_id"), col("embedding")), s"$base/ivf")
    graft.sources.RollupTable.materialize(spark, sfDir, s"$base/rollup")
    val card = CorpusPipeline.dataCardHealth(spark,
      fpIndex = Some(s"$base/fp"), ivfIndex = Some(s"$base/ivf"),
      pairStore = Some(ps), rollup = Some((s"$base/rollup", sfDir)))
    assert(card.count() == 6L, "one row per provided store metric")
    assert(metric(card, "fp_occupancy_skew_ppm") >= 1000000L)
    val drift = metric(card, "ivf_drift_ppm")
    assert(drift >= 900000L && drift <= 1100000L,
      s"a just-fit index must read ≈1e6 ppm drift, got $drift")
    assert(metric(card, "lattice_lag_sec") == 0L,
      "a full-corpus rollup must trail the raw stream by nothing")
  }

}
