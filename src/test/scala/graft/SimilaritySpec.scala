package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ann.SimilarityOps

class SimilaritySpec extends AnyFunSuite with SharedSpark {

  test("ann top-k returns exactly k ranked neighbors per query") {
    val rows = SimilarityOps.annTopK(spark, sfDir, nQueries = 4, k = 3).collect()
    val byQ = rows.groupBy(_.getLong(0))
    assert(byQ.keySet == Set(0L, 1L, 2L, 3L))
    byQ.values.foreach { rs =>
      assert(rs.map(_.getInt(1)).sorted.sameElements(Array(1, 2, 3)))
    }
  }

  test("1-NN of the top-1 ANN result agrees with brute force on query vectors") {
    val ann = SimilarityOps.annTopK(spark, sfDir, nQueries = 5, k = 1).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    val knn = SimilarityOps.knn1(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    (0L until 5L).foreach(q => assert(ann(q) == knn(q)))
  }

  test("multi-probe IVF: recall vs exact is monotone in nprobe") {
    // probing more cells only ADDS candidates, and anything that outranks an
    // exact-top-k member is itself exact-top-k — so per-query hit counts
    // cannot decrease from nprobe=1 to nprobe=2
    val exact = SimilarityOps.annTopK(spark, sfDir, nQueries = 6, k = 3).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    def hits(nprobe: Int): Map[Long, Int] =
      SimilarityOps.ivfTopKMultiProbe(spark, sfDir, nQueries = 6, k = 3, nprobe = nprobe)
        .collect()
        .map(r => (r.getLong(0), r.getLong(2)))
        .groupBy(_._1)
        .map { case (q, rs) => q -> rs.count(exact.contains) }
        .withDefaultValue(0)
    val (h1, h2) = (hits(1), hits(2))
    (0L until 6L).foreach { q =>
      assert(h2(q) >= h1(q), s"query $q: recall dropped $h1 -> $h2 with more probes")
    }
    // nprobe=1 must agree with the single-cell ivfTopK implementation
    val single = SimilarityOps.ivfTopK(spark, sfDir, nQueries = 6, k = 3).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val probe1 = SimilarityOps.ivfTopKMultiProbe(spark, sfDir, nQueries = 6, k = 3, nprobe = 1)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(single == probe1)
  }

  test("pq encoding matches a driver-side recompute; adc ranks are well-formed") {
    import org.apache.spark.sql.functions._
    val vecs = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("v"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    val rows = SimilarityOps.pqCodes(spark, sfDir).collect()
    assert(rows.length == vecs.size)
    val md = java.security.MessageDigest.getInstance("MD5")
    rows.take(25).foreach { r =>
      val (id, fp, err) = (r.getLong(0), r.getString(1), r.getDouble(2))
      val v = vecs(id)
      val (codes, recon) = (0 until SimilarityOps.PqM).map { m =>
        val vm = v.slice(m * SimilarityOps.PqSubDim, (m + 1) * SimilarityOps.PqSubDim)
        val dists = (0 until SimilarityOps.PqK).map { k =>
          val c = SimilarityOps.pqCodebook(m)(k)
          vm.indices.map(i => (vm(i) - c(i)) * (vm(i) - c(i))).sum
        }
        val best = dists.indices.minBy(k => (dists(k), k))
        (best, dists(best))
      }.unzip
      md.reset()
      val expectFp = md.digest(codes.mkString(",").getBytes("UTF-8"))
        .map(b => f"${b & 0xff}%02x").mkString
      assert(fp == expectFp, s"vec $id codes differ from driver recompute")
      // each of the 8 decimal(18,6) terms may round by 5e-7
      assert(err >= 0 && math.abs(err - recon.sum) < 1e-5, s"vec $id recon err $err vs ${recon.sum}")
    }
    val adc = SimilarityOps.pqAdcTopK(spark, sfDir, nQueries = 5, k = 3).collect()
    adc.groupBy(_.getLong(0)).foreach { case (q, rs) =>
      assert(rs.map(_.getInt(1)).sorted.sameElements(1 to rs.length) && rs.length <= 3)
      assert(rs.map(_.getLong(2)).distinct.length == rs.length && !rs.exists(_.getLong(2) == q))
    }
  }

  test("kmeans step: updated centroids do not worsen within-cluster SS") {
    import org.apache.spark.sql.functions._
    val e = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("v"))
      .join(SimilarityOps.ivfAssignments(spark, sfDir), "vec_id")
      .select("centroid_id", "v").collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1).toArray))
    def wcss(cents: Map[Int, Array[Double]]): Double =
      e.map { case (k, v) =>
        val c = cents(k)
        v.indices.map(i => (v(i) - c(i)) * (v(i) - c(i))).sum
      }.sum
    val seed = (0 until SimilarityOps.NumCentroids)
      .map(k => k -> SimilarityOps.centroids(k)).toMap
    // full-dimension Lloyd update computed from the same assignment
    val updated = e.groupBy(_._1).map { case (k, vs) =>
      val dim = vs.head._2.length
      val mean = Array.tabulate(dim)(i => vs.map(_._2(i)).sum / vs.size)
      k -> mean
    }
    // clusters can be empty in theory; keep the seed centroid there
    val next = seed ++ updated
    assert(wcss(next) <= wcss(seed) + 1e-9,
      "a Lloyd update must not increase within-cluster sum of squares")
    // the query's decimal sums agree with the driver-side numerators
    val q = SimilarityOps.kmeansStep(spark, sfDir).collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getDouble(2))).toMap
    updated.foreach { case (k, mean) =>
      val (n, s1) = q(k)
      assert(n == e.count(_._1 == k).toLong)
      assert(math.abs(s1 - mean(0) * n) < 1e-3, s"cluster $k dim-1 sum off")
    }
  }

  test("iterated kmeans strictly improves WCSS over the seed and matches a driver Lloyd loop") {
    import org.apache.spark.sql.functions._
    val vecs = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("v"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
    def assign(cents: IndexedSeq[Array[Double]], v: Array[Double]): Int =
      cents.indices.minBy { k =>
        val c = cents(k)
        (v.indices.map(i => (v(i) - c(i)) * (v(i) - c(i))).sum, k)
      }
    def wcss(cents: IndexedSeq[Array[Double]]): Double =
      vecs.map { case (_, v) =>
        val c = cents(assign(cents, v))
        v.indices.map(i => (v(i) - c(i)) * (v(i) - c(i))).sum
      }.sum
    // driver-side Lloyd loop, same rounds (float means — reference is
    // approximate, so counts are compared exactly and sums loosely)
    var cents = SimilarityOps.centroids
    (1 to SimilarityOps.KmeansIters).foreach { _ =>
      val byCell = vecs.groupBy { case (_, v) => assign(cents, v) }
      cents = cents.indices.map { k =>
        byCell.get(k).fold(cents(k)) { vs =>
          Array.tabulate(vs.head._2.length)(i => vs.map(_._2(i)).sum / vs.size)
        }
      }
    }
    assert(wcss(cents) < wcss(SimilarityOps.centroids),
      "three Lloyd rounds must improve on the md5-seeded centroids")
    val q = SimilarityOps.kmeansIter(spark, sfDir).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    val refCounts = vecs.groupBy { case (_, v) => assign(cents, v) }
      .map { case (k, vs) => k -> vs.length.toLong }
    assert(q.view.mapValues(_._1).toMap == refCounts,
      s"trained-cell populations diverged: $q vs $refCounts")
    refCounts.foreach { case (k, _) =>
      val refS1 = vecs.filter { case (_, v) => assign(cents, v) == k }.map(_._2(0)).sum
      assert(math.abs(q(k)._2 - refS1) < 1e-3, s"cell $k dim-1 sum off")
    }
  }

  test("semdedup drops exactly the in-cell vectors with a lower-id near-dup") {
    import org.apache.spark.sql.functions._
    val cells = SimilarityOps.ivfAssignments(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    // expected drops from the independent exact pair list, cell-restricted
    val expected = SimilarityOps.cosinePairs(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .filter { case (a, b) => cells(a) == cells(b) }
      .map(_._2).toSet
    val ledger = SimilarityOps.semDedup(spark, sfDir).collect()
    val totalDropped = ledger.map(_.getLong(2)).sum
    assert(totalDropped == expected.size.toLong,
      s"ledger drops $totalDropped, exact pair list implies ${expected.size}")
    assert(totalDropped > 0, "fixture should contain at least one in-cell near-dup")
    assert(ledger.map(_.getLong(1)).sum == cells.size.toLong)
  }

  test("mega-cell sub-partition is exact: knnGraph/semDedup invariant under forced splitting (r11 verdict #1)") {
    // subCellThreshold=1 forces EVERY cell onto the maximum block grid (the
    // degenerate-mega-cell code path everywhere), threshold=Long.MaxValue
    // forces the nb=1 plain-join path everywhere — results must be
    // bit-identical: the guard is a sub-partition, never a drop.
    def knn(t: Long) = SimilarityOps.knnGraph(spark, sfDir, k = 3, subCellThreshold = t)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    val kSplit = knn(1L)
    val kPlain = knn(Long.MaxValue)
    assert(kSplit.nonEmpty && kSplit == kPlain,
      s"knnGraph changed under forced sub-partitioning: ${kSplit.size} vs ${kPlain.size} rows")
    def sem(t: Long) = SimilarityOps.semDedup(spark, sfDir, subCellThreshold = t)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getString(3))).toSeq
    val sSplit = sem(1L)
    val sPlain = sem(Long.MaxValue)
    assert(sSplit.nonEmpty && sSplit == sPlain,
      "semDedup ledger changed under forced sub-partitioning")
    // the forced-split plan must actually split: every cell's nb hits the
    // 64-block cap, so the join carries the internal block keys (visible as
    // the explode over the per-cell sequence) — guard against the helper
    // silently degenerating to the plain join
    val plan = SimilarityOps.knnGraph(spark, sfDir, k = 3, subCellThreshold = 1L)
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("__graft_cell_nb") || plan.contains("explode") ||
      plan.contains("Generate"),
      s"forced sub-partition did not reach the plan:\n$plan")
  }

  test("hot-slice knn engages the guard at nb > 1 and stays exact vs the plain join (r12 verdict #3)") {
    // the planted mega-cell (150 identical vectors) must genuinely want
    // MORE than one block under the hot-slice threshold — i.e. the oracle
    // row exercises the nb > 1 path, not the degenerate explode
    val hotAssigns = SimilarityOps
      .withCentroidAssignment(SimilarityOps.hotSliceEmb(spark, sfDir), "v")
      .select("vec_id", "centroid_id")
    val nbMax = SimilarityOps
      .cellBlockCounts(hotAssigns, SimilarityOps.HotSliceSubThreshold)
      .agg(org.apache.spark.sql.functions.max("__graft_cell_nb")).head().getInt(0)
    assert(nbMax >= 2, s"hot-slice fixture must force nb > 1, got max nb = $nbMax")
    // exactness at nb > 1: the guarded join must equal the plain join over
    // the same hot-slice corpus
    def hs(t: Long) = SimilarityOps.knnGraphHotSlice(spark, sfDir, k = 3, subCellThreshold = t)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    val guarded = hs(SimilarityOps.HotSliceSubThreshold)
    val plain = hs(Long.MaxValue)
    assert(guarded.nonEmpty && guarded == plain,
      "hot-slice knnGraph diverged between the nb>1 guard and the plain join")
    // the guard's second consumer, through its different aggregation tail
    def sd(t: Long) = SimilarityOps.semDedupHotSlice(spark, sfDir, subCellThreshold = t)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getString(3))).toSeq
    val sdGuarded = sd(SimilarityOps.HotSliceSubThreshold)
    assert(sdGuarded.nonEmpty && sdGuarded == sd(Long.MaxValue),
      "hot-slice semDedup diverged between the nb>1 guard and the plain join")
    assert(sdGuarded.exists(_._3 >= 149L),
      "the planted 150-identical-vector cell must drop all but one member")
    // the clamp ledger over the same corpus: the planted cell binds the
    // 64-block clamp at the corpus-relative ledger threshold, with the
    // implied per-task block size reported; median cells stay off it
    val nCorpus = graft.Tables.embeddings(spark, sfDir).count()
    val t = SimilarityOps.hotSliceClampThreshold(nCorpus)
    val ledger = SimilarityOps.knnClampLedger(spark, sfDir).collect()
    assert(ledger.nonEmpty, "planted mega-cell must appear on the over-clamp ledger")
    ledger.foreach { r =>
      val (n, nbUncapped, blockRows) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(nbUncapped > 64 && nbUncapped == math.ceil(n.toDouble / t).toLong)
      assert(blockRows == math.ceil(n.toDouble / 64).toLong)
      assert(n > nCorpus * 0.15,
        s"only cells past 15% of the corpus may bind the clamp: $n of $nCorpus")
    }
    assert(ledger.exists(_.getLong(1) >= (nCorpus * 3) / 10 - 2),
      "the planted 30% cell must be on the ledger")
  }

  test("over-clamp ledger fires exactly when the 64-block clamp binds (r12 verdict #2)") {
    import spark.implicits._
    val t = 3L
    // cell 0 sits exactly AT the boundary (nb_uncapped = 64: representable,
    // clamp does not bind, no ledger row); cell 1 is one row past it
    val rows = (0 until 64 * 3).map(i => (i.toLong, 0)) ++
      (0 until 64 * 3 + 1).map(i => (1000L + i, 1))
    val led = SimilarityOps.overClampCells(rows.toDF("vec_id", "centroid_id"), t)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(led.toSeq == Seq((1, 193L, 65L, 4L)),
      s"ledger must fire on exactly the over-clamp cell: ${led.toSeq}")
  }

  test("embed outliers are each cell's true distance maxima under the assignment metric") {
    import org.apache.spark.sql.functions._
    val vecs = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("v"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def sq(v: Array[Double], c: Array[Double]): Double = {
      var vv = 0.0; var vc = 0.0; var cc = 0.0; var i = 0
      while (i < v.length) { vv += v(i) * v(i); vc += v(i) * c(i); cc += c(i) * c(i); i += 1 }
      vv + (cc - 2.0 * vc)
    }
    val assign = SimilarityOps.ivfAssignments(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getInt(1))
    val byCell = assign.groupBy(_._2)
    val got = SimilarityOps.embedOutliers(spark, sfDir, k = 3).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2)))
    got.groupBy(_._1).foreach { case (cell, rs) =>
      val expected = byCell(cell).map(_._1)
        .sortBy(id => (-sq(vecs(id), SimilarityOps.centroids(cell)), id))
        .take(3)
      assert(rs.sortBy(_._2).map(_._3).toSeq == expected.toSeq, s"cell $cell")
    }
    assert(got.groupBy(_._1).keySet == byCell.keySet)
  }

  test("sq8 quantization: codes fit int8 and error is bounded by dim x scale^2") {
    import org.apache.spark.sql.functions._
    val e = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("v"))
      .withColumn("scale",
        expr("aggregate(v, cast(0.0 as double), (m, x) -> greatest(m, abs(x)))") / 127.0)
      .withColumn("codes", expr("transform(v, x -> cast(floor(x / scale) as long))"))
      .withColumn("dim", size(col("v")))
    val stats = e.select(
      expr("aggregate(codes, cast(127L as long), (m, c) -> least(m, c))").as("cmin"),
      expr("aggregate(codes, cast(-128L as long), (m, c) -> greatest(m, c))").as("cmax"),
      (col("dim") * col("scale") * col("scale")).as("bound"))
      .collect()
    stats.foreach { r =>
      assert(r.getLong(0) >= -128 && r.getLong(1) <= 127, "codes out of int8 range")
    }
    val errs = SimilarityOps.quantizeSq8(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val bounds = e.select(col("vec_id"), (col("dim") * col("scale") * col("scale")).as("b"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    errs.foreach { case (id, err) =>
      assert(err >= 0 && err <= bounds(id) + 1e-9, s"vec $id error $err exceeds ${bounds(id)}")
    }
  }

  test("lsh buckets partition the corpus completely") {
    val total = Tables.embeddings(spark, sfDir).count()
    val bucketed = SimilarityOps.lshBuckets(spark, sfDir)
      .agg(org.apache.spark.sql.functions.sum("n_vectors")).first().getLong(0)
    assert(bucketed == total)
  }

  test("cosine pairs are symmetric-free (a < b) and deduplicated") {
    val rows = SimilarityOps.cosinePairs(spark, sfDir, threshold = 0.4).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.forall { case (a, b) => a < b })
    assert(rows.distinct.length == rows.length)
  }

  test("grid-join plans broadcast nothing corpus-sized: no BNLJ, no cartesian") {
    Seq(
      SimilarityOps.knn1(spark, sfDir),
      SimilarityOps.cosinePairs(spark, sfDir)
    ).foreach { df =>
      df.collect() // force AQE final plan
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin"), s"BNLJ in plan:\n$plan")
      assert(!plan.contains("CartesianProduct"), s"cartesian in plan:\n$plan")
    }
  }

  test("grid-join results equal driver-side brute force") {
    val vecs = Tables.embeddings(spark, sfDir)
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
      .sortBy(_._1)
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val expectedNn = vecs.map { case (q, qv) =>
      q -> vecs.filter(_._1 != q)
        .map { case (c, cv) => (c, cos(qv, cv)) }
        .maxBy { case (c, s) => (s, -c) }._1
    }.toMap
    val gotNn = SimilarityOps.knn1(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(gotNn == expectedNn)

    val t = 0.45
    val expectedPairs = (for {
      (a, av) <- vecs; (b, bv) <- vecs if a < b && cos(av, bv) >= t
    } yield (a, b)).toSet
    val gotPairs = SimilarityOps.cosinePairs(spark, sfDir, t).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(gotPairs == expectedPairs)
  }
  test("hybrid rrf fuses both rankers and orders by the fused score") {
    val rows = SimilarityOps.hybridRrf(spark, sfDir).collect()
    assert(rows.nonEmpty)
    // ranks are 1..n dense, scores non-increasing
    rows.zipWithIndex.foreach { case (r, i) => assert(r.getInt(0) == i + 1) }
    val scores = rows.map(_.getLong(2))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    // a doc in both pools outranks one in a single pool at similar depth:
    // the top fused score must be at least the best single-ranker score
    assert(scores.head >= 1000000L / (SimilarityOps.RrfK + 1),
      "top fused score below a rank-1 single-ranker score")
  }

  test("cluster-balanced sample binds the quota per cell and rank-prunes before the sort") {
    val df = SimilarityOps.clusterBalancedSample(spark, "/root/testdata/sf0.01")
    val rows = df.collect().map(r =>
      (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq
    assert(rows.nonEmpty)
    rows.foreach { case (cell, members, kept) =>
      assert(kept == math.min(members, SimilarityOps.ClusterCap.toLong),
        s"cell $cell: kept $kept of $members under cap ${SimilarityOps.ClusterCap}")
    }
    // the corpus must exercise BOTH branches: a trimmed cell and a whole one
    assert(rows.exists(_._2 > SimilarityOps.ClusterCap), "no cell above the cap — vacuous")
    assert(rows.exists(_._2 <= SimilarityOps.ClusterCap), "no small cell — vacuous")
    // the rank filter must reach WindowGroupLimit (pre-sort pruning)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"expected WindowGroupLimit in:\n$plan")
  }

  test("recall sweep is monotone in nprobe and agrees with the per-query recall ledger") {
    val sweep = SimilarityOps.ivfRecallSweep(spark, sfDir)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    assert(sweep.map(_._1).toSeq == SimilarityOps.RecallSweepProbes,
      s"one row per operating point, ordered: ${sweep.mkString(",")}")
    // probing more cells only widens the candidate superset → hits never drop
    sweep.sliding(2).foreach { case Array(a, b) =>
      assert(b._3 >= a._3, s"recall regressed with more probes: $a -> $b")
    }
    assert(sweep.forall(r => r._2 > 0 && r._3 <= r._2), "hits must be within k_exact")
    // the nprobe=1 point is exactly ivfRecall's ledger, summed
    val ledger = SimilarityOps.ivfRecall(spark, sfDir)
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(sweep.head._2 == ledger.map(_._1).sum && sweep.head._3 == ledger.map(_._2).sum,
      "sweep@1 must equal the per-query recall ledger totals")
  }

  test("residual-ADC one-shot: the rerank pool widened to the whole corpus reduces to exact search") {
    // with rerank ≥ every candidate, ADC ranking stops mattering and the
    // exact-cosine rerank must reproduce the float multi-probe search — the
    // invariant that pins the residual machinery's plumbing independently of
    // codebook quality
    val full = SimilarityOps.ivfRadcTopK(spark, sfDir, nQueries = 10, k = 3, nprobe = 2,
      rerank = 1000000)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val float = SimilarityOps.ivfTopKMultiProbe(spark, sfDir, nQueries = 10, k = 3, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(full.nonEmpty && full.sameElements(float),
      "full-width residual-ADC rerank must equal the float multi-probe search")
  }

}
