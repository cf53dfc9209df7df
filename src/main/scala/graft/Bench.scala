package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Benchmark main: runs every declared query on SPARK_GRAFT_SF_DIR and prints
  * one JSON line. A warm-up pass (table footers + a small shuffle/join) runs
  * first so the first timed query doesn't absorb JVM/codegen/session
  * initialization — the per-query numbers then reflect plan cost, which is
  * what BASELINE comparison needs.
  *
  * Output layout is truncation-proof by keeping the stdout line SMALL
  * (~5.5 KB: contract fields + compact summary + contention + the full
  * per-query map at 4-decimal precision) so a bounded tail capture holds the
  * whole line; the full-precision detail document (probe/skew/streaming/
  * serving legs, attribution objects) is written to /tmp/bench_last.json and
  * /tmp/bench_last_c$cpus.json (per-leg, so a 32- and an 8-core run in the
  * same session don't clobber each other).
  */
object Bench {

  /** JSON-safe rendering of a failure for error-marker fields. */
  private def jsonErr(t: Throwable): String =
    String.valueOf(t).replaceAll("""[\\"\n\r\t]""", " ").take(200)

  /** `embeddings` × factor with disjoint vec_ids — the shared 10× fixture
    * shape of the mega-cell and grow-K legs (one id-shift constant, one
    * place). The vector distribution (and thus IVF cell shape) is
    * preserved while every cell's population grows `factor`×.
    */
  private def replicateEmbeddings(df: DataFrame, factor: Int): DataFrame = {
    import org.apache.spark.sql.functions._
    df.crossJoin(df.sparkSession.range(factor).toDF("rep"))
      .withColumn("vec_id", col("vec_id") + col("rep") * lit(10000000L))
      .drop("rep")
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.tune(spark)

    // Warm-up: touch every table and exercise scan→shuffle→join→agg codegen.
    try {
      import org.apache.spark.sql.functions._
      val tables = Seq("region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings")
      tables.foreach(t => Tables.read(spark, sfDir, t).count())
      val o = Tables.orders(spark, sfDir).groupBy("o_custkey").count()
      Tables.customer(spark, sfDir)
        .join(o, col("c_custkey") === col("o_custkey"), "left").count()
    } catch { case _: Throwable => () }

    // Contention self-identification (VERDICT r5 #5): the driver's bench can
    // land on a contended box, producing phantom regressions that waste a
    // round chasing noise. Two signals make a polluted run read as polluted
    // from the JSON alone: the OS 1-min load average sampled before and
    // after the run (a quiet 32-cpu box sits well under cpus; a contended
    // one reads above it), and a fixed-cost CPU sentinel — an in-memory
    // spark.range sum whose work is constant regardless of SF or code
    // changes — timed at start AND end. Sentinel drift between the two
    // samples, or a sentinel far above its historical ~0.1 s, means the
    // per-query numbers of THIS run are not comparable across rounds.
    def loadAvg(): Double =
      java.lang.management.ManagementFactory.getOperatingSystemMXBean.getSystemLoadAverage
    def sentinelSec(): Double = {
      import org.apache.spark.sql.functions._
      def once(): Double = {
        val t0 = System.nanoTime()
        spark.range(200L * 1000 * 1000)
          .select(sum(col("id") % 7)).head()
        (System.nanoTime() - t0) / 1e9
      }
      math.min(once(), once())
    }
    val loadAvgStart = loadAvg()
    val sentinelStartSec = sentinelSec()

    // Two executions per query, report the faster: the first pays one-off
    // whole-stage-codegen JIT (~0.3-1 s/plan), which amortizes to nothing on
    // a long-running engine — steady-state plan cost is the comparable number.
    // A failing catalog query must NOT record its fast failure as a timing:
    // round 6's testdata dtype drift broke 34 queries whose ~0.08 s analysis
    // errors read as GREAT times in the driver's bench, hiding the breakage.
    // Failures time as -1.0 and surface in a top-level "errors" object.
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      def once(): Double = {
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count(); (System.nanoTime() - t0) / 1e9 }
        catch { case t: Throwable => errors(name) = jsonErr(t); -1.0 }
      }
      val a = once(); val b = once()
      name -> (if (a < 0 || b < 0) -1.0 else math.min(a, b))
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val errJson =
      if (errors.isEmpty) ""
      else errors.map { case (k, v) => s""""$k":"$v"""" }
        .mkString(""","errors":{""", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).filter(_ >= 0).sum else 0.0
    val base = results.toMap

    // min-of-two timing of a probe plan; -1.0 sentinel on failure so a query
    // failing against the probe tables never reads as a great ratio
    def timed(fn: (SparkSession, String) => DataFrame, dir: String): Double = {
      def once(): Double = {
        val t0 = System.nanoTime()
        try { fn(spark, dir).count(); (System.nanoTime() - t0) / 1e9 }
        catch { case _: Throwable => -1.0 }
      }
      val (a, b) = (once(), once())
      if (a < 0 || b < 0) -1.0 else math.min(a, b)
    }
    // A probe measurement: ratio + the per-query JSON fragment + a compact
    // self-contained attribution object the SUMMARY lifts for its worst rows
    // (VERDICT r11 #5: the driver's artifact capture truncates the detailed
    // probe sections, so two rounds of published worst_skew_ratio 11–17
    // could not be attributed stall-vs-superlinear without the builder's
    // local /tmp runs — the worst row's name, retry flag and row-local
    // sentinel must survive in the summary object itself).
    // raw attempt timings of a probe plan (-1.0 on failure) — kept
    // individually so a flagged row can publish its per-attempt spread
    // (VERDICT r14 #1: the r14 driver artifact read worst_skew 13.14 with a
    // FRESH base while six clean runs read ≤9.03, and nothing in the
    // artifact could say whether the SCALED leg was slow once, twice, or
    // consistently — a twice-slow scaled leg was indistinguishable from
    // genuine superlinearity)
    def timedAttempts(fn: (SparkSession, String) => DataFrame, dir: String): Seq[Double] = {
      def once(): Double = {
        val t0 = System.nanoTime()
        try { fn(spark, dir).count(); (System.nanoTime() - t0) / 1e9 }
        catch { case _: Throwable => -1.0 }
      }
      Seq(once(), once())
    }
    def jsonArr(xs: Seq[Double]): String =
      xs.map(x => f"$x%.4f").mkString("[", ",", "]")
    def probeRowVs(name: String, b: Double, dir: String,
        fn: (SparkSession, String) => DataFrame, extra: String = "",
        fresh: Option[((SparkSession, String) => DataFrame, String)] = None): (Double, String, String) = {
      val attempts0 = timedAttempts(fn, dir)
      val first =
        if (attempts0.exists(_ < 0)) -1.0 else attempts0.min
      // stall defense (applies to EVERY probeRow caller — uniform AND skew
      // sections): a ratio past the superlinear flag threshold gets ONE
      // re-measurement before it is believed — a single GC pause or page-
      // cache eviction on a sub-second base otherwise brands a linear plan
      // superlinear (observed: q_funnel 0.18 s base, one 9 s stalled probe
      // → ratio 52 on a run whose clean sibling read 1.4). A genuinely
      // superlinear plan still reads > 10 on the retry; the retry itself is
      // min-of-two, so this cannot HIDE a real regression, only a stall.
      val retried = b > 0 && first >= 0 && first / b > 10.0
      // sentinels ADJACENT to the scaled attempts (VERDICT r14 #1): the
      // fixed-cost CPU sentinel fires immediately after the flagged first
      // attempt pair and again after the retry pair — a slow sentinel beside
      // slow attempts proves box contention AT the scaled leg, which the
      // run-start samples and the row-level post-hoc sentinel could not
      val sentinel0 = if (retried) sentinelSec() else -1.0
      val attempts1 = if (retried) timedAttempts(fn, dir) else Seq.empty[Double]
      val sentinel1 = if (retried) sentinelSec() else -1.0
      val again =
        if (attempts1.isEmpty || attempts1.exists(_ < 0)) -1.0 else attempts1.min
      // published scaled number = min over EVERY attempt taken (the best-of-N
      // rule the streaming gate follows) — a stall can only inflate an
      // attempt, never deflate it, so min is the plan-cost reading
      val scaled =
        if (retried && again >= 0) math.min(first, again) else first
      val staleRatio = if (scaled < 0 || b <= 0) -1.0 else scaled / b
      // a row that survives the retry still > 10 carries its own contention
      // witness: the fixed-cost sentinel re-measured AT THE ROW (historical
      // quiet-box value ~0.1-0.17 s) — the r10 driver run published
      // worst_skew_ratio 11.34 with only run-START contention samples, so
      // the stall-vs-superlinear call could not be made from the artifact
      val rowSentinel = sentinel1
      val attemptsJson =
        if (!retried) ""
        else s""","scaled_attempt_secs":${jsonArr(attempts0 ++ attempts1)},""" +
          s""""scaled_adjacent_sentinel_secs":${jsonArr(Seq(sentinel0, sentinel1))}"""
      // FRESH-BASE re-measurement (VERDICT r12 #1, the final attribution
      // hole): the base above was timed during the catalog pass, minutes
      // earlier under DIFFERENT load — a run-wide contention shift inflates
      // the ratio even when the plan is linear (r12 published 11.6 while
      // four clean runs read 8.1–9.9). When a row survives its retry still
      // past the flag threshold, re-time the base query ADJACENT to the
      // scaled run and publish BOTH; the row's ratio becomes the fresh one
      // (same-load numerator and denominator), with the stale reading kept
      // in the attribution for the audit trail.
      val freshAttempted = fresh.nonEmpty && staleRatio > 10.0
      val freshBase = fresh match {
        case Some((bfn, bdir)) if staleRatio > 10.0 => timed(bfn, bdir)
        case _ => -1.0
      }
      val ratio = if (freshBase > 0 && scaled >= 0) scaled / freshBase else staleRatio
      // when the fresh base fires, IT becomes the row's published "base" so
      // ratio == scaled/base stays true within the object; the stale
      // reading moves whole into the attribution fields. An ATTEMPTED fresh
      // re-measurement that itself failed (timed sentinel) must say so
      // (ADVICE r13): silently publishing the stale ratio re-opens the
      // attribution gap exactly on the contended runs the feature exists
      // for — fresh_base_failed marks "the number you see is stale because
      // the fresh attempt could not complete", not "no attempt was made".
      val pubBase = if (freshBase > 0) freshBase else b
      val freshJson =
        if (freshBase > 0)
          s""","stale_base":$b,"stale_ratio":$staleRatio,"fresh_base_sec":$freshBase"""
        else if (freshAttempted) s""","fresh_base_failed":true"""
        else ""
      val attribution =
        if (staleRatio > 10.0)
          s""","retried":$retried,"stall_sentinel_sec":$rowSentinel$attemptsJson$freshJson"""
        else if (retried) s""","retried":true$attemptsJson"""
        else ""
      (ratio,
        s""""$name":{"base":$pubBase,"scaled":$scaled,"ratio":$ratio$attribution$extra}""",
        s"""{"query":"$name","ratio":$ratio,"retried":$retried,"row_sentinel_sec":$rowSentinel$attemptsJson""" +
          (if (freshBase > 0) s""","stale_ratio":$staleRatio,"fresh_base_sec":$freshBase}"""
          else if (freshAttempted) s""","fresh_base_failed":true}"""
          else "}"))
    }
    def probeRow(name: String, baseName: String, dir: String,
        fn: (SparkSession, String) => DataFrame, extra: String = ""): (Double, String, String) =
      probeRowVs(name, base.getOrElse(baseName, -1.0), dir, fn, extra,
        fresh = SparkEntry.queries.get(baseName).map(f => (f, sfDir)))
    // the worst surviving row's attribution object (JSON null when a section
    // had no measurable rows, e.g. after a section-level failure)
    def worstAttrib(rows: Seq[(Double, String, String)]): String =
      rows.filter(_._1 >= 0).sortBy(-_._1).headOption.map(_._3).getOrElse("null")
    // the bare query NAME of the worst row, for consumers that want a flat
    // string key next to the structured attrib object
    def worstName(rows: Seq[(Double, String, String)]): String =
      rows.filter(_._1 >= 0).sortBy(-_._1).headOption
        .map(_._2.split("\":", 2).head.stripPrefix("\""))
        .map(n => s""""$n"""").getOrElse("null")
    def cleanup(dir: String): Unit = {
      import scala.reflect.io.Directory
      new Directory(new java.io.File(dir)).deleteRecursively(); ()
    }

    // Scale probe (VERDICT r1 #9): the same shuffle-bound event plans against
    // a 10×-replicated events table (10× rows AND 10× distinct key space, so
    // shuffles and aggregation state actually grow). time(10×)/time(1×) well
    // under 10 on idle cores = the plan scales with partitions, not the
    // driver; a ratio ≥ 10 would flag a serialization point.
    val factor = 10
    val (probeJson, probeWorst, probeTwoSidedPerUnit, probeWorstAttrib, probeWorstQuery) = try {
      import org.apache.spark.sql.functions._
      val probeDir = java.nio.file.Files.createTempDirectory("graft_scale").toString
      Tables.events(spark, sfDir)
        .crossJoin(spark.range(factor).toDF("rep"))
        .withColumn("user_id", col("user_id") + col("rep") * lit(1000000L))
        .drop("rep")
        .write.mode("overwrite").parquet(s"$probeDir/events.parquet")
      // 10× documents with per-replica token prefixes: vocabularies are
      // disjoint across replicas, so the shingle df distribution (and thus
      // the candidate-join fanout per key) matches the original corpus —
      // an honest 10× for the near-dup family, not a 10×-hot-key pathology.
      Tables.documents(spark, sfDir)
        .crossJoin(spark.range(factor).toDF("rep"))
        .withColumn("doc_id", col("doc_id") + col("rep") * lit(10000000L))
        .withColumn("text",
          regexp_replace(col("text"), lit("(\\S+)"),
            concat(col("rep").cast("string"), lit("_$1"))))
        .drop("rep")
        .write.mode("overwrite").parquet(s"$probeDir/documents.parquet")
      // 10× embeddings with shifted ids: the vector distribution (and thus
      // IVF cell shape) is preserved while every cell's population grows
      // 10× — honest linear growth for cell-restricted search and the
      // per-cell outlier window. (The quadratic-within-cell ops like
      // semdedup are deliberately absent: their scale story is growing the
      // centroid count with the corpus, not a fixed-k 10× cell.)
      replicateEmbeddings(Tables.embeddings(spark, sfDir), factor)
        .write.mode("overwrite").parquet(s"$probeDir/embeddings.parquet")
      val probeQueries = Seq("q_duty_cycle", "q_duty_cycle_prerolled",
        "q_rollup_1s", "q_timeseries_5s",
        "q_shared_shingles", "q_ngram_jaccard_pairs",
        // capped-LSH pairs (r10 verdict #1): disjoint-vocab replicas keep
        // the band-bucket structure, so candidate volume grows linearly
        "q_minhash_lsh_pairs",
        "q_ann_topk", "q_ivf_topk", "q_embed_outliers",
        // chained per-user joins (funnel) and the broadcast-LM score: the
        // 10× user/vocabulary growth exercises their join sides honestly
        "q_funnel", "q_bigram_lm",
        // the iterative driver-loop shape: K checkpointed joins over a 10×
        // edge list — flags any serialization point in the loop state
        "q_pagerank_iter",
        // the native merge as-of join: per-side exchange + sort over 10× events
        "q_asof_native",
        // PQ ADC search: the codes relation grows 10×, the per-query LUT doesn't
        "q_pq_adc_topk",
        // IVFADC: cells prune the 10× corpus, ADC ranks codes, bounded
        // rerank — the compound approximation's scale shape end-to-end
        "q_ivf_adc_topk",
        // cross-doc chunk dedup: grouped-min + join-back over 10× chunks
        "q_line_dedup_cross",
        // classifier distillation: 10× feature volume through the bounded
        // hashed-model train + broadcast apply
        "q_quality_classifier",
        // iterated BPE: 6 rounds of grouped aggregates over a 10× vocabulary
        "q_bpe_train",
        // count-LM fit + score: 10× transition volume through the
        // vocabulary-sized model tables
        "q_lm_transition_score",
        // the composed curation funnel (CC + gate + decontaminate + cap)
        "q_curation_funnel")
      val uniformRows = probeQueries.flatMap { name =>
        SparkEntry.queries.get(name).map(fn => probeRow(name, name, probeDir, fn))
      }
      // BOTH sides scaled: 10× corpus AND 10× query set (nQueries 10→100),
      // so the candidate space grows 100× — the honest two-sided ADC probe.
      // work_factor is the expected cost multiple; ratio/work_factor ≲ 1/10
      // means per-unit work held constant (the LUT join stayed subquadratic).
      // Reported separately from the uniform rows: its raw ratio measures a
      // 100× workload, so folding it into the uniform-10× max would make the
      // headline read as a superlinear plan that doesn't exist (VERDICT r4).
      val twoSided = probeRow("q_pq_adc_topk_bothsides", "q_pq_adc_topk", probeDir,
        (s, d) => graft.ann.SimilarityOps.pqAdcTopK(s, d, nQueries = 100),
        extra = s""","work_factor":${factor * factor}""")
      // Hamming self-join with a FIXED 256-value band alphabet is O(n²/256)
      // by design — at 10× rows the in-bucket candidate space grows 100×, so
      // this is a two-sided-style row (per-unit bar, not the uniform max).
      // The corpus-scale remedy is wider fingerprints with 16-bit bands, not
      // a different join shape.
      val imageFixedBands = probeRow("q_image_neardup_fixedbands", "q_image_neardup",
        probeDir, graft.multimodal.MediaOps.imageNearDup(_, _),
        extra = s""","work_factor":${factor * factor}""")
      // The wide (256-bit, 16-bit-band) variant's in-bucket candidate space
      // stays ~flat at 10×: 2^16 buckets/band absorb the corpus growth the
      // fixed 256-value alphabet cannot. Its ratio should sit measurably
      // below the fixed-band row's — the r7 verdict's wide-band remedy,
      // demonstrated rather than asserted.
      val imageWideBands = probeRow("q_image_neardup_wideband", "q_image_neardup_wideband",
        probeDir, graft.multimodal.MediaOps.imageNearDupWideband(_, _),
        extra = s""","work_factor":${factor * factor}""")
      // Durable-index probe at 10×: float vs raw-ADC vs residual-ADC search
      // against the SAME stored index. At 1× (index_serving below) the float
      // probe wins — ADC's LUT/window overhead dominates a 6k-vector corpus.
      // This row is the crossover evidence: the ADC scans read ~3 code bytes
      // where the float scan reads 512 vector bytes per candidate, so as the
      // cells grow 10× the ADC probes' advantage should appear (and keeps
      // growing with the corpus — memory bandwidth is the 100 TB bound).
      // guarded separately: a failure here must cost only THIS row, never
      // the already-measured probe rows above or the probeDir cleanup below
      val ivfIndexScale = try {
        def t2(run: => Unit): Double = {
          def once(): Double = {
            val t0 = System.nanoTime(); run; (System.nanoTime() - t0) / 1e9
          }
          math.min(once(), once())
        }
        // Bytes per probe (VERDICT r10 #2): the ADC claim is a BYTE claim —
        // the code-only candidate scan reads ~3 code bytes where the float
        // scan reads 512 vector bytes per candidate — but local wall-clock
        // cannot evidence it while the whole index is page-cache resident,
        // and task InputMetrics under-report parquet column reads on this
        // filesystem (measured ~600× low). So derive each mode's
        // candidate-scan bytes from the ground truth the claim is actually
        // about: the parquet COLUMN-CHUNK sizes (footer metadata) of exactly
        // the columns each mode's candidate scan reads, over exactly the
        // `centroid_id` partitions the probe schedule touches (what DPP
        // bounds the scan to).
        // one listing + one footer parse per file, tallying every top-level
        // column's chunk bytes — the three mode figures then read from the
        // same map instead of re-listing and re-parsing per mode
        def columnBytes(idx: String, cells: Seq[Int]): Map[String, Long] = {
          val conf = spark.sparkContext.hadoopConfiguration
          val root = new org.apache.hadoop.fs.Path(idx)
          val fs = root.getFileSystem(conf)
          val cellDirs = cells.map(c => s"centroid_id=$c/").toSet
          val it = fs.listFiles(root, true)
          val totals = scala.collection.mutable.Map.empty[String, Long]
          while (it.hasNext) {
            val f = it.next()
            val p = f.getPath.toString
            if (p.endsWith(".parquet") && cellDirs.exists(p.contains)) {
              val rd = org.apache.parquet.hadoop.ParquetFileReader.open(
                org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(f.getPath, conf))
              try rd.getFooter.getBlocks.forEach { b =>
                b.getColumns.forEach { c =>
                  val top = c.getPath.toDotString.split("\\.").head
                  totals(top) = totals.getOrElse(top, 0L) + c.getTotalSize
                }
              } finally rd.close()
            }
          }
          totals.toMap.withDefaultValue(0L)
        }
        val idx = s"$probeDir/ivf_index"
        graft.ann.IvfIndex.materialize(
          spark, Tables.embeddings(spark, probeDir).select("vec_id", "embedding"), idx)
        // materialize the query batch to its own tiny parquet: reading the
        // queries out of the full 10× embeddings table would charge every
        // mode ~the whole table's bytes and drown the scan comparison.
        // 100 queries (not 10): at 10 the sub-second mode timings are
        // scheduling-dominated and adc_vs_float swung 1.4-2.25 across
        // otherwise-identical runs — 10× the probe work makes the
        // decomposition (candidate phase vs float vs full ADC) stable.
        Tables.embeddings(spark, probeDir)
          .filter(col("vec_id") < 100).select("vec_id", "embedding")
          .coalesce(1).write.mode("overwrite").parquet(s"$probeDir/ivf_queries")
        val qs = spark.read.parquet(s"$probeDir/ivf_queries")
        val fl = t2(graft.ann.IvfIndex.search(spark, idx, qs, 3, 2).count())
        val adc = t2(graft.ann.IvfIndex.searchAdc(spark, idx, qs, 3, 2).count())
        val radc = t2(graft.ann.IvfIndex.searchRadc(spark, idx, qs, 3, 2).count())
        // LATE-MATERIALIZATION rerank (VERDICT r13 #3): the pool's ids are
        // collected and pushed into the rerank scan as static IN filters, so
        // only pages holding pooled candidates decode floats — the attack on
        // the "rerank re-decodes whole probed cells" floor. Published beside
        // the plain ratio; whichever reading lands, it is a measurement, not
        // an inference.
        val adcPushed = t2(graft.ann.IvfIndex.searchAdc(
          spark, idx, qs, 3, 2, pushRerankIds = true).count())
        val radcPushed = t2(graft.ann.IvfIndex.searchRadc(
          spark, idx, qs, 3, 2, pushRerankIds = true).count())
        // wall-clock decomposition (VERDICT r12 #5): the codes-only
        // CANDIDATE phase alone vs the float probe. Locally (page-cached)
        // searchAdc's floor is float + this phase: the exact rerank must
        // re-decode the probed cells' float vectors, which IS the float
        // probe's whole candidate scan — the <1.0 crossover only exists
        // where storage bandwidth, not decode, dominates (the byte table's
        // regime below). candidate_phase < float is the decode/byte win
        // made visible at bench scale.
        val adcCand = t2(graft.ann.IvfIndex.adcCandidates(spark, idx, qs, 2).count())
        // Recall-vs-rerank curve (VERDICT r14 #6): the serving tables price
        // the candidate phase in bytes and wall-clock; this prices the OTHER
        // axis — how much exact rerank buys back the recall the coded
        // ranking loses, so the "candidate phase cheap + rerank floor" trade
        // is quantified in both dimensions. Ground truth = the float search
        // over the SAME probed cells (what ADC approximates); recall@3 =
        // matched (qid, cid) slots / |truth rows| — which equals
        // 3 × |queries| only when every query has 3 neighbors; a query with
        // fewer shrinks numerator and denominator together (ADVICE r15 #4:
        // the definition here now states the implemented denominator).
        val recallCurveJson = {
          val tRows = graft.ann.IvfIndex.search(spark, idx, qs, 3, 2)
            .select(col("qid").as("tq"), col("cid").as("tc"))
          tRows.cache()
          val slots = tRows.count().toDouble
          def hitsAt(mode: String, r: Int): Long = {
            val ap =
              (if (mode == "radc")
                graft.ann.IvfIndex.searchRadc(spark, idx, qs, 3, 2, rerank = r)
              else graft.ann.IvfIndex.searchAdc(spark, idx, qs, 3, 2, rerank = r))
                .select(col("qid"), col("cid"))
            tRows.join(ap, col("qid") === col("tq") && col("cid") === col("tc")).count()
          }
          val curve = Seq(1, 10, 30, 100).map { r =>
            s"""{"rerank":$r,"adc_recall3":${hitsAt("adc", r) / slots},""" +
              s""""radc_recall3":${hitsAt("radc", r) / slots}}"""
          }.mkString("[", ",", "]")
          tRows.unpersist()
          curve
        }
        // candidate-scan bytes over the probed cells: the float probe ranks
        // from the stored vectors + norms; the ADC probes rank from the code
        // column alone. (The bounded exact rerank re-reads v/nn for
        // rerank × |queries| rows of the same cells — row-group granularity
        // makes its worst case the float figure, which is why rerank is
        // BOUNDED; the candidate phase is where the corpus-scale bytes live.)
        val cells = graft.ann.IvfIndex.probedCells(spark, idx, qs, 2)
        val colB = columnBytes(idx, cells)
        val flB = colB("vec_id") + colB("v") + colB("nn")
        val adcB = colB("vec_id") + colB("pq")
        val radcB = colB("vec_id") + colB("rpq")
        s""","ivf_index_scale":{"corpus_factor":$factor,"float_probe_sec":$fl,""" +
          s""""adc_probe_sec":$adc,"radc_probe_sec":$radc,""" +
          s""""adc_candidate_phase_sec":$adcCand,""" +
          s""""adc_recall_vs_rerank":$recallCurveJson,""" +
          s""""adc_candidate_vs_float":${if (fl > 0) adcCand / fl else -1.0},""" +
          s""""adc_vs_float":${if (fl > 0) adc / fl else -1.0},""" +
          s""""adc_pushed_probe_sec":$adcPushed,""" +
          s""""adc_pushed_vs_float":${if (fl > 0) adcPushed / fl else -1.0},""" +
          s""""radc_pushed_probe_sec":$radcPushed,""" +
          s""""radc_pushed_vs_float":${if (fl > 0) radcPushed / fl else -1.0},""" +
          s""""radc_vs_float":${if (fl > 0) radc / fl else -1.0},""" +
          s""""probed_cells":${cells.size},""" +
          s""""float_candidate_scan_bytes":$flB,"adc_candidate_scan_bytes":$adcB,""" +
          s""""radc_candidate_scan_bytes":$radcB,""" +
          s""""adc_bytes_vs_float":${if (flB > 0) adcB.toDouble / flB else -1.0},""" +
          s""""radc_bytes_vs_float":${if (flB > 0) radcB.toDouble / flB else -1.0}}"""
      } catch { case t: Throwable => s""","ivf_index_scale":{"error":"${jsonErr(t)}"}""" }
      cleanup(probeDir)
      val rows = uniformRows :+ twoSided :+ imageFixedBands :+ imageWideBands
      val worst = uniformRows.map(_._1).filterNot(_ < 0).foldLeft(0.0)(math.max)
      val twoSidedPerUnit =
        if (twoSided._1 < 0) -1.0 else twoSided._1 / (factor.toDouble * factor)
      (s""","scale_probe":{"factor":$factor,"queries":${rows.map(_._2).mkString("{", ",", "}")}}""" +
        ivfIndexScale,
        worst, twoSidedPerUnit, worstAttrib(uniformRows), worstName(uniformRows))
    } catch { case t: Throwable =>
      (s""","scale_probe":{"error":"${jsonErr(t)}"}""", -1.0, -1.0, "null", "null") }

    // Planted-SKEW probe (VERDICT r3 #2): the uniform replication above keeps
    // keys evenly loaded, which can't surface hot-key failure modes. Here the
    // 10× tables additionally carry zipfian heads — one boilerplate shingle
    // block in 30% of documents, one house with ~60% of events, one orderkey
    // with 50% of lineitems — and the ratio is still measured against the 1×
    // UNSKEWED base, so a plan that degenerates on a hot key (single-task
    // window, unsplittable join partition, uncapped postings blowup) reads as
    // a superlinear ratio instead of hiding behind uniform balance.
    val (skewJson, skewWorst, skewWorstAttrib, skewWorstQuery) = try {
      import org.apache.spark.sql.functions._
      val skewDir = java.nio.file.Files.createTempDirectory("graft_skew").toString
      // events: 10× replicas; half of all rows remapped into house "1_1_0"
      // (user_id*5 ≡ 0 mod 5) with distinct appliance ids preserved
      Tables.events(spark, sfDir)
        .crossJoin(spark.range(factor).toDF("rep"))
        .withColumn("user_id", col("user_id") + col("rep") * lit(1000000L))
        .withColumn("user_id",
          when(col("event_id") % 2 === 0, col("user_id") * 5).otherwise(col("user_id")))
        .drop("rep")
        .write.mode("overwrite").parquet(s"$skewDir/events.parquet")
      // documents: disjoint-vocab 10× replicas plus one shared boilerplate
      // sentence appended to 30% of docs — its shingles reach df ≈ 0.3·n,
      // the hot-postings case the RawDfCap exists for
      Tables.documents(spark, sfDir)
        .crossJoin(spark.range(factor).toDF("rep"))
        .withColumn("doc_id", col("doc_id") + col("rep") * lit(10000000L))
        .withColumn("text",
          regexp_replace(col("text"), lit("(\\S+)"),
            concat(col("rep").cast("string"), lit("_$1"))))
        .withColumn("text",
          when(col("doc_id") % 10 < 3,
            concat(col("text"), lit(" zq0 zq1 zq2 zq3 zq4 zq5 zq6 zq7 zq8 zq9")))
            .otherwise(col("text")))
        .drop("rep")
        .write.mode("overwrite").parquet(s"$skewDir/documents.parquet")
      // orders/lineitem: 10× replicas with disjoint key ranges, then half of
      // all lineitems rekeyed onto ONE existing orderkey — the skewed-join
      // case AQE's OptimizeSkewedJoin is for
      val keyShift = 1000000000L
      Tables.orders(spark, sfDir)
        .crossJoin(spark.range(factor).toDF("rep"))
        .withColumn("o_orderkey", col("o_orderkey") + col("rep") * lit(keyShift))
        .drop("rep")
        .write.mode("overwrite").parquet(s"$skewDir/orders.parquet")
      val hotKey = Tables.orders(spark, sfDir)
        .agg(min("o_orderkey")).head().getLong(0)
      Tables.lineitem(spark, sfDir)
        .crossJoin(spark.range(factor).toDF("rep"))
        .withColumn("l_orderkey", col("l_orderkey") + col("rep") * lit(keyShift))
        .withColumn("l_orderkey",
          when(col("l_partkey") % 2 === 0, lit(hotKey)).otherwise(col("l_orderkey")))
        .drop("rep")
        .write.mode("overwrite").parquet(s"$skewDir/lineitem.parquet")
      // dimension sides the probe queries read unchanged
      java.nio.file.Files.createSymbolicLink(
        java.nio.file.Paths.get(s"$skewDir/customer.parquet"),
        java.nio.file.Paths.get(s"$sfDir/customer.parquet"))
      val skewQueries = Seq(
        // hot-house aggregation family (direct, salted, windowed, top-k)
        "q_power_by_house", "q_salted_agg", "q_duty_cycle",
        "q_duty_cycle_prerolled", "q_topk_per_house",
        // hot-postings dedup family (all df-capped now)
        "q_ngram_jaccard_pairs", "q_jaccard_capped", "q_substr_dup",
        "q_shared_shingles",
        // hot-chunk cross-doc dedup (grouped-min dimension side, AQE-split
        // probe side) and hot-feature classifier (two-stage agg + broadcast)
        "q_line_dedup_cross", "q_quality_classifier",
        // hot-bigram LM: the boilerplate sentence dominates the transition
        // counts — the model stays vocabulary-sized, the probe join hot key
        // AQE-splits
        "q_lm_transition_score",
        // hot-orderkey join (AQE skew-join split)
        "q_star_join")
      val rows0 = skewQueries.flatMap { name =>
        SparkEntry.queries.get(name).map(fn => probeRow(name, name, skewDir, fn))
      }
      // Degenerate-band-bucket twin for the capped LSH pass (VERDICT r10 #1):
      // 30% of a SAME-SIZED corpus rewritten to ONE text, so every band
      // bucket that text hashes into holds 0.3·n rows — the boilerplate
      // slice that survives exact dedup upstream. The occupancy cap drops
      // those buckets before the self-join; the uncapped collect_list form
      // would have buffered 1500 sig structs in one aggregation row and
      // emitted ~1.1M pairs from one task. Ratio is vs the 1× clean base
      // (corpus size unchanged), so bounded ≈ 1 is the healthy reading.
      val hotBucketDir = java.nio.file.Files.createTempDirectory("graft_lsh_hot").toString
      Tables.documents(spark, sfDir)
        .withColumn("text",
          when(col("doc_id") % 10 < 3,
            lit("zq0 zq1 zq2 zq3 zq4 zq5 zq6 zq7 zq8 zq9")).otherwise(col("text")))
        .write.mode("overwrite").parquet(s"$hotBucketDir/documents.parquet")
      val hotBucketRow = probeRow(
        "q_minhash_lsh_pairs_hotbucket", "q_minhash_lsh_pairs", hotBucketDir,
        SparkEntry.queries("q_minhash_lsh_pairs"),
        extra = s""","hot_doc_frac":0.3,"work_factor":1""")
      cleanup(hotBucketDir)
      // Planted MEGA-CELL twin for the sub-partitioned within-cell embedding
      // joins (VERDICT r11 #1 — the embedding-space sibling of the LSH
      // hot-bucket probe above): 10× embeddings once uniform and once with
      // 30% of vectors rewritten near-identical, so they all assign to ONE
      // IVF cell holding 0.3·n rows. knnGraph/semDedup share
      // subPartitionedCellJoin, which splits the degenerate cell onto the
      // per-cell block grid — EXACT results, bounded per-task pair work. The
      // ratio is hot-10× vs CLEAN-10× (same corpus size, same quadratic
      // family), so ≈ 1 is the healthy reading; the pre-guard equi-join
      // routed the hot cell's O((0.3n)²) pairs through one join key.
      // guarded separately (the ivf_index_scale pattern): a failure building
      // or timing the embedding fixtures must cost only THIS row, never the
      // already-measured skew rows above
      val megaCellRow = try {
        val embCleanDir = java.nio.file.Files.createTempDirectory("graft_knn_clean").toString
        val embHotDir = java.nio.file.Files.createTempDirectory("graft_knn_hot").toString
        try {
          val emb10 = replicateEmbeddings(Tables.embeddings(spark, sfDir), factor)
          emb10.write.mode("overwrite").parquet(s"$embCleanDir/embeddings.parquet")
          emb10.withColumn("embedding",
            when(col("vec_id") % 10 < 3,
              expr("transform(embedding, x -> CAST(0.5 + pmod(vec_id, 1000) / 1000000.0 AS FLOAT))"))
              .otherwise(col("embedding")))
            .write.mode("overwrite").parquet(s"$embHotDir/embeddings.parquet")
          val knnClean10x = timed(SparkEntry.queries("q_knn_graph"), embCleanDir)
          // 64-block clamp saturation ledger (VERDICT r12 #2): the planted
          // 10× mega-cell (0.3 · 20k = 6000 identical-assignment vectors) is
          // past the clamp at threshold 64 (⌈6000/64⌉ = 94 > 64 blocks) —
          // the indivisible-cell case no grow-K can separate. The ledger
          // (one grouped count) must FIRE here; its fields quantify the
          // per-task block size the clamp has let grow.
          val clampExtra = try {
            val t0 = System.nanoTime()
            val assigns = graft.ann.SimilarityOps.ivfAssignments(spark, embHotDir)
            val led = graft.ann.SimilarityOps.overClampCells(assigns, 64L).collect()
            // the 64 threshold above is the HOT-SLICE ORACLE FIXTURE's (it
            // makes the planted 6000-row cell saturate its 64-block clamp);
            // the timed q_knn_graph row runs at the engine default
            // CellPairSubThreshold, where the clamp does not bind on this
            // corpus — evaluate the ledger at the timed plan's threshold too
            // so the saturation evidence cannot be misread as describing the
            // measured query (ADVICE r13). Over-clamp at a HIGHER threshold
            // is a subset of the 64-row ledger (occ > 64·t), so the timed
            // reading derives driver-side from the ONE collect instead of
            // re-running the assignment pipeline (review r14) — ledger_sec
            // is then one honest evaluation.
            val timedThreshold = graft.ann.SimilarityOps.CellPairSubThreshold
            val ledTimed = led.filter(_.getLong(1) > 64L * timedThreshold)
            val ledgerSec = (System.nanoTime() - t0) / 1e9
            val maxBlock = if (led.isEmpty) 0L else led.map(_.getLong(3)).max
            s""","clamp_ledger":{"threshold":64,"threshold_is_hotslice_fixture":true,""" +
              s""""n_over_cells":${led.length},""" +
              s""""max_block_rows":$maxBlock,""" +
              s""""timed_query_threshold":$timedThreshold,""" +
              s""""n_over_cells_at_timed_threshold":${ledTimed.length},""" +
              s""""clamp_engaged_in_timed_plan":${ledTimed.nonEmpty},""" +
              s""""ledger_sec":$ledgerSec}"""
          } catch { case t: Throwable =>
            s""","clamp_ledger":{"error":"${jsonErr(t)}"}""" }
          probeRowVs(
            "q_knn_graph_megacell", knnClean10x, embHotDir,
            SparkEntry.queries("q_knn_graph"),
            extra = s""","hot_vec_frac":0.3,"corpus_factor":$factor,"base_is_clean_10x":true$clampExtra""",
            fresh = Some((SparkEntry.queries("q_knn_graph"), embCleanDir)))
        } finally { cleanup(embCleanDir); cleanup(embHotDir) }
      } catch { case t: Throwable =>
        (-1.0, s""""q_knn_graph_megacell":{"error":"${jsonErr(t)}"}""",
          s"""{"query":"q_knn_graph_megacell","ratio":-1.0}""")
      }
      val rows = rows0 :+ hotBucketRow :+ megaCellRow
      cleanup(skewDir)
      val worst = rows.map(_._1).filterNot(_ < 0).foldLeft(0.0)(math.max)
      (s""","scale_probe_skew":{"factor":$factor,"hot_doc_frac":0.3,"hot_event_frac":0.5,"hot_lineitem_frac":0.5,"queries":${rows.map(_._2).mkString("{", ",", "}")}}""",
        worst, worstAttrib(rows), worstName(rows))
    } catch { case t: Throwable =>
      (s""","scale_probe_skew":{"error":"${jsonErr(t)}"}""", -1.0, "null", "null") }

    // Rollup-serving demonstration: the same sliding-window counts, once over
    // raw events and once with RollupRewrite routing them onto the rollup
    // lattice (the Expand replays over rollup groups). The sf events table is
    // SPARSE in time (~1 reading per appliance per ~2600 s), which starves a
    // time rollup by construction, so the demo uses a dense grid-shaped
    // events table (4 readings per appliance-second — REDD channels run at
    // 1-3 Hz): 2 h × 25 appliances × 4 Hz = 720k raw rows → 180k 1 s groups
    // → 3k 60 s groups. The 25s/5s duty window can only use the 1 s level
    // (speedup = readings per appliance-second); the 120s/60s minute window
    // routes to the 60 s level — the reduction the lattice buys every
    // dashboard tile. At 100 TB the served plans read rollup tables instead
    // of the fact table.
    val rollupServingJson = try {
      import org.apache.spark.sql.functions._
      val denseDir = java.nio.file.Files.createTempDirectory("graft_dense_grid").toString
      val baseEpoch = 1704067200L // 2024-01-01T00:00Z, minute-aligned
      val secs = 7200L; val apps = 25L; val perSec = 4L
      spark.range(secs * apps * perSec).select(
        col("id").as("event_id"),
        expr(s"(id div ${apps * perSec} + $baseEpoch) * 1000000000" +
          s" + (id % $perSec) * 250000000").as("ts"),
        expr(s"id % $apps").as("user_id"),
        lit("meter").as("event_type"),
        expr("CAST(id % 400 AS DOUBLE)").as("value"))
        .write.mode("overwrite").parquet(s"$denseDir/events.parquet")
      val rollupDir = s"$denseDir/rollup"
      val coarseDir = s"${rollupDir}_60s"
      graft.sources.RollupTable.materialize(spark, denseDir, rollupDir)
      graft.sources.RollupTable.materializeCoarse(spark, rollupDir, coarseDir, 60L)
      def windowed(width: String, slide: String) =
        graft.operators.Grid.powerReadings(spark, denseDir)
          .groupBy(window(col("time"), width, slide),
            col("house_id"), col("appliance_id"))
          .agg(count("power").as("c_all"))
      // the flagship tile whole: conditional count via the cnt_duty
      // filtered metric + post-aggregate ratio, over the sliding window.
      // At the 25s/5s second level the group count dominates and serving is
      // ~parity; the minute tile routes to the 60 s lattice level (cnt_duty
      // coarsens additively) where the group reduction pays.
      def dutyTile(width: String, slide: String) =
        graft.operators.Grid.powerReadings(spark, denseDir)
          .groupBy(window(col("time"), width, slide),
            col("house_id"), col("appliance_id"))
          .agg(
            count("power").as("c_all"),
            count(when(col("power") > graft.operators.Grid.PowerThreshold, true))
              .as("c_duty"))
          .withColumn("duty_cycle", col("c_duty") / col("c_all"))
      def time2(mk: => DataFrame): Double = {
        def once(): Double = {
          val t0 = System.nanoTime()
          mk.count()
          (System.nanoTime() - t0) / 1e9
        }
        math.min(once(), once())
      }
      val rawSecondSec = time2(windowed("25 seconds", "5 seconds"))
      val rawMinuteSec = time2(windowed("120 seconds", "60 seconds"))
      val rawDutySec = time2(dutyTile("25 seconds", "5 seconds"))
      val rawDutyMinSec = time2(dutyTile("120 seconds", "60 seconds"))
      graft.plans.RollupRewrite.install(
        spark, rollupDir, graft.operators.Grid.powerReadings(spark, denseDir),
        Seq((coarseDir, 60L)))
      val (servedSecondSec, servedMinuteSec, servedDutySec, servedDutyMinSec) =
        try {
          val planSecond = windowed("25 seconds", "5 seconds")
            .queryExecution.optimizedPlan.toString
          require(!planSecond.contains("user_id"),
            s"second window did not route:\n$planSecond")
          val planMinute = windowed("120 seconds", "60 seconds")
            .queryExecution.executedPlan.toString
          require(planMinute.contains("_60s"),
            s"minute window did not route to the 60 s level:\n$planMinute")
          val planDuty = dutyTile("25 seconds", "5 seconds")
            .queryExecution.optimizedPlan.toString
          require(planDuty.contains("cnt_duty") && !planDuty.contains("user_id"),
            s"duty tile did not route via the filtered metric:\n$planDuty")
          val planDutyMin = dutyTile("120 seconds", "60 seconds")
            .queryExecution.executedPlan.toString
          require(planDutyMin.contains("_60s"),
            s"minute duty tile did not route to the 60 s level:\n$planDutyMin")
          (time2(windowed("25 seconds", "5 seconds")),
            time2(windowed("120 seconds", "60 seconds")),
            time2(dutyTile("25 seconds", "5 seconds")),
            time2(dutyTile("120 seconds", "60 seconds")))
        } finally graft.plans.RollupRewrite.uninstall(spark)
      cleanup(denseDir)
      def leg(name: String, raw: Double, served: Double) =
        s""""$name":{"raw_sec":$raw,"served_sec":$served,""" +
          s""""speedup":${if (served > 0) raw / served else -1.0}}"""
      s""","rollup_serving":{"raw_rows":${secs * apps * perSec},""" +
        s"""${leg("window_25s_5s_via_1s", rawSecondSec, servedSecondSec)},""" +
        s"""${leg("window_120s_60s_via_60s", rawMinuteSec, servedMinuteSec)},""" +
        s"""${leg("duty_tile_via_cnt_duty", rawDutySec, servedDutySec)},""" +
        s"""${leg("duty_tile_60s_via_lattice", rawDutyMinSec, servedDutyMinSec)}}"""
    } catch { case t: Throwable => s""","rollup_serving":{"error":"${jsonErr(t)}"}""" }

    // Index-serving demonstration: per-batch cost against the durable LSH /
    // IVF indexes vs the naive one-shot recompute a pipeline without an
    // index pays on every incoming batch. The index builds are one-off and
    // untimed; the timed probe is a 2% document batch (LSH candidates) and a
    // 10-query embedding batch (IVF top-k) — at 100 TB the one-shot side
    // re-signs/re-assigns the whole corpus per batch while the probe side
    // reads the index (DPP-pruned to the probed cells for IVF).
    val indexServingJson = try {
      import org.apache.spark.sql.functions._
      val base = java.nio.file.Files.createTempDirectory("graft_index_bench").toString
      def time2(run: => Unit): Double = {
        def once(): Double = {
          val t0 = System.nanoTime(); run; (System.nanoTime() - t0) / 1e9
        }
        math.min(once(), once())
      }
      val docs = graft.Tables.documents(spark, sfDir).select("doc_id", "text")
      val lshFullSec = time2(graft.dedup.DedupOps.minhashLshPairs(spark, sfDir).count())
      graft.dedup.LshIndex.materialize(spark, docs, s"$base/lsh")
      val lshBatch = docs.filter(col("doc_id") % 50 === 0) // a 2% ingest batch
      val lshProbeSec = time2(
        graft.dedup.LshIndex.candidates(spark, s"$base/lsh", lshBatch).count())
      val embs = graft.Tables.embeddings(spark, sfDir).select("vec_id", "embedding")
      val ivfFullSec = time2(
        graft.ann.SimilarityOps.ivfTopKMultiProbe(spark, sfDir, 10, 3, 2).count())
      graft.ann.IvfIndex.materialize(spark, embs, s"$base/ivf")
      val ivfSearchSec = time2(graft.ann.IvfIndex.search(
        spark, s"$base/ivf", embs.filter(col("vec_id") < 10), 3, 2).count())
      // IVFADC over the SAME index: the probed cells rank from stored PQ
      // codes (pq-only column-pruned scan) with bounded exact rerank; vs
      // the float probe above, the candidate scan reads ~1% of the bytes —
      // the gap widens with corpus size (memory bandwidth, not compute,
      // bounds ANN serving)
      val ivfAdcSearchSec = time2(graft.ann.IvfIndex.searchAdc(
        spark, s"$base/ivf", embs.filter(col("vec_id") < 10), 3, 2).count())
      // residual-IVFADC (FAISS IndexIVFPQ default): same byte economics as
      // the raw-code ADC probe — stored rpq codes, per-(query, cell) LUT
      val ivfRadcSearchSec = time2(graft.ann.IvfIndex.searchRadc(
        spark, s"$base/ivf", embs.filter(col("vec_id") < 10), 3, 2).count())
      // drift→retrain payoff (VERDICT r10 #6): residual-ADC agreement with
      // the float search (same probed cells, k=3 × 10 queries = 30 slots)
      // before and after recluster(retrainCodebook) swaps the seed codebook
      // for one trained on this index's own residuals. maxIter=0 keeps the
      // centroid set, isolating the codebook's effect; the wall-clock is the
      // honest whole-index-rewrite cost the drift policy pays when it trips.
      def adcHits(mode: String): Long = {
        val qs10 = embs.filter(col("vec_id") < 10)
        val ex = graft.ann.IvfIndex.search(spark, s"$base/ivf", qs10, 3, 2)
          .select(col("qid"), col("cid"))
        val approx =
          if (mode == "radc") graft.ann.IvfIndex.searchRadc(spark, s"$base/ivf", qs10, 3, 2)
          else graft.ann.IvfIndex.searchAdc(spark, s"$base/ivf", qs10, 3, 2)
        val ap = approx.select(col("qid").as("aq"), col("cid").as("ac"))
        ex.join(ap, col("qid") === col("aq") && col("cid") === col("ac")).count()
      }
      val radcHitsSeed = adcHits("radc")
      val adcHitsSeed = adcHits("adc")
      val tRetrain = System.nanoTime()
      graft.ann.IvfIndex.recluster(
        spark, s"$base/ivf", maxIter = 0, retrainCodebook = true)
      val codebookRetrainSec = (System.nanoTime() - tRetrain) / 1e9
      val radcHitsTrained = adcHits("radc")
      val adcHitsTrained = adcHits("adc")
      // GROW-K maintenance row, at 10× (VERDICT r12 #6: at the 2k-row index
      // the candidate story was right but probe wall-clock was scheduling
      // noise — on the 200k-dot 10× corpus the wall-clock follows the
      // candidates). The hottest seed-8 cell holds ≈ 40% of the corpus, so
      // a 3000-row budget trips and the doubling floor re-fits at K = 16.
      // Reported: the one-off re-fit wall-clock (the price the policy pays
      // when it trips), hottest-cell rows before/after (the balance
      // payoff), candidate rows and the nprobe=2 float search
      // before/after. Guarded separately (ADVICE r12): a grow-K failure
      // must cost only THESE fields, never the already-measured
      // LSH/IVF/ADC/retrain rows of this section.
      val growkJson = try {
        val gkDir = s"$base/ivf_growk"
        val embs10 = replicateEmbeddings(embs, 10)
        graft.ann.IvfIndex.materialize(spark, embs10, gkDir)
        val (gkMaxBefore, gkTotal) = graft.ann.IvfIndex.cellStats(spark, gkDir)
        // 100-query probe batch: at 10 queries the ~0.3 s probe is
        // scheduling-dominated and the before/after wall-clock ordering
        // flips run-to-run even as candidate rows read 4x apart — 10x the
        // probe work makes the wall-clock follow the candidates reliably
        val gkQueries = embs.filter(col("vec_id") < 100)
        def gkProbedRows(): Long = graft.ann.IvfIndex.candidateRows(
          spark, gkDir, gkQueries, 2)
        val gkProbeRowsBefore = gkProbedRows()
        val gkProbeBefore = time2(graft.ann.IvfIndex.search(
          spark, gkDir, gkQueries, 3, 2).count())
        val tGrowk = System.nanoTime()
        val (_, gkRan) = graft.ann.IvfIndex.maintainCellBudget(
          spark, gkDir, targetCellRows = 3000, maxIter = 5)
        val growkSec = (System.nanoTime() - tGrowk) / 1e9
        val gkK = graft.ann.IvfIndex.currentCentroids(spark, gkDir).size
        val (gkMaxAfter, _) = graft.ann.IvfIndex.cellStats(spark, gkDir)
        val gkProbeRowsAfter = gkProbedRows()
        val gkProbeAfter = time2(graft.ann.IvfIndex.search(
          spark, gkDir, gkQueries, 3, 2).count())
        s""""growk_corpus_factor":10,"growk_ran":$gkRan,"growk_sec":$growkSec,""" +
          s""""growk_k_after":$gkK,"growk_total_rows":$gkTotal,""" +
          s""""growk_max_cell_before":$gkMaxBefore,"growk_max_cell_after":$gkMaxAfter,""" +
          s""""growk_probe_rows_before":$gkProbeRowsBefore,""" +
          s""""growk_probe_rows_after":$gkProbeRowsAfter,""" +
          s""""growk_probe_sec_before":$gkProbeBefore,"growk_probe_sec_after":$gkProbeAfter"""
      } catch { case t: Throwable => s""""growk_error":"${jsonErr(t)}"""" }
      // AUTOMATIC grow-K policy leg (VERDICT r13 #2): the same 10× corpus
      // arrives as a STREAM in 4 batches, twice — once with the in-stream
      // cellBudget policy wired, once without. The policy feed's budget
      // trips mid-stream (batch 2 pushes the hottest seed-8 cell past
      // 3000), the re-fit runs between triggers under its own lease, and
      // the later batches' probe phases — plus the final 100-query search —
      // run against the re-balanced index. Published: per-batch wall
      // seconds for BOTH feeds (the mid-stream recovery is visible as the
      // policy feed's post-refit batches undercutting the unmaintained
      // twin's), the maintenance ledger's row, and the final probe
      // sec + candidate rows on each twin.
      val autoGrowkJson = try {
        import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
        import spark.implicits._
        val embs10Rows = replicateEmbeddings(embs, 10)
          .collect().map(r => (r.getLong(0), r.getSeq[Float](1)))
        val nBatches = 4
        val per = embs10Rows.length / nBatches
        def feed(budget: Option[Long], tag: String): (Seq[Double], Double, Long, Int, String) = {
          val d = java.nio.file.Files.createTempDirectory(s"graft_autogrowk_$tag").toString
          try feedIn(d, budget)
          finally cleanup(d) // also on failure — the 10× index must not orphan (review r14)
        }
        def feedIn(d: String, budget: Option[Long]): (Seq[Double], Double, Long, Int, String) = {
          implicit val sc = spark.sqlContext
          val stream = MemoryStream[(Long, Seq[Float])]
          val q = graft.ann.IvfIndex.streamingAbsorb(
            stream.toDF().toDF("vec_id", "embedding"),
            s"$d/idx", s"$d/out", s"$d/ckpt",
            cellBudget = budget, maintainLedgerOut = Some(s"$d/ledger")).start()
          val secs = try {
            (0 until nBatches).map { b =>
              val lo = b * per
              val hi = if (b == nBatches - 1) embs10Rows.length else lo + per
              val t0 = System.nanoTime()
              stream.addData(embs10Rows.slice(lo, hi).toSeq)
              q.processAllAvailable()
              (System.nanoTime() - t0) / 1e9
            }
          } finally q.stop()
          val gkQueries = embs.filter(col("vec_id") < 100)
          val probeSec = time2(graft.ann.IvfIndex.search(
            spark, s"$d/idx", gkQueries, 3, 2).count())
          val candRows = graft.ann.IvfIndex.candidateRows(spark, s"$d/idx", gkQueries, 2)
          val kAfter = graft.ann.IvfIndex.currentCentroids(spark, s"$d/idx").size
          val ledgerJson =
            if (!new java.io.File(s"$d/ledger").exists()) "[]"
            else spark.read.option("basePath", s"$d/ledger").parquet(s"$d/ledger")
              .drop("batch").collect().map { r =>
                s"""{"segment":${r.getAs[Long]("segment")},""" +
                  s""""max_cell_before":${r.getAs[Long]("max_cell_before")},""" +
                  s""""k_before":${r.getAs[Int]("k_before")},""" +
                  s""""k_after":${r.getAs[Int]("k_after")}}"""
              }.mkString("[", ",", "]")
          (secs, probeSec, candRows, kAfter, ledgerJson)
        }
        val (offSecs, offProbe, offCand, offK, _) = feed(None, "off")
        val (onSecs, onProbe, onCand, onK, onLedger) = feed(Some(3000L), "on")
        s""","auto_growk_stream":{"corpus_factor":10,"batches":$nBatches,""" +
          s""""cell_budget":3000,""" +
          s""""policy_off_batch_secs":${offSecs.map(s => f"$s%.3f").mkString("[", ",", "]")},""" +
          s""""policy_on_batch_secs":${onSecs.map(s => f"$s%.3f").mkString("[", ",", "]")},""" +
          s""""policy_off_k":$offK,"policy_on_k":$onK,""" +
          s""""policy_off_final_probe_sec":$offProbe,"policy_on_final_probe_sec":$onProbe,""" +
          s""""policy_off_candidate_rows":$offCand,"policy_on_candidate_rows":$onCand,""" +
          s""""probe_recovery":${if (onProbe > 0) offProbe / onProbe else -1.0},""" +
          s""""maintenance_ledger":$onLedger}"""
      } catch { case t: Throwable =>
        s""","auto_growk_stream":{"error":"${jsonErr(t)}"}""" }
      // hamming fingerprint index: one-shot = rehash + all-band self-join of
      // the whole image corpus; probe = a 2% batch against the stored bands
      // (zero-shuffle broadcast probe)
      val fps = graft.multimodal.MediaOps.imageFingerprints(spark, sfDir)
      val fpFullSec = time2(
        graft.multimodal.MediaOps.imageNearDup(spark, sfDir).count())
      graft.dedup.FingerprintIndex.materialize(spark, fps, s"$base/fp")
      val fpBatch = fps.filter(col("id") % 50 === 0)
      val fpProbeSec = time2(graft.dedup.FingerprintIndex.candidates(
        spark, s"$base/fp", fpBatch).count())
      // the hamming index's health signal (band-occupancy skew ≈ 1 means
      // probe cost is uniform; a hot bucket inflates it quadratically) plus
      // its governance ledger (VERDICT r13 #5): the over-cap buckets at the
      // relative cap and the candidate volume suppression saves — the
      // quantified cost of the only governance hamming space admits (value
      // masses are indivisible by any banding; see
      // FingerprintIndex.occupancyLedger)
      val fpSkew = graft.dedup.FingerprintIndex.occupancySkew(spark, s"$base/fp")
      val fpCap = graft.multimodal.MediaOps.imageBucketCap(fps.count())
      val fpLed = graft.dedup.FingerprintIndex
        .occupancyLedgerOf(spark, s"$base/fp", fpCap).collect()
      val fpSuppressed = fpLed.map(_.getLong(3)).sum
      // pair/label store: one-shot = the full jaccard-pair + CC-fixpoint
      // recompute every consumer used to pay; served = reading the published
      // label snapshot (the store itself was built once by the query
      // catalog's first consumer, so `ensure` here is a lookup)
      val pairFullSec = time2(graft.dedup.DedupOps.nearDupLabels(spark, sfDir).count())
      val pairServedSec = time2(graft.dedup.PairStore.labelsFor(spark, sfDir).count())
      // the honest COLD build cost the min-of-two serving rows can never
      // show (VERDICT r8 #6): pair join + CC fixpoint + snapshot publish
      // into a fresh store, timed once — this is what the FIRST consumer
      // (or a corpus-change rebuild) actually pays before the 30× serving
      // legs exist
      val coldDir = java.nio.file.Files.createTempDirectory("graft_pairstore_cold").toString
      val tBuild = System.nanoTime()
      graft.dedup.PairStore.materialize(
        spark, graft.dedup.DedupOps.ngramJaccardPairs(spark, sfDir), coldDir)
      graft.dedup.PairStore.refreshLabels(spark, coldDir)
      val pairBuildSec = (System.nanoTime() - tBuild) / 1e9
      cleanup(coldDir)
      // incremental absorb: pairs of a 2% document batch (exact, vs the
      // full-corpus pair join an index-less pipeline re-runs per batch).
      // The batch probes the STORED shingle-postings relation (VERDICT r13
      // #1: the live-derivation incremental form re-derived the corpus's
      // shingles on both join sides, so this row read speedup 0.98 — no
      // incremental benefit); the one-off postings build is timed
      // separately, and the store-less recompute form stays published as
      // the audit-trail comparison.
      val incrFullSec = time2(graft.dedup.DedupOps.ngramJaccardPairs(spark, sfDir).count())
      val shingleIdxDir = s"$base/shingles"
      val tShIdx = System.nanoTime()
      graft.dedup.ShingleIndex.materialize(spark, sfDir, shingleIdxDir)
      val shingleBuildSec = (System.nanoTime() - tShIdx) / 1e9
      val incrBatchSec = time2(graft.dedup.ShingleIndex
        .incrementalPairs(spark, shingleIdxDir, _ % 50 === 0).count())
      val incrRecomputeSec = time2(graft.dedup.DedupOps
        .ngramJaccardPairsIncremental(spark, sfDir, _ % 50 === 0).count())
      // the FULL pair set served from the same store (join-free posting-list
      // expansion) vs its live derivation — what PairStore builds and
      // cluster refreshes pay once the store exists
      val fullServedSec = time2(
        graft.dedup.ShingleIndex.allPairs(spark, shingleIdxDir).count())
      // the true STREAMING-ADMISSION path: a batch of NEW documents (2%)
      // probed against a store of the other 98% under the stored (stale-df)
      // vocabulary — what each incoming micro-batch pays between store
      // rebuilds, vs the full-corpus recompute an index-less pipeline runs
      val admIdxDir = s"$base/shingles_adm"
      graft.dedup.ShingleIndex.materializeDocs(
        spark, docs.filter(col("doc_id") % 50 =!= 0), admIdxDir)
      val admProbeSec = time2(graft.dedup.ShingleIndex.probePairs(
        spark, admIdxDir, docs.filter(col("doc_id") % 50 === 0)).count())
      cleanup(base)
      def leg(name: String, full: Double, probe: Double) =
        s""""$name":{"one_shot_sec":$full,"index_probe_sec":$probe,""" +
          s""""speedup":${if (probe > 0) full / probe else -1.0}}"""
      s""","index_serving":{${leg("lsh_batch_candidates", lshFullSec, lshProbeSec)},""" +
        s"""${leg("ivf_topk_search", ivfFullSec, ivfSearchSec)},""" +
        s"""${leg("ivf_adc_search", ivfFullSec, ivfAdcSearchSec)},""" +
        s"""${leg("ivf_radc_search", ivfFullSec, ivfRadcSearchSec)},""" +
        s""""ivf_adc_vs_float_probe":${
          if (ivfSearchSec > 0) ivfAdcSearchSec / ivfSearchSec else -1.0},""" +
        s""""ivf_radc_hits30_seed":$radcHitsSeed,""" +
        s""""ivf_radc_hits30_trained":$radcHitsTrained,""" +
        s""""ivf_adc_hits30_seed":$adcHitsSeed,""" +
        s""""ivf_adc_hits30_trained":$adcHitsTrained,""" +
        s""""codebook_retrain_sec":$codebookRetrainSec,""" +
        s"""$growkJson,""" +
        s"""${leg("fp_hamming_candidates", fpFullSec, fpProbeSec)},""" +
        s"""${leg("neardup_labels_via_pairstore", pairFullSec, pairServedSec)},""" +
        s"""${leg("jaccard_pairs_incremental_batch", incrFullSec, incrBatchSec)},""" +
        s"""${leg("jaccard_pairs_full_via_postings", incrFullSec, fullServedSec)},""" +
        s"""${leg("jaccard_admission_probe", incrFullSec, admProbeSec)},""" +
        s""""jaccard_incremental_recompute_sec":$incrRecomputeSec,""" +
        s""""shingle_index_build_sec":$shingleBuildSec,""" +
        s""""pairstore_build_sec":$pairBuildSec,""" +
        s""""fp_occupancy_skew":$fpSkew,""" +
        s""""fp_occupancy_cap":$fpCap,"fp_over_cap_buckets":${fpLed.length},""" +
        s""""fp_suppressed_candidate_pairs":$fpSuppressed}""" + autoGrowkJson
    } catch { case t: Throwable => s""","index_serving":{"error":"${jsonErr(t)}"}""" }

    // Shingle-store rebuild governance (VERDICT r14 #2 + #3): the COMPOSED
    // two-tier admission pipeline over the real corpus. 90% of documents
    // bootstrap the generational posting store; the held-out 10% stream in
    // as two STABLE batches (same-distribution docs — the staleness signal
    // reads its natural level, which is high in shingle space because
    // 5-gram shingles are near-unique per doc, and the generation must not
    // move), then two DRIFTED batches (every token rewritten — a new
    // vocabulary): the first breaches the threshold — derived RELATIVE to
    // the measured natural level, never a fixed literal — and rebuilds the
    // next generation with its exact catch-up segment; the second lands
    // inside the cooldown and publishes signal only. The per-batch signal,
    // the rebuild ledger, the catch-up size, and the composed pipeline's
    // docs/s all land in the artifact.
    val shingleGovernanceJson = try {
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      import org.apache.spark.sql.functions._
      import spark.implicits._
      val base = java.nio.file.Files.createTempDirectory("graft_shingle_gov").toString
      val docs = Tables.documents(spark, sfDir).select("doc_id", "text")
      val corpus = docs.filter(col("doc_id") % 10 =!= 0)
      val corpusDocs = corpus.count()
      val tInit = System.nanoTime()
      graft.dedup.ShingleIndex.initGenerations(spark, s"$base/gen", corpus)
      val initSec = (System.nanoTime() - tInit) / 1e9
      // ADVICE r15 #3: everything below collect()s the held-out split to
      // feed MemoryStream — cap the driver-side row count so a larger SF
      // cannot OOM the driver through this fixture (the governance behavior
      // needs a bounded, deterministic sample, not every held-out document).
      val heldOut = docs.filter(col("doc_id") % 10 === 0)
        .orderBy("doc_id").limit(10000)
      // natural staleness of held-out SAME-DISTRIBUTION docs, measured up
      // front PER PLANNED STABLE BATCH (the worse half sets the floor —
      // run 1 of r15 measured the second half at 0.9398 against a
      // whole-set-derived threshold of 0.9501, a margin thin enough for
      // batch composition noise to flip), so the trip threshold separates
      // "new documents" (healthy, high in shingle space — 5-gram shingles
      // are near-unique per doc) from "new vocabulary" (drift ≈ 1.0) at
      // any sf: threshold = halfway between the worst stable batch's level
      // and 1.0
      val genPath0 = graft.dedup.ShingleIndex.currentGenerationPath(spark, s"$base/gen")
      val stableBatches = Seq(
        heldOut.filter(col("doc_id") % 20 === 0),
        heldOut.filter(col("doc_id") % 20 =!= 0))
      val naturalUnseen = stableBatches.map(b =>
        graft.dedup.ShingleIndex.admissionStaleness(spark, genPath0, b)._2).max
      // ADVICE r15 #1: a fully-unseen stable batch (naturalUnseen == 1.0)
      // would derive threshold = 1.0, and the pipeline's breach test is
      // `>=`, so the STABLE batch itself would trip a rebuild and the
      // stable/drift narrative would lie at such an SF — degrade to
      // signal-only (no trip threshold) instead of publishing a fiction.
      val thresholdOpt =
        if (naturalUnseen < 1.0) Some(naturalUnseen + (1.0 - naturalUnseen) / 2)
        else None
      val driftRows = heldOut
        .withColumn("doc_id", col("doc_id") + lit(100000000L))
        .withColumn("text",
          regexp_replace(col("text"), lit("(\\S+)"), lit("gx_$1")))
        .collect().map(r => (r.getLong(0), r.getString(1)))
      implicit val sc = spark.sqlContext
      val stream = MemoryStream[(Long, String)]
      val q = graft.dedup.AdmissionPipeline.streamingTwoTier(
        stream.toDF().toDF("doc_id", "text"),
        s"$base/gen", s"$base/lsh", s"$base/docs", s"$base/pairs", s"$base/ckpt",
        baseDocs = corpus, refreshEvery = 2,
        stalenessThreshold = thresholdOpt, rebuildCooldownBatches = 5,
        ledgerOut = Some(s"$base/ledger")).start()
      val dHalf = driftRows.length / 2
      val batches = stableBatches.map(
        _.collect().map(r => (r.getLong(0), r.getString(1))).toSeq) ++ Seq(
        driftRows.take(dHalf).toSeq, driftRows.drop(dHalf).toSeq)
      val batchSecs = try {
        batches.map { rows =>
          val t0 = System.nanoTime()
          stream.addData(rows)
          q.processAllAvailable()
          (System.nanoTime() - t0) / 1e9
        }
      } finally q.stop()
      val nDocs = batches.map(_.length.toLong).sum
      val ledgerJson = spark.read.option("basePath", s"$base/ledger")
        .parquet(s"$base/ledger").orderBy("segment").collect().map { r =>
          s"""{"gen":${r.getAs[Long]("gen")},""" +
            s""""unseen_frac":${f"${r.getAs[Double]("unseen_frac")}%.4f"},""" +
            s""""rebuilt":${r.getAs[Boolean]("rebuilt")},""" +
            s""""gen_after":${r.getAs[Long]("gen_after")},""" +
            s""""catchup_pairs":${r.getAs[Long]("catchup_pairs")}}"""
        }.mkString("[", ",", "]")
      val genFinal = graft.dedup.ShingleIndex.currentGeneration(spark, s"$base/gen")
      // catch-up convergence, priced honestly: the exact tiers' distinct
      // pair set is a SUPERSET of the rebuilt generation's fixpoint (pairs
      // judged under the pre-rebuild vocabulary are append-only — the
      // documented lagging-view trade); the surplus is published, not
      // hidden behind an equality claim
      val exactPairs = graft.dedup.AdmissionPipeline
        .readPairsExact(spark, s"$base/pairs")
        .select("id_a", "id_b").distinct().count()
      val lshTierPairs = graft.dedup.AdmissionPipeline
        .readPairsTiered(spark, s"$base/pairs")
        .filter(col("tier") === "lsh").count()
      val fixpointPairs = graft.dedup.ShingleIndex.allPairs(
        spark, graft.dedup.ShingleIndex.currentGenerationPath(spark, s"$base/gen"))
        .count()
      cleanup(base)
      s""","shingle_governance":{"corpus_docs":$corpusDocs,"stream_docs":$nDocs,""" +
        s""""gen_build_sec":$initSec,""" +
        s""""natural_unseen_frac":${f"$naturalUnseen%.4f"},""" +
        s""""staleness_threshold":${thresholdOpt.map(t => f"$t%.4f").getOrElse("null")},""" +
        s""""batch_secs":${batchSecs.map(s => f"$s%.3f").mkString("[", ",", "]")},""" +
        s""""two_tier_docs_per_sec":${(nDocs / batchSecs.sum).toLong},""" +
        s""""final_generation":$genFinal,""" +
        s""""exact_tier_distinct_pairs":$exactPairs,""" +
        s""""fixpoint_pairs":$fixpointPairs,""" +
        s""""stale_surplus_pairs":${exactPairs - fixpointPairs},""" +
        s""""lsh_tier_pairs":$lshTierPairs,""" +
        s""""ledger":$ledgerJson}"""
    } catch { case t: Throwable =>
      s""","shingle_governance":{"error":"${jsonErr(t)}"}""" }

    // PairStore streaming absorb under skew (VERDICT r8 #8): micro-batch
    // pair absorbs with the cadenced in-stream label refresh, once over
    // uniform pairs (disjoint 2-node components) and once with 30% of every
    // batch's pairs landing on ONE hot doc — the star a viral page's
    // near-dups build. Reported per feed: absorbed pair rows/s INCLUDING
    // the cadenced refreshes, plus the explicit full-fixpoint refresh
    // second at the end. hot/uniform near 1 means the CC fixpoint and the
    // segment absorbs don't serialize on the hot key.
    val pairStreamingJson = try {
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      import org.apache.spark.sql.functions._
      import spark.implicits._
      val nPairs = 100000
      val batches = 5
      def feed(hot: Boolean): (Double, Double) = {
        val base = java.nio.file.Files.createTempDirectory("graft_ps_stream").toString
        implicit val sc = spark.sqlContext
        val stream = MemoryStream[(Long, Long)]
        val pairs = stream.toDF().toDF("id_a", "id_b")
          .withColumn("inter", lit(1L)).withColumn("n_a", lit(1L))
          .withColumn("n_b", lit(1L)).withColumn("jaccard", lit(1.0))
        val q = graft.dedup.PairStore
          .streamingAbsorb(pairs, s"$base/store", s"$base/ckpt", refreshEvery = 2)
          .start()
        val per = nPairs / batches
        val t0 = System.nanoTime()
        try {
          (0 until batches).foreach { b =>
            val rows = (0 until per).map { i =>
              val j = (b.toLong * per + i)
              if (hot && i % 10 < 3) (0L, j + 1) else (2 * j + 1, 2 * j + 2)
            }
            stream.addData(rows)
            q.processAllAvailable()
          }
        } finally q.stop()
        val absorbSec = (System.nanoTime() - t0) / 1e9
        val tr = System.nanoTime()
        graft.dedup.PairStore.refreshLabels(spark, s"$base/store")
        val refreshSec = (System.nanoTime() - tr) / 1e9
        cleanup(base)
        (nPairs / absorbSec, refreshSec)
      }
      val (uniRps, uniRefresh) = feed(hot = false)
      val (hotRps, hotRefresh) = feed(hot = true)
      s""","pairstore_streaming":{"pair_rows":$nPairs,"micro_batches":$batches,""" +
        s""""refresh_every":2,"hot_pair_frac":0.3,""" +
        s""""uniform_rows_per_sec":${uniRps.toLong},"hot_rows_per_sec":${hotRps.toLong},""" +
        s""""hot_slowdown":${if (hotRps > 0) uniRps / hotRps else -1.0},""" +
        s""""refresh_sec_uniform":$uniRefresh,"refresh_sec_hot":$hotRefresh,""" +
        s""""refresh_hot_ratio":${if (uniRefresh > 0) hotRefresh / uniRefresh else -1.0}}"""
    } catch { case t: Throwable => s""","pairstore_streaming":{"error":"${jsonErr(t)}"}""" }

    // Long-document probe (VERDICT r8 #2): per-row lambda costs are
    // invisible at the corpus's ~54 tokens/doc — plant 200 docs × 2k and
    // × 10k tokens (~3k distinct, the shape of a big web page) and time the
    // gopher-rule scan on each. sec_per_token_ratio near 1 certifies the
    // top-token statistic stays LINEAR in document length; the quadratic
    // form this replaced (array_max over per-distinct-token filters) would
    // read ~5× here (25× work / 5× tokens).
    val longDocJson = try {
      import spark.implicits._
      def mk(tokensPerDoc: Int): String = {
        val dir = java.nio.file.Files.createTempDirectory("graft_longdoc").toString
        spark.range(200).map { d =>
          val sb = new StringBuilder
          var i = 0
          while (i < tokensPerDoc) {
            if (i > 0) sb.append(' ')
            sb.append('t'); sb.append((d * 17 + i.toLong * 31) % 3000)
            i += 1
          }
          (d, sb.toString, "en", "web", sb.length.toLong)
        }.toDF("doc_id", "text", "lang", "source", "n_chars")
          .repartition(8).write.mode("overwrite").parquet(s"$dir/documents.parquet")
        dir
      }
      def t(dir: String): Double = {
        def once(): Double = {
          val t0 = System.nanoTime()
          graft.text.FilterRules.gopherRules(spark, dir).count()
          (System.nanoTime() - t0) / 1e9
        }
        math.min(once(), once())
      }
      val dShort = mk(2000); val sShort = t(dShort)
      val dLong = mk(10000); val sLong = t(dLong)
      cleanup(dShort); cleanup(dLong)
      val perTok = if (sShort > 0) (sLong / 5.0) / sShort else -1.0
      s""","long_doc_probe":{"docs":200,"tokens_short":2000,"tokens_long":10000,""" +
        s""""gopher_sec_short":$sShort,"gopher_sec_long":$sLong,""" +
        s""""sec_per_token_ratio":$perTok}"""
    } catch { case t: Throwable => s""","long_doc_probe":{"error":"${jsonErr(t)}"}""" }

    // Streaming throughput vs BASELINE.md's one published number (≥100k
    // msg/s sustained ingest): run the duty-cycle streaming plan over a 1M-row
    // file source (MemoryStream would measure the driver's single-threaded
    // row encoding, not the plan) and report end-to-end rows/s.
    val (streamingJson, streamingRps) = try {
      import java.sql.Timestamp
      import org.apache.spark.sql.streaming.OutputMode
      import graft.streaming.{GridConfig, StreamingDutyCycle}
      import spark.implicits._
      val n = 1000000L
      val dir = java.nio.file.Files.createTempDirectory("graft_stream_bench").toString
      spark.range(n).map { i =>
        StreamingDutyCycle.PowerReading(
          new Timestamp((i % 86400) * 1000L),
          s"1_1_${i % 5}", "lamp", s"1_1_${i % 5}_${i % 50}", (i % 400).toDouble)
      }.repartition(16).write.mode("overwrite").parquet(dir)
      // Planted-hot-key twin (VERDICT r5 missing #5: the batch skew probe
      // had no streaming counterpart — these gates fed uniform keys only):
      // 60% of all readings land on ONE appliance in ONE house, the rest
      // spread as above. Same row count, same schema, same plan — the ratio
      // uniform/hot isolates what a hot meter costs the stateful pipeline.
      // Expected near 1: micro-batch execution plans partial aggregation
      // before the state-store shuffle, so the hot (window, appliance) key
      // collapses to one row per input partition per trigger rather than
      // funneling raw readings through one state task.
      val hotDir = java.nio.file.Files.createTempDirectory("graft_stream_hot").toString
      spark.range(n).map { i =>
        if (i % 10 < 6)
          StreamingDutyCycle.PowerReading(
            new Timestamp((i % 86400) * 1000L),
            "1_1_0", "lamp", "1_1_0_0", (i % 400).toDouble)
        else
          StreamingDutyCycle.PowerReading(
            new Timestamp((i % 86400) * 1000L),
            s"1_1_${i % 5}", "lamp", s"1_1_${i % 5}_${i % 50}", (i % 400).toDouble)
      }.repartition(16).write.mode("overwrite").parquet(hotDir)
      val schema = spark.read.parquet(dir).schema
      def throughputAttempts(name: String, srcDir: String,
          planFn: DataFrame => DataFrame, attempts: Int): Seq[Long] = {
        def once(attempt: Int): Long = {
          val stream = spark.readStream.schema(schema).parquet(srcDir)
          val t0 = System.nanoTime()
          val query = planFn(stream)
            .writeStream.format("memory").queryName(s"${name}_$attempt")
            .outputMode(org.apache.spark.sql.streaming.OutputMode.Append).start()
          try {
            query.processAllAvailable()
            (n / ((System.nanoTime() - t0) / 1e9)).toLong
          } finally query.stop()
        }
        (1 to attempts).map(once)
      }
      // best-of-N, like every other bench number: a single-shot stream
      // measurement folds query startup (planning, state-store init) and
      // one GC roll of the dice into the rows/s — observed ±15% across
      // otherwise-quiet runs (291k → 240k → 266k over three rounds with
      // the measured plan untouched since r9, per git). The HEADLINE legs
      // run best-of-THREE with every attempt published (VERDICT r13 #4:
      // clean runs spread 207k–369k for an unchanged plan — the spread must
      // be visible in the JSON, not discovered by re-running the bench).
      def throughput(name: String, srcDir: String,
          planFn: DataFrame => DataFrame): Long =
        throughputAttempts(name, srcDir, planFn, attempts = 2).max
      try {
        val rpsAttempts = throughputAttempts("graft_duty_bench", dir,
          StreamingDutyCycle.plan(_, GridConfig()), attempts = 3)
        val rps = rpsAttempts.max
        // the chained-stateful-agg form: 1 s pre-aggregate feeding the slide
        val rpsPreAttempts = throughputAttempts("graft_duty_bench_prerolled", dir,
          StreamingDutyCycle.planPrerolled(_, GridConfig()), attempts = 3)
        val rpsPre = rpsPreAttempts.max
        // Pre-roll CROSSOVER leg (VERDICT r12 #4: at the default 5-pane
        // window the pre-roll reads ~0.67× of plain — its second stateful
        // exchange buys nothing the plain plan's map-side partial agg
        // doesn't already do). The decisive variable is the PANE COUNT:
        // plain's sliding-window Expand copies every RAW row once per pane,
        // the pre-roll expands only per-second rows. At a 1 s slide
        // (25 panes — a dashboard refreshing every second), the pre-roll
        // must come out ahead.
        val paneCfg = GridConfig(slideOverrideSec = Some(1))
        val rpsPane = throughput("graft_duty_pane25", dir,
          StreamingDutyCycle.plan(_, paneCfg))
        val rpsPanePre = throughput("graft_duty_pane25_prerolled", dir,
          StreamingDutyCycle.planPrerolled(_, paneCfg))
        // High-pane leg (VERDICT r14 #4): the 25-pane ratio measures ≈1 on
        // clean runs (0.94–1.06 across r14's six), so the crossover evidence
        // needs a point where the expansion asymmetry must dominate — a 60 s
        // window on a 1 s slide (60 panes: plain copies every RAW row 60×
        // into the stateful shuffle, the pre-roll copies per-SECOND rows).
        // The threshold planAuto uses is re-derived from this curve.
        val paneCfg60 = GridConfig(windowMin = 24, slideOverrideSec = Some(1))
        val rpsPane60 = throughput("graft_duty_pane60", dir,
          StreamingDutyCycle.plan(_, paneCfg60))
        val rpsPane60Pre = throughput("graft_duty_pane60_prerolled", dir,
          StreamingDutyCycle.planPrerolled(_, paneCfg60))
        val rpsHot = throughput("graft_duty_bench_hot", hotDir,
          StreamingDutyCycle.plan(_, GridConfig()))
        val hotRatio = if (rpsHot > 0) rps.toDouble / rpsHot else -1.0
        // the full-measure-set ingest rollup (decimal sum + extrema +
        // PowerHist sketch in one stateful agg): its rows/s is the price of
        // Druid-style ingest-time sketches vs the lean (cnt, sum) rollup
        val rpsRollupFull = throughput("graft_rollup_full_bench", dir,
          StreamingDutyCycle.rollupPlanFull(_))
        // State-scale probe (VERDICT r7 #4): the throughput gates above feed
        // 5 distinct (house, appliance) state keys — they never test whether
        // STATE CARDINALITY degrades the pipeline. Same plan, same row
        // count, RocksDB state store (the bounded-memory provider a
        // long-running deployment uses), 10× the key space: the ratio
        // rows/s(10× keys) ÷ rows/s(base keys) near 1 means state lookups
        // stay O(1) per row and the store absorbs cardinality; a ratio
        // collapsing toward 1/10 would flag per-key costs serializing the
        // pipeline.
        val keysDir = java.nio.file.Files.createTempDirectory("graft_stream_keys").toString
        spark.range(n).map { i =>
          StreamingDutyCycle.PowerReading(
            new Timestamp((i % 86400) * 1000L),
            s"1_1_${i % 50}", "lamp", s"1_1_${i % 50}_${i % 50}", (i % 400).toDouble)
        }.repartition(16).write.mode("overwrite").parquet(keysDir)
        val prevProvider = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
        val (rpsRocksBase, rpsRocks10x) =
          try {
            spark.conf.set("spark.sql.streaming.stateStore.providerClass",
              "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
            (throughput("graft_duty_rocks_base", dir,
              StreamingDutyCycle.plan(_, GridConfig())),
              throughput("graft_duty_rocks_10x", keysDir,
                StreamingDutyCycle.plan(_, GridConfig())))
          } finally {
            prevProvider match {
              case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
              case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
            }
            cleanup(keysDir)
          }
        val stateScaleRatio =
          if (rpsRocksBase > 0) rpsRocks10x.toDouble / rpsRocksBase else -1.0
        (s""","streaming":{"duty_cycle_rows_per_sec":$rps,""" +
          s""""duty_cycle_attempts_rows_per_sec":${rpsAttempts.mkString("[", ",", "]")},""" +
          s""""duty_cycle_prerolled_rows_per_sec":$rpsPre,""" +
          s""""duty_cycle_prerolled_attempts_rows_per_sec":${rpsPreAttempts.mkString("[", ",", "]")},""" +
          s""""duty_cycle_25pane_rows_per_sec":$rpsPane,""" +
          s""""duty_cycle_25pane_prerolled_rows_per_sec":$rpsPanePre,""" +
          s""""preroll_crossover_25pane":${
            if (rpsPane > 0) rpsPanePre.toDouble / rpsPane else -1.0},""" +
          s""""duty_cycle_60pane_rows_per_sec":$rpsPane60,""" +
          s""""duty_cycle_60pane_prerolled_rows_per_sec":$rpsPane60Pre,""" +
          s""""preroll_crossover_60pane":${
            if (rpsPane60 > 0) rpsPane60Pre.toDouble / rpsPane60 else -1.0},""" +
          s""""duty_cycle_hot_key_rows_per_sec":$rpsHot,""" +
          s""""hot_key_frac":0.6,"hot_key_slowdown":$hotRatio,""" +
          s""""rollup_full_sketch_rows_per_sec":$rpsRollupFull,""" +
          s""""rocksdb_rows_per_sec_base_keys":$rpsRocksBase,""" +
          s""""rocksdb_rows_per_sec_10x_keys":$rpsRocks10x,""" +
          s""""state_keys_factor":10,"state_scale_ratio":$stateScaleRatio,""" +
          s""""input_rows":$n,"baseline_rows_per_sec":100000}""",
          math.max(rps, rpsPre))
      } finally { cleanup(dir); cleanup(hotDir) }
    } catch { case t: Throwable => (s""","streaming":{"error":"${jsonErr(t)}"}""", -1L) }

    // end-of-run contention sample: drift vs the start sample flags a run
    // that degraded mid-flight (another tenant landed on the box)
    val (loadAvgEnd, sentinelEndSec) = (loadAvg(), sentinelSec())
    val contentionJson =
      s""","contention":{"cpus":$cpus,"load_avg_start":$loadAvgStart,""" +
        s""""load_avg_end":$loadAvgEnd,"sentinel_start_sec":$sentinelStartSec,""" +
        s""""sentinel_end_sec":$sentinelEndSec}"""

    // worst_probe_ratio covers the UNIFORM 10× rows only; the two-sided
    // (100× work) probe is normalized per unit of expected work and emitted
    // under its own key so the headline never conflates the two scales
    // the worst uniform/skew rows' attribution objects ride in THIS (file)
    // summary (VERDICT r11 #5): stall-vs-superlinear must be decidable from
    // the artifact alone —
    // "query" names the plan, "retried" says the >10× reading survived a
    // re-measurement, "row_sentinel_sec" is the fixed-cost CPU sentinel
    // sampled AT the row (≫ ~0.17 s ⇒ the box, not the plan)
    val summary = s""""summary":{"total_sec":$total,"n_queries":${results.size},""" +
      s""""n_errors":${errors.size},""" +
      s""""worst_probe_ratio":$probeWorst,"worst_uniform_ratio":$probeWorst,""" +
      s""""worst_twosided_per_unit":$probeTwoSidedPerUnit,"worst_skew_ratio":$skewWorst,""" +
      s""""worst_uniform_query":$probeWorstQuery,"worst_skew_query":$skewWorstQuery,""" +
      s""""worst_uniform_attrib":$probeWorstAttrib,"worst_skew_attrib":$skewWorstAttrib,""" +
      s""""streaming_rows_per_sec":$streamingRps,""" +
      s""""load_avg_start":$loadAvgStart,"sentinel_start_sec":$sentinelStartSec}"""
    // VERDICT r16 #1: the stdout line must survive the driver's bounded tail
    // capture AND parse as one JSON document; four straight rounds of ~17 KB
    // lines were truncated to an unparseable tail. Two changes vs r16:
    // (a) the COMPLETE detail document (probe/skew/streaming/serving legs,
    //     the worst-row attribution objects, full-precision timings) lives in
    //     /tmp/bench_last.json PLUS a per-leg /tmp/bench_last_c$cpus.json so
    //     the 32- and 8-core legs stop clobbering each other;
    // (b) the stdout line keeps ONLY the contract fields (metric/value/unit/
    //     sf), a compact summary (attribution blobs moved to the file), the
    //     contention sample, any errors, and the FULL "queries" map (all
    //     entries, none removed or renamed) at 4-decimal precision — 0.1 ms,
    //     two orders below query noise. ~5.5 KB instead of ~17 KB. No timed
    //     path changed; same timing methodology, reduced print precision on
    //     the stdout copy only (the file keeps full precision).
    def r4(v: Double): String = {
      val r = math.rint(v * 10000) / 10000
      if (r == math.floor(r) && math.abs(r) < 1e15) s"${r.toLong}.0" else r.toString
    }
    val summaryCompact = s""""summary":{"total_sec":${r4(total)},"n_queries":${results.size},""" +
      s""""n_errors":${errors.size},""" +
      s""""worst_probe_ratio":${r4(probeWorst)},"worst_uniform_ratio":${r4(probeWorst)},""" +
      s""""worst_twosided_per_unit":${r4(probeTwoSidedPerUnit)},"worst_skew_ratio":${r4(skewWorst)},""" +
      s""""worst_uniform_query":$probeWorstQuery,"worst_skew_query":$skewWorstQuery,""" +
      s""""streaming_rows_per_sec":$streamingRps,""" +
      s""""load_avg_start":$loadAvgStart,"sentinel_start_sec":$sentinelStartSec}"""
    val qsCompact = results.map { case (k, v) => "\"" + k + "\":" + r4(v) }
      .mkString("{", ",", "}")
    val fullJson =
      s"""{"metric":"total","value":$total,"unit":"sec","sf":"$sfDir",""" +
        s"""$summary$contentionJson$streamingJson$rollupServingJson$indexServingJson$shingleGovernanceJson$pairStreamingJson$longDocJson$probeJson$skewJson$errJson,"queries":$qs}"""
    // key order: queries FIRST, summary LAST — if a capture still truncates
    // to a tail despite the 5.5 KB line, the tail ends with the summary +
    // contention (the pre-r17 artifacts' only readable content), not with an
    // uninterpretable mid-queries fragment
    val stdoutLine =
      s"""{"metric":"total","value":${r4(total)},"unit":"sec","sf":"$sfDir",""" +
        s""""queries":$qsCompact$errJson,$summaryCompact$contentionJson}"""
    try {
      for (p <- Seq("/tmp/bench_last.json", s"/tmp/bench_last_c$cpus.json"))
        java.nio.file.Files.write(java.nio.file.Paths.get(p), fullJson.getBytes("UTF-8"))
      println(s"""{"bench_json_file":"/tmp/bench_last.json","bench_json_file_leg":"/tmp/bench_last_c$cpus.json"}""")
    } catch { case _: Throwable => () }
    println(stdoutLine)
    spark.stop()
  }
}
