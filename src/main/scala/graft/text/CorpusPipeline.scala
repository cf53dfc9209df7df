package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** The end-to-end training-corpus preparation pipeline, composed from the
  * engine's own operators: exact dedup → quality gate → language routing.
  * One Catalyst plan — dedup's hash-groupBy, the quality arithmetic and the
  * language scorer all fuse into the same scan where possible.
  */
object CorpusPipeline {

  val QualityThreshold = 0.60

  /** Per-document decision record for the kept subset. */
  def cleanCorpus(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    // exact dedup: keep the min doc_id per content hash (semi join on keeper)
    val keepers = docs
      .groupBy(md5(col("text")).as("h"))
      .agg(min("doc_id").as("doc_id"))
      .select("doc_id")
    val toks = split(col("text"), " ")
    val nTok = size(toks).cast("double")
    val nDis = size(array_distinct(toks)).cast("double")
    val nStop = size(filter(toks, t => t === "the" || t === "a")).cast("double")
    val quality = (nDis / nTok) * 0.7 + (lit(1.0) - nStop / nTok) * 0.3
    val scores = TextOps.LangMarkers.map { case (lang, markers) =>
      lang -> size(filter(toks, t => markers.map(t === _).reduce(_ || _)))
    }
    val langs = TextOps.LangMarkers.map(_._1)
    val scored = docs
      .join(keepers, Seq("doc_id"), "left_semi")
      .select(
        Seq(col("doc_id"), col("lang"), nTok.cast("int").as("n_tokens"), quality.as("quality")) ++
          scores.map { case (l, c) => c.as(s"s_$l") }: _*)
    val pred = langs.zipWithIndex.init.foldRight(lit(langs.last)) { case ((l, i), elseCol) =>
      val geAll = langs.drop(i + 1).map(o => col(s"s_$l") >= col(s"s_$o")).reduce(_ && _)
      when(geAll, lit(l)).otherwise(elseCol)
    }
    scored
      .withColumn("pred_lang", pred)
      .filter(col("quality") >= QualityThreshold)
      .groupBy("pred_lang")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens").cast("long")).as("total_tokens"))
      .orderBy("pred_lang")
  }

  val cleanCorpusSql: String = {
    val scoreCols = TextOps.LangMarkers.map { case (l, ms) =>
      val cond = ms.map(m => s"t = '$m'").mkString(" OR ")
      s"len(list_filter(string_split(text, ' '), t -> $cond)) AS s_$l"
    }.mkString(",\n         ")
    val langs = TextOps.LangMarkers.map(_._1)
    val cases = langs.zipWithIndex.init.map { case (l, i) =>
      val ge = langs.drop(i + 1).map(o => s"s_$l >= s_$o").mkString(" AND ")
      s"WHEN $ge THEN '$l'"
    }.mkString("\n         ")
    s"""WITH keepers AS (
       |  SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)),
       |kept AS (
       |  SELECT d.* FROM documents d WHERE EXISTS (SELECT 1 FROM keepers k WHERE k.doc_id = d.doc_id)),
       |scored AS (
       |  SELECT doc_id, lang,
       |         CAST(len(string_split(text, ' ')) AS DOUBLE) AS n_tok,
       |         CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE) AS n_dis,
       |         CAST(len(list_filter(string_split(text, ' '), t -> t = 'the' OR t = 'a')) AS DOUBLE) AS n_stop,
       |         $scoreCols
       |  FROM kept),
       |decided AS (
       |  SELECT doc_id, CAST(n_tok AS INT) AS n_tokens,
       |         (n_dis / n_tok) * 0.7 + (1.0 - n_stop / n_tok) * 0.3 AS quality,
       |         CASE $cases ELSE '${langs.last}' END AS pred_lang
       |  FROM scored)
       |SELECT pred_lang, count(*) AS n_docs,
       |       CAST(sum(n_tokens) AS BIGINT) AS total_tokens
       |FROM decided
       |WHERE quality >= $QualityThreshold
       |GROUP BY 1 ORDER BY 1""".stripMargin
  }

  /** Deterministic train/val/test split: content-hash bucket (md5 mod 10 →
    * 8/1/1) so the assignment is reproducible across runs, engines and
    * cluster layouts — the standard leak-proof split for training corpora.
    */
  def datasetSplit(spark: SparkSession, sfDir: String): DataFrame = {
    val bucket = expr(s"CAST(conv(substring(md5(text), 1, 6), 16, 10) AS BIGINT) % 10")
    Tables.documents(spark, sfDir)
      .withColumn("split",
        when(bucket < 8, "train").when(bucket === 8, "val").otherwise("test"))
      .groupBy("split", "lang")
      .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("total_chars"))
      .orderBy("split", "lang")
  }

  val datasetSplitSql: String =
    """WITH b AS (
      |  SELECT lang, n_chars,
      |         CAST('0x' || substr(md5(text), 1, 6) AS BIGINT) % 10 AS bucket
      |  FROM documents)
      |SELECT CASE WHEN bucket < 8 THEN 'train' WHEN bucket = 8 THEN 'val' ELSE 'test' END AS split,
      |       lang, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS total_chars
      |FROM b GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** Group-aware split: ALL documents of one source land in the same split
    * (bucket by md5(source), not md5(text)) — the leakage guard content-hash
    * splitting cannot give: near-duplicate documents from the same crawl
    * domain must not straddle train/test (Soldaini et al., Dolma 2024 split
    * by source for exactly this reason). Verifiable invariant: every source
    * maps to exactly one split, pinned both in the output (n_splits per
    * source is identically 1) and in CurationSpec.
    */
  def groupSplit(spark: SparkSession, sfDir: String): DataFrame = {
    val bucket = expr(s"CAST(conv(substring(md5(source), 1, 6), 16, 10) AS BIGINT) % 10")
    Tables.documents(spark, sfDir)
      .withColumn("split",
        when(bucket < 8, "train").when(bucket === 8, "val").otherwise("test"))
      .groupBy("source")
      .agg(
        countDistinct("split").as("n_splits"),
        min("split").as("split"),
        count(lit(1)).as("n_docs"),
        sum("n_chars").as("total_chars"))
      .orderBy("source")
  }

  val groupSplitSql: String =
    """WITH b AS (
      |  SELECT source, n_chars,
      |         CASE WHEN CAST('0x' || substr(md5(source), 1, 6) AS BIGINT) % 10 < 8 THEN 'train'
      |              WHEN CAST('0x' || substr(md5(source), 1, 6) AS BIGINT) % 10 = 8 THEN 'val'
      |              ELSE 'test' END AS split
      |  FROM documents)
      |SELECT source, count(DISTINCT split) AS n_splits, min(split) AS split,
      |       count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS total_chars
      |FROM b GROUP BY 1 ORDER BY source""".stripMargin

  /** Vocabulary statistics: term frequency, document frequency and a
    * rational salience score (tf·N/df — ln-free so both engines agree
    * bitwise), top-20 terms.
    */
  def vocabStats(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    // corpus size as a broadcast 1-row aggregate: stays inside the one plan
    // (no separate driver action / extra scan-triggering job)
    val total = docs.agg(count(lit(1)).as("n_total"))
    val terms = docs.select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
    terms
      .groupBy("term")
      .agg(
        count(lit(1)).as("tf"),
        countDistinct("doc_id").as("df"))
      .crossJoin(broadcast(total))
      .withColumn("salience", col("tf") * col("n_total") / col("df"))
      .drop("n_total")
      .orderBy(desc("tf"), asc("term"))
      .limit(20)
  }

  val vocabStatsSql: String =
    """WITH t AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
      |n AS (SELECT count(*) AS total FROM documents)
      |SELECT term, count(*) AS tf, count(DISTINCT doc_id) AS df,
      |       count(*) * (SELECT total FROM n) / count(DISTINCT doc_id) AS salience
      |FROM t GROUP BY term
      |ORDER BY tf DESC, term LIMIT 20""".stripMargin

  /** The WHOLE curation pipeline as one audited funnel: near-dup cluster
    * canonicalization (keep each cluster's highest-quality member — the
    * shared CC core, which subsumes exact dedup since identical texts are
    * jaccard-1.0 pairs) → quality gate → benchmark decontamination (flagged
    * docs AND the benchmark slice itself leave the training set) → per-source
    * quota cap (the md5-uniform draw, ranked over the docs still alive when
    * the cap runs). Emits the stage-by-stage survivor ledger (docs + tokens
    * after each stage) every production curation run reports.
    *
    * Shape: ONE pass assigns each document the first stage that drops it
    * (joins on doc_id; the cap rank is a per-source window over survivors
    * only), then the ledger folds from the ≤ 5-row drop histogram — the
    * histogram is collected and cumulated driver-side (O(stages), the same
    * scalar-per-round discipline as the iterative operators), so no
    * non-equi join or global window ever appears in the plan.
    */
  def curationFunnel(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = Tables.documents(spark, sfDir).select(
      col("doc_id"), col("source"),
      size(split(col("text"), " ")).cast("long").as("n_tok"),
      TextOps.qualityCol(col("text")).as("quality"))
    val repW = Window.partitionBy("lbl").orderBy(desc("quality"), asc("doc_id"))
    val clusterDrop = graft.dedup.PairStore.labelsFor(spark, sfDir)
      .join(base.select("doc_id", "quality"), "doc_id")
      .withColumn("rn", row_number().over(repW))
      .filter(col("rn") > 1)
      .select(col("doc_id"), lit(1).as("dup_drop"))
    val contDrop = CurationOps.contamination(spark, sfDir)
      .select("doc_id").distinct().withColumn("cont_drop", lit(1))
    val u = conv(substring(md5(concat(lit("cap_"), col("doc_id").cast("string"))), 1, 8), 16, 10)
      .cast("long")
    val flagged = base
      .join(clusterDrop, Seq("doc_id"), "left")
      .join(contDrop, Seq("doc_id"), "left")
      .withColumn("dropped_at",
        when(col("dup_drop") === 1, 1)
          .when(col("quality") < QualityThreshold, 2)
          .when(col("cont_drop") === 1 || col("doc_id") < CurationOps.BenchmarkMaxId, 3))
      .withColumn("u", u)
      .localCheckpoint() // referenced twice: survivor cap-rank + final union
    val capW = Window.partitionBy("source").orderBy("u", "doc_id")
    val capDrop = flagged.filter(col("dropped_at").isNull)
      .withColumn("rn", row_number().over(capW))
      .filter(col("rn") > CurationOps.SourceCap)
      .select(col("doc_id"), lit(4).as("cap_drop"))
    val hist = flagged.join(capDrop, Seq("doc_id"), "left")
      .withColumn("dropped_at", coalesce(col("dropped_at"), col("cap_drop")))
      .groupBy("dropped_at")
      .agg(count(lit(1)).as("d_docs"), sum("n_tok").as("d_toks"))
      .collect()
      .map(r => (if (r.isNullAt(0)) Int.MaxValue else r.getInt(0), r.getLong(1), r.getLong(2)))
    val totalDocs = hist.map(_._2).sum
    val totalToks = hist.map(_._3).sum
    val stages = Seq(0 -> "raw", 1 -> "near_dup", 2 -> "quality_gate",
      3 -> "decontaminate", 4 -> "source_cap")
    val ledger = stages.map { case (i, name) =>
      val droppedDocs = hist.filter(h => h._1 <= i).map(_._2).sum
      val droppedToks = hist.filter(h => h._1 <= i).map(_._3).sum
      (i, name, totalDocs - droppedDocs, totalToks - droppedToks)
    }
    import spark.implicits._
    ledger.toDF("stage_idx", "stage", "n_docs", "n_tokens").orderBy("stage_idx")
  }

  val curationFunnelSql: String = {
    val qualityExpr =
      """CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
        |           / len(string_split(text, ' ')) * 0.7 +
        |         (1.0 - CAST(len(list_filter(string_split(text, ' '),
        |                                     t -> t = 'the' OR t = 'a')) AS DOUBLE)
        |           / len(string_split(text, ' '))) * 0.3""".stripMargin
    s"""WITH RECURSIVE ${graft.dedup.DedupOps.nearDupLabelCtes(0.6)},
       |q AS (
       |  SELECT doc_id, source,
       |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
       |         $qualityExpr AS quality
       |  FROM documents),
       |ranked AS (
       |  SELECT l.doc_id,
       |         row_number() OVER (PARTITION BY l.lbl ORDER BY qq.quality DESC, l.doc_id) AS rn
       |  FROM labels l JOIN q qq ON l.doc_id = qq.doc_id),
       |cont AS (
       |  SELECT DISTINCT t.doc_id FROM (
       |    SELECT c.doc_id
       |    FROM sh0 c JOIN sh0 b ON c.s = b.s
       |    WHERE c.doc_id >= ${CurationOps.BenchmarkMaxId}
       |      AND b.doc_id < ${CurationOps.BenchmarkMaxId}
       |    GROUP BY c.doc_id, b.doc_id
       |    HAVING count(*) >= ${CurationOps.ContaminationMinOverlap}) t),
       |flagged AS (
       |  SELECT q.doc_id, q.source, q.n_tok,
       |         CAST('0x' || substr(md5('cap_' || CAST(q.doc_id AS VARCHAR)), 1, 8) AS BIGINT) AS u,
       |         CASE WHEN r.rn > 1 THEN 1
       |              WHEN q.quality < $QualityThreshold THEN 2
       |              WHEN ct.doc_id IS NOT NULL
       |                   OR q.doc_id < ${CurationOps.BenchmarkMaxId} THEN 3
       |         END AS dropped_at
       |  FROM q
       |  LEFT JOIN ranked r ON q.doc_id = r.doc_id
       |  LEFT JOIN cont ct ON q.doc_id = ct.doc_id),
       |capped AS (
       |  SELECT doc_id, row_number() OVER (PARTITION BY source ORDER BY u, doc_id) AS rn_cap
       |  FROM flagged WHERE dropped_at IS NULL),
       |fin AS (
       |  SELECT f.doc_id, f.n_tok,
       |         coalesce(f.dropped_at,
       |                  CASE WHEN c.rn_cap > ${CurationOps.SourceCap} THEN 4 END) AS dropped_at
       |  FROM flagged f LEFT JOIN capped c ON f.doc_id = c.doc_id),
       |stages(stage_idx, stage) AS (VALUES
       |  (0, 'raw'), (1, 'near_dup'), (2, 'quality_gate'),
       |  (3, 'decontaminate'), (4, 'source_cap'))
       |SELECT s.stage_idx, s.stage,
       |       CAST(count(*) FILTER (WHERE fin.dropped_at IS NULL
       |                                OR fin.dropped_at > s.stage_idx) AS BIGINT) AS n_docs,
       |       CAST(coalesce(sum(fin.n_tok) FILTER (WHERE fin.dropped_at IS NULL
       |                                OR fin.dropped_at > s.stage_idx), 0) AS BIGINT) AS n_tokens
       |FROM stages s, fin
       |GROUP BY s.stage_idx, s.stage
       |ORDER BY s.stage_idx""".stripMargin
  }

  /** DATA CARD — the one-table corpus summary a training run records
    * alongside its snapshot pins (the executable core of "Datasheets for
    * Datasets", Gebru et al. 2021): volume, composition, dedup pressure,
    * quality-gate yield and the rule-filter yield, every value an exact
    * integer so two engines — or two runs — can diff cards cell-for-cell.
    * Each metric is a bounded aggregate unioned into (metric, value) rows;
    * the expensive members (near-dup pairs) come from the shared stores the
    * pipeline already maintains, so the card costs little beyond the
    * aggregates a curation run produces anyway.
    */
  /** The data card's mean-quality row over any (text) relation. The summed
    * DECIMAL(18,6) goes through an explicit `floor` BEFORE the BIGINT cast:
    * Spark's decimal→bigint cast truncates toward zero while DuckDB's
    * rounds half away — a corpus whose summed ppm fraction lands ≥ 0.5
    * would flip the oracle hash without the floor (r9 advisory; the oracle
    * carries the same floor). Spec-pinned on such a corpus.
    */
  private[text] def qualityMeanPpmRow(docs: DataFrame): DataFrame =
    docs.select(TextOps.qualityCol(col("text")).as("q"))
      .agg(expr(
        "cast(floor(sum(cast(q * 1000000 as decimal(18,6)))) as bigint) div count(*)")
        .cast("long").as("value"))
      .select(lit("quality_mean_ppm").as("metric"), col("value"))

  def dataCard(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, sfDir)
    def one(name: String, v: org.apache.spark.sql.Column): DataFrame =
      docs.agg(v.cast("long").as("value")).select(lit(name).as("metric"), col("value"))
    val toks = TextOps.tokens(col("text"))
    val base = Seq(
      one("docs_total", count(lit(1))),
      one("tokens_total", sum(size(toks))),
      one("chars_total", sum(length(col("text")))),
      one("sources_distinct", countDistinct(col("source"))),
      one("langs_distinct", countDistinct(col("lang"))),
      // mean quality through per-row DECIMAL quantization (the dsum rule:
      // a raw double sum's fold order differs across engines and a last-bit
      // wobble would flip the integer cast)
      qualityMeanPpmRow(docs),
      one("quality_gate_kept",
        count(when(TextOps.qualityCol(col("text")) >= QualityThreshold, 1))))
    val pairs = graft.dedup.PairStore.pairsFor(spark, sfDir)
    val dedup = Seq(
      pairs.agg(count(lit(1)).cast("long").as("value"))
        .select(lit("neardup_pairs").as("metric"), col("value")),
      pairs.select(col("id_a").as("d")).unionByName(pairs.select(col("id_b").as("d")))
        .agg(countDistinct("d").cast("long").as("value"))
        .select(lit("neardup_docs").as("metric"), col("value")))
    val gopher = graft.text.FilterRules.gopherRules(spark, sfDir)
      .agg(count(when(col("keep"), 1)).cast("long").as("value"))
      .select(lit("gopher_rules_kept").as("metric"), col("value"))
    (base ++ dedup :+ gopher).reduce(_ unionByName _).orderBy("metric")
  }

  /** INFRA-HEALTH companion to [[dataCard]] (VERDICT r8 #9): the serving
    * stores' freshness/skew signals as the same exact-integer (metric,
    * value) rows, so a training run's card records not just WHAT the corpus
    * is but whether the machinery it was curated through was healthy —
    * stale labels or a drifted index silently change which documents
    * survive. Each metric is a bounded aggregate over an EXISTING store
    * (nothing recomputes corpus state); doubles are floor-quantized to ppm
    * so cards diff cell-for-cell. Emits rows only for the stores passed —
    * the card never guesses at paths. Not SQL-expressible over the raw
    * tables (the values ARE store state), so it is spec-pinned rather than
    * oracle-checked.
    *
    *  - `fp_occupancy_skew_ppm`   hamming-index hot-bucket skew × 1e6
    *     (1e6 = uniform; see [[graft.dedup.FingerprintIndex.occupancySkew]])
    *  - `ivf_drift_ppm`           residual-vs-fit ratio × 1e6 (1e6 = fresh
    *     fit; ≥ ~1.5e6 is the usual recluster trigger)
    *  - `pair_watermark` / `label_watermark` / `pair_label_lag_batches`
    *     pair-segment vs label-snapshot watermarks; lag 0 = every absorbed
    *     pair is reflected in the served dedup decisions (−1 label
    *     watermark = no complete snapshot yet, making the lag `pw + 1`)
    *  - `lattice_lag_sec`         newest raw event second minus newest
    *     materialized rollup second — how far the serving lattice trails
    *     the stream feeding it
    */
  def dataCardHealth(
      spark: SparkSession,
      fpIndex: Option[String] = None,
      ivfIndex: Option[String] = None,
      pairStore: Option[String] = None,
      rollup: Option[(String, String)] = None): DataFrame = {
    import spark.implicits._
    def ppm(v: Double): Long = math.floor(v * 1e6).toLong
    val fp = fpIndex.toSeq.map(p =>
      "fp_occupancy_skew_ppm" -> ppm(graft.dedup.FingerprintIndex.occupancySkew(spark, p)))
    val ivf = ivfIndex.toSeq.map(p =>
      "ivf_drift_ppm" -> ppm(graft.ann.IvfIndex.driftRatio(spark, p)))
    val pair = pairStore.toSeq.flatMap { p =>
      val pw = graft.dedup.PairStore.pairsWatermark(spark, p)
      val lw = graft.dedup.PairStore.labelsWatermark(spark, p).getOrElse(-1L)
      Seq("pair_watermark" -> pw, "label_watermark" -> lw,
        "pair_label_lag_batches" -> (pw - lw))
    }
    val lattice = rollup.toSeq.map { case (rollupPath, sf) =>
      val rawMax = Tables.events(spark, sf)
        .agg(max(col("ts")).as("m")).head().getLong(0) / 1000000000L
      val servedMax = graft.sources.RollupTable.read(spark, rollupPath)
        .agg(max(col("epoch_s")).as("m")).head().getLong(0)
      "lattice_lag_sec" -> (rawMax - servedMax)
    }
    (fp ++ ivf ++ pair ++ lattice).toDF("metric", "value").orderBy("metric")
  }

  val dataCardSql: String =
    s"""WITH ${graft.dedup.DedupOps.jaccardCtes(0.6)},
       |q AS (
       |  SELECT doc_id,
       |         CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
       |           / len(string_split(text, ' ')) * 0.7 +
       |         (1.0 - CAST(len(list_filter(string_split(text, ' '),
       |                                     t -> t = 'the' OR t = 'a')) AS DOUBLE)
       |           / len(string_split(text, ' '))) * 0.3 AS quality
       |  FROM documents),
       |g AS (
       |  SELECT doc_id,
       |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
       |         CAST(length(text) - (len(string_split(text, ' ')) - 1) AS BIGINT) AS n_chars_tok,
       |         CAST((SELECT max(c) FROM (
       |            SELECT count(*) AS c FROM unnest(string_split(text, ' ')) AS u(tok) GROUP BY tok)) AS BIGINT) AS top_cnt,
       |         CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_distinct
       |  FROM documents)
       |SELECT 'chars_total' AS metric, CAST(sum(length(text)) AS BIGINT) AS value FROM documents
       |UNION ALL SELECT 'docs_total', count(*) FROM documents
       |UNION ALL SELECT 'tokens_total', CAST(sum(len(string_split(text, ' '))) AS BIGINT) FROM documents
       |UNION ALL SELECT 'sources_distinct', count(DISTINCT source) FROM documents
       |UNION ALL SELECT 'langs_distinct', count(DISTINCT lang) FROM documents
       |UNION ALL SELECT 'quality_mean_ppm',
       |          CAST(CAST(floor(sum(CAST(quality * 1000000 AS DECIMAL(18,6)))) AS BIGINT) // count(*) AS BIGINT) FROM q
       |UNION ALL SELECT 'quality_gate_kept', count(CASE WHEN quality >= $QualityThreshold THEN 1 END) FROM q
       |UNION ALL SELECT 'neardup_pairs', count(*) FROM pairs
       |UNION ALL SELECT 'neardup_docs', count(DISTINCT d)
       |          FROM (SELECT id_a AS d FROM pairs UNION ALL SELECT id_b FROM pairs)
       |UNION ALL SELECT 'gopher_rules_kept',
       |          count(CASE WHEN n_words BETWEEN ${graft.text.FilterRules.MinWords} AND ${graft.text.FilterRules.MaxWords}
       |                      AND n_chars_tok BETWEEN ${graft.text.FilterRules.MinMeanWordLen} * n_words AND ${graft.text.FilterRules.MaxMeanWordLen} * n_words
       |                      AND top_cnt * 1000000 <= ${graft.text.FilterRules.MaxTopTokenPpm} * n_words
       |                      AND n_distinct * 1000000 >= ${graft.text.FilterRules.MinDistinctPpm} * n_words THEN 1 END) FROM g
       |ORDER BY metric""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_clean_corpus" -> (cleanCorpus(_, _)),
    "q_dataset_split" -> (datasetSplit(_, _)),
    "q_group_split" -> (groupSplit(_, _)),
    "q_vocab_stats" -> (vocabStats(_, _)),
    "q_curation_funnel" -> (curationFunnel(_, _)),
    "q_data_card" -> (dataCard(_, _))
  )

  def oracle: Map[String, String] = Map(
    "q_clean_corpus" -> cleanCorpusSql,
    "q_dataset_split" -> datasetSplitSql,
    "q_group_split" -> groupSplitSql,
    "q_vocab_stats" -> vocabStatsSql,
    "q_curation_funnel" -> curationFunnelSql,
    "q_data_card" -> dataCardSql
  )
}
