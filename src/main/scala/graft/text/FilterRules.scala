package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Rule-based document filters and a count-based language-model scorer —
  * the two filter families every public pretraining recipe layers on top of
  * dedup (Gopher's quality heuristics, Rae et al. 2021 §A1.1; C4's line
  * rules, Raffel et al. 2020; CCNet's LM-perplexity gate, Wenzek et al.
  * 2020), re-expressed as single-pass columnar plans.
  *
  * Everything here is exact integer/ratio arithmetic — no floats beyond
  * final ratios, no log() (cross-engine libm last-bit drift would break the
  * oracle hash), so both engines agree bit-for-bit.
  */
object FilterRules {

  // Gopher-style rule thresholds, scaled to the synthetic corpus (real
  // deployments read these from config; the PLAN is threshold-independent).
  val MinWords = 5
  val MaxWords = 1000
  val MinMeanWordLen = 2
  val MaxMeanWordLen = 12
  /** Max fraction (ppm) of tokens that repeat the doc's most frequent
    * token — Gopher's "fraction of duplicate n-grams" at n = 1.
    */
  val MaxTopTokenPpm = 300000L
  /** Min fraction (ppm) of distinct tokens. */
  val MinDistinctPpm = 200000L

  /** Per-document Gopher-style rule flags, one row per doc with each rule's
    * pass/fail plus the overall verdict — kept as separate columns (not a
    * pre-folded boolean) because curation pipelines tune and ablate rules
    * independently. One pass over the corpus: every statistic derives from
    * the token array inside a single projection (no explode, no shuffle —
    * embarrassingly parallel at 100 TB), using exact integer ppm ratios.
    */
  def gopherRules(spark: SparkSession, sfDir: String): DataFrame = {
    // tokenize once into a real column — split(text) referenced inside the
    // nested lambdas below would re-run per element (see bigramsOf)
    val toks = col("toks")
    val nTok = size(toks).cast("long")
    // total characters across tokens (text length minus separators)
    val charSum = (length(col("text")) - (nTok - 1)).cast("long")
    // top-token count AND distinct count in ONE O(n log n) pass: sort the
    // tokens, then a linear run-length aggregate tracks the longest run
    // (= max frequency) and the number of runs (= distinct tokens). The r8
    // form — array_max over per-distinct-token filter() — was
    // O(n_distinct × n_tokens) per ROW: invisible at ~54 tokens/doc, ~30M
    // comparisons for a 10k-token page with 3k distinct tokens (the bench's
    // longdoc probe pins this cost class). First element: prev is NULL, so
    // `t === prev` is NULL and both whens fall to their otherwise branch.
    val scan = aggregate(
      array_sort(toks),
      struct(
        lit(null).cast("string").as("prev"), lit(0L).as("run"),
        lit(0L).as("best"), lit(0L).as("nd")),
      (acc, t) => {
        val run = when(t === acc.getField("prev"), acc.getField("run") + 1L)
          .otherwise(lit(1L))
        struct(
          t.as("prev"), run.as("run"),
          greatest(acc.getField("best"), run).as("best"),
          (acc.getField("nd") +
            when(t === acc.getField("prev"), 0L).otherwise(1L)).as("nd"))
      })
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"), TextOps.tokens(col("text")).as("toks"))
      .select(col("doc_id"), col("text"), col("toks"), scan.as("scan"))
      .select(
        col("doc_id"),
        nTok.as("n_words"),
        charSum.as("n_chars_tok"),
        col("scan.best").as("top_token_cnt"),
        col("scan.nd").as("n_distinct"))
      .select(
        col("doc_id"), col("n_words"),
        (col("n_words") >= MinWords && col("n_words") <= MaxWords).as("ok_words"),
        (col("n_chars_tok") >= col("n_words") * MinMeanWordLen &&
          col("n_chars_tok") <= col("n_words") * MaxMeanWordLen).as("ok_word_len"),
        (col("top_token_cnt") * 1000000L <= col("n_words") * MaxTopTokenPpm)
          .as("ok_top_token"),
        (col("n_distinct") * 1000000L >= col("n_words") * MinDistinctPpm)
          .as("ok_distinct"))
      .withColumn("keep",
        col("ok_words") && col("ok_word_len") && col("ok_top_token") && col("ok_distinct"))
      .orderBy("doc_id")
  }

  val gopherRulesSql: String =
    s"""WITH t AS (
       |  SELECT doc_id, string_split(text, ' ') AS toks,
       |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
       |         CAST(length(text) - (len(string_split(text, ' ')) - 1) AS BIGINT) AS n_chars_tok
       |  FROM documents),
       |s AS (
       |  SELECT doc_id, n_words, n_chars_tok,
       |         CAST((SELECT max(c) FROM (
       |            SELECT count(*) AS c FROM unnest(toks) AS u(tok) GROUP BY tok)) AS BIGINT)
       |           AS top_token_cnt,
       |         CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct
       |  FROM t)
       |SELECT doc_id, n_words,
       |       n_words >= $MinWords AND n_words <= $MaxWords AS ok_words,
       |       n_chars_tok >= $MinMeanWordLen * n_words
       |         AND n_chars_tok <= $MaxMeanWordLen * n_words AS ok_word_len,
       |       top_token_cnt * 1000000 <= $MaxTopTokenPpm * n_words AS ok_top_token,
       |       n_distinct * 1000000 >= $MinDistinctPpm * n_words AS ok_distinct,
       |       (n_words >= $MinWords AND n_words <= $MaxWords)
       |         AND (n_chars_tok >= $MinMeanWordLen * n_words
       |              AND n_chars_tok <= $MaxMeanWordLen * n_words)
       |         AND top_token_cnt * 1000000 <= $MaxTopTokenPpm * n_words
       |         AND n_distinct * 1000000 >= $MinDistinctPpm * n_words AS keep
       |FROM s ORDER BY doc_id""".stripMargin

  /** N-gram width for [[dupNgramCoverage]]. */
  val DupNgramN = 3

  /** Gopher's "fraction of characters in duplicate n-grams", in token form:
    * the ppm fraction of a document's token POSITIONS covered by any n-gram
    * occurring ≥ 2 times within the document — the within-doc repetition
    * signal [[gopherRules]]' top-token rule cannot see (a looping paragraph
    * repeats no single token often, but its trigrams all duplicate).
    * Coverage is the UNION of the duplicated grams' position spans
    * (overlaps counted once), so the fraction is a true ≤ 1 ratio.
    *
    * Shape: grams explode once with their position, per-doc gram counts are
    * map-side combinable, the join back is on (doc_id, gram) — the same
    * compress-then-probe discipline as the shingle family — and the span
    * union is a per-doc distinct over exploded positions (bounded by doc
    * length × n).
    */
  def dupNgramCoverage(spark: SparkSession, sfDir: String, n: Int = DupNgramN): DataFrame = {
    val toksDf = Tables.documents(spark, sfDir)
      .select(col("doc_id"), TextOps.tokens(col("text")).as("toks"))
      .filter(size(col("toks")) >= n)
    val base = toksDf.select(col("doc_id"), size(col("toks")).cast("long").as("n_tokens"))
    val grams = toksDf.select(
      col("doc_id"),
      explode(transform(sequence(lit(0), size(col("toks")) - n),
        p => struct(p.as("pos"),
          array_join(slice(col("toks"), p + 1, lit(n)), " ").as("g")))).as("pg"))
      .select(col("doc_id"), col("pg.pos"), col("pg.g"))
    val dup = grams.groupBy("doc_id", "g")
      .agg(count(lit(1)).as("c")).filter(col("c") >= 2)
      .select("doc_id", "g")
    val covered = grams.join(dup, Seq("doc_id", "g"))
      .select(col("doc_id"), explode(sequence(col("pos"), col("pos") + (n - 1))).as("i"))
      .groupBy("doc_id").agg(countDistinct("i").as("n_dup_covered"))
    base.join(covered, Seq("doc_id"), "left")
      .select(
        col("doc_id"), col("n_tokens"),
        coalesce(col("n_dup_covered"), lit(0L)).as("n_dup_covered"),
        expr("1000000 * coalesce(n_dup_covered, 0) div n_tokens").as("dup_frac_ppm"))
      .orderBy("doc_id")
  }

  def dupNgramCoverageSql(n: Int = DupNgramN): String =
    s"""WITH t AS (
       |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
       |  WHERE len(string_split(text, ' ')) >= $n),
       |g AS (
       |  SELECT doc_id, p.p AS pos,
       |         array_to_string(list_slice(toks, p.p + 1, p.p + $n), ' ') AS g
       |  FROM t, LATERAL (SELECT unnest(generate_series(0, len(toks) - $n)) AS p) p),
       |d AS (SELECT doc_id, g FROM g GROUP BY 1, 2 HAVING count(*) >= 2),
       |cov AS (
       |  SELECT g.doc_id, count(DISTINCT ii.i) AS n_cov
       |  FROM g JOIN d USING (doc_id, g),
       |       LATERAL (SELECT unnest(generate_series(g.pos, g.pos + ${n - 1})) AS i) ii
       |  GROUP BY 1)
       |SELECT t.doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
       |       CAST(coalesce(n_cov, 0) AS BIGINT) AS n_dup_covered,
       |       CAST(1000000 * coalesce(n_cov, 0) // len(toks) AS BIGINT) AS dup_frac_ppm
       |FROM t LEFT JOIN cov USING (doc_id)
       |ORDER BY doc_id""".stripMargin

  // -------------------------------------------------------------------------
  // Count-based LM coherence scorer (the CCNet gate without the float LM)
  // -------------------------------------------------------------------------

  /** Laplace pseudo-count for the transition model. */
  val LmSmoothK = 1

  /** Per-document mean bigram transition probability, in exact ppm: the
    * corpus-level bigram model P(w2|w1) = (c(w1,w2)+k)/(c(w1·)+k·V) is fit
    * over ALL documents (two grouped counts — map-side combinable,
    * vocabulary-sized results), then each document scores as the integer
    * mean of its transitions' ppm probabilities. CCNet's insight with a
    * count model instead of a float LM: documents whose word-to-word
    * transitions are corpus-typical score high; shuffled/garbage text
    * scores near the smoothing floor. No log(): integer ppm survives the
    * cross-engine hash compare where libm's last bit would not.
    *
    * Scale shape: transitions explode once (corpus-token-sized, the same
    * volume every shingle operator handles), both model tables compress to
    * vocabulary size before the broadcast-sized join back, and the per-doc
    * mean is one grouped aggregate.
    */
  /** The (doc_id, w1, w2) transition stream of a (doc_id, text) relation —
    * shared by training, batch scoring and the streaming sink so the three
    * cannot drift.
    */
  private def bigramsOf(docs: DataFrame): DataFrame = {
    // tokenize ONCE into a materialized array column before the lambda:
    // referencing split(text) inside the transform re-evaluates the split
    // per element (no CSE across a LambdaFunction boundary) — measured
    // 4.8 s for a 266k-transition explode before this hoist, ~0.3 s after
    val toks = col("toks")
    docs.select(col("doc_id"), TextOps.tokens(col("text")).as("toks"))
      .select(
        col("doc_id"),
        explode(when(size(toks) > 1,
          transform(sequence(lit(1), size(toks) - 1),
            i => struct(element_at(toks, i).as("w1"), element_at(toks, i + 1).as("w2"))))
          .otherwise(array().cast("array<struct<w1:string,w2:string>>"))).as("bg"))
      .select(col("doc_id"), col("bg.w1"), col("bg.w2"))
  }

  /** Fit the transition model over the corpus: (w1, w2, p_ppm),
    * vocabulary-sized and lineage-truncated — frozen model state a
    * long-lived scoring stream can broadcast per micro-batch.
    */
  def lmModel(spark: SparkSession, sfDir: String): DataFrame = {
    // fan-out (r16): the bigram explode otherwise runs single-task locally
    val base = bigramsOf(Tables.documentsDerive(spark, sfDir))
    // pairCnt is VOCABULARY-sized (bigram types) and feeds three consumers
    // (head counts, vocab size, the model join) — materialize it once
    // rather than re-deriving the corpus-sized explode per consumer
    // (measured: 4 parquet scans → 2, no ReusedExchange fires here because
    // the aggregate and join exchanges differ in schema)
    val pairCnt = base.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
      .localCheckpoint()
    val headCnt = pairCnt.groupBy("w1").agg(sum("c12").as("c1"))
    val vocab = pairCnt.agg(countDistinct("w2").as("v"))
    // NO broadcast hint on the model: bigram TYPES can approach corpus
    // scale — Catalyst/AQE picks broadcast only when the model actually
    // fits
    pairCnt.join(headCnt, "w1").crossJoin(broadcast(vocab))
      .select(col("w1"), col("w2"),
        expr(s"(1000000 * (c12 + $LmSmoothK)) div (c1 + $LmSmoothK * v)").as("p_ppm"))
      .localCheckpoint()
  }

  /** Score ANY (doc_id, text) relation under a frozen model — unseen
    * transitions contribute nothing (they are absent from the join), the
    * same out-of-model semantics the batch query has.
    */
  def lmScore(docs: DataFrame, model: DataFrame): DataFrame =
    bigramsOf(docs.select("doc_id", "text")).join(model, Seq("w1", "w2"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_transitions"), expr("sum(p_ppm) div count(*)").as("score_ppm"))
      .select(col("doc_id"), col("n_transitions"),
        col("score_ppm").cast("long").as("score_ppm"))

  def lmTransitionScore(spark: SparkSession, sfDir: String): DataFrame =
    lmScore(Tables.documentsDerive(spark, sfDir, Seq(col("doc_id"))), lmModel(spark, sfDir))
      .orderBy("doc_id")

  /** Streaming inference with the frozen transition model — the
    * [[QualityClassifier.scoringSink]] discipline: replay-idempotent
    * `batch=<id>` score segments, no streaming state (a broadcast-able
    * model join per micro-batch).
    */
  def lmScoringSink(
      docsStream: DataFrame, model: DataFrame, outPath: String, checkpoint: String)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    docsStream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        lmScore(batch, model).write.mode("overwrite").parquet(s"$outPath/batch=$batchId")
      }

  val lmTransitionScoreSql: String =
    s"""WITH base AS (
       |  SELECT doc_id,
       |         toks[i] AS w1, toks[i+1] AS w2
       |  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
       |       LATERAL (SELECT unnest(generate_series(1, len(toks) - 1)) AS i) t
       |  WHERE len(toks) > 1),
       |pc AS (SELECT w1, w2, count(*) AS c12 FROM base GROUP BY 1, 2),
       |hc AS (SELECT w1, sum(c12) AS c1 FROM pc GROUP BY 1),
       |v AS (SELECT count(DISTINCT w2) AS v FROM pc),
       |model AS (
       |  SELECT pc.w1, pc.w2,
       |         (1000000 * (c12 + $LmSmoothK)) // (c1 + $LmSmoothK * (SELECT v FROM v)) AS p_ppm
       |  FROM pc JOIN hc ON pc.w1 = hc.w1)
       |SELECT b.doc_id, count(*) AS n_transitions,
       |       CAST(sum(p_ppm) // count(*) AS BIGINT) AS score_ppm
       |FROM base b JOIN model m ON b.w1 = m.w1 AND b.w2 = m.w2
       |GROUP BY b.doc_id ORDER BY b.doc_id""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_gopher_rules" -> (gopherRules(_, _)),
    "q_dup_ngram_coverage" -> (dupNgramCoverage(_, _)),
    "q_lm_transition_score" -> (lmTransitionScore(_, _))
  )

  def oracle: Map[String, String] = Map(
    "q_gopher_rules" -> gopherRulesSql,
    "q_dup_ngram_coverage" -> dupNgramCoverageSql(),
    "q_lm_transition_score" -> lmTransitionScoreSql
  )
}
