package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.text.TextOps.tokens

/** Link-analysis over a corpus-derived graph: one PageRank power-iteration
  * step (Page et al., "The PageRank Citation Ranking", 1999) on the directed
  * token-adjacency graph (an edge per consecutive token pair, weighted by
  * occurrence count). A web-crawl curation pipeline runs exactly this shape
  * over the hyperlink graph to score source quality; the token graph stands
  * in because the corpus tables carry no links.
  *
  * Scale shape: edge extraction is a narrow per-document transform
  * (`transform(sequence(...))`, no join back to positions); edge weights and
  * out-degrees are grouped sums on the edge/source key; the contribution join
  * is an equi-join on `src` between two vocabulary-sized relations — at
  * 100 TB the grouped edge list is orders of magnitude smaller than the
  * corpus, and the degree side broadcasts. One iteration is the unit a
  * production loop repeats; iterating is a driver-side loop over this plan
  * with a localCheckpoint per round (the [[graft.dedup.DedupOps]] connected-
  * components pattern).
  *
  * Arithmetic is integer-scaled (ppm): starting rank 1.0, the damped update
  * `r' = 0.15 + 0.85 * Σ_in w(u,v)/outdeg(u)` is computed as
  * `150000 + 850 * Σ (w·1e6 div outdeg) div 1000` — floor division both
  * engines, bit-identical (the STATE.md determinism contract).
  */
object GraphOps {

  /** Weighted directed bigram edges: (src, dst, w). */
  private def edges(spark: SparkSession, sfDir: String): DataFrame =
    // NOT fanned (r16, measured): bigram struct explode is cheap per byte —
    // A/B on/off = 1.19 (q_pagerank_step); exchange overhead dominates
    Tables.documents(spark, sfDir)
      .select(tokens(col("text")).as("t"))
      // sequence(1, 0) would run DESCENDING in Spark; single-token docs must
      // be dropped before the transform, matching DuckDB's empty series
      .filter(size(col("t")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, size(t) - 1), " +
          "i -> struct(element_at(t, i) AS src, element_at(t, i + 1) AS dst))")).as("e"))
      .groupBy(col("e.src").as("src"), col("e.dst").as("dst"))
      .agg(count(lit(1)).as("w"))

  /** One damped PageRank step from uniform rank 1.0, ppm-scaled. */
  def pagerankStep(spark: SparkSession, sfDir: String): DataFrame = {
    val e = edges(spark, sfDir)
    val outdeg = e.groupBy(col("src").as("u")).agg(sum("w").as("outdeg"))
    e.join(outdeg, e("src") === outdeg("u"))
      .select(col("dst"), expr("(w * 1000000) div outdeg").as("contrib_ppm"))
      .groupBy(col("dst").as("word"))
      .agg(sum("contrib_ppm").as("in_ppm"))
      .select(
        col("word"),
        expr("CAST(150000 + (850 * in_ppm) div 1000 AS BIGINT)").as("rank_ppm"))
      .orderBy(desc("rank_ppm"), asc("word"))
  }

  val pagerankStepSql: String =
    """WITH toks AS (
      |  SELECT string_split(text, ' ') AS t FROM documents),
      |bigrams AS (
      |  SELECT unnest(list_transform(generate_series(1, len(t) - 1),
      |                               i -> t[i] || ' ' || t[i + 1])) AS b
      |  FROM toks),
      |e AS (
      |  SELECT string_split(b, ' ')[1] AS src, string_split(b, ' ')[2] AS dst,
      |         count(*) AS w
      |  FROM bigrams GROUP BY 1, 2),
      |outdeg AS (
      |  SELECT src AS u, sum(w) AS outdeg FROM e GROUP BY 1),
      |contrib AS (
      |  SELECT e.dst, (e.w * 1000000) // o.outdeg AS contrib_ppm
      |  FROM e JOIN outdeg o ON e.src = o.u)
      |SELECT dst AS word,
      |       CAST(150000 + (850 * sum(contrib_ppm)) // 1000 AS BIGINT) AS rank_ppm
      |FROM contrib
      |GROUP BY 1
      |ORDER BY rank_ppm DESC, word""".stripMargin

  /** Default power-iteration horizon for [[pagerankIter]] — enough steps for
    * rank mass to propagate 3 hops, small enough that the unrolled oracle SQL
    * stays readable.
    */
  val PagerankIters = 3

  /** PageRank iterated to a fixed horizon — the production form of
    * [[pagerankStep]]: a driver-side loop over the one-step plan with a
    * `localCheckpoint` per round (the connected-components pattern from
    * [[graft.dedup.DedupOps]]; without it the join lineage grows linearly and
    * the final plan re-executes every round from scratch). The loop state is
    * one vocabulary-sized (word, rank) relation; edges and out-degrees are
    * computed once and checkpointed. At 100 TB the corpus scan happens once
    * (edge extraction); every iteration after that touches only the grouped
    * edge list — the exact shape GraphX/Pregel executes, declared as plain
    * DataFrame joins so Catalyst keeps the aggregation partial.
    *
    * Same ppm integer arithmetic as [[pagerankStep]] (`r' = 150000 +
    * 850·Σ (r·w div outdeg) div 1000`, floor division at every step), so the
    * K-step result is bit-identical to the oracle's unrolled K-CTE chain.
    */
  def pagerankIter(spark: SparkSession, sfDir: String, iters: Int = PagerankIters): DataFrame = {
    val e = edges(spark, sfDir).localCheckpoint()
    val outdeg = e.groupBy(col("src").as("u")).agg(sum("w").as("outdeg")).localCheckpoint()
    val verts = e.select(col("src").as("word"))
      .union(e.select(col("dst").as("word")))
      .distinct()
      .localCheckpoint()
    var ranks = verts.select(col("word"), lit(1000000L).as("rank_ppm"))
    for (_ <- 1 to iters) {
      val contribs = e
        .join(outdeg, e("src") === outdeg("u"))
        .join(ranks.select(col("word").as("rw"), col("rank_ppm").as("r_src")),
          col("src") === col("rw"))
        .select(col("dst"), expr("(r_src * w) div outdeg").as("contrib_ppm"))
        .groupBy(col("dst"))
        .agg(sum("contrib_ppm").as("in_ppm"))
      ranks = verts
        .join(contribs, verts("word") === contribs("dst"), "left")
        .select(verts("word"),
          expr("CAST(150000 + (850 * coalesce(in_ppm, 0)) div 1000 AS BIGINT)")
            .as("rank_ppm"))
        .localCheckpoint()
    }
    ranks.orderBy(desc("rank_ppm"), asc("word"))
  }

  /** Oracle: the same K steps unrolled as chained CTEs (r0 → r1 → … → rK). */
  def pagerankIterSql(iters: Int = PagerankIters): String = {
    val steps = (1 to iters).map { k =>
      s"""r$k AS (
         |  SELECT v.word,
         |         CAST(150000 + (850 * coalesce(s.in_ppm, 0)) // 1000 AS BIGINT) AS rank_ppm
         |  FROM verts v LEFT JOIN (
         |    SELECT e.dst, sum((r.rank_ppm * e.w) // o.outdeg) AS in_ppm
         |    FROM e JOIN outdeg o ON e.src = o.u JOIN r${k - 1} r ON r.word = e.src
         |    GROUP BY 1) s ON v.word = s.dst)""".stripMargin
    }.mkString(",\n")
    s"""WITH toks AS (
       |  SELECT string_split(text, ' ') AS t FROM documents),
       |bigrams AS (
       |  SELECT unnest(list_transform(generate_series(1, len(t) - 1),
       |                               i -> t[i] || ' ' || t[i + 1])) AS b
       |  FROM toks),
       |e AS (
       |  SELECT string_split(b, ' ')[1] AS src, string_split(b, ' ')[2] AS dst,
       |         count(*) AS w
       |  FROM bigrams GROUP BY 1, 2),
       |outdeg AS (
       |  SELECT src AS u, sum(w) AS outdeg FROM e GROUP BY 1),
       |verts AS (
       |  SELECT src AS word FROM e UNION SELECT dst FROM e),
       |r0 AS (
       |  SELECT word, CAST(1000000 AS BIGINT) AS rank_ppm FROM verts),
       |$steps
       |SELECT word, rank_ppm FROM r$iters
       |ORDER BY rank_ppm DESC, word""".stripMargin
  }

  // -------------------------------------------------------------------------
  // Corpus bigram-LM document scoring
  // -------------------------------------------------------------------------

  /** Document fluency under the corpus's own bigram language model — the
    * KenLM-perplexity-style filter (CCNet, Wenzek et al. 2020) with the LM
    * trained on the corpus itself. Per bigram occurrence the MLE conditional
    * `p(dst|src) = count(src,dst) / count(src,·)`; the per-document score is
    * the arithmetic mean over its bigram occurrences, ppm-scaled with floor
    * division at each step so both engines agree bit-for-bit (no log — the
    * monotone mean-probability form keeps the arithmetic integer).
    *
    * Scale shape: the "model" (grouped bigram counts + out-degrees) is
    * vocabulary-bounded and broadcasts; the document side is a narrow
    * explode → two broadcast joins → per-doc sum. Training and scoring are
    * the same two aggregates a real count-LM pipeline runs.
    */
  def bigramLmScore(spark: SparkSession, sfDir: String): DataFrame = {
    // doc_id fan-out (r16): the per-doc bigram explode parallelizes and the
    // groupBy(doc_id) after the broadcast model join reuses the exchange
    val docBigrams = Tables.documentsDerive(spark, sfDir, Seq(col("doc_id")))
      .select(col("doc_id"), tokens(col("text")).as("t"))
      .filter(size(col("t")) >= 2)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(1, size(t) - 1), " +
          "i -> struct(element_at(t, i) AS src, element_at(t, i + 1) AS dst))")).as("e"))
      .select(col("doc_id"), col("e.src").as("src"), col("e.dst").as("dst"))
    val model = edges(spark, sfDir)
    val outdeg = model.groupBy(col("src").as("u")).agg(sum("w").as("outdeg"))
    val scored = model.join(outdeg, model("src") === outdeg("u"))
      .select(col("src"), col("dst"), expr("(w * 1000000) div outdeg").as("p_ppm"))
    docBigrams
      .join(broadcast(scored), Seq("src", "dst"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"), sum("p_ppm").as("total_ppm"))
      .select(
        col("doc_id"), col("n_bigrams"),
        expr("total_ppm div n_bigrams").as("avg_cond_ppm"))
      .orderBy("doc_id")
  }

  val bigramLmScoreSql: String =
    """WITH toks AS (
      |  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |occ AS (
      |  SELECT doc_id,
      |         unnest(list_transform(generate_series(1, len(t) - 1),
      |                               i -> t[i] || ' ' || t[i + 1])) AS b
      |  FROM toks),
      |e AS (SELECT b, count(*) AS w FROM occ GROUP BY 1),
      |outdeg AS (
      |  SELECT string_split(b, ' ')[1] AS u, sum(w) AS outdeg FROM e GROUP BY 1),
      |model AS (
      |  SELECT e.b, (e.w * 1000000) // o.outdeg AS p_ppm
      |  FROM e JOIN outdeg o ON string_split(e.b, ' ')[1] = o.u)
      |SELECT occ.doc_id,
      |       count(*) AS n_bigrams,
      |       CAST(sum(m.p_ppm) // count(*) AS BIGINT) AS avg_cond_ppm
      |FROM occ JOIN model m ON occ.b = m.b
      |GROUP BY 1
      |ORDER BY doc_id""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_pagerank_step" -> (pagerankStep(_, _)),
    "q_pagerank_iter" -> (pagerankIter(_, _)),
    "q_bigram_lm" -> (bigramLmScore(_, _))
  )

  def oracle: Map[String, String] = Map(
    "q_pagerank_step" -> pagerankStepSql,
    "q_pagerank_iter" -> pagerankIterSql(),
    "q_bigram_lm" -> bigramLmScoreSql
  )
}
