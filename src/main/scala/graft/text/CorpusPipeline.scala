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

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_clean_corpus" -> (cleanCorpus(_, _))
  )

  def oracle: Map[String, String] = Map(
    "q_clean_corpus" -> cleanCorpusSql
  )
}
