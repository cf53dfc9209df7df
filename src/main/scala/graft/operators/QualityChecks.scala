package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Declarative data-quality validation over the warehouse — the Deequ-style
  * (Schelter et al., "Automating Large-Scale Data Quality Verification",
  * VLDB 2018) constraint ledger a production pipeline runs before promoting
  * a batch: completeness, range, consistency, uniqueness and
  * referential-integrity rules, each reduced to a
  * (rule, n_checked, n_violations) row.
  *
  * Scale shape: all of a table's row-level rules fuse into ONE aggregate
  * over that table's scan (each violation count is a conditional-count
  * column, so adding a rule adds a column, not a pass), then explode into
  * ledger rows; uniqueness is a grouped count on the key (the same shuffle
  * a dedup would pay); referential integrity is a broadcast left join when
  * the parent side is dimension-sized. The ledger itself is rules-sized.
  */
object QualityChecks {

  /** One scan → one aggregate → one ledger row per rule. Each rule is
    * (name, violation condition); n_checked is the table's row count.
    */
  private[graft] def tableRules(df: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    val aggs = count(lit(1)).as("n") +:
      rules.zipWithIndex.map { case ((_, cond), i) => count(when(cond, true)).as(s"v_$i") }
    val rows = rules.zipWithIndex.map { case ((name, _), i) =>
      struct(lit(name).as("rule"), col("n").cast("long").as("n_checked"),
        col(s"v_$i").cast("long").as("n_violations"))
    }
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(rows: _*)).as("r"))
      .select("r.*")
  }

  def dqChecks(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = tableRules(Tables.events(spark, sfDir), Seq(
      "events.value_non_negative" -> (col("value") < 0),
      "events.user_id_complete" -> col("user_id").isNull))
    val docs = tableRules(Tables.documents(spark, sfDir), Seq(
      "documents.text_nonempty" -> (col("text").isNull || length(col("text")) === 0),
      "documents.n_chars_consistent" -> (col("n_chars") =!= length(col("text")))))
    val emb = tableRules(Tables.embeddings(spark, sfDir), Seq(
      "embeddings.dim_64" -> (size(col("embedding")) =!= 64)))
    // uniqueness: one grouped count on the candidate key; violations =
    // surplus copies beyond the first
    val uniq = Tables.documents(spark, sfDir)
      .groupBy("doc_id").agg(count(lit(1)).as("c"))
      .agg(
        lit("documents.doc_id_unique").as("rule"),
        sum("c").cast("long").as("n_checked"),
        sum(when(col("c") > 1, col("c") - 1).otherwise(0)).cast("long").as("n_violations"))
    // referential integrity: orphan orders (no matching customer)
    val ri = Tables.orders(spark, sfDir)
      .join(
        broadcast(Tables.customer(spark, sfDir).select(col("c_custkey").as("pk"))),
        col("o_custkey") === col("pk"), "left")
      .agg(
        lit("orders.custkey_in_customer").as("rule"),
        count(lit(1)).cast("long").as("n_checked"),
        count(when(col("pk").isNull, true)).cast("long").as("n_violations"))

    ev.unionByName(docs).unionByName(emb).unionByName(uniq).unionByName(ri)
      .orderBy("rule")
  }

  val dqChecksSql: String =
    """SELECT rule, n_checked, n_violations FROM (
      |  SELECT 'events.value_non_negative' AS rule, count(*) AS n_checked,
      |         count(*) FILTER (value < 0) AS n_violations FROM events
      |  UNION ALL
      |  SELECT 'events.user_id_complete', count(*),
      |         count(*) FILTER (user_id IS NULL) FROM events
      |  UNION ALL
      |  SELECT 'documents.text_nonempty', count(*),
      |         count(*) FILTER (text IS NULL OR length(text) = 0) FROM documents
      |  UNION ALL
      |  SELECT 'documents.n_chars_consistent', count(*),
      |         count(*) FILTER (n_chars <> length(text)) FROM documents
      |  UNION ALL
      |  SELECT 'embeddings.dim_64', count(*),
      |         count(*) FILTER (len(embedding) <> 64) FROM embeddings
      |  UNION ALL
      |  SELECT 'documents.doc_id_unique', CAST(sum(c) AS BIGINT),
      |         CAST(sum(CASE WHEN c > 1 THEN c - 1 ELSE 0 END) AS BIGINT)
      |  FROM (SELECT count(*) AS c FROM documents GROUP BY doc_id)
      |  UNION ALL
      |  SELECT 'orders.custkey_in_customer', count(*),
      |         count(*) FILTER (c.c_custkey IS NULL)
      |  FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey)
      |ORDER BY rule""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_dq_checks" -> (dqChecks(_, _)))

  def oracle: Map[String, String] = Map(
    "q_dq_checks" -> dqChecksSql)
}
