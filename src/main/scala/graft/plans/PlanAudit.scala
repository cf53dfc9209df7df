package graft.plans

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan, WholeStageCodegenExec}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.execution.exchange.{BroadcastExchangeExec, ShuffleExchangeExec}
import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, BroadcastNestedLoopJoinExec, CartesianProductExec, ShuffledHashJoinExec, SortMergeJoinExec}
import org.apache.spark.sql.types.{IntegerType, StringType, StructField, StructType}

/** "Explain as data": walk a query's EXECUTED physical plan and emit one row
  * per scale-relevant operator — scans (with pushed filters and the pruned
  * read schema), exchanges (shuffle/broadcast), join strategies, and
  * whole-stage-codegen spans. This is the audit a 100 TB deployment runs
  * before promoting a query: "did my filter reach the scan, how many
  * shuffles does this cost, which side broadcast, is anything cartesian" —
  * answered as a DataFrame instead of by eyeballing `.explain` text, so it
  * can be asserted in CI (ScaleSpec does exactly that) or aggregated over a
  * whole query catalog.
  *
  * The walk unwraps AQE nodes (AdaptiveSparkPlanExec/QueryStageExec) so the
  * counts reflect the FINAL adaptive plan — run the query (or at least
  * `df.collect()`) first if runtime re-planning matters.
  */
object PlanAudit {

  val schema: StructType = StructType(Seq(
    StructField("op", StringType, nullable = false),
    StructField("kind", StringType, nullable = false),
    StructField("detail", StringType, nullable = true),
    StructField("depth", IntegerType, nullable = false)))

  /** Fully unwrap adaptive wrappers to the concrete physical operator. */
  private def unwrap(p: SparkPlan): SparkPlan = p match {
    case a: AdaptiveSparkPlanExec => unwrap(a.executedPlan)
    case q: QueryStageExec        => unwrap(q.plan)
    case other                    => other
  }

  private def children(p: SparkPlan): Seq[SparkPlan] =
    p.children ++ p.subqueries

  private def walk(p0: SparkPlan, depth: Int): Seq[Row] = {
    val p = unwrap(p0)
    val here: Seq[Row] = p match {
      case s: FileSourceScanExec =>
        val pushed = s.metadata.getOrElse("PushedFilters", "[]")
        val read = s.metadata.getOrElse("ReadSchema", "")
        Seq(
          Row(p.nodeName, "scan", s"pushed=$pushed", depth),
          Row(p.nodeName, "scan_schema", read, depth))
      case s: BatchScanExec =>
        Seq(Row(p.nodeName, "scan", s.simpleString(120), depth))
      case e: ShuffleExchangeExec =>
        Seq(Row(p.nodeName, "shuffle", e.outputPartitioning.toString, depth))
      case e: BroadcastExchangeExec =>
        Seq(Row(p.nodeName, "broadcast", e.mode.getClass.getSimpleName, depth))
      case j: BroadcastHashJoinExec =>
        Seq(Row(p.nodeName, "join", s"broadcast-hash ${j.joinType} build=${j.buildSide}", depth))
      case j: ShuffledHashJoinExec =>
        Seq(Row(p.nodeName, "join", s"shuffled-hash ${j.joinType} build=${j.buildSide}", depth))
      case j: SortMergeJoinExec =>
        Seq(Row(p.nodeName, "join", s"sort-merge ${j.joinType}", depth))
      case j: BroadcastNestedLoopJoinExec =>
        Seq(Row(p.nodeName, "join", s"bnlj ${j.joinType} build=${j.buildSide}", depth))
      case _: CartesianProductExec =>
        Seq(Row(p.nodeName, "join", "cartesian", depth))
      case w: org.apache.spark.sql.execution.window.WindowExec =>
        // partitionBy=0 is the scale red flag: the whole frame sorts
        // through one task
        Seq(Row(p.nodeName, "window", s"partitionBy=${w.partitionSpec.length}", depth))
      case w: WholeStageCodegenExec =>
        Seq(Row(p.nodeName, "codegen", s"stage ${w.codegenStageId}", depth))
      case _ => Seq.empty
    }
    here ++ children(p).flatMap(walk(_, depth + 1))
  }

  /** Audit rows for the (finalized) physical plan of `df`. */
  def audit(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val rows = walk(df.queryExecution.executedPlan, 0)
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), schema)
  }

  /** One-row summary: operator counts a CI gate can threshold on. */
  def summary(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    audit(df)
      .groupBy()
      .agg(
        sum(when(col("kind") === "scan", 1).otherwise(0)).cast("int").as("n_scans"),
        sum(when(col("kind") === "shuffle", 1).otherwise(0)).cast("int").as("n_shuffles"),
        sum(when(col("kind") === "broadcast", 1).otherwise(0)).cast("int").as("n_broadcasts"),
        sum(when(col("detail") === "cartesian", 1).otherwise(0)).cast("int").as("n_cartesian"),
        sum(when(col("kind") === "codegen", 1).otherwise(0)).cast("int").as("n_codegen_stages"))
  }

  /** Convenience for the spark-shell: audit a SQL string in one call. */
  def auditSql(spark: SparkSession, sql: String): DataFrame = audit(spark.sql(sql))
}
