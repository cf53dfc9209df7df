package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference, Cast, Expression, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, Count, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** Rollup-aware aggregate routing (SURVEY.md §4 "materialized
  * pre-aggregation"): Druid answers dashboard aggregates from its ingest-time
  * rollup automatically; in Spark that takes a plan rewrite. This optimizer
  * rule (installed through the public `spark.experimental.extraOptimizations`
  * hook; a deployment would wire the same rule via
  * `SparkSessionExtensions.injectOptimizerRule`) rewrites
  *
  *   Aggregate(groupings ⊆ {house_id, appliance_id, appliance_name},
  *             aggs ∈ {count(*) / count(power), sum(power)},
  *             Project chain over the raw events parquet relation)
  *
  * onto the materialized rollup table registered as `powerraw_rollup`
  * (schema: epoch_s, house_id, appliance_id, appliance_name, cnt,
  * sum_power_dec): counts become sum(cnt), sum(power) becomes
  * sum(sum_power_dec) cast to the original result type — exact, because the
  * rollup keeps DECIMAL sums. Output attribute ids are preserved so parent
  * operators are untouched.
  *
  * Scope is deliberately conservative: any filter between the aggregate and
  * the scan, any unknown aggregate function, or any grouping that is not a
  * rollup-served column leaves the plan unchanged (correct-but-unoptimized
  * beats wrong-and-fast). The rewrite fires only when the projected raw view
  * exposes this engine's PowerReading schema (house_id/appliance_id/power
  * aliases over the events table).
  */
class RollupRewrite(spark: SparkSession) extends Rule[LogicalPlan] {

  val RollupViewName = "powerraw_rollup"

  private val servedKeys = Set("house_id", "appliance_id", "appliance_name", "epoch_s")

  private def rollupPlan(): Option[LogicalPlan] =
    try Some(spark.table(RollupViewName).queryExecution.optimizedPlan)
    catch { case _: Exception => None }

  /** Project-only chain ending at the raw events parquet relation whose
    * surviving output (column pruning may have removed most of it) stays
    * within the PowerReading schema — i.e. this subtree is (a pruning of)
    * the engine's raw power view. A Filter anywhere rejects the chain.
    */
  private val powerReadingCols =
    Set("event_id", "ts_ns", "epoch_s", "time", "house_id", "appliance_id", "appliance_name", "power")

  private def isPowerRawChain(p: LogicalPlan): Boolean = {
    def chain(q: LogicalPlan): Boolean = q match {
      case l: LogicalRelation =>
        l.relation match {
          case fs: HadoopFsRelation =>
            fs.location.rootPaths.exists(_.toString.endsWith("events.parquet"))
          case _ => false
        }
      case pr: Project => chain(pr.child)
      case _ => false
    }
    chain(p) && p.output.map(_.name).toSet.subsetOf(powerReadingCols)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case agg @ Aggregate(groups, aggExprs, child, _) if isPowerRawChain(child) =>
      rollupPlan()
        .flatMap(tryRewrite(groups, aggExprs, _))
        .getOrElse(agg)
  }

  private def tryRewrite(
      groups: Seq[Expression],
      aggExprs: Seq[NamedExpression],
      rollup: LogicalPlan): Option[LogicalPlan] = {
    val rollupAttr: Map[String, Attribute] = rollup.output.map(a => a.name -> a).toMap
    if (!servedKeys.forall(rollupAttr.contains) ||
      !rollupAttr.contains("cnt") || !rollupAttr.contains("sum_power_dec")) return None

    val groupOk = groups.forall {
      case a: AttributeReference => servedKeys.contains(a.name)
      case _ => false
    }
    if (!groupOk) return None

    def rewriteNamed(ne: NamedExpression): Option[NamedExpression] = ne match {
      case a: AttributeReference if servedKeys.contains(a.name) =>
        Some(Alias(rollupAttr(a.name), a.name)(exprId = a.exprId))
      case al @ Alias(AggregateExpression(f, Complete, false, None, _), name) =>
        val rewritten: Option[Expression] = f match {
          // count(*) / count(lit) / count(power): the raw view's power is
          // never null, so every form collapses to sum(cnt)
          case Count(args) if args.forall {
                case _: Literal => true
                case a: AttributeReference => a.name == "power" || servedKeys.contains(a.name)
                case _ => false
              } =>
            Some(Cast(Sum(rollupAttr("cnt")).toAggregateExpression(), al.dataType))
          case Sum(a: AttributeReference, _) if a.name == "power" =>
            Some(Cast(Sum(rollupAttr("sum_power_dec")).toAggregateExpression(), al.dataType))
          case _ => None
        }
        rewritten.map(e => Alias(e, name)(exprId = al.exprId))
      case _ => None
    }

    val newAggExprs = aggExprs.map(rewriteNamed)
    if (newAggExprs.exists(_.isEmpty)) return None
    val newGroups = groups.map { case a: AttributeReference => rollupAttr(a.name): Expression }
    Some(Aggregate(newGroups, newAggExprs.map(_.get), rollup))
  }
}

object RollupRewrite {
  /** Register the rollup view and install the rule (idempotent). */
  def install(spark: SparkSession, rollupPath: String): Unit = {
    spark.read.parquet(rollupPath)
      .createOrReplaceTempView("powerraw_rollup")
    if (!spark.experimental.extraOptimizations.exists(_.isInstanceOf[RollupRewrite])) {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ new RollupRewrite(spark)
    }
  }

  def uninstall(spark: SparkSession): Unit =
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations.filterNot(_.isInstanceOf[RollupRewrite])
}
