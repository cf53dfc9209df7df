package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Alias, And, Attribute, AttributeReference, BinaryComparison, Cast, Coalesce, Concat, Divide, ExprId, Expression, GreaterThan, GreaterThanOrEqual, If, In, IntegralDivide, IsNotNull, LessThan, LessThanOrEqual, Literal, NamedExpression, Not, Or, Remainder}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Average, Complete, Count, Max, Min, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types.{DoubleType, LongType, StringType}

/** Rollup-aware aggregate routing (SURVEY.md §4 "materialized
  * pre-aggregation"): Druid answers dashboard aggregates from its ingest-time
  * rollup automatically; in Spark that takes a plan rewrite. This optimizer
  * rule (installed through the public `spark.experimental.extraOptimizations`
  * hook; a deployment would wire the same rule via
  * `SparkSessionExtensions.injectOptimizerRule`) rewrites
  *
  *   Aggregate(groupings ⊆ {epoch_s, house_id, appliance_id, appliance_name},
  *             aggs ∈ {count, sum/min/max(power)},
  *             Project/Filter chain over the raw events parquet relation)
  *
  * onto the materialized rollup table registered as `powerraw_rollup`
  * (schema: epoch_s, house_id, appliance_id, appliance_name, cnt, cnt_power,
  * min_power, max_power, sum_power_dec): counts become sum(cnt) (null-safe
  * counts of the measure become sum(cnt_power)), sum(power) becomes
  * sum(sum_power_dec) cast to the original result type — exact, because the
  * rollup keeps DECIMAL sums — and min/max(power) become min/max of the
  * per-group extrema. Output attribute ids are preserved so parent operators
  * are untouched.
  *
  * Correctness gates, both structural (VERDICT r1 / ADVICE r1):
  *
  *   - The chain's output columns are validated against CANONICAL DEFINITIONS
  *     captured at [[RollupRewrite.install]] time from the engine's raw power
  *     view: every grouping/measure column must resolve, through the chain's
  *     projections, to an expression structurally identical (same `.sql`
  *     rendering over the scan's columns) to the canonical one. A user
  *     projection that merely reuses the names (`value * 2 AS power`) no
  *     longer matches.
  *   - Filters are allowed only when every atom of the predicate is a
  *     function of rollup group keys — equality/range/IN/IsNotNull over a
  *     served key, or a second-aligned bound on the raw `ts` column, which
  *     maps exactly onto `epoch_s` (`ts >= s·1e9 ⟺ epoch_s >= s` and
  *     `ts < e·1e9 ⟺ epoch_s < e` for the non-negative integer `ts` this
  *     table carries). Group-key-constant predicates select whole rollup
  *     groups, so every aggregate is preserved exactly; anything else — e.g.
  *     a predicate on the measure — rejects the rewrite
  *     (correct-but-unoptimized beats wrong-and-fast).
  */
class RollupRewrite(
    spark: SparkSession,
    canonicalSql: Map[String, String],
    // scan column -> served key, only pairs whose canonical def was PROVEN
    // null-bijective at install time (ADVICE r2: never assume the view shape)
    nullBijections: Map[String, String],
    // true only when epoch_s was proven to be exactly `ts div 1e9` at install
    tsRangeMappable: Boolean)
    extends Rule[LogicalPlan] {

  import RollupRewrite.{analyzeChain, RollupViewName, ServedKeys}

  private def rollupPlan(): Option[LogicalPlan] =
    try Some(spark.table(RollupViewName).queryExecution.optimizedPlan)
    catch { case _: Exception => None }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case agg @ Aggregate(groups, aggExprs, child, _) =>
      (for {
        (defs, conds) <- analyzeChain(child)
        rollup <- rollupPlan()
        rewritten <- tryRewrite(groups, aggExprs, defs, conds, rollup)
      } yield rewritten).getOrElse(agg)
  }

  /** The attribute's scan-space definition matches the canonical power-view
    * definition of `key` captured at install time. Keyed by ExprId — output
    * NAMES are not unique in Catalyst plans (PullOutGroupingExpressions
    * aliases every derived grouping as `_groupingexpression`).
    */
  private def defMatches(
      a: AttributeReference, key: String, defs: Map[ExprId, Expression]): Boolean =
    defs.get(a.exprId).exists(d => canonicalSql.get(key).contains(d.sql))

  /** Map a SCAN-space expression into rollup space: every maximal subtree
    * structurally identical to a canonical served-key definition becomes the
    * rollup's column; succeeds only when nothing else references the scan
    * (and the expression is deterministic). Sound for groupings and filter
    * atoms alike: any deterministic function of rollup GROUP KEYS selects or
    * merges whole rollup groups, so re-aggregating the partial aggregates
    * under the mapped expression is exact. This is what routes the
    * dashboard's time-bucketed tiles (`epoch_s div 5`) to the rollup.
    */
  private def mapScanExpr(
      scanExpr: Expression, rollupAttr: Map[String, Attribute]): Option[Expression] = {
    if (!scanExpr.deterministic) return None
    val bySql: Map[String, String] =
      ServedKeys.flatMap(k => canonicalSql.get(k).map(_ -> k)).toMap
    val out = scanExpr.transformDown {
      case e if bySql.contains(e.sql) => rollupAttr(bySql(e.sql))
    }
    val allowed = rollupAttr.values.map(_.exprId).toSet
    if (out.references.forall(r => allowed.contains(r.exprId))) Some(out) else None
  }

  private def tryRewrite(
      groups: Seq[Expression],
      aggExprs: Seq[NamedExpression],
      defs: Map[ExprId, Expression],
      conds: Seq[Expression],
      rollup: LogicalPlan): Option[LogicalPlan] = {
    val rollupAttr: Map[String, Attribute] = rollup.output.map(a => a.name -> a).toMap
    val rollupCols = ServedKeys ++ Set("cnt", "cnt_power", "min_power", "max_power", "sum_power_dec")
    if (!rollupCols.forall(rollupAttr.contains)) return None

    // every grouping expression must map into rollup space (a served key
    // itself, or any deterministic function of served keys — time buckets
    // like `epoch_s div 5`, concatenated dims, …)
    val mappedGroups: Seq[Option[Expression]] = groups.map {
      case a: AttributeReference =>
        defs.get(a.exprId).flatMap(mapScanExpr(_, rollupAttr))
      case g =>
        RollupRewrite.substitute(g, defs).flatMap(mapScanExpr(_, rollupAttr))
    }
    if (mappedGroups.exists(_.isEmpty)) return None

    // `power` here means: resolves to the canonical measure definition.
    def isPower(a: AttributeReference): Boolean = defMatches(a, "power", defs)

    // Count over empty input is 0, but Sum is NULL — reachable for a global
    // aggregate whose filter matches no rollup rows (ADVICE r2, high).
    def sumAsCount(cnt: Attribute): Expression =
      Coalesce(Seq(Sum(cnt).toAggregateExpression(), Literal(0L)))

    def rewriteNamed(ne: NamedExpression): Option[NamedExpression] = ne match {
      case a: AttributeReference =>
        defs.get(a.exprId).flatMap(mapScanExpr(_, rollupAttr))
          .map(e => Alias(e, a.name)(exprId = a.exprId))
      case al @ Alias(AggregateExpression(f, Complete, false, None, _), name) =>
        val rewritten: Option[Expression] = f match {
          // count of anything provably non-null per raw row → row count
          case Count(args) if args.forall {
                case l: Literal => l.value != null
                case a: AttributeReference => !a.nullable &&
                  (ServedKeys.exists(defMatches(a, _, defs)) || isPower(a))
                case _ => false
              } =>
            Some(Cast(sumAsCount(rollupAttr("cnt")), al.dataType))
          // count(power) with nullable power → the rollup's null-safe count
          case Count(Seq(a: AttributeReference)) if isPower(a) =>
            Some(Cast(sumAsCount(rollupAttr("cnt_power")), al.dataType))
          case Sum(a: AttributeReference, _) if isPower(a) =>
            Some(Cast(Sum(rollupAttr("sum_power_dec")).toAggregateExpression(), al.dataType))
          case Min(a: AttributeReference) if isPower(a) =>
            Some(Cast(Min(rollupAttr("min_power")).toAggregateExpression(), al.dataType))
          case Max(a: AttributeReference) if isPower(a) =>
            Some(Cast(Max(rollupAttr("max_power")).toAggregateExpression(), al.dataType))
          // avg(power) = sum(power)/count(power): the rollup's decimal sum
          // over its null-safe count. Division is guarded — count(power)=0
          // (all-null group, or a global aggregate whose filter matched no
          // rollup rows) must yield NULL like Average, never a division
          // error or 0/0.
          case Average(a: AttributeReference, _) if isPower(a) =>
            val s = Sum(rollupAttr("sum_power_dec")).toAggregateExpression()
            val c = Sum(rollupAttr("cnt_power")).toAggregateExpression()
            val div = Divide(Cast(s, DoubleType), Cast(c, DoubleType))
            Some(Cast(
              If(GreaterThan(Coalesce(Seq(c, Literal(0L))), Literal(0L)),
                div, Literal.create(null, DoubleType)),
              al.dataType))
          case _ => None
        }
        rewritten.map(e => Alias(e, name)(exprId = al.exprId))
      // non-aggregate alias: a (derived) grouping projection. The guard is
      // load-bearing: an alias whose child CONTAINS an aggregate in any
      // shape the strict case above does not match (nested in arithmetic,
      // FILTER clause, distinct) must reject the whole rewrite — treating it
      // as a grouping projection would evaluate the aggregate over ROLLUP
      // rows instead of raw rows.
      case al @ Alias(child, name)
          if !child.exists(_.isInstanceOf[AggregateExpression]) =>
        RollupRewrite.substitute(child, defs).flatMap(mapScanExpr(_, rollupAttr))
          .map(e => Alias(e, name)(exprId = al.exprId))
      case _ => None
    }

    val newAggExprs = aggExprs.map(rewriteNamed)
    if (newAggExprs.exists(_.isEmpty)) return None
    val mappedConds = conds.map(mapCond(_, rollupAttr))
    if (mappedConds.exists(_.isEmpty)) return None
    val newGroups: Seq[Expression] = mappedGroups.flatten
    val child = mappedConds.flatten
      .reduceOption(And)
      .map(Filter(_, rollup))
      .getOrElse(rollup)
    Some(Aggregate(newGroups, newAggExprs.map(_.get), child))
  }

  /** Map a scan-space predicate onto rollup columns. Every atom must be a
    * function of rollup group keys; atom equivalences are exact (not mere
    * implications), so arbitrary And/Or/Not combinations stay exact.
    */
  private def mapCond(e: Expression, rollupAttr: Map[String, Attribute]): Option[Expression] =
    e match {
      case And(l, r) =>
        for { a <- mapCond(l, rollupAttr); b <- mapCond(r, rollupAttr) } yield And(a, b)
      case Or(l, r) =>
        for { a <- mapCond(l, rollupAttr); b <- mapCond(r, rollupAttr) } yield Or(a, b)
      case Not(c) => mapCond(c, rollupAttr).map(Not)
      case _ => mapAtom(e, rollupAttr)
    }

  private val NanosPerSec = 1000000000L

  /** A second-aligned epoch-ns literal's epoch-s rendering. */
  private def alignedSec(l: Literal): Option[Literal] = l.value match {
    case v: java.lang.Long if v >= 0 && v % NanosPerSec == 0 =>
      Some(Literal(v / NanosPerSec))
    case _ => None
  }

  /** The raw scan's `ts` column (epoch ns): `epoch_s` is its second floor, so
    * `>=`/`<`/`>`/`<=` with second-aligned bounds map exactly.
    */
  private def isRawTs(e: Expression): Boolean = e match {
    case a: AttributeReference => a.name == "ts"
    case _ => false
  }

  private def mapAtom(e: Expression, rollupAttr: Map[String, Attribute]): Option[Expression] =
    e match {
      case cmp: BinaryComparison =>
        val (x, lit, flipped) = (cmp.left, cmp.right) match {
          case (l: Literal, r) => (r, l, true)
          case (l, r: Literal) => (l, r, false)
          case _ => return None
        }
        mapScanExpr(x, rollupAttr) match {
          case Some(a) =>
            Some(if (flipped) cmp.withNewChildren(Seq(lit, a)) else cmp.withNewChildren(Seq(a, lit)))
          case None if tsRangeMappable && isRawTs(x) =>
            val es = rollupAttr("epoch_s")
            // normalized to (ts OP lit): only the aligned closed-lower /
            // open-upper forms map; ts > s·1e9 / ts <= s·1e9 have sub-second
            // slack that epoch_s cannot express
            (cmp, flipped) match {
              case (_: GreaterThanOrEqual, false) | (_: LessThanOrEqual, true) =>
                alignedSec(lit).map(GreaterThanOrEqual(es, _)) // ts >= s·1e9
              case (_: LessThan, false) | (_: GreaterThan, true) =>
                alignedSec(lit).map(LessThan(es, _)) // ts < e·1e9
              case _ => None
            }
          case None => None
        }
      case In(x, list) if list.forall(_.isInstanceOf[Literal]) =>
        mapScanExpr(x, rollupAttr).map(In(_, list))
      case IsNotNull(x) =>
        // A scan column maps onto a key only when install() PROVED the key's
        // canonical def null-bijective in that column (e.g. user_id null ⟺
        // house_id null through the null-propagating concat). Unproven shapes
        // fall through to the exact-definition path or reject.
        x match {
          case a: AttributeReference if nullBijections.contains(a.name) =>
            Some(IsNotNull(rollupAttr(nullBijections(a.name))))
          case _ => mapScanExpr(x, rollupAttr).map(IsNotNull)
        }
      case _ => None
    }
}

object RollupRewrite {

  val RollupViewName = "powerraw_rollup"

  private[plans] val ServedKeys = Set("house_id", "appliance_id", "appliance_name", "epoch_s")

  /** Measure + keys whose canonical definitions the rule validates. */
  private val CanonicalCols = ServedKeys + "power"

  /** Walk a Project/Filter chain down to the raw events parquet relation,
    * composing projections so every output attribute (and every filter
    * condition found along the way) is expressed over the SCAN's own
    * columns. Keyed by ExprId, never by name: optimizer rules emit
    * duplicate output names (PullOutGroupingExpressions aliases every
    * derived grouping as `_groupingexpression`), and a name-keyed map would
    * silently collapse them. Any node that is not a
    * Project/Filter/events-scan, or any column that does not resolve,
    * rejects the chain.
    */
  private[plans] def analyzeChain(
      p: LogicalPlan): Option[(Map[ExprId, Expression], Seq[Expression])] = p match {
    case l: LogicalRelation if isEventsScan(l) =>
      Some((l.output.map(a => a.exprId -> (a: Expression)).toMap, Nil))
    case pr: Project =>
      analyzeChain(pr.child).flatMap { case (defs, conds) =>
        val resolved = pr.projectList.map {
          case a: AttributeReference => defs.get(a.exprId).map(a.exprId -> _)
          case al @ Alias(child, _) => substitute(child, defs).map(al.exprId -> _)
          case _ => None
        }
        if (resolved.exists(_.isEmpty)) None
        else Some((resolved.flatten.toMap, conds))
      }
    case f: Filter =>
      analyzeChain(f.child).flatMap { case (defs, conds) =>
        substitute(f.condition, defs).map(c => (defs, conds :+ c))
      }
    case _ => None
  }

  private def isEventsScan(l: LogicalRelation): Boolean = l.relation match {
    case fs: HadoopFsRelation =>
      fs.location.rootPaths.exists(_.toString.endsWith("events.parquet"))
    case _ => false
  }

  private[plans] def substitute(e: Expression, defs: Map[ExprId, Expression]): Option[Expression] = {
    var ok = true
    val out = e.transformUp {
      case a: AttributeReference =>
        defs.get(a.exprId) match {
          case Some(d) => d
          case None => ok = false; a
        }
    }
    if (ok) Some(out) else None
  }

  /** Candidate IsNotNull source→key pairs; each is enabled only if proven. */
  private val NullBijectionCandidates =
    Seq("user_id" -> "house_id", "ts" -> "epoch_s", "event_type" -> "appliance_name")

  /** The served-key canonical defs that are provably null-bijective in their
    * single source column: def references exactly `src`, null in ⟹ null out
    * (checked by folding the def with a null literal substituted), and
    * non-null in ⟹ non-null out (conservative structural walk). Only these
    * mappings let the rule translate `IsNotNull(src)` filters.
    */
  private[plans] def validatedNullBijections(
      defs: Map[String, Expression]): Map[String, String] =
    NullBijectionCandidates.filter { case (src, key) =>
      defs.get(key).exists(d =>
        d.references.toSeq.map(_.name) == Seq(src) &&
          nullPropagates(d, src) && nonNullPreserving(d, src))
    }.toMap

  private def nullPropagates(d: Expression, src: String): Boolean =
    try {
      val nulled = d.transformUp {
        case a: AttributeReference if a.name == src => Literal.create(null, a.dataType)
      }
      nulled.deterministic && nulled.foldable && nulled.eval(null) == null
    } catch { case scala.util.control.NonFatal(_) => false }

  /** Given a non-null `src`, is `e` guaranteed non-null? Whitelist of shapes
    * the canonical views use; anything unrecognized conservatively fails.
    */
  private def nonNullPreserving(e: Expression, src: String): Boolean = e match {
    case a: AttributeReference => a.name == src
    case l: Literal => l.value != null
    // numeric→string casts cannot fail; other casts may return null
    case Cast(child, StringType, _, _) => nonNullPreserving(child, src)
    case Remainder(l, Literal(d, _), _) if d != null && d != 0 && d != 0L =>
      nonNullPreserving(l, src)
    case IntegralDivide(l, Literal(d, _), _) if d != null && d != 0 && d != 0L =>
      nonNullPreserving(l, src)
    case Concat(children) => children.forall(nonNullPreserving(_, src))
    case _ => false
  }

  /** The ts≥s·1e9 ⟺ epoch_s≥s range mapping is sound only when epoch_s is
    * EXACTLY the second floor of the scan's long `ts` — proven structurally,
    * not assumed (ADVICE r2, medium).
    */
  private[plans] def tsSecondFloorProven(defs: Map[String, Expression]): Boolean =
    defs.get("epoch_s").exists {
      case IntegralDivide(a: AttributeReference, Literal(ns, LongType), _) =>
        a.name == "ts" && a.dataType == LongType && ns == 1000000000L
      case _ => false
    }

  /** Sessions whose rollup rule is live, for the extension-injected delegate
    * ([[graft.GraftExtensions]]). Weak keys: a dropped session must not be
    * pinned by its installed rule.
    */
  private val installed =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkSession, RollupRewrite]())

  private[graft] def installedFor(spark: SparkSession): Option[RollupRewrite] =
    Option(installed.get(spark))

  /** The session was built with `spark.sql.extensions=graft.GraftExtensions`,
    * so the delegate rule is already in its optimizer batch list.
    */
  private def extensionConfigured(spark: SparkSession): Boolean =
    spark.conf.getOption("spark.sql.extensions")
      .exists(_.split(",").map(_.trim).contains("graft.GraftExtensions"))

  /** Register the rollup view, capture the canonical raw-view definitions,
    * and install the rule (idempotent). `canonicalRaw` is the engine's raw
    * power view over the SAME events source (e.g. `Grid.powerReadings`); its
    * optimized projection is the structural fingerprint user plans must match.
    * Filter-atom special mappings (IsNotNull translation, ts range → epoch_s)
    * are derived from the captured defs here, never assumed downstream.
    *
    * In a session bootstrapped through [[graft.GraftExtensions]] the rule
    * activates via the injected delegate; otherwise it lands on the public
    * `spark.experimental.extraOptimizations` hook.
    */
  def install(spark: SparkSession, rollupPath: String, canonicalRaw: DataFrame): Unit = {
    spark.read.parquet(rollupPath)
      .createOrReplaceTempView(RollupViewName)
    // name the ExprId-keyed defs through the view's OUTPUT attributes (the
    // one place names are authoritative: the canonical view's own schema)
    val plan = canonicalRaw.queryExecution.optimizedPlan
    val byId: Map[ExprId, Expression] =
      analyzeChain(plan).map(_._1).getOrElse(Map.empty)
    val canonicalDefs: Map[String, Expression] =
      plan.output.flatMap(a => byId.get(a.exprId).map(a.name -> _))
        .toMap.filter { case (n, _) => CanonicalCols(n) }
    val canonicalSql = canonicalDefs.map { case (n, e) => n -> e.sql }
    require(CanonicalCols.forall(canonicalSql.contains),
      s"canonicalRaw must expose ${CanonicalCols.mkString(", ")} over the events scan")
    uninstall(spark)
    val rule = new RollupRewrite(
      spark, canonicalSql,
      validatedNullBijections(canonicalDefs), tsSecondFloorProven(canonicalDefs))
    installed.put(spark, rule)
    if (!extensionConfigured(spark)) {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ rule
    }
  }

  def uninstall(spark: SparkSession): Unit = {
    installed.remove(spark)
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations.filterNot(_.isInstanceOf[RollupRewrite])
  }
}
