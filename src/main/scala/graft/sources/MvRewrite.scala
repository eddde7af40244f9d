package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{
  Alias,
  AttributeReference,
  Cast,
  Expression,
  Literal,
  NamedExpression
}
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical.{
  Aggregate,
  LogicalPlan,
  Project
}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.streaming.MergeSink

/** TRANSPARENT MATERIALIZED-VIEW REWRITE (opt-in:
  * `spark.graft.mvRewrite=true`): a `GROUP BY` aggregate over a
  * graft-merge table routes to a maintained single-table view when
  *
  *  - the table registers a `single` view in its `_dependents` sidecar
  *    whose group columns EXACTLY equal the query's grouping set,
  *  - every aggregate in the query maps to a stored view column
  *    (sum/min/max/count/avg over the same input; `count(*)` maps to
  *    the view's group-liveness counter `__n`, which every view
  *    carries), no DISTINCT, no FILTER clause,
  *  - the view is FRESH: `mv_lag_versions == 0` at optimization time
  *    ([[MaterializedViews.viewLag]] — the same staleness signal
  *    `.detail` surfaces). A stale view never serves silently.
  *
  * The rewrite replaces an O(fact) scan + shuffle + aggregate with an
  * O(groups) view scan + projection — at 100 TB the difference between
  * reading the table and reading the answer. Every check is
  * metadata-only (two sidecar reads + commit listings), paid only when
  * the conf is on and the plan has a matching aggregate shape.
  *
  * The analytic dual of the reference's derived-ref discipline
  * (/root/reference/src/opusdb/core/stm.clj:42 `apply-writes!` keeps
  * derived structures at the committed head so readers use THEM, not a
  * re-fold of history).
  */
object MvRewrite extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val on = SparkSession.getActiveSession.exists(
      _.conf.get("spark.graft.mvRewrite", "false").toBoolean)
    if (!on) plan
    else plan.transform {
      case agg @ Aggregate(groups, results, child, _) =>
        rewrite(agg, groups, results, child).getOrElse(agg)
    }
  }

  /** The scan under the aggregate, tolerating a pruning Project. */
  private def relationOf(
      child: LogicalPlan): Option[DataSourceV2Relation] = child match {
    case r: DataSourceV2Relation => Some(r)
    case Project(pl, r: DataSourceV2Relation)
        if pl.forall(_.isInstanceOf[AttributeReference]) => Some(r)
    case _ => None
  }

  private final case class MvDef(
      mvDir: String, groupCols: Seq[String],
      aggs: Seq[MaterializedViews.Agg])

  private def viewsOf(spark: SparkSession, srcDir: String): Seq[MvDef] =
    MaterializedViews.dependentLines(spark, srcDir).flatMap {
      _.split('\t') match {
        case Array("single", mvDir, _, groupCsv, aggsSpec, _) =>
          scala.util.Try(MvDef(
            mvDir,
            groupCsv.split(',').toSeq.map(_.trim).filter(_.nonEmpty),
            MaterializedViews.parseAggs(aggsSpec))).toOption
        case _ => None
      }
    }

  private def rewrite(
      agg: Aggregate,
      groups: Seq[Expression],
      results: Seq[NamedExpression],
      child: LogicalPlan): Option[LogicalPlan] = {
    val spark = SparkSession.active
    val rel = relationOf(child).getOrElse(return None)
    val srcDir = Option(rel.table.properties().get("path"))
      .getOrElse(return None)
    if (!rel.table.isInstanceOf[GraftMergeTable]) return None
    // grouping must be bare source columns
    val groupAttrs = groups.map {
      case a: AttributeReference => a
      case _ => return None
    }
    if (groupAttrs.isEmpty) return None // global aggregate: no view keys
    val groupNames = groupAttrs.map(_.name)
    val candidates = viewsOf(spark, srcDir)
      .filter(_.groupCols.toSet == groupNames.toSet)
    if (candidates.isEmpty) return None

    def mapped(mv: MvDef): Option[LogicalPlan] = {
      // FRESHNESS GATE: serve only a view at the source's head
      MaterializedViews.viewLag(spark, mv.mvDir) match {
        case Some((_, 0L)) => ()
        case _ => return None
      }
      val head = MergeSink.lastCommit(spark, mv.mvDir)
        .getOrElse(return None)
      val schema = MergeSink.manifestSchema(spark, mv.mvDir, head.version)
        .getOrElse(return None)
      val props = Map(
        "path" -> mv.mvDir,
        "key" -> mv.groupCols.mkString(","),
        "seq" -> MaterializedViews.RefreshCol)
      val mvRel = DataSourceV2Relation.create(
        new GraftMergeTable(schema, props), None, None,
        new CaseInsensitiveStringMap(
          scala.jdk.CollectionConverters.MapHasAsJava(props).asJava))
      def mvAttr(name: String): Option[AttributeReference] =
        mvRel.output.collectFirst {
          case a: AttributeReference if a.name == name => a
        }
      // an aggregate call -> the stored view column holding its value
      def columnFor(fn: AggregateFunction): Option[String] = fn match {
        case Sum(a: AttributeReference, _) =>
          mv.aggs.collectFirst {
            case MaterializedViews.Agg(al, "sum", c) if c == a.name => al
          }
        case Min(a: AttributeReference) =>
          mv.aggs.collectFirst {
            case MaterializedViews.Agg(al, "min", c) if c == a.name => al
          }
        case Max(a: AttributeReference) =>
          mv.aggs.collectFirst {
            case MaterializedViews.Agg(al, "max", c) if c == a.name => al
          }
        case Average(a: AttributeReference, _) =>
          mv.aggs.collectFirst {
            case MaterializedViews.Agg(al, "avg", c) if c == a.name => al
          }
        case Count(Seq(Literal(1, _))) =>
          // count(*): every view maintains the group-liveness counter
          mv.aggs.collectFirst {
            case MaterializedViews.Agg(al, "count", "*") => al
          }.orElse(Some(MaterializedViews.RowCountCol))
        case Count(Seq(a: AttributeReference)) =>
          mv.aggs.collectFirst {
            case MaterializedViews.Agg(al, "count", c) if c == a.name => al
          }
        case _ => None
      }
      val outputs: Seq[NamedExpression] = results.map {
        case a: AttributeReference if groupNames.contains(a.name) =>
          val src = mvAttr(a.name).getOrElse(return None)
          Alias(src, a.name)(exprId = a.exprId)
        case al @ Alias(a: AttributeReference, n)
            if groupNames.contains(a.name) =>
          val src = mvAttr(a.name).getOrElse(return None)
          Alias(src, n)(exprId = al.exprId)
        case al @ Alias(ae: AggregateExpression, n)
            if !ae.isDistinct && ae.filter.isEmpty =>
          val stored = columnFor(ae.aggregateFunction).getOrElse(return None)
          val src = mvAttr(stored).getOrElse(return None)
          val e: Expression =
            if (src.dataType == ae.dataType) src
            else Cast(src, ae.dataType)
          Alias(e, n)(exprId = al.exprId)
        case _ => return None
      }
      Some(Project(outputs, mvRel))
    }
    candidates.view.flatMap(mapped).headOption
  }
}
