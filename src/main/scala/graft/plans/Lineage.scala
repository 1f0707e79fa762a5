package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{Attribute, ExprId, NamedExpression}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.execution.datasources.LogicalRelation

/** Column-level lineage from the ANALYZED logical plan: for every output
  * column of a query, the set of source `table.column` leaves that feed
  * it — the impact-analysis answer ("which outputs move if this source
  * column changes?") and the provenance answer ("where did this number
  * come from?") that a governed 100 TB warehouse has to produce per
  * dataset. Works on any DataFrame, because it walks Catalyst's resolved
  * attribute graph rather than parsing SQL: each node that INTRODUCES
  * attributes (Project/Aggregate/Window/Generate/Expand) maps its new
  * exprIds to the union of the leaf sets of the expressions' references;
  * every other node passes attributes through unchanged (their exprIds
  * are stable through filters, joins, sorts, limits, unions by
  * position). Expression-level subqueries contribute their outer
  * references.
  *
  * Leaves are tagged by the file-relation's last path segment (the
  * fixture's `<table>.parquet`) or `local`/node-name otherwise. */
object Lineage {

  private def leafTag(p: LogicalPlan): String = p match {
    case lr: LogicalRelation =>
      val id = lr.relation match {
        case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
          fs.location.rootPaths.headOption.map(_.getName).getOrElse("files")
        case other => other.getClass.getSimpleName
      }
      id
    case _: LocalRelation => "local"
    case other => other.nodeName.toLowerCase
  }

  /** exprId → contributing source columns, built bottom-up. */
  private def build(plan: LogicalPlan): Map[ExprId, Set[String]] = {
    val fromChildren: Map[ExprId, Set[String]] =
      plan.children.map(build).foldLeft(Map.empty[ExprId, Set[String]])(_ ++ _)
    def resolve(refs: Iterable[Attribute]): Set[String] =
      refs.flatMap(a => fromChildren.getOrElse(a.exprId, Set.empty[String])).toSet
    def introduced(nes: Seq[NamedExpression]): Map[ExprId, Set[String]] =
      nes.map { ne =>
        ne.toAttribute.exprId -> resolve(ne.references.toSeq)
      }.toMap
    plan match {
      case leaf: LeafNode =>
        val tag = leafTag(leaf)
        leaf.output.map(a => a.exprId -> Set(s"$tag.${a.name}")).toMap
      case p: Project => fromChildren ++ introduced(p.projectList)
      case a: Aggregate => fromChildren ++ introduced(a.aggregateExpressions)
      case w: Window => fromChildren ++ introduced(w.windowExpressions)
      case g: Generate =>
        fromChildren ++ g.generatorOutput.map(o =>
          o.exprId -> resolve(g.generator.references.toSeq))
      case e: Expand =>
        fromChildren ++ e.output.zipWithIndex.map { case (o, i) =>
          o.exprId -> e.projections.flatMap(proj =>
            if (i < proj.length) resolve(proj(i).references.toSeq) else Set.empty[String]).toSet
        }
      case u: Union =>
        // union output is positional: each output column draws from that
        // position in every branch
        fromChildren ++ u.output.zipWithIndex.map { case (o, i) =>
          o.exprId -> u.children.flatMap(c =>
            fromChildren.getOrElse(c.output(i).exprId, Set.empty[String])).toSet
        }
      case _ => fromChildren
    }
  }

  /** Ordered (output column, sorted source columns) pairs. */
  def columnLineage(df: DataFrame): Seq[(String, Seq[String])] = {
    val plan = df.queryExecution.analyzed
    val m = build(plan)
    plan.output.map(a =>
      a.name -> m.getOrElse(a.exprId, Set.empty[String]).toSeq.sorted)
  }

  /** The lineage as a DataFrame (for export next to a dataset card). */
  def lineageTable(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    columnLineage(df).toDF("output_column", "source_columns")
  }
}
