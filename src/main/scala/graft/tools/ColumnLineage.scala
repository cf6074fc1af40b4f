package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, ExprId, Expression}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** Column-level lineage extraction from the ANALYZED logical plan: for
  * every output column of a DataFrame, the set of `table.column` leaf
  * fields it derives from — the governance artifact behind impact
  * analysis ("which gold columns break if this bronze column changes
  * type?") and the column-provenance audit a regulated lakehouse must
  * produce (the reference's medallion docs promise exactly this
  * traceability story; here it falls out of the Catalyst plan itself,
  * no external catalog needed).
  *
  * Pure plan walk — no execution, no data access, O(plan size). Works
  * on any DataFrame because it folds ATTRIBUTE dependencies bottom-up
  * by `ExprId`: leaves seed each attribute with its own qualified name,
  * defining nodes (Project/Aggregate/Window/Generate) map each Alias to
  * the union of its referenced attributes' lineage, Union merges
  * children positionally, and every other node passes attributes
  * through untouched. Conservative by construction: the result is the
  * set of columns whose VALUES can flow into the output (filter/join
  * predicates are control, not data, lineage — the standard distinction).
  */
object ColumnLineage {

  /** output column name -> set of "relation.column" leaf fields. */
  def lineage(df: DataFrame): Map[String, Set[String]] = {
    val plan = df.queryExecution.analyzed
    val deps = attrDeps(plan)
    plan.output.map(a => a.name -> deps.getOrElse(a.exprId, Set.empty)).toMap
  }

  private def leafTag(l: LeafNode): String = l match {
    case LogicalRelation(fs: HadoopFsRelation, _, _, _, _) =>
      val p = fs.location.rootPaths.headOption.map(_.getName).getOrElse("file")
      p.stripSuffix(".parquet").stripSuffix(".csv").stripSuffix(".json")
    case _: LocalRelation => "local"
    case other => other.nodeName.toLowerCase
  }

  private def refDeps(e: Expression,
      child: Map[ExprId, Set[String]]): Set[String] =
    e.references.toSeq.flatMap(r => child.getOrElse(r.exprId, Set.empty)).toSet

  private def attrDeps(plan: LogicalPlan): Map[ExprId, Set[String]] =
    plan match {
      case l: LeafNode =>
        l.output.map(a => a.exprId -> Set(s"${leafTag(l)}.${a.name}")).toMap
      case u: Union =>
        val childMaps = u.children.map(attrDeps)
        val merged = u.output.zipWithIndex.map { case (out, i) =>
          out.exprId -> u.children.zip(childMaps).flatMap { case (c, m) =>
            m.getOrElse(c.output(i).exprId, Set.empty)
          }.toSet
        }.toMap
        childMaps.reduce(_ ++ _) ++ merged
      case p =>
        val child = p.children.map(attrDeps)
          .reduceOption(_ ++ _).getOrElse(Map.empty)
        val defined: Seq[(ExprId, Set[String])] = p match {
          case pr: Project =>
            pr.projectList.collect { case a: Alias =>
              a.exprId -> refDeps(a.child, child)
            }
          case ag: Aggregate =>
            ag.aggregateExpressions.collect { case a: Alias =>
              a.exprId -> refDeps(a.child, child)
            }
          case w: Window =>
            w.windowExpressions.collect { case a: Alias =>
              a.exprId -> refDeps(a.child, child)
            }
          case g: Generate =>
            // every generator output column flows from the generator input
            g.generatorOutput.map(a => a.exprId -> refDeps(g.generator, child))
          case e: Expand =>
            // grouping-set expansion: merge each output position across
            // all projection branches (nulls contribute nothing)
            e.output.zipWithIndex.map { case (out, i) =>
              out.exprId -> e.projections
                .flatMap(row => refDeps(row(i), child)).toSet
            }
          case _ => Seq.empty
        }
        child ++ defined
    }
}
