package graft.plans

import graft.functions.L2SquaredDistance
import graft.search.IvfIndex
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types.{ArrayType, FloatType}

/** Optimizer rule (SURVEY §4.3 stretch): transparently rewrites a
  * brute-force kNN plan
  *
  *   Limit k ( Sort (l2_sq(vecCol, <literal query>) ASC) ( scan ivfDir ) )
  *
  * over a REGISTERED IVF-indexed table into the centroid-pruned probe plan
  * by injecting `cluster_id IN (<nprobe nearest clusters>)` directly above
  * the file relation. The predicate then rides the normal
  * operator-optimization fixpoint (the rule is injected into that batch via
  * GraftExtensions), so PruneFileSourcePartitions turns it into
  * `PartitionFilters` on the scan — users write the naive query and get
  * the index probe.
  *
  * Registration is an explicit opt-in ([[register]]) because nprobe<nlist
  * trades recall for speed — the engine never silently approximates an
  * unregistered table. The rule only fires under a Limit (pure sorts must
  * keep every row) and only for a literal query vector.
  */
object IvfProbeRewrite extends Rule[LogicalPlan] {
  private val registry =
    new java.util.concurrent.ConcurrentHashMap[String, (IvfIndex.Model, Int)]()

  private def normalize(p: String): String =
    p.stripPrefix("file:").stripSuffix("/")

  /** Opt a built/loaded index in for automatic probe rewriting. */
  def register(model: IvfIndex.Model, nprobe: Int): Unit =
    registry.put(normalize(IvfIndex.dataDir(model.indexDir)), (model, nprobe))

  def clear(): Unit = registry.clear()

  /** Match any global Sort under a GlobalLimit — rules like
    * PushProjectionThroughLimit interleave Projects between the limit and
    * the sort, so the ancestor check and the sort match are separate
    * traversals rather than one rigid pattern. */
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformDown {
    case gl: GlobalLimit =>
      gl.transformDown {
        case sort @ Sort(orders, true, child, _) =>
          rewrite(orders, child)
            .map(newChild => sort.copy(child = newChild))
            .getOrElse(sort)
      }
  }

  private def rewrite(orders: Seq[SortOrder], child: LogicalPlan): Option[LogicalPlan] = {
    // relations already guarded by a cluster_id predicate (idempotency
    // under the fixpoint batch)
    val alreadyFiltered = child.collect {
      case Filter(cond, lr: LogicalRelation)
          if cond.references.exists(_.name == "cluster_id") => lr
    }.toSet

    val target = child.collectFirst {
      case lr: LogicalRelation if !alreadyFiltered.contains(lr) =>
        lr.relation match {
          case fs: HadoopFsRelation =>
            fs.location.rootPaths.toSeq
              .flatMap(p => Option(registry.get(normalize(p.toString))))
              .headOption.map(m => (lr, m._1, m._2))
          case _ => None
        }
    }.flatten

    for {
      (lr, model, nprobe) <- target
      query <- literalQueryVector(orders, child)
      clusterAttr <- lr.output.find(_.name == "cluster_id")
    } yield {
      val probes = IvfIndex.probeClusters(model, query, nprobe)
      child.transformUp {
        case rel: LogicalRelation if rel eq lr =>
          Filter(In(clusterAttr, probes.map(Literal(_))), rel)
      }
    }
  }

  /** Extract the literal query vector when the leading sort key is an
    * ascending l2_sq, resolving through projected aliases and round(). */
  private def literalQueryVector(orders: Seq[SortOrder],
                                 child: LogicalPlan): Option[Array[Float]] = {
    val aliases = child.collect { case p: Project => p.projectList }
      .flatten.collect { case a: Alias => a.exprId -> a.child }.toMap
    def unwrap(e: Expression): Expression = e match {
      case ar: AttributeReference => aliases.get(ar.exprId).map(unwrap).getOrElse(ar)
      case r: Round => unwrap(r.child)
      case other => other
    }
    orders.headOption.filter(_.direction == Ascending)
      .map(o => unwrap(o.child)).flatMap {
        case L2SquaredDistance(_, Literal(v, ArrayType(FloatType, _))) =>
          Some(v.asInstanceOf[ArrayData].toFloatArray())
        case L2SquaredDistance(Literal(v, ArrayType(FloatType, _)), _) =>
          Some(v.asInstanceOf[ArrayData].toFloatArray())
        case _ => None
      }
  }
}
