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

  /** Extract the query vector when the leading sort key is an ascending
    * l2_sq, resolving through projected aliases and round(). Handles a
    * LITERAL vector and a SCALAR SUBQUERY (the `sql_knn` pattern
    * `graft_l2_sq(embedding, (SELECT embedding ... WHERE id = ...))`) —
    * the subquery is pre-executed at optimize time, which is sound
    * because a scalar subquery is required to produce exactly one row and
    * this rule only fires for tables explicitly registered for probe
    * rewriting. Execution happens at most once per rewrite: the
    * for-comprehension in [[rewrite]] resolves the registered relation
    * BEFORE calling this, and the injected cluster_id Filter makes the
    * rule a no-op on subsequent fixpoint passes. */
  private def literalQueryVector(orders: Seq[SortOrder],
                                 child: LogicalPlan): Option[Array[Float]] = {
    val aliases = child.collect { case p: Project => p.projectList }
      .flatten.collect { case a: Alias => a.exprId -> a.child }.toMap
    def unwrap(e: Expression): Expression = e match {
      case ar: AttributeReference => aliases.get(ar.exprId).map(unwrap).getOrElse(ar)
      case r: Round => unwrap(r.child)
      case other => other
    }
    def vectorOf(e: Expression): Option[Array[Float]] = e match {
      case Literal(v, ArrayType(FloatType, _)) =>
        Some(v.asInstanceOf[ArrayData].toFloatArray())
      case ss: ScalarSubquery
          if ss.plan.output.size == 1 &&
            ss.plan.output.head.dataType.isInstanceOf[ArrayType] &&
            ss.plan.output.head.dataType.asInstanceOf[ArrayType]
              .elementType == FloatType =>
        scala.util.Try {
          val rows = org.apache.spark.sql.graftbridge.Bridge.runPlan(
            org.apache.spark.sql.SparkSession.active, ss.plan)
          require(rows.length == 1, "scalar subquery must yield one row")
          rows(0).getSeq[Float](0).toArray
        }.toOption
      case _ => None
    }
    orders.headOption.filter(_.direction == Ascending)
      .map(o => unwrap(o.child)).flatMap {
        case L2SquaredDistance(a, b) => vectorOf(b).orElse(vectorOf(a))
        case _ => None
      }
  }
}
