package graft.rules

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType, LongType}

import graft.Hnsw
import graft.expressions._
import graft.index.{HnswIndexMeta, IndexCatalog}
import graft.plans.HnswIndexScan

/**
 * O7 — scalar rewrite `1.0 - array_cosine_similarity(a,b)` →
 * `array_cosine_distance(a,b)`, enabling the TopN/min_by/join rules to match
 * cosine indexes (/root/reference/src/hnsw/hnsw_optimize_expr.cpp:17-70).
 */
object CosineDistanceRewrite extends Rule[LogicalPlan] {
  private def isOne(e: Expression): Boolean = e match {
    case Literal(1.0d, DoubleType) => true
    case Literal(1.0f, FloatType) => true
    case c: Cast => isOne(c.child)
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case Subtract(one, ArrayCosineSimilarity(a, b), _) if isOne(one) =>
      ArrayCosineDistance(a, b)
  }
}

/**
 * O3 — TopN → index-scan rewrite: matches
 * `Limit(k, Sort(dist ASC, [Project(...,)] FileRelation))` where `dist` is a
 * distance function between the indexed column and a foldable query vector,
 * and replaces the subtree with [[HnswIndexScan]]
 * (/root/reference/src/hnsw/hnsw_optimize_scan.cpp:30-256).
 *
 * Guard clauses mirror the reference's bail-outs: ASC only, single sort key,
 * 0 < k < 2048, no filters under the sort (the reference *pulls* table
 * filters above the k-limited scan, accepting post-filter semantics,
 * hnsw_optimize_scan.cpp:161-198 — we preserve standard SQL semantics by not
 * rewriting instead), distance function must match the index metric, and the
 * query vector dimension must equal the index dimension. Kill switch:
 * `spark.graft.hnsw.rewrite.enabled=false` (the `PRAGMA disable_optimizer`
 * analogue used by hnsw_rewrite.test).
 */
class TopNToIndexScan(session: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!session.conf.get(Hnsw.RewriteEnabledKey, "true").toBoolean) return plan
    plan.transformDown {
      case l @ Limit(IntegerLiteral(k), Sort(Seq(SortOrder(key, Ascending, _, _)), true, child, _))
          if k > 0 && k < 2048 =>
        rewriteChild(child, key, k).getOrElse(l)
      // PushProjectionThroughLimit moves post-sort projections between the
      // limit and the sort; the reference's MergeProjections handles the
      // same shape (hnsw_optimize_scan.cpp:211-249).
      case l @ Limit(IntegerLiteral(k),
          Project(pl, Sort(Seq(SortOrder(key, Ascending, _, _)), true, child, _)))
          if k > 0 && k < 2048 =>
        rewriteChild(child, key, k).map(Project(pl, _)).getOrElse(l)
    }
  }

  /** Try to rewrite; None restores the original shape. */
  private def rewriteChild(child: LogicalPlan, key: Expression, k: Int): Option[LogicalPlan] =
    child match {
      case rel: LogicalRelation =>
        matchIndexScan(rel, key, k)
      case p @ Project(projList, rel: LogicalRelation) =>
        val resolved = key match {
          case a: Attribute =>
            projList.collectFirst { case al: Alias if al.toAttribute.semanticEquals(a) => al.child }
              .orElse(projList.collectFirst { case at: Attribute if at.semanticEquals(a) => at })
          case e => Some(e)
        }
        resolved.flatMap(dist => matchIndexScan(rel, dist, k))
          .map(scan => Project(projList, scan))
      case _ => None
    }

  private def matchIndexScan(rel: LogicalRelation, dist: Expression, k: Int): Option[HnswIndexScan] = {
    val base = Hnsw.baseDir(session)
    HnswMatch.distanceArgs(dist).flatMap { case (metrics, a, b) =>
      HnswMatch.findIndex(base, rel, metrics, a, b).map { case (meta, qvec) =>
        HnswIndexScan(rel, base, meta, qvec, k, Hnsw.efSearch(session, meta))
      }
    }
  }
}

/**
 * O4 — `min_by(col, dist, k)` (no GROUP BY) → the same aggregate over an
 * [[HnswIndexScan]] feeding only the k nearest candidate rows
 * (/root/reference/src/hnsw/hnsw_optimize_topk.cpp:67-228). The reference
 * swaps the aggregate for `list(col ORDER BY dist)`; re-running our bounded
 * k-heap aggregate over the k scanned rows is equivalent (it returns them
 * best-first) and keeps output ordering guaranteed by the aggregate itself.
 *
 * Guards mirror the reference: single aggregate expression, constant
 * 0 < k < 2048 (hnsw_optimize_topk.cpp:112-121,171-174), bare scan below
 * (filters under the aggregate bail out automatically).
 */
class MinByKToIndexScan(session: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!session.conf.get(Hnsw.RewriteEnabledKey, "true").toBoolean) return plan
    plan.transformDown {
      case agg @ Aggregate(groups, aggExprs, child, _) if groups.isEmpty =>
        val aggFns = aggExprs.flatMap(_.collect {
          case ae: org.apache.spark.sql.catalyst.expressions.aggregate.AggregateExpression => ae
        })
        aggFns match {
          case Seq(ae) => ae.aggregateFunction match {
            case graft.aggregates.MinMaxByK(_, order, IntegerLiteral(k), true, _, _)
                if k > 0 && k < 2048 && !ae.isDistinct =>
              rewriteAggChild(child, order, k).map(newChild => agg.copy(child = newChild))
                .getOrElse(agg)
            case _ => agg
          }
          case _ => agg
        }
    }
  }

  private def rewriteAggChild(child: LogicalPlan, order: Expression, k: Int): Option[LogicalPlan] =
    child match {
      case rel: LogicalRelation =>
        matchScan(rel, order, k)
      case p @ Project(projList, rel: LogicalRelation) =>
        val aliasMap = projList.collect { case al: Alias => al.toAttribute.exprId -> al.child }.toMap
        val resolved = order.transform {
          case a: Attribute if aliasMap.contains(a.exprId) => aliasMap(a.exprId)
        }
        matchScan(rel, resolved, k).map(scan => p.copy(child = scan))
      case _ => None
    }

  private def matchScan(rel: LogicalRelation, dist: Expression, k: Int): Option[HnswIndexScan] = {
    val base = Hnsw.baseDir(session)
    HnswMatch.distanceArgs(dist).flatMap { case (metrics, a, b) =>
      HnswMatch.findIndex(base, rel, metrics, a, b).map { case (meta, qvec) =>
        HnswIndexScan(rel, base, meta, qvec, k, Hnsw.efSearch(session, meta))
      }
    }
  }
}

/** Shared index-matching helpers for the O3/O4/O6 rules — the analogue of
  * `HNSWIndex::TryMatchDistanceFunction` + `TryBindIndexExpression`
  * (/root/reference/src/hnsw/hnsw_index.cpp:635-689). */
object HnswMatch {

  /** (metrics that serve this function, arg a, arg b). l2sq indexes serve
    * both `array_distance` (sqrt) and `array_squared_distance` — monotone
    * orderings (hnsw_index.cpp:659-673). */
  def distanceArgs(e: Expression): Option[(Set[String], Expression, Expression)] = e match {
    case ArrayDistance(a, b) => Some((Set("l2sq"), a, b))
    case ArraySquaredDistance(a, b) => Some((Set("l2sq"), a, b))
    case ArrayCosineDistance(a, b) => Some((Set("cosine"), a, b))
    case ArrayNegativeInnerProduct(a, b) => Some((Set("ip"), a, b))
    case _ => None
  }

  @scala.annotation.tailrec
  def stripCast(e: Expression): Expression = e match {
    case c: Cast => stripCast(c.child)
    case other => other
  }

  /** Evaluate a foldable vector argument to Array[Float]. */
  def foldableVec(e: Expression): Option[Array[Float]] =
    if (!e.foldable) None
    else (e.eval(), e.dataType) match {
      case (ad: ArrayData, ArrayType(FloatType, _)) => Some(ad.toFloatArray())
      case (ad: ArrayData, ArrayType(DoubleType, _)) => Some(ad.toDoubleArray().map(_.toFloat))
      case _ => None
    }

  /** Match (indexed column attr, foldable query vec) in either arg order and
    * find a catalog index bound to this relation + column + metric + dim. */
  def findIndex(base: String, rel: LogicalRelation, metrics: Set[String],
      a: Expression, b: Expression): Option[(HnswIndexMeta, Array[Float])] = {
    val relPaths = rel.relation match {
      case fs: HadoopFsRelation => fs.location.rootPaths.map(_.toString).distinct.sorted
      case _ => return None
    }
    val candidates = Seq((stripCast(a), b), (stripCast(b), a))
    candidates.view.flatMap {
      case (colRef: AttributeReference, queryside) =>
        for {
          qvec <- foldableVec(queryside)
          meta <- IndexCatalog.list(base).find { m =>
            metrics.contains(m.metric) && m.paths == relPaths &&
              m.column == colRef.name && m.dim == qvec.length &&
              rel.output.exists(_.exprId == colRef.exprId) &&
              rel.output.exists(o => o.name == m.idColumn && o.dataType == LongType)
          }
        } yield (meta, qvec)
      case _ => None
    }.headOption
  }
}
