package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, GraftPlanBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Whole-operator Catalyst extension (the (c) tier of the build brief's
  * custom-operator ladder: LogicalPlan + Strategy + SparkPlan): per-key
  * top-k via bounded heaps.
  *
  * Why not a window? `row_number().over(partitionBy(key).orderBy(o))
  * .filter(rn <= k)` SORTS every row of every key group and shuffles
  * the ENTIRE input — at 100 TB that is a full-data exchange plus an
  * O(n log n) sort per key, to keep k rows. This operator keeps a
  * k-bounded heap per key and plans as partial → exchange → final, so
  * the map side emits at most k rows per (key, input partition): the
  * shuffle carries k·parts rows per key instead of all of them, and
  * nothing is ever fully sorted. The same partial/final split Spark
  * gives hash aggregates, applied to an operator Catalyst doesn't have.
  *
  * State per task is k rows per distinct key in that task's input —
  * strictly smaller than the window form's sort buffer for the same
  * partition.
  */
case class TopKPerKeyNode(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKeyNode =
    copy(child = newChild)
}

/** Physical operator; `partial = true` runs before the exchange (map-
  * side combine), `partial = false` after it. Both phases run the same
  * kernel — top-k of a union of per-partition top-k's is the global
  * per-key top-k. */
case class TopKPerKeyExec(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    partial: Boolean,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(keys) :: Nil

  protected override def doExecute(): RDD[InternalRow] = {
    val kLocal = k
    val keyExprs = keys
    val orderExprs = order
    val childOutput = child.output
    val isPartial = partial
    // The partial phase's heap map grows with the partition's DISTINCT
    // key count — unbounded on an all-unique-key input. Past this cap,
    // rows for keys not already tracked pass through unaggregated:
    // correct (the final phase prunes them) with bounded memory, the
    // same degrade-to-passthrough a map-side combine makes. The final
    // phase is exact and never overflows (its per-partition key set is
    // the shuffle target, the same sizing assumption hash aggregation
    // makes).
    val maxKeys =
      if (isPartial)
        session.sessionState.conf
          .getConfString("spark.graft.topk.maxPartialKeys", (1 << 20).toString)
          .toInt
      else Int.MaxValue
    child.execute().mapPartitions { it =>
      val toUnsafe = UnsafeProjection.create(childOutput, childOutput)
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      val ord = RowOrdering.create(orderExprs, childOutput)
      // heap head = the WORST retained row, so peek/poll evicts right
      val worstFirst = new java.util.Comparator[UnsafeRow] {
        override def compare(a: UnsafeRow, b: UnsafeRow): Int = ord.compare(b, a)
      }
      val heaps = new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[UnsafeRow]]
      import scala.jdk.CollectionConverters._
      new Iterator[InternalRow] {
        private var pending: UnsafeRow = null
        private var tail: Iterator[UnsafeRow] = null
        private def advance(): Unit = {
          while (pending == null && it.hasNext) {
            val u = toUnsafe(it.next())
            val key = keyProj(u)
            var q = heaps.get(key)
            if (q == null) {
              if (heaps.size >= maxKeys) pending = u // passthrough overflow
              else {
                q = new java.util.PriorityQueue[UnsafeRow](kLocal, worstFirst)
                heaps.put(key.copy(), q)
                q.add(u.copy())
              }
            } else if (q.size < kLocal) q.add(u.copy())
            else if (ord.compare(u, q.peek) < 0) { q.poll(); q.add(u.copy()) }
          }
          if (pending == null && tail == null)
            tail = heaps.values.asScala.iterator.flatMap(_.iterator.asScala)
        }
        override def hasNext: Boolean = {
          if (pending == null && tail == null) advance()
          pending != null || (tail != null && tail.hasNext)
        }
        override def next(): InternalRow = {
          if (!hasNext) throw new NoSuchElementException
          if (pending != null) { val r = pending; pending = null; r }
          else tail.next()
        }
      }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
}

/** Plans the logical node as final(exchange(partial(child))) — the
  * exchange is inserted by EnsureRequirements from the final phase's
  * ClusteredDistribution requirement. */
object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyNode(keys, order, k, child) =>
      TopKPerKeyExec(keys, order, k, partial = false,
        TopKPerKeyExec(keys, order, k, partial = true, planLater(child))) :: Nil
    case _ => Nil
  }
}

object TopKPerKey {
  /** Top `k` rows per key group under `orderBy` (e.g. `col("v").desc,
    * col("id").asc` — include a unique tiebreak for determinism).
    * Output rows keep the input schema; row order across groups is
    * unspecified. */
  def topK(df: DataFrame, keyCols: Seq[String], orderBy: Seq[Column], k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    val spark = df.sparkSession
    // synchronized check-then-act, and skip when GraftExtensions already
    // injected the strategy via extraPlanningStrategies (else it plans twice)
    TopKPerKey.synchronized {
      if (!spark.sessionState.planner.extraPlanningStrategies.contains(TopKStrategy) &&
          !spark.experimental.extraStrategies.contains(TopKStrategy))
        spark.experimental.extraStrategies =
          spark.experimental.extraStrategies :+ TopKStrategy
    }
    val keys: Seq[Expression] =
      keyCols.map(n => GraftPlanBridge.expr(org.apache.spark.sql.functions.col(n)))
    val order: Seq[SortOrder] = orderBy.map { c =>
      GraftPlanBridge.expr(c) match {
        case so: SortOrder => so
        case e => SortOrder(e, org.apache.spark.sql.catalyst.expressions.Ascending)
      }
    }
    GraftPlanBridge.ofRows(spark,
      TopKPerKeyNode(keys, order, k, df.queryExecution.analyzed))
  }
}
