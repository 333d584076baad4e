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
  * `mode` selects the rank semantics of the k cutoff:
  *  - `row_number`: exactly k rows per key (heap, ties cut arbitrarily
  *    unless the ordering includes a tiebreak).
  *  - `rank`: every row whose rank() ≤ k — boundary TIES are kept, so
  *    a group can exceed k rows; retained state per key is k plus the
  *    boundary tie group (worst case all-equal input: the whole group,
  *    which is also that window's output size — no worse than the
  *    window form's own result).
  *  - `dense_rank`: every row among the top-k DISTINCT order values.
  *
  * All three compose as partial → final: removing rows never lowers
  * another row's rank, so a per-partition rank ≤ k pass retains a
  * superset of the global winners, and the final phase re-ranks the
  * union exactly.
  *
  * State per task is the per-key retained set for each distinct key in
  * that task's input — strictly smaller than the window form's sort
  * buffer for the same partition.
  */
case class TopKPerKeyNode(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: LogicalPlan,
    mode: String = TopKPerKeyNode.RowNumberMode) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKeyNode =
    copy(child = newChild)
}

object TopKPerKeyNode {
  val RowNumberMode = "row_number"
  val RankMode = "rank"
  val DenseRankMode = "dense_rank"
}

/** Physical operator; `partial = true` runs before the exchange (map-
  * side combine), `partial = false` after it. Both phases run the same
  * kernel — top-k of a union of per-partition top-k's is the global
  * per-key top-k (for every rank mode; see node doc). */
case class TopKPerKeyExec(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    partial: Boolean,
    child: SparkPlan,
    mode: String = TopKPerKeyNode.RowNumberMode) extends UnaryExecNode {

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
    val modeLocal = mode
    // The partial phase's buffer map grows with the partition's DISTINCT
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

      // per-key retained set, best row first
      sealed trait Buf {
        def insert(u: UnsafeRow): Unit // copies internally
        def rows: Iterator[UnsafeRow]
      }
      final class HeapBuf extends Buf { // row_number: exactly k
        // heap head = the WORST retained row, so peek/poll evicts right
        private val q = new java.util.PriorityQueue[UnsafeRow](kLocal,
          new java.util.Comparator[UnsafeRow] {
            override def compare(a: UnsafeRow, b: UnsafeRow): Int = ord.compare(b, a)
          })
        override def insert(u: UnsafeRow): Unit =
          if (q.size < kLocal) q.add(u.copy())
          else if (ord.compare(u, q.peek) < 0) { q.poll(); q.add(u.copy()) }
        override def rows: Iterator[UnsafeRow] = {
          import scala.jdk.CollectionConverters._
          q.iterator.asScala
        }
      }
      final class GroupBuf(dense: Boolean) extends Buf { // rank / dense_rank
        // tie groups keyed by a representative row, best group first
        private val m = new java.util.TreeMap[UnsafeRow, java.util.ArrayList[UnsafeRow]](
          new java.util.Comparator[UnsafeRow] {
            override def compare(a: UnsafeRow, b: UnsafeRow): Int = ord.compare(a, b)
          })
        private var total = 0
        override def insert(u: UnsafeRow): Unit = {
          val c = u.copy()
          var g = m.get(c)
          if (g == null) { g = new java.util.ArrayList[UnsafeRow](); m.put(c, g) }
          g.add(c); total += 1
          if (dense) { // keep at most k distinct order values
            while (m.size > kLocal) total -= m.pollLastEntry().getValue.size
          } else { // rank: evict tail groups fully outranked by k rows
            var done = false
            while (!done && !m.isEmpty) {
              val lastSize = m.lastEntry().getValue.size
              if (total - lastSize >= kLocal) { m.pollLastEntry(); total -= lastSize }
              else done = true
            }
          }
        }
        override def rows: Iterator[UnsafeRow] = {
          import scala.jdk.CollectionConverters._
          m.values.asScala.iterator.flatMap(_.asScala.iterator)
        }
      }
      def newBuf(): Buf = modeLocal match {
        case TopKPerKeyNode.RowNumberMode => new HeapBuf
        case TopKPerKeyNode.RankMode => new GroupBuf(dense = false)
        case TopKPerKeyNode.DenseRankMode => new GroupBuf(dense = true)
      }

      val bufs = new java.util.HashMap[UnsafeRow, Buf]
      new Iterator[InternalRow] {
        private var pending: UnsafeRow = null
        private var tail: Iterator[UnsafeRow] = null
        private def advance(): Unit = {
          while (pending == null && it.hasNext) {
            val u = toUnsafe(it.next())
            val key = keyProj(u)
            var b = bufs.get(key)
            if (b == null) {
              if (bufs.size >= maxKeys) pending = u // passthrough overflow
              else {
                b = newBuf()
                bufs.put(key.copy(), b)
                b.insert(u)
              }
            } else b.insert(u)
          }
          if (pending == null && tail == null) {
            import scala.jdk.CollectionConverters._
            tail = bufs.values.asScala.iterator.flatMap(_.rows)
          }
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
    case TopKPerKeyNode(keys, order, k, child, mode) =>
      TopKPerKeyExec(keys, order, k, partial = false,
        TopKPerKeyExec(keys, order, k, partial = true, planLater(child), mode),
        mode) :: Nil
    case _ => Nil
  }
}

object TopKPerKey {
  /** Top `k` rows per key group under `orderBy` (e.g. `col("v").desc,
    * col("id").asc` — include a unique tiebreak for determinism).
    * Output rows keep the input schema; row order across groups is
    * unspecified. `mode` selects row_number/rank/dense_rank cutoff
    * semantics (see TopKPerKeyNode). */
  def topK(df: DataFrame, keyCols: Seq[String], orderBy: Seq[Column], k: Int,
      mode: String = TopKPerKeyNode.RowNumberMode): DataFrame = {
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
      TopKPerKeyNode(keys, order, k, df.queryExecution.analyzed, mode))
  }
}
