package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact distributed heavy hitters in two passes.
  *
  * Pass 1 builds a Misra–Gries summary (k counters) per partition and
  * merges them with `treeAggregate` — a mergeable summary, so the
  * combine tree is communication-bounded by k entries per merge no
  * matter how many tokens flow through. The MG guarantee: every item
  * whose true frequency exceeds N/(k+1) is present in the merged
  * summary (its counter may undercount, but it cannot be evicted to
  * zero across merges). Pass 2 broadcasts the candidate set, recounts
  * ONLY candidate tokens exactly, and applies the threshold — so for
  * any threshold fraction f with f > 1/(k+1) the result is EXACTLY
  * the answer of the naive `GROUP BY token HAVING count >= f*N`,
  * while the shuffle carries at most k distinct keys instead of the
  * whole vocabulary.
  *
  * This is the standard scale recipe for "which n-grams/domains are
  * boilerplate" over a pretraining corpus: the naive form shuffles
  * every gram occurrence; this form shuffles only grams that might
  * matter. (Reference analog: the play-text frequency scans in
  * src/cbbd_etl/pbp feature extraction; generalized here to an exact
  * sketch-gated operator.)
  */
object HeavyHitters {

  /** Merge `b` into `a` under the k-counter bound: add counts, and if
    * the map overflows k entries, subtract the (k+1)-th largest count
    * from every counter and drop the non-positive ones (the classic
    * MG merge of Agarwal et al., "Mergeable Summaries").
    */
  private[graft] def merge(
      a: mutable.Map[String, Long], b: mutable.Map[String, Long], k: Int)
      : mutable.Map[String, Long] = {
    b.foreach { case (t, c) => a.update(t, a.getOrElse(t, 0L) + c) }
    if (a.size > k) {
      val cut = a.values.toArray.sorted(Ordering[Long].reverse).apply(k)
      val dead = a.iterator.collect { case (t, c) if c - cut <= 0 => t }.toArray
      dead.foreach(a.remove)
      a.keysIterator.toArray.foreach(t => a.update(t, a(t) - cut))
    }
    a
  }

  private[graft] def offer(
      acc: mutable.Map[String, Long], t: String, k: Int): Unit = {
    acc.get(t) match {
      case Some(c) => acc.update(t, c + 1)
      case None if acc.size < k => acc.update(t, 1L)
      case None => // decrement-all step, amortized by eager cleanup
        val dead = acc.iterator.collect { case (x, c) if c == 1 => x }.toArray
        dead.foreach(acc.remove)
        acc.keysIterator.toArray.foreach(x => acc.update(x, acc(x) - 1))
    }
  }

  /** (MG summary of ≤k counters, exact total token count) from one
    * distributed pass over `tokens` (a single string column `tokCol`;
    * nulls are skipped). The summary is MERGEABLE (Agarwal et al.):
    * merge(summarize(A), summarize(B)) is a valid k-counter summary of
    * A ++ B — which is what lets the streaming variant accumulate it
    * across micro-batches without re-reading history. */
  def summarize(tokens: DataFrame, tokCol: String, k: Int)
      : (mutable.Map[String, Long], Long) = {
    require(k > 0)
    tokens.select(col(tokCol)).rdd
      .treeAggregate((mutable.Map.empty[String, Long], 0L))(
        seqOp = { case ((acc, n), row) =>
          if (row.isNullAt(0)) (acc, n)
          else { offer(acc, row.getString(0), k); (acc, n + 1) }
        },
        combOp = { case ((a, na), (b, nb)) => (merge(a, b, k), na + nb) })
  }

  /** (candidate set, exact total token count): the summary's key set.
    * Candidates ⊇ every token with frequency > N/(k+1). */
  def candidates(tokens: DataFrame, tokCol: String, k: Int)
      : (Set[String], Long) = {
    val (m, n) = summarize(tokens, tokCol, k)
    (m.keySet.toSet, n)
  }

  /** Exact heavy hitters: tokens whose count >= N/denom (the same
    * IEEE `n/denom` double division an ANSI `HAVING cnt >= n/denom`
    * computes, so thresholds are bit-identical cross-engine).
    * Requires denom < k+1 so the MG guarantee (freq > N/(k+1) ⇒
    * present) covers every token at-or-above the threshold.
    * Output columns: (`tokCol`, cnt: long). */
  def exact(tokens: DataFrame, tokCol: String, k: Int, denom: Double)
      : DataFrame = {
    require(denom > 0 && denom < k + 1,
      s"denom $denom outside the MG guarantee window (0, ${k + 1})")
    val (cands, n) = candidates(tokens, tokCol, k)
    // candidate filter is a broadcast-sized literal set evaluated
    // before the shuffle: only ≤k distinct keys reach the aggregation
    tokens.filter(col(tokCol).isInCollection(cands))
      .groupBy(col(tokCol))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= lit(n.toDouble / denom))
  }
}
