package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Iterative BPE vocabulary training (the tokenizer-build loop the
  * reference-class pipeline iterates over t19's pair-count step; same
  * procedural class as the ratings solver I1 and KMeans v05).
  *
  * Representation: each word is one string of fully bracketed symbols,
  * `<L>sym<R>` concatenated. A merge of pair (x, y) is then
  * EXACTLY `replace(enc, "<L>x<R><L>y<R>", "<L>xy<R>")`:
  * string replace is left-to-right non-overlapping, which is precisely
  * BPE's merge convention, and the full bracketing means a match can
  * only ever be a whole-symbol pair — a symbol merely SUFFIXED by x
  * cannot match, because the pattern anchors on x's opening bracket.
  *
  * Spark shape per iteration: one codegen'd pair-count hash agg
  * (shuffle keyed by pair over the word-frequency table — VOCABULARY-
  * sized, never corpus-sized), a TakeOrderedAndProject for the top
  * pair, a ONE-ROW driver collect, and a codegen'd `replace` projection
  * to apply the merge. At 100 TB the corpus collapses to the word-
  * frequency table once (t19's groupBy), and every iteration after
  * that touches only that table — the driver state is one (x, y) pair
  * per iteration.
  */
object BpeTrainer {

  private val L = "\u0001"
  private val R = "\u0002"

  /** Initial encoding: every character its own bracketed symbol. */
  def encode(word: Column): Column =
    concat_ws("", transform(split(word, ""), c => concat(lit(L), c, lit(R))))

  /** Bracketed `enc` string -> symbol array (strip the outer brackets,
    * split on the inter-symbol boundary). */
  private def symbols(enc: Column): Column =
    split(enc.substr(lit(2), length(enc) - 2), R + L)

  /** Adjacent symbol pairs as "x y" strings (space-joined: symbols come
    * from space-split words, so they never contain spaces, and space
    * sorts below every symbol character — the joined-string ordering
    * equals component-wise (x, y) ordering). */
  private def pairsOf(syms: Column): Column =
    when(size(syms) >= 2,
      transform(sequence(lit(0), size(syms) - 2),
        i => concat(element_at(syms, i + 1), lit(" "), element_at(syms, i + 2))))
      .otherwise(array())

  /** Run `iterations` BPE merges over a (w, wc) word-frequency table.
    * Returns the re-encoded table (w, wc, enc, syms) and the merge list
    * in application order. Ties break on the pair string ascending. */
  def fit(words: DataFrame, iterations: Int): (DataFrame, Seq[(String, String)]) = {
    var enc = words.select(col("w"), col("wc"), encode(col("w")).as("enc"))
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    for (i <- 1 to iterations) {
      val top = pairCounts(enc)
        .orderBy(col("n_occurrences").desc, col("pair").asc)
        .limit(1)
        .collect() // bounded: exactly one row (the chosen merge)
      top.headOption.foreach { row =>
        val Array(x, y) = row.getString(0).split(" ", 2)
        merges += ((x, y))
        enc = enc.withColumn("enc",
          replace(col("enc"), lit(L + x + R + L + y + R), lit(L + x + y + R)))
      }
      // real vocab builds run tens of thousands of merges: without a
      // periodic lineage cut the plan nests one replace() per merge and
      // the PLANNER dies long before the data does (the CC lesson) —
      // checkpoint the vocabulary-sized table every 25 merges
      if (i % 25 == 0) enc = enc.localCheckpoint(true)
    }
    (enc.withColumn("syms", symbols(col("enc"))), merges.toSeq)
  }

  /** ENCODE with a trained merge list (tokenizer APPLICATION — the
    * production half of the build): fold each merge, in application
    * order, over the word's initial char encoding. Exactly the
    * training-side replace semantics, so train-then-apply round-trips.
    * A real vocabulary is tens of thousands of merges — a chained
    * replace() per merge is planner-infeasible there; the scale shape
    * (t19c) is to encode each DISTINCT word once (vocabulary-sized
    * compute, where a specialized per-word encoder is fine) and join
    * the corpus against that word→tokens table. */
  def applyMerges(word: Column, merges: Seq[(String, String)]): Column =
    merges.foldLeft(encode(word)) { case (enc, (x, y)) =>
      replace(enc, lit(L + x + R + L + y + R), lit(L + x + y + R))
    }

  /** Token count of an encoded word: its symbol-array size. */
  def tokenCount(enc: Column): Column = size(symbols(enc))

  /** Pair-count table over the current encoding (the t19 statistic,
    * recomputed after the merges): ("x y", sum of word counts). */
  def pairCounts(encoded: DataFrame): DataFrame =
    encoded
      .select(col("wc"), explode(pairsOf(symbols(col("enc")))).as("pair"))
      .groupBy(col("pair"))
      .agg(sum(col("wc")).as("n_occurrences"))
}
