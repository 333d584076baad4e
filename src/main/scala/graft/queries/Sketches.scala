package graft.queries

import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Approximate-aggregation sketches (beyond-reference; the 100 TB
  * path for a13-style distincts and a15-style quantiles, where exact
  * distinct/percentile means a full shuffle of the key set).
  *
  * Oracle design: DuckDB can't replay Spark's HLL++/KLL internals, but
  * it CAN check the contract — each query emits the EXACT statistic
  * plus a boolean asserting the sketch landed inside its error bound,
  * and the oracle recomputes the exact side with a literal `true`.
  * A sketch drifting out of bound flips the boolean and fails the
  * hash gate, so these are NOT rows-only checks.
  */
object Sketches {

  def defs: Seq[Q] = Seq(

    Q(
      "sk01_approx_distinct",
      "approx_count_distinct (HLL++, rsd 2%) vs exact distinct per " +
        "order priority; emits the exact count and a within-5% bound " +
        "flag the oracle pins to true. At 100 TB the sketch is one " +
        "mergeable 'register set' per group — no distinct shuffle.",
      (s, d) => {
        val o = Tables.orders(s, d)
        o.groupBy(col("o_orderpriority"))
          .agg(
            countDistinct(col("o_custkey")).as("n_exact"),
            approx_count_distinct(col("o_custkey"), 0.02).as("n_approx"))
          .select(col("o_orderpriority"), col("n_exact"),
            (abs(col("n_approx") - col("n_exact"))
              <= col("n_exact") * 0.05).as("within_5pct"))
      },
      Some("""
        SELECT o_orderpriority,
               count(DISTINCT o_custkey) AS n_exact,
               true AS within_5pct
        FROM orders GROUP BY 1""")),

    Q(
      "sk02_approx_quantile",
      "percentile_approx (accuracy 10000) vs the exact interpolated " +
        "median per order priority; emits the exact median and a flag " +
        "that the sketch median sits inside the exact [p45, p55] band, " +
        "pinned to true by the oracle.",
      (s, d) => {
        val o = Tables.orders(s, d)
        o.groupBy(col("o_orderpriority"))
          .agg(
            expr("percentile(o_totalprice, 0.5)").as("p50_exact"),
            expr("percentile(o_totalprice, 0.45)").as("p45"),
            expr("percentile(o_totalprice, 0.55)").as("p55"),
            expr("percentile_approx(o_totalprice, 0.5, 10000)").as("p50_approx"))
          .select(col("o_orderpriority"),
            round(col("p50_exact"), 2).as("p50_exact"),
            col("p50_approx").between(col("p45"), col("p55")).as("in_band"))
      },
      Some("""
        SELECT o_orderpriority,
               round(quantile_cont(o_totalprice, 0.5), 2) AS p50_exact,
               true AS in_band
        FROM orders GROUP BY 1""")),

    Q(
      "sk03_count_min",
      "Count-Min frequency sketch (seeded, eps 0.1%) vs exact " +
        "per-event-type counts: the heavy-hitter counter whose build " +
        "is a distributed treeAggregate merge of per-partition " +
        "sketches; only the finished O(width x depth) register table " +
        "reaches the driver. CMS never underestimates and " +
        "overestimates by at most eps*N w.h.p. — the flag pins " +
        "0 <= est - exact <= 0.01*N and the oracle sets it true. The " +
        "per-key probe loops over the 5-value event_type domain on " +
        "the driver (bounded by key cardinality, the dm10 grid " +
        "precedent), never over events.",
      (s, d) => {
        val e = Tables.events(s, d)
        val cms = e.stat.countMinSketch(col("event_type"),
          eps = 0.001, confidence = 0.99, seed = 42)
        val exact = e.groupBy(col("event_type"))
          .agg(count(lit(1)).as("n_exact")).collect()
        val total = exact.map(_.getLong(1)).sum
        val rows = exact.map { r =>
          val est = cms.estimateCount(r.getString(0))
          (r.getString(0), r.getLong(1),
            est >= r.getLong(1) && est - r.getLong(1) <= 0.01 * total)
        }.toSeq
        import s.implicits._
        rows.toDF("event_type", "n_exact", "within_bound")
      },
      Some("""
        SELECT event_type, count(*) AS n_exact, true AS within_bound
        FROM events GROUP BY 1""")),

    Q(
      "sk04_heavy_hitters",
      "EXACT heavy hitters in two passes (operators/HeavyHitters): " +
        "boilerplate-bigram discovery over documents — every bigram " +
        "with count >= N/850. Pass 1 treeAggregates a 1023-counter " +
        "Misra-Gries summary (mergeable; anything above N/1024 is " +
        "guaranteed present), pass 2 recounts ONLY the <=1023 " +
        "candidates exactly and applies the threshold. Unlike " +
        "sk01-sk03's bound-flag gates this IS the exact SQL answer " +
        "hash-for-hash: the sketch prunes the shuffle (<=1023 distinct " +
        "keys instead of the whole gram vocabulary), it never changes " +
        "the result. The fixture's ~900-bigram vocabulary sits under k " +
        "(prune inert here; HeavyHittersSpec drives real eviction on a " +
        "400-token zipf stream with k=63); at corpus scale vocabulary " +
        "is unbounded while the shuffle stays k-bounded — the naive " +
        "form shuffles every gram occurrence.",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val bigrams = docs
          .select(split(col("text"), " ").as("w"))
          .filter(size(col("w")) >= 2)
          .select(explode(expr(
            "transform(sequence(1, size(w) - 1)," +
              " i -> concat(w[i-1], ' ', w[i]))")).as("tok"))
        graft.operators.HeavyHitters.exact(bigrams, "tok", k = 1023, denom = 850.0)
      },
      Some("""
        WITH w AS (SELECT string_split(text, ' ') AS w FROM documents),
        b AS (SELECT w[i] || ' ' || w[i+1] AS tok
              FROM (SELECT w, unnest(range(1, len(w))) AS i FROM w)),
        tot AS (SELECT count(*) AS n FROM b)
        SELECT tok, cnt FROM
          (SELECT tok, count(*) AS cnt FROM b GROUP BY 1), tot
        WHERE cnt >= n / 850.0"""))
  )
}
