package graft.plans

import org.apache.spark.sql.{Column, DataFrame, GraftPlanBridge}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions.{lit, xxhash64}
import org.apache.spark.sql.types.BinaryType

/** Broadcast-able Bloom filter over a column, built and probed with the
  * SAME Spark-internal expressions the optimizer's runtime row-level
  * filtering uses (`BloomFilterAggregate` / `BloomFilterMightContain`) —
  * fully codegen'd, no UDFs, engine-exact across build and probe because
  * both sides key on `xxhash64` of the column.
  *
  * Why it exists: the t10 decontamination join broadcasts the RAW
  * benchmark gram set. At 100 TB the benchmark side is tens of millions
  * of grams — gigabytes raw, but ~1.2 MB per million items as a bloom at
  * the default 3% fpp. The scale shape is: build the bloom in one
  * distributed aggregate, ship the serialized bits as a literal in the
  * probe expression (task-closure broadcast), kill the overwhelming
  * majority of corpus grams executor-side BEFORE any shuffle, then
  * exact-verify only the survivors with a plain shuffle join — making the
  * final output exact (bloom false positives are filtered by the verify
  * join, false negatives are impossible by construction).
  */
object BloomSketch {

  /** One distributed aggregate pass; the returned bits are the only
    * driver-side value (bounded by numBits/8 — ~1.2 MB per 1M expected
    * items — the sanctioned sketch-sized collect class). */
  def build(df: DataFrame, c: Column, expectedItems: Long): Array[Byte] = {
    // clamp into BloomFilterAggregate's accepted range; past the 4M conf
    // default a real deployment raises
    // spark.sql.optimizer.runtime.bloomFilter.maxNumItems (and maxNumBits)
    // rather than silently degrading fpp
    val sized = math.min(math.max(expectedItems, 1024L), 4000000L)
    val agg = new BloomFilterAggregate(GraftPlanBridge.expr(xxhash64(c)), sized)
    val row = df.agg(GraftPlanBridge.column(agg.toAggregateExpression()).as("bf")).head()
    if (row.isNullAt(0)) Array.emptyByteArray else row.getAs[Array[Byte]](0)
  }

  /** Codegen'd membership probe: false only when the value is DEFINITELY
    * absent. An empty filter (built over zero rows) matches nothing. */
  def mightContain(bloom: Array[Byte], c: Column): Column =
    if (bloom.isEmpty) lit(false)
    else GraftPlanBridge.column(
      BloomFilterMightContain(Literal(bloom, BinaryType), GraftPlanBridge.expr(xxhash64(c))))
}
