package graft.operators

import org.apache.spark.sql.Dataset

/** Storage hygiene for iterative operators that cut lineage with eager
  * local checkpoints (ADVICE r11): `Dataset.unpersist()` on a
  * localCheckpoint-ed frame is a no-op — the cache manager does not
  * track the checkpoint's LogicalRDD blocks — so per-round frames
  * accumulated for the whole loop despite the unpersist calls. The
  * blocks are freed by unpersisting the BACKING RDD itself.
  *
  * Only safe when every downstream consumer is itself already
  * materialized (a local checkpoint's cached blocks ARE its data —
  * unrecomputable once dropped). The iterative loops here qualify:
  * each round's frame is eagerly checkpointed before the previous
  * round's is freed.
  */
object Lineage {

  def free(df: Dataset[_]): Unit =
    df.queryExecution.analyzed.collectLeaves().foreach {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(blocking = false)
      case _ => ()
    }
}
