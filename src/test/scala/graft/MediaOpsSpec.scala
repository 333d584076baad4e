package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BinaryType, LongType}
import graft.multimodal.MediaOps

class MediaOpsSpec extends SparkSpec {

  private def docs = {
    val s = spark
    import s.implicits._
    Seq((1L, "a" * 100), (2L, "hello world"), (3L, "x" * 64))
      .toDF("doc_id", "text")
  }

  test("payload is a binary column carrying the utf-8 bytes") {
    val df = MediaOps.withPayload(docs)
    assert(df.schema("payload").dataType == BinaryType)
    val r = df.filter(col("doc_id") === 2).select(length(col("payload"))).head()
    assert(r.getInt(0) == 11)
  }

  test("meta struct is typed and deterministic") {
    val df = MediaOps.withMeta(MediaOps.withPayload(docs))
    val m = df.filter(col("doc_id") === 1)
      .select(col("media_meta.byte_len"), col("media_meta.width"),
        col("media_meta.height"), col("media_meta.channels")).head()
    assert(m.getInt(0) == 100 && m.getInt(1) == 100 && m.getInt(2) == 220 &&
      m.getInt(3) == 3)
  }

  test("frame sampling chunks the payload into 64-byte frames") {
    val df = MediaOps.withFrameHashes(MediaOps.withMeta(MediaOps.withPayload(docs)))
    val rows = df.select(col("doc_id"), col("n_frames"), size(col("frame_hashes")))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getInt(2))).toMap
    assert(rows(1L) == ((2L, 2)))  // 100 bytes -> 2 frames
    assert(rows(2L) == ((1L, 1)))  // 11 bytes -> 1 frame
    assert(rows(3L) == ((1L, 1)))  // exactly 64 bytes -> 1 frame
    // identical content -> identical frame hash; distinct -> distinct
    val h = df.select(col("doc_id"), element_at(col("frame_hashes"), 1).as("f0"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(h(1L) != h(3L))
  }

  test("extractFeatures runs partition-parallel and is deterministic") {
    val s = spark
    import s.implicits._
    val media = MediaOps.withPayload(docs)
      .select(col("doc_id"), col("payload"))
      .as[MediaOps.MediaIn]
      .repartition(3)
    val f = MediaOps.extractFeatures(media, dim = 4).collect()
      .map(x => x.doc_id -> x).toMap
    assert(f.size == 3)
    assert(f(2L).byte_len == 11)
    assert(f(2L).feature.length == 4)
    val again = MediaOps.extractFeatures(media, dim = 4).collect()
      .map(x => x.doc_id -> x.feature.toSeq).toMap
    assert(f.map { case (k, v) => k -> v.feature.toSeq } == again)
  }
}
