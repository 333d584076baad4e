package graft.streaming

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}

/** The versioned-state pointer file every incremental state machine in
  * this package publishes: whitespace-separated fields (batch id
  * first) in a single marker file, replaced via tmp-write +
  * ATOMIC_MOVE rename so readers see either the old or the new
  * pointer, never a torn one. ONE implementation — five classes
  * (IncrementalAggregate, IncrementalJoin, IncrementalDedup,
  * StreamingHeavyHitters, StreamingWeightedSample) used to hand-roll
  * this and their formats drifted into 1-, 2- and 3-field variants
  * needing per-class backward-compat parsing.
  */
private[graft] object StateMarker {

  /** Whitespace-split marker fields; empty when no marker exists. */
  def read(dir: String, name: String = "_current"): Array[String] = {
    val m = Paths.get(dir, name)
    if (!Files.exists(m)) Array.empty
    else new String(Files.readAllBytes(m), StandardCharsets.UTF_8)
      .trim.split(" ")
  }

  /** First marker field as the last applied batch id; -1 before the
    * first publish. */
  def lastApplied(dir: String, name: String = "_current"): Long = {
    val f = read(dir, name)
    if (f.isEmpty) -1L else f(0).toLong
  }

  /** Atomically publish `batchId` (+ extra fields) as the marker. */
  def publish(dir: String, batchId: Long, extras: Seq[String] = Nil,
      name: String = "_current"): Unit = {
    val tmp = Paths.get(dir, s"${name}__tmp$batchId")
    Files.write(tmp,
      (batchId.toString +: extras).mkString(" ")
        .getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, Paths.get(dir, name),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }
}
