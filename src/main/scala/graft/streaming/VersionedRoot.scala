package graft.streaming

import java.nio.file.{Files, Path}

/** The versioned-ROOT half of the persistence convention whose marker
  * half is [[StateMarker]] (VERDICT r13 #4: StreamingKnnGraph.compact
  * and StreamingVectorIndex.compact each hand-rolled the same go-live
  * dance and the same unreferenced-sibling sweep — two copies of
  * crash-window reasoning that must stay identical to stay correct —
  * and IndexArtifacts' new version GC needed the same sweep + parse a
  * third time). ONE implementation of each:
  *
  *  - [[goLive]]: a fully-staged directory becomes the live
  *    `<prefix><version>` root and the marker flips AFTER the rename,
  *    so readers (who resolve roots through the marker only) see the
  *    old state until the flip and the new state after it — never a
  *    torn root. An existing target can only be the unpublished
  *    leftover of a crash between a previous rename and its flip, so
  *    replacing it is safe by construction.
  *  - [[sweep]]: the post-flip cleanup tail — delete every child the
  *    caller's predicate marks unreferenced. Crash-safe because a
  *    crash mid-sweep leaves only garbage a later publish re-sweeps;
  *    the predicate must therefore cover ALL stale generations, not
  *    just the one this publish superseded (the convention every
  *    caller already follows).
  */
private[graft] object VersionedRoot {

  /** Atomic go-live of `staged` as `live`, publishing `version` to
    * `markerDir/markerName` as the publication point. */
  def goLive(staged: java.io.File, live: Path, markerDir: String,
      version: Long, markerName: String): Unit = {
    // an existing target can only be the unpublished leftover of a
    // crash between rename and marker flip — safe to replace
    org.apache.commons.io.FileUtils.deleteQuietly(live.toFile)
    Files.move(staged.toPath, live)
    StateMarker.publish(markerDir, version, name = markerName)
  }

  /** Delete every child of `parent` whose name the predicate marks
    * unreferenced (quiet per child — a vanished or locked entry never
    * fails the publish that already went live).
    * @return the names actually deleted, so a caller that REPORTS its
    *         collection (IndexArtifacts.reap) never claims a child a
    *         held handle or permission error left on disk. */
  def sweep(parent: java.io.File)(unreferenced: String => Boolean)
      : Seq[String] =
    Option(parent.listFiles()).getOrElse(Array.empty[java.io.File])
      .filter(f => unreferenced(f.getName))
      .filter(org.apache.commons.io.FileUtils.deleteQuietly)
      .map(_.getName).toSeq

  /** Parse `name` as `<prefix><version>` with a digit-bounded version
    * field (18 digits — ids fit forever, and a foreign 20-digit name
    * can't overflow Long and crash a sweep; the ADVICE r13 rule, now
    * in one place). None for anything that is not a version dir. */
  def versionOf(name: String, prefix: String): Option[Long] =
    if (name.startsWith(prefix) &&
        name.drop(prefix.length).matches("\\d{1,18}"))
      Some(name.drop(prefix.length).toLong)
    else None
}
