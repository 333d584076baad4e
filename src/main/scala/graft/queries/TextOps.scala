package graft.queries

/** Text-analysis + dedup surface (filled in incrementally). */
object TextOps {
  def defs: Seq[Q] = Seq()
}
