package graft.queries

/** Embedding similarity-search surface (filled in incrementally). */
object VectorOps {
  def defs: Seq[Q] = Seq()
}
