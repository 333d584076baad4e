package graft.queries

/** Domain (basketball-semantics) operators exercised on the generic test
  * tables (filled in incrementally). */
object DomainOps {
  def defs: Seq[Q] = Seq()
}
