package graft

/** Shared fixed ForkJoinPool for coarse task-level concurrency (the
  * gold runner's independent transforms, fixture-lake writes, audit
  * readbacks, Verify's query fan-out). One JVM-wide pool instead of a
  * fresh never-shutdown pool per call site — g08 alone used to mint
  * two pools per bench invocation. 4-way: these tasks are themselves
  * Spark jobs, so the pool only needs enough width to keep the
  * scheduler fed, not one thread per core.
  */
object Par {
  private lazy val pool = new java.util.concurrent.ForkJoinPool(4)

  def map[A, B](xs: Seq[A])(f: A => B): Seq[B] = {
    import scala.collection.parallel.CollectionConverters._
    val p = xs.par
    p.tasksupport = new scala.collection.parallel.ForkJoinTaskSupport(pool)
    p.map(f).seq
  }

  def foreach[A](xs: Seq[A])(f: A => Unit): Unit = { map(xs)(f); () }
}
