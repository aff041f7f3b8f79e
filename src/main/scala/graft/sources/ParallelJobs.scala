package graft.sources

/** Shared fan-out helper for overlapping INDEPENDENT Spark jobs
  * (optimization guide §2.6): later jobs back-fill the executor tail
  * of earlier ones instead of paying a serial job floor. Used by
  * [[TimeTravel.commitSeries]], the index maintenance paths
  * ([[InvertedIndex]]), and the bounded probe loops in the fixture
  * queries.
  *
  * Failure contract: ALL thunks are awaited — success or failure —
  * before anything is rethrown, so no job outlives the call. A caller
  * that catches the (first, in argument order) rethrown failure can
  * therefore rely on every sibling having finished: a maintenance
  * window ends when this returns or throws, never while a concurrent
  * rename is still in flight.
  */
private[graft] object ParallelJobs {

  /** Run the thunks concurrently (bounded pool), await all, return
    * their results in order; rethrows the first failure AFTER every
    * thunk has completed. */
  def awaitAll[A](thunks: Seq[() => A]): Seq[A] = {
    require(thunks.nonEmpty, "awaitAll needs at least one job")
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.min(thunks.size, 8))
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutorService(pool)
    try {
      // Future(Try(...)) never fails, so every Await below runs to
      // completion — the first failure is rethrown only once all
      // siblings have finished
      val done = thunks
        .map(t => scala.concurrent.Future(scala.util.Try(t())))
        .map(f => scala.concurrent.Await.result(
          f, scala.concurrent.duration.Duration.Inf))
      done.collectFirst { case scala.util.Failure(e) => throw e }
      done.map(_.get)
    } finally pool.shutdown()
  }
}
