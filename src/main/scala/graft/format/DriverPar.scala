package graft.format

/** Bounded-parallel driver-side metadata mapping (guide §5/§6): per-file
  * parquet-footer reads are independent, latency-bound operations — a
  * serial loop over them serializes the driver on file count, which at
  * 100 TB bucket/partition counts (thousands of part files) becomes the
  * bottleneck of an otherwise metadata-only step. Runs `f` over `xs` on
  * at most `threads` threads, preserving input order and rethrowing the
  * first failure's own exception (not the ExecutionException wrapper).
  * Sequential below 4 items — pool setup outweighs the win there. */
private[graft] object DriverPar {
  def parMap[A, B](xs: Seq[A], threads: Int = 8, minPar: Int = 4)(
      f: A => B): Seq[B] =
    if (xs.size < minPar) xs.map(f)
    else {
      val pool = java.util.concurrent.Executors.newFixedThreadPool(
        math.min(threads, xs.size))
      try {
        val futures = xs.map { x =>
          pool.submit(new java.util.concurrent.Callable[B] {
            def call(): B = f(x)
          })
        }
        futures.map { fu =>
          try fu.get()
          catch {
            case e: java.util.concurrent.ExecutionException =>
              throw e.getCause
          }
        }
      } finally pool.shutdown()
    }
}
