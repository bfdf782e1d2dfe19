package graft

/** Fixed, dependency-free host-speed probe — the missing denominator in
  * round-over-round bench comparisons. Rounds 4→5→6 each measured the
  * SAME untouched queries ~10% slower than the previous round while
  * same-day runs repeat within ~1%: that signature is host-capacity
  * drift, not plan regressions, but without an absolute yardstick each
  * round has to re-argue it. This main runs a deterministic integer
  * workload (no allocation, no I/O, no JIT-variant branches) single- and
  * multi-threaded and prints one JSON line; its numbers recorded next to
  * a bench run let the NEXT round divide out host speed before reading
  * any per-query ratio as a regression.
  *
  * Run: `sbt "runMain graft.HostProbe"`. The workload is a fixed-length
  * LCG chain (data-dependent, so it cannot be vectorized or folded) —
  * ~1.5 s single-threaded on the round-6 box.
  */
object HostProbe {

  /** LCG chain of dependent steps, value returned so the JIT cannot
    * dead-code the loop.
    */
  private def chain(iters: Long, seed: Long): Long = {
    var x = seed
    var i = 0L
    while (i < iters) {
      x = x * 6364136223846793005L + 1442695040888963407L
      i += 1
    }
    x
  }

  def main(args: Array[String]): Unit = {
    val iters = 1600000000L
    val threads = Runtime.getRuntime.availableProcessors()
    // warm the JIT on a short chain first so the measurement is steady-state
    chain(iters / 10, 1L)
    val t1 = System.nanoTime()
    val r1 = chain(iters, 1L)
    val sec1 = (System.nanoTime() - t1) / 1e9
    val pool = java.util.concurrent.Executors.newFixedThreadPool(threads)
    val tN = System.nanoTime()
    val futures = (0 until threads).map { t =>
      pool.submit(new java.util.concurrent.Callable[Long] {
        override def call(): Long = chain(iters, t + 1L)
      })
    }
    val rN = futures.map(_.get()).reduce(_ ^ _)
    val secN = (System.nanoTime() - tN) / 1e9
    pool.shutdown()
    // aggregate throughput in chain-steps/sec; scale = how much the pool
    // beats one thread (ideal = thread count on an unloaded exclusive box)
    val single = iters / sec1 / 1e6
    val multi = iters.toDouble * threads / secN / 1e6
    println(f"""{"harness":"host-probe","threads":$threads,"sec_single":$sec1%.2f,""" +
      f""""sec_multi":$secN%.2f,"msteps_single":$single%.0f,"msteps_multi":$multi%.0f,""" +
      f""""scale":${multi / single}%.1f,"check":${r1 ^ rN}}""")
  }
}
