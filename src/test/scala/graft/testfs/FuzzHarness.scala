package graft.testfs

import java.lang.management.ManagementFactory
import java.util.concurrent.{Executors, TimeUnit, TimeoutException}

/** Shared mutant-probe harness for the decoder fuzz specs
  * (Hdf5FuzzSpec, MediaFuzzSpec).
  *
  * Hang detection is CPU-TIME based, not wall-clock: the decoder hang
  * class this guards against is an unbounded CPU loop (cursor not
  * advancing, runaway FS codeword), and a wall-clock fuse conflates that
  * with host starvation — a fully-loaded co-tenant host once turned 22
  * healthy mutants into spurious "HANG (>10s)" findings because the
  * worker thread simply got no CPU for 10 s. The worker's own
  * `ThreadMXBean.getThreadCpuTime` only advances when the probe actually
  * runs, so the fuse fires on real loops regardless of load, and never
  * on a starved-but-fine probe. A generous wall-clock ceiling stays as
  * the backstop for a probe that BLOCKS forever (not our decoders'
  * failure mode, but a stuck fuse would otherwise stall the suite).
  */
final class FuzzHarness(threadName: String) {

  private val tmx = ManagementFactory.getThreadMXBean
  private val CpuBudgetNs = 10L * 1000 * 1000 * 1000 // 10 s of actual CPU
  private val WallCeilingMs = 300L * 1000 // blocked-probe backstop

  private def newPool() = Executors.newSingleThreadExecutor { r =>
    val t = new Thread(r, threadName); t.setDaemon(true); t
  }
  private var pool = newPool()

  /** Run one probe; Some(outcome) = finished (None inside = clean,
    * Some(t) = threw t); None = hung (pool replaced). */
  def probe(run: () => Unit): Option[Option[Throwable]] = {
    val workerId = new java.util.concurrent.atomic.AtomicLong(-1L)
    val startCpu = new java.util.concurrent.atomic.AtomicLong(0L)
    val fut = pool.submit(new java.util.concurrent.Callable[Option[Throwable]] {
      def call(): Option[Throwable] = {
        // the worker thread is REUSED across probes, so its absolute CPU
        // time accumulates — budget the DELTA from this probe's entry
        startCpu.set(tmx.getCurrentThreadCpuTime)
        workerId.set(Thread.currentThread.getId)
        try { run(); None } catch { case t: Throwable => Some(t) }
      }
    })
    val deadline = System.currentTimeMillis() + WallCeilingMs
    while (true) {
      try return Some(fut.get(200, TimeUnit.MILLISECONDS))
      catch {
        case _: TimeoutException =>
          val id = workerId.get()
          val cpu =
            if (id < 0) 0L else tmx.getThreadCpuTime(id) - startCpu.get()
          if (cpu > CpuBudgetNs || System.currentTimeMillis() > deadline) {
            fut.cancel(true)
            pool.shutdownNow()
            pool = newPool()
            return None
          }
      }
    }
    None // unreachable
  }

  def shutdown(): Unit = pool.shutdownNow()
}
