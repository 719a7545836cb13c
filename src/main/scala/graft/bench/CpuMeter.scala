package graft.bench

/**
 * Executor-CPU accounting shared by the benches (Bench's headline/queries
 * and ScalingBench's per-phase samples — one definition, round-6 lesson:
 * this listener + drain pair was copy-pasted scaffolding once already).
 *
 * Sums `executorCpuTime` over completed tasks; [[snapshotNs]] drains the
 * listener bus first so the counter covers every task of the action that
 * just returned (events post asynchronously). Open the CPU window at the
 * SAME instant as the wall clock — wrapping extra driver work inside the
 * window over-attributes CPU (round-6 gotcha).
 */
final class CpuMeter(sc: org.apache.spark.SparkContext) {

  private val cpuNs = new java.util.concurrent.atomic.AtomicLong(0)

  sc.addSparkListener(new org.apache.spark.scheduler.SparkListener {
    override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
      val m = te.taskMetrics
      if (m != null) { cpuNs.addAndGet(m.executorCpuTime); () }
    }
  })

  /** Drain the listener bus, then read the counter. listenerBus is
    * private[spark] — public in bytecode, reached reflectively. */
  def snapshotNs(): Long = {
    scala.util.Try {
      val bus = sc.getClass.getMethod("listenerBus").invoke(sc)
      bus.getClass.getMethods.find(m => m.getName == "waitUntilEmpty" && m.getParameterCount == 0)
        .orElse(bus.getClass.getMethods.find(_.getName == "waitUntilEmpty"))
        .foreach { m =>
          if (m.getParameterCount == 0) m.invoke(bus)
          else m.invoke(bus, java.lang.Long.valueOf(10000L))
        }
    }
    cpuNs.get()
  }

  /** Time `body`, opening the CPU window at the same instant as the wall
    * clock: returns (result, wallSecs, cpuSecs). */
  def timed[A](body: => A): (A, Double, Double) = {
    val c0 = snapshotNs()
    val t0 = System.nanoTime()
    val r = body
    val wall = (System.nanoTime() - t0) / 1e9
    val cpu = (snapshotNs() - c0) / 1e9
    (r, wall, cpu)
  }
}
