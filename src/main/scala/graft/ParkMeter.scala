package graft

/** Whole-VM stall (park) detector — the r17 bench heartbeat, shared
  * with the measurement harnesses (RebuildScale, ProbeAB, LinkScale)
  * so ladder points carry their park overlap instead of being read as
  * "minima under unknown contamination" (r16 verdict #4).
  *
  * A daemon thread sleeps a fixed period and records every overshoot
  * beyond `threshMs` as a park interval: a stall of the whole VM
  * (vCPU preemption, hypervisor pause) stalls this thread exactly like
  * it stalls executor threads, so the overshoot IS the stolen
  * wall-clock. Known conflation: a stop-the-world GC pause also
  * overshoots — for a measured window that is equally non-code
  * inflation, so discounting it errs conservative (see Bench.scala's
  * fuller discussion). */
final class ParkMeter(periodMs: Long = 100L, threshMs: Long = 250L) {
  private val parks =
    new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long)]()
  private val periodNs = periodMs * 1000000L
  private val threshNs = threshMs * 1000000L
  @volatile private var stopped = false
  private val t = new Thread(() => {
    while (!stopped) {
      val t0 = System.nanoTime()
      try Thread.sleep(periodMs) catch { case _: InterruptedException => }
      val dt = System.nanoTime() - t0
      // attribute the stall to the tail of the interval: the sleep was
      // due at t0+period, everything after that is overshoot
      if (dt - periodNs > threshNs) parks.add((t0 + periodNs, t0 + dt))
    }
  }, "graft-park-meter")
  t.setDaemon(true)
  t.start()

  /** Seconds of detected park intervals overlapping [t0Nanos, t1Nanos]
    * (System.nanoTime() values). */
  def overlapSecs(t0Nanos: Long, t1Nanos: Long): Double = {
    var sum = 0L
    val it = parks.iterator()
    while (it.hasNext) {
      val (ps, pe) = it.next()
      val o = math.min(t1Nanos, pe) - math.max(t0Nanos, ps)
      if (o > 0) sum += o
    }
    sum / 1e9
  }

  def stop(): Unit = stopped = true
}
