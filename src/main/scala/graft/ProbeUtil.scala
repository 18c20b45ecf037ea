package graft

/** Shared probe plumbing — the stopwatch every probe main re-implemented. */
private[graft] object ProbeUtil {
  def time[T](f: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val r = f
    (r, (System.nanoTime() - t0) / 1e9)
  }
}
