package graft

/** Gate for WALL-CLOCK ratio assertions in tests (thread-scaling halves
  * time, capped pass not slower, …). The ratios are sound on an idle
  * multi-core host but flake on a busy or low-core CI box, so callers
  * keep their functional assertions unconditional and guard only the
  * timing ones behind [[enabled]].
  *
  * `GRAFT_TIMING_ASSERTS=1` forces the assertions on, `=0` off; unset →
  * auto: require at least `minCores` hardware threads AND a 1-minute
  * loadavg under half the core count (the same idleness signal
  * `graft.Bench` samples for its `noisy` stamp).
  */
object TimingAsserts {
  def enabled(minCores: Int = 8): Boolean =
    sys.env.get("GRAFT_TIMING_ASSERTS") match {
      case Some("1") => true
      case Some("0") => false
      case _ =>
        val cores = Runtime.getRuntime.availableProcessors
        val load = java.lang.management.ManagementFactory
          .getOperatingSystemMXBean.getSystemLoadAverage
        cores >= minCores && load >= 0 && load < cores / 2.0
    }
}
