package graft

/** Session-global staging-time accumulator for gate attribution.
  *
  * The streaming gates pay deterministic INPUT-PREP inside their own
  * wall: batch xlsx encodes of the corpus slice a stream then reads
  * (plus SharedPrep cache-miss builds). Under IO pressure that staging
  * inflates 10-60× and a reader of the bench artifact cannot tell
  * engine time from staging time — BENCH_r18.json's anomalous window
  * (excel_stream_quantile 75.2 s driver vs 12.2 s idle) was adjudicated
  * by hand (VERDICT r18, Next #2). Gates wrap their staging in
  * [[staged]]; `graft.Bench` snapshots the counter around each repeat
  * and stamps `{stage_s, engine_s}` per gate into `bench_full.json`, so
  * the next anomalous artifact is self-attributing.
  *
  * A plain monotonic counter (never reset) so concurrent readers only
  * ever diff snapshots; staging runs inside the gate's own call, on the
  * bench's single driver thread — nested [[staged]] calls would
  * double-count, so wrap only leaf staging blocks.
  */
object GateMetrics {
  private val stagingNanos = new java.util.concurrent.atomic.AtomicLong

  /** Run `body`, attributing its wall time to staging. */
  def staged[T](body: => T): T = {
    val t0 = System.nanoTime()
    try body
    finally stagingNanos.addAndGet(System.nanoTime() - t0)
  }

  /** Monotonic staging-nanos counter; diff two snapshots to attribute. */
  def snapshot(): Long = stagingNanos.get()
}
