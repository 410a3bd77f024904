package graft

/** Driver-side wall-clock breakdown for the composed pipelines
  * (q177/q183 — SURVEY §2.12 "corpus increment" family). The q177
  * composition crept 10.49 → 14.37 s over three rounds as stages
  * accreted, and a single end-to-end number cannot charge an
  * accretion to its stage; these timings make the per-stage budget
  * in BASELINE.md enforceable.
  *
  * Semantics: each `timed` block records the WALL CLOCK of the Spark
  * actions it encloses. Spark frames are lazy, so a stage that only
  * DEFINES a frame costs ~0 here and its work is charged to the
  * first downstream stage that materializes it — the breakdown
  * attributes JOBS, not plan fragments (documented at each call
  * site). Diagnostics only: nothing in any gate reads these.
  *
  * Thread-safe (suites run pipelines concurrently), but the buffer
  * is global — `reset()` before a run you intend to read, as
  * [[StageBench]] does.
  *
  * Recording is OFF by default: the production increment path
  * (including the streaming absorb sink's foreachBatch, ~11 entries
  * per micro-batch) flows through `timed`, and an always-on global
  * buffer is an unbounded driver-memory leak in a long-running
  * stream that nobody reads (round-13 advice). [[StageBench]] calls
  * `enable()`; everyone else pays one volatile read and zero
  * allocation. A belt-and-braces cap bounds the buffer even while
  * enabled (oldest dropped — a diagnostic that silently truncates
  * history beats a driver OOM in a diagnostic). */
object StageTimer {
  private val Cap = 4096
  @volatile private var on = false
  private val buf =
    scala.collection.mutable.ArrayBuffer.empty[(String, Double)]

  /** Turn recording on for this JVM (diagnostic harnesses only). */
  def enable(): Unit = { on = true }

  def reset(): Unit = synchronized { buf.clear() }

  /** Recorded (stage, seconds) pairs since the last reset, in
    * execution order. Repeated stages (two increments in one q177
    * run) appear once per execution. */
  def timings: Seq[(String, Double)] = synchronized { buf.toSeq }

  def timed[T](stage: String)(body: => T): T = {
    if (!on) body
    else {
      val t0 = System.nanoTime()
      val r = body
      val dt = (System.nanoTime() - t0) / 1e9
      synchronized {
        if (buf.size >= Cap) buf.remove(0)
        buf += stage -> dt
      }
      r
    }
  }
}
