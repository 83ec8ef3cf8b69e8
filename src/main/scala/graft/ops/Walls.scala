package graft.ops

/** Env-gated wall-clock attribution for the index-lifecycle operators
  * (guide §1.5: label where the time goes). `SPARK_GRAFT_TIMINGS=1` prints
  * one stderr line per labelled region; off (the default) it is a plain
  * call with no timer, no allocation, no output — safe on every hot path.
  *
  * The bench's per-query seconds are the sum of many sequential driver-side
  * actions (builds, bucketed writes, lease/meta IO); a per-region wall is
  * the only way to attribute a lifecycle query's cost to the operator that
  * owns it instead of guessing from job counts. */
private[graft] object Walls {
  val on: Boolean = sys.env.get("SPARK_GRAFT_TIMINGS").contains("1")

  def timed[T](label: String)(f: => T): T =
    if (!on) f
    else {
      val t0 = System.nanoTime()
      try f
      finally System.err.println(
        f"[graft-wall] $label ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
}
