package graft

/** Merge policy for the bench telemetry snapshots (BENCH_PRIOR.tsv /
  * BENCH_DETAIL.tsv) — extracted from Bench's main so the protocol
  * introduced for r18 verdict #1/#4 is unit-testable on its own:
  *
  *  - `pad8`: every retained row is normalized to 8 FULLY TYPED columns
  *    (axis, query, wall_s, build_s, shuf_read_mb, shuf_write_mb,
  *    spill_mb, tasks). Pre-telemetry rows carried empty metric fields
  *    that broke header-indexed float parsers; 0-sentinels are the
  *    documented trade — those axes' corpora are gone, so "not
  *    measured" and "measured zero" are equally unusable as priors,
  *    and a file where every row parses wins.
  *
  *  - `twinProtect`: when a sweep ran in a LOADED window (calib bracket
  *    decayed >1.3×, or started >1.3× above the prior calibration), a
  *    new row whose shuffle-byte/spill/task telemetry is bit-close to
  *    its prior twin but whose wall is slower is a load artifact, not
  *    a plan change — the prior (quiet) row is kept verbatim so the
  *    next round's regression gate stays anchored to real plan cost.
  *    Only fires on a loaded bracket: on a quiet box the fresh
  *    measurement always wins, so a genuine same-bytes regression
  *    (e.g. codegen fell back to interpreted) still lands the moment a
  *    quiet sweep sees it.
  */
object BenchMerge {

  /** Pad/normalize a TSV row to 8 typed columns (0-sentinels). */
  def pad8(l: String): String = {
    val c = (l.split('\t') ++ Array.fill(8)("")).take(8)
    (0 until 8).map { i =>
      if (c(i).nonEmpty) c(i) else if (i == 7) "0" else "0.000"
    }.mkString("\t")
  }

  /** Byte metrics match within max(0.05 MB, 2%) — "bit-close": task
    * counts must be exactly equal, shuffle read/write/spill within the
    * tolerance that absorbs listener-drain jitter but not a plan change.
    */
  private def near(a: String, b: String): Boolean = {
    val x = a.toDouble
    val y = b.toDouble
    math.abs(x - y) <= math.max(0.05, 0.02 * math.max(x, y))
  }

  /** Replace each of this run's rows with its (axis, query) prior twin
    * when `loaded` and the prior is a byte-twin with a faster wall.
    * Calib rows are never protected (they ARE the load record).
    */
  def twinProtect(oldLines: Seq[String], mine: Seq[String],
                  loaded: Boolean): Seq[String] =
    if (!loaded) mine
    else {
      val old = oldLines.map(pad8).flatMap { l =>
        val c = l.split('\t')
        if (c.length == 8) Some((c(0), c(1)) -> c) else None
      }.toMap
      mine.map { l =>
        val c = l.split('\t')
        old.get((c(0), c(1))) match {
          case Some(o) if !c(1).startsWith("__calib") =>
            val keepOld = try {
              o(2).toDouble > 0 && o(2).toDouble < c(2).toDouble &&
                o(7) == c(7) && near(o(4), c(4)) && near(o(5), c(5)) &&
                near(o(6), c(6))
            } catch { case _: NumberFormatException => false }
            if (keepOld) o.mkString("\t") else l
          case _ => l
        }
      }
    }
}
