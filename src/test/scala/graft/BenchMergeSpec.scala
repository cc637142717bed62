package graft

import org.scalatest.funsuite.AnyFunSuite

/** Unit pins for the bench-telemetry snapshot policy (r18 verdict
  * #1/#4): row normalization to 8 typed columns, and the loaded-window
  * byte-twin wall protection that keeps load artifacts out of the
  * regression gate. Pure functions — no Spark session needed.
  */
class BenchMergeSpec extends AnyFunSuite {

  private def row(axis: String, q: String, wall: String,
                  build: String = "0.000", rd: String = "1.000",
                  wr: String = "1.000", sp: String = "0.000",
                  tk: String = "10"): String =
    Seq(axis, q, wall, build, rd, wr, sp, tk).mkString("\t")

  test("pad8 fills short and empty-field rows with typed sentinels") {
    assert(BenchMerge.pad8("/tmp/x\t__calib__\t0.493") ==
      "/tmp/x\t__calib__\t0.493\t0.000\t0.000\t0.000\t0.000\t0")
    // r17-era width-8 rows with EMPTY metric fields (the rows that
    // broke header-indexed float parsers) normalize in place
    assert(BenchMerge.pad8("/tmp/x\t__calib__\t0.493\t0.355\t\t\t\t") ==
      "/tmp/x\t__calib__\t0.493\t0.355\t0.000\t0.000\t0.000\t0")
    // fully-typed rows pass through byte-identically
    val full = row("/a", "q1", "1.234")
    assert(BenchMerge.pad8(full) == full)
  }

  test("every pad8 output parses as 8 typed columns") {
    val ragged = Seq("/a\tq\t1.0", "/a\tq\t1.0\t\t\t\t\t",
      "/a\tq\t1.0\t2.0\t3.0\t4.0\t5.0\t6")
    ragged.map(BenchMerge.pad8).foreach { l =>
      val c = l.split('\t')
      assert(c.length == 8)
      c.slice(2, 7).foreach(v => assert(v.toDouble >= 0))
      assert(c(7).toInt >= 0)
    }
  }

  test("quiet sweep: fresh measurements always win, even slower ones") {
    val old = Seq(row("/a", "q1", "1.000"))
    val mine = Seq(row("/a", "q1", "9.000"))
    assert(BenchMerge.twinProtect(old, mine, loaded = false) == mine)
  }

  test("loaded sweep: byte-twin prior with a faster wall is kept " +
      "verbatim") {
    val old = Seq(row("/a", "q1", "1.000", build = "0.500"))
    val mine = Seq(row("/a", "q1", "3.000"))
    val out = BenchMerge.twinProtect(old, mine, loaded = true)
    assert(out == old, "the quiet twin (including its build col) wins")
  }

  test("loaded sweep: a byte DELTA disables protection — the slow wall " +
      "is a plan change, not load") {
    val old = Seq(row("/a", "q1", "1.000", rd = "1.000"))
    // +50% shuffle read: not a twin
    val mineBytes = Seq(row("/a", "q1", "3.000", rd = "1.500"))
    assert(BenchMerge.twinProtect(old, mineBytes, loaded = true)
      == mineBytes)
    // different task count: not a twin
    val mineTasks = Seq(row("/a", "q1", "3.000", tk = "11"))
    assert(BenchMerge.twinProtect(old, mineTasks, loaded = true)
      == mineTasks)
  }

  test("loaded sweep: a FASTER fresh wall replaces the prior (min-plan-" +
      "cost semantics)") {
    val old = Seq(row("/a", "q1", "2.000"))
    val mine = Seq(row("/a", "q1", "1.200"))
    assert(BenchMerge.twinProtect(old, mine, loaded = true) == mine)
  }

  test("byte tolerance absorbs listener jitter but not real shifts") {
    // 100.000 vs 100.008 MB (the r18 adamic_adar case): twin
    val old = Seq(row("/a", "q1", "1.795", rd = "100.000", wr = "100.000",
      tk = "129"))
    val mine = Seq(row("/a", "q1", "3.805", rd = "100.008", wr = "100.008",
      tk = "129"))
    assert(BenchMerge.twinProtect(old, mine, loaded = true) == old)
  }

  test("calib rows and unmatched queries are never protected") {
    val old = Seq(row("/a", "__calib__", "0.500"),
      row("/a", "q_other", "0.100"))
    val mine = Seq(row("/a", "__calib__", "2.000"),
      row("/a", "q_new", "5.000"))
    assert(BenchMerge.twinProtect(old, mine, loaded = true) == mine)
  }

  test("legacy short prior rows participate after padding (zero-wall " +
      "priors never win)") {
    // a padded legacy row has wall but 0-sentinel bytes; a new row with
    // real bytes is not its twin — and a 0-wall prior must never replace
    // anything (the `> 0` guard)
    val old = Seq("/a\tq1\t0.000")
    val mine = Seq(row("/a", "q1", "3.000"))
    assert(BenchMerge.twinProtect(old, mine, loaded = true) == mine)
  }
}
