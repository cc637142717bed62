package graft

import java.nio.file.{Files, Path => JPath, Paths, StandardCopyOption}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Incremental

/** Make-semantics contract: build when stale, skip when fresh, rebuild
  * when an input's mtime moves past the output's.
  */
class IncrementalSpec extends AnyFunSuite with SparkFixture {

  private def copyTree(src: JPath, dst: JPath): Unit = {
    Files.walk(src).forEach { p =>
      val t = dst.resolve(src.relativize(p))
      if (Files.isDirectory(p)) Files.createDirectories(t)
      else Files.copy(p, t, StandardCopyOption.REPLACE_EXISTING)
    }
  }

  test("materialize: builds once, skips while fresh, rebuilds on new input") {
    val in = Paths.get(tmpDir("inc_in"), "region")
    copyTree(Paths.get(sfDir, "region.parquet"), in)
    val out = tmpDir("inc_out") + "/agg"
    var builds = 0
    def build() = {
      builds += 1
      spark.read.parquet(in.toString)
        .groupBy("r_regionkey").agg(count(lit(1)).as("n"))
    }

    val (df1, b1) = Incremental.materialize(
      spark, Seq(in.toString), out)(build())
    assert(b1 && builds == 1 && df1.count() == 5)

    // second call: inputs unchanged → skipped, plan never constructed
    val (df2, b2) = Incremental.materialize(
      spark, Seq(in.toString), out)(build())
    assert(!b2 && builds == 1 && df2.count() == 5)

    // touch an input file past the output's mtime → stale → rebuild
    val anyFile = Files.walk(in).filter(Files.isRegularFile(_))
      .findFirst().get()
    val success = Paths.get(out, "_SUCCESS")
    Files.setLastModifiedTime(anyFile,
      java.nio.file.attribute.FileTime.fromMillis(
        Files.getLastModifiedTime(success).toMillis + 2000))
    val (df3, b3) = Incremental.materialize(
      spark, Seq(in.toString), out)(build())
    assert(b3 && builds == 2 && df3.count() == 5)
  }

  test("isFresh is false when the output was never written") {
    assert(!Incremental.isFresh(spark, Seq(sfDir), tmpDir("inc_x") + "/none"))
  }
}
