package graft

// throwaway optimization probe: split per-query wall into
// (plan = construct DataFrame + analyze/optimize/physical-plan) vs
// (exec = run via noop sink). Prints TSV sorted by plan time.
object PlanTimeProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sfDir/region.parquet").count()
    val only = args.toSet
    val rows = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.isEmpty || only(n) }
      .map { case (name, fn) =>
        val t0 = System.nanoTime()
        try {
          val df = fn(spark, sfDir)
          df.queryExecution.executedPlan // force analyze+optimize+plan
          val t1 = System.nanoTime()
          df.write.format("noop").mode("overwrite").save()
          val t2 = System.nanoTime()
          (name, (t1 - t0) / 1e9, (t2 - t1) / 1e9)
        } catch { case e: Throwable =>
          System.err.println(s"[plantime] $name failed: $e")
          (name, -1.0, -1.0)
        }
      }
    println("== sorted by plan seconds ==")
    rows.sortBy(-_._2).foreach { case (n, p, e) =>
      println(f"$n\t$p%.3f\t$e%.3f")
    }
    val ps = rows.map(_._2).filter(_ >= 0).sum
    val es = rows.map(_._3).filter(_ >= 0).sum
    println(f"TOTALS\tplan $ps%.1f s\texec $es%.1f s")
    spark.stop()
  }
}
