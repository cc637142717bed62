package graft

// throwaway optimization probe: per-JOB shuffle byte attribution for one
// query (callsite-labelled), so eager localCheckpoint builds are visible
// separately from the final plan's own exchanges.
object JobProbe {
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
    import scala.collection.concurrent.TrieMap
    val jobSite = TrieMap[Int, String]()
    val stageJob = TrieMap[Int, Int]()
    val jobBytes = TrieMap[Int, (Long, Long, Long)]() // read, write, tasks
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          jobSite(j.jobId) = Option(j.properties)
            .flatMap(p => Option(p.getProperty("callSite.short")))
            .getOrElse("?")
          j.stageIds.foreach(sid => stageJob(sid) = j.jobId)
        }
        override def onTaskEnd(
            t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          val m = t.taskMetrics
          if (m != null) {
            val jid = stageJob.getOrElse(t.stageId, -1)
            val (r, w, n) = jobBytes.getOrElse(jid, (0L, 0L, 0L))
            jobBytes(jid) = (r + m.shuffleReadMetrics.totalBytesRead,
              w + m.shuffleWriteMetrics.bytesWritten, n + 1)
          }
        }
      })
    args.foreach { name =>
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      org.apache.spark.graftbridge.ListenerDrain.drain(spark.sparkContext)
      println(f"== $name total $dt%.2f s ==")
      jobBytes.toSeq.sortBy(_._1).foreach { case (jid, (r, w, n)) =>
        println(f"  job $jid%3d  read ${r / 1048576.0}%8.2f MB  " +
          f"write ${w / 1048576.0}%8.2f MB  tasks $n%5d  " +
          jobSite.getOrElse(jid, "?"))
      }
      jobBytes.clear(); jobSite.clear(); stageJob.clear()
    }
    spark.stop()
  }
}
