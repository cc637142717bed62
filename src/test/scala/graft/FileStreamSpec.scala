package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.StreamQueries

/** File-source streaming integration (no network needed): the same
  * tumbling-window transform the MemoryStream units drive, but fed by
  * `readStream.format("parquet")` over a watched directory — the
  * landing-zone ingestion shape a cluster actually runs when Kafka isn't
  * in the picture. Covers, end-to-end: new-file discovery, file-source
  * OFFSET recovery across a checkpoint restart (pre-restart files must
  * not be re-read), watermark-driven window close over discovered files,
  * and exactly-once append into a parquet sink. Asserts stream ≡ batch
  * over the closed windows.
  */
class FileStreamSpec extends AnyFunSuite with SparkFixture {

  private def t(s: String): Timestamp = Timestamp.valueOf(s)

  test("parquet file source: discover, restart from checkpoint, match batch") {
    val s = spark
    import s.implicits._
    val dir = tmpDir("filestream")
    val (srcDir, outDir, ckpt) = (s"$dir/src", s"$dir/out", s"$dir/ckpt")

    val batch1 = Seq(
      TestEv(1, t("2024-01-01 10:00:00"), 1, "click", 1.0),
      TestEv(2, t("2024-01-01 10:10:00"), 1, "click", 2.0),
      TestEv(3, t("2024-01-01 10:20:00"), 2, "view", 4.0))
    // 11:30 moves the 10-minute watermark to 11:20 → closes [10:00, 11:00)
    val batch2 = Seq(TestEv(4, t("2024-01-01 11:30:00"), 1, "click", 8.0))
    // 13:00 → watermark 12:50 → closes [11:00, 12:00)
    val batch3 = Seq(TestEv(5, t("2024-01-01 13:00:00"), 2, "view", 16.0))

    def drop(rows: Seq[TestEv]): Unit =
      rows.toDF().coalesce(1).write.mode("append").parquet(srcDir)

    val schema = batch1.toDF().schema
    def start() = StreamQueries.tumbling(
        s.readStream.schema(schema).parquet(srcDir)
          .withWatermark("ts", "10 minutes"))
      .writeStream.format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", ckpt)
      .outputMode("append").start()

    drop(batch1)
    val q1 = start()
    try q1.processAllAvailable()
    finally q1.stop() // crash stand-in: hour-10 window still open in state

    drop(batch2) // lands while no query is running — discovered on restart
    val q2 = start()
    try {
      q2.processAllAvailable()
      drop(batch3)
      q2.processAllAvailable()
    } finally q2.stop()

    val streamed = s.read.parquet(outDir)
      .select("ws", "event_type", "n", "sval").collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2),
        r.getDouble(3))).toSet
    // batch truth over ALL files, restricted to the windows the final
    // watermark (12:50) closed — append mode emits exactly those
    val batchTruth = StreamQueries.tumbling(
        (batch1 ++ batch2 ++ batch3).toDF())
      .where(col("ws") < lit(t("2024-01-01 12:00:00")))
      .collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2),
        r.getDouble(3))).toSet
    assert(batchTruth.size == 3, s"fixture drift: $batchTruth")
    assert(streamed == batchTruth,
      s"stream/batch divergence:\n  stream=$streamed\n  batch=$batchTruth")
    // dupe guard: a re-read of batch1 after restart would double hour-10
    val hour10Click = streamed.filter(r =>
      r._1 == t("2024-01-01 10:00:00") && r._2 == "click")
    assert(hour10Click == Set((t("2024-01-01 10:00:00"), "click", 2L, 3.0)))
  }

  test("exactly-once composition: foreachBatch(commitEpoch) survives a " +
       "crash-replay of a committed batch with zero duplicates") {
    import java.nio.file.{Files, Paths}
    import scala.jdk.CollectionConverters._
    import graft.sources.ManifestTable
    val s = spark
    import s.implicits._
    val dir = tmpDir("fs_epoch")
    val (srcDir, tableRoot, ckpt) = (s"$dir/src", s"$dir/table", s"$dir/ckpt")

    def drop(ids: Range): Unit =
      ids.toDF("v").coalesce(1).write.mode("append").parquet(srcDir)

    drop(1 to 5)
    val schema = (1 to 1).toDF("v").schema
    def start() = s.readStream.schema(schema).parquet(srcDir)
      .writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
        ManifestTable.commitEpoch(s, tableRoot, df, id); ()
      }
      .option("checkpointLocation", ckpt)
      .start()

    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()
    assert(ManifestTable.committedEpochs(tableRoot) == Set(0L))

    // crash BETWEEN the sink commit and the checkpoint commit: the sink
    // (our manifest) holds epoch 0, but the engine never recorded it —
    // simulated by removing the newest entry from ckpt/commits, exactly
    // the state a kill at that instant leaves on disk. On restart the
    // engine MUST replay batchId 0 with the same data; the sink's
    // ledger makes the replay a no-op.
    val commits = Paths.get(ckpt, "commits")
    val newest = Files.list(commits).iterator().asScala
      .filter(p => p.getFileName.toString.forall(_.isDigit))
      .maxBy(_.getFileName.toString.toLong)
    Files.delete(newest)
    // drop the local-fs checksum sidecar with it, as a real kill would
    // never have written either
    Files.deleteIfExists(
      commits.resolve("." + newest.getFileName.toString + ".crc"))

    val q2 = start()
    try {
      q2.processAllAvailable() // replays epoch 0 → ledger no-op
      drop(6 to 9)             // then fresh data → epoch 1
      q2.processAllAvailable()
    } finally q2.stop()

    // zero duplicates across the restart, ledger == batch ids, and the
    // version history is one commit per EFFECTIVE epoch (the replay
    // added no version)
    val latest = ManifestTable.latestVersion(tableRoot)
    assert(ManifestTable.committedEpochs(tableRoot) == Set(0L, 1L))
    assert(latest == 2,
      s"replayed epoch must not add a version (history=$latest)")
    assert(ManifestTable.readAt(s, tableRoot, latest)
      .collect().map(_.getInt(0)).sorted.toSeq == (1 to 9),
      "rows must appear exactly once across the crash-replay")
  }
}
