package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.{AnomalyHit, ScoredEvent, StreamQueries, UserEvent,
  UserTotal}

final case class TestEv(event_id: Long, ts: Timestamp, user_id: Long,
                        event_type: String, value: Double)

/** The §2.I streaming ops driven through real readStream micro-batches:
  * batch≡stream equivalence, watermark late-data drops, exactly-once dedup,
  * session gap boundaries, and custom mapGroupsWithState state.
  */
class StreamingSpec extends AnyFunSuite with SparkFixture {

  private def t(s: String): Timestamp = Timestamp.valueOf(s)

  test("tumbling: streaming (complete mode) equals batch on same input") {
    val s = spark
    implicit val sql = s.sqlContext
    import s.implicits._
    val rows = Seq(
      TestEv(1, t("2024-01-01 10:00:00"), 1, "click", 1.0),
      TestEv(2, t("2024-01-01 10:40:00"), 1, "click", 2.0),
      TestEv(3, t("2024-01-01 11:10:00"), 2, "view", 3.0))
    val ms = MemoryStream[TestEv]
    val q = StreamQueries.tumbling(ms.toDF())
      .writeStream.format("memory").queryName("tumb_complete")
      .outputMode("complete").start()
    try {
      ms.addData(rows: _*)
      q.processAllAvailable()
      val streamed = spark.table("tumb_complete")
        .orderBy("ws", "event_type").collect().toSeq
      val batch = StreamQueries.tumbling(rows.toDF())
        .orderBy("ws", "event_type").collect().toSeq
      assert(streamed == batch)
    } finally q.stop()
  }

  test("windowed top-k leaderboard: streamed agg + downstream rank " +
    "equals batch") {
    val s = spark
    implicit val sql = s.sqlContext
    import s.implicits._
    val rows = Seq(
      TestEv(1, t("2024-01-01 10:05:00"), 1, "purchase", 5.0),
      TestEv(2, t("2024-01-01 10:15:00"), 2, "purchase", 9.0),
      TestEv(3, t("2024-01-01 10:25:00"), 3, "purchase", 7.0),
      TestEv(4, t("2024-01-01 10:35:00"), 4, "purchase", 1.0),
      TestEv(5, t("2024-01-01 11:05:00"), 1, "purchase", 2.0),
      TestEv(6, t("2024-01-01 10:45:00"), 1, "click", 99.0)) // not spend
    val ms = MemoryStream[TestEv]
    val q = StreamQueries.windowSpend(ms.toDF())
      .writeStream.format("memory").queryName("spend_windows")
      .outputMode("complete").start()
    try {
      // split across micro-batches so the window agg must merge state
      ms.addData(rows.take(3): _*)
      q.processAllAvailable()
      ms.addData(rows.drop(3): _*)
      q.processAllAvailable()
      val streamedTop = StreamQueries
        .rankWindows(spark.table("spend_windows"))
        .orderBy("ws", "rk").collect().toSeq
      val batchTop = StreamQueries
        .rankWindows(StreamQueries.windowSpend(rows.toDF()))
        .orderBy("ws", "rk").collect().toSeq
      assert(streamedTop == batchTop)
      // top-3 of the 10:00 window excludes the lowest spender and clicks
      val w10 = streamedTop.filter(_.getTimestamp(0) ==
        t("2024-01-01 10:00:00"))
      assert(w10.map(_.getLong(1)).toSeq == Seq(2L, 3L, 1L))
    } finally q.stop()
  }

  test("tumbling + 10min watermark (append): closes windows, drops late rows") {
    val s = spark
    implicit val sql = s.sqlContext
    import s.implicits._
    val ms = MemoryStream[TestEv]
    val q = StreamQueries.tumbling(
        ms.toDF().withWatermark("ts", "10 minutes"))
      .writeStream.format("memory").queryName("tumb_append")
      .outputMode("append").start()
    try {
      ms.addData(TestEv(1, t("2024-01-01 10:00:00"), 1, "click", 1.0),
                 TestEv(2, t("2024-01-01 10:05:00"), 1, "click", 2.0))
      q.processAllAvailable() // wm after: 09:55 — nothing closed
      assert(spark.table("tumb_append").count() == 0)
      ms.addData(TestEv(3, t("2024-01-01 11:30:00"), 1, "click", 1.0))
      q.processAllAvailable() // processed with wm 09:55; wm after: 11:20
      ms.addData(TestEv(4, t("2024-01-01 11:35:00"), 1, "click", 1.0))
      q.processAllAvailable() // wm 11:20 closes [10:00, 11:00)
      val closed = spark.table("tumb_append").collect()
      assert(closed.length == 1 && closed(0).getAs[Long]("n") == 2)
      // late row far behind the watermark → dropped, nothing re-emitted
      ms.addData(TestEv(5, t("2024-01-01 10:10:00"), 1, "click", 9.0))
      q.processAllAvailable()
      assert(spark.table("tumb_append").count() == 1)
    } finally q.stop()
  }

  test("dropDuplicates within watermark: exactly-once across micro-batches") {
    val s = spark
    implicit val sql = s.sqlContext
    import s.implicits._
    val ms = MemoryStream[TestEv]
    val q = StreamQueries.dedupEvents(
        ms.toDF().withWatermark("ts", "1 hour"))
      .select("event_id", "user_id")
      .writeStream.format("memory").queryName("dedup_stream")
      .outputMode("append").start()
    try {
      ms.addData(TestEv(1, t("2024-01-01 10:00:00"), 1, "click", 1.0),
                 TestEv(2, t("2024-01-01 10:01:00"), 1, "click", 1.0))
      q.processAllAvailable()
      assert(spark.table("dedup_stream").count() == 2)
      // replay event 1 (same id) + one new id
      ms.addData(TestEv(1, t("2024-01-01 10:00:00"), 1, "click", 1.0),
                 TestEv(3, t("2024-01-01 10:02:00"), 2, "view", 1.0))
      q.processAllAvailable()
      val ids = spark.table("dedup_stream").select("event_id")
        .collect().map(_.getLong(0)).sorted.toSeq
      assert(ids == Seq(1L, 2L, 3L))
    } finally q.stop()
  }

  test("session windows: 30min gap boundary is exclusive-merge (>= splits)") {
    val s = spark
    import s.implicits._
    val rows = Seq(
      TestEv(1, t("2024-01-01 10:00:00"), 1, "click", 1.0),
      TestEv(2, t("2024-01-01 10:29:59"), 1, "click", 1.0), // merges
      TestEv(3, t("2024-01-01 11:00:00"), 1, "click", 1.0), // 30:01 gap → new
      TestEv(4, t("2024-01-01 10:00:00"), 2, "click", 1.0))
    val out = StreamQueries.sessions(rows.toDF())
      .orderBy("user_id", "session_start").collect()
    assert(out.length == 3)
    assert(out(0).getAs[Long]("n_events") == 2)
    assert(out(0).getAs[Timestamp]("session_end") ==
      t("2024-01-01 10:59:59")) // last event + 30min
    assert(out(1).getAs[Long]("n_events") == 1)
    // sessions of one user never overlap
    val u1 = out.filter(_.getAs[Long]("user_id") == 1)
    assert(!u1(1).getAs[Timestamp]("session_start")
      .before(u1(0).getAs[Timestamp]("session_end")))
  }

  test("transformWithState running totals accumulate across micro-batches") {
    val s = spark
    implicit val sql = s.sqlContext
    import s.implicits._
    val prev = s.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    s.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val ms = MemoryStream[UserEvent]
    val q = StreamQueries.runningTotalsTws(ms.toDS())
      .writeStream.format("memory").queryName("totals_tws")
      .outputMode("update").start()
    try {
      ms.addData(UserEvent(1, 1.0), UserEvent(2, 5.0))
      q.processAllAvailable()
      ms.addData(UserEvent(1, 2.0))
      q.processAllAvailable()
      val latest = spark.table("totals_tws").as[UserTotal].collect()
        .groupBy(_.user_id).map { case (_, v) => v.maxBy(_.n) }.toSet
      assert(latest == Set(UserTotal(1, 2, 3.0), UserTotal(2, 1, 5.0)))
    } finally {
      q.stop()
      prev match {
        case Some(p) =>
          s.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None =>
          s.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("anomaly z-scores: stateful stream equals the batch window form") {
    val s = spark
    implicit val sql = s.sqlContext
    import s.implicits._
    val prev = s.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    s.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val ev = graft.sources.Tables.events(s, sfDir)
    // identical cents/micros projection for both paths
    val scored = ev.select(col("event_id"), col("user_id"),
      unix_micros(col("ts")).as("ts_us"),
      round(col("value") * 100)
        .cast(org.apache.spark.sql.types.DecimalType(18, 0))
        .cast("long").as("c")).as[ScoredEvent].collect().toSeq
    // two micro-batches split on event time: cross-batch arrival order is
    // the event-time order the processor contract requires
    val cut = scored.map(_.ts_us).sorted.apply(scored.size / 2)
    val (b1, b2) = scored.partition(_.ts_us < cut)
    val ms = MemoryStream[ScoredEvent]
    val q = StreamQueries.anomalyStream(ms.toDS())
      .writeStream.format("memory").queryName("anomaly_tws")
      .outputMode("update").start()
    try {
      ms.addData(b1: _*)
      q.processAllAvailable()
      ms.addData(b2: _*)
      q.processAllAvailable()
      val streamed = spark.table("anomaly_tws").as[AnomalyHit]
        .collect().toSet
      val batch = StreamQueries.anomalyScores(ev)
        .select(col("event_id"), col("user_id"),
          unix_micros(col("ts")).as("ts_us"), col("c"), col("z"))
        .as[AnomalyHit].collect().toSet
      assert(batch.nonEmpty, "fixture produced no anomalies — test is vacuous")
      assert(streamed == batch)
    } finally {
      q.stop()
      prev match {
        case Some(p) =>
          s.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None =>
          s.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("checkpoint restart: a new query resumes state, no dupes, no loss") {
    val s = spark
    implicit val sql = s.sqlContext
    import s.implicits._
    val dir = tmpDir("restart")
    val ms = MemoryStream[TestEv]
    def start() = StreamQueries.tumbling(
        ms.toDF().withWatermark("ts", "10 minutes"))
      .writeStream.format("parquet")
      .option("path", s"$dir/out")
      .option("checkpointLocation", s"$dir/ckpt") // SAME checkpoint
      .outputMode("append").start()
    val q1 = start()
    try {
      ms.addData(TestEv(1, t("2024-01-01 10:00:00"), 1, "click", 1.0),
                 TestEv(2, t("2024-01-01 10:10:00"), 1, "click", 2.0))
      q1.processAllAvailable()
    } finally q1.stop() // crash/redeploy stand-in: open window state pending
    val q2 = start() // recovery: offsets + window state from the checkpoint
    try {
      ms.addData(TestEv(3, t("2024-01-01 11:30:00"), 1, "click", 4.0),
                 TestEv(4, t("2024-01-01 11:40:00"), 1, "click", 8.0))
      q2.processAllAvailable() // watermark closes [10:00, 11:00)
      val rows = spark.read.parquet(s"$dir/out").collect()
      // the pre-restart window must emit EXACTLY once, with BOTH its
      // pre-restart rows — counted-twice = replayed state, n=1 = lost state
      assert(rows.length == 1)
      assert(rows(0).getAs[Long]("n") == 2)
      assert(rows(0).getAs[Double]("sval") == 3.0)
    } finally q2.stop()
  }

  test("streaming parquet file sink: append windows land in files exactly once") {
    val s = spark
    implicit val sql = s.sqlContext
    import s.implicits._
    val dir = tmpDir("stream_sink")
    val ms = MemoryStream[TestEv]
    val q = StreamQueries.tumbling(
        ms.toDF().withWatermark("ts", "10 minutes"))
      .writeStream.format("parquet")
      .option("path", s"$dir/out")
      .option("checkpointLocation", s"$dir/ckpt")
      .outputMode("append").start()
    try {
      ms.addData(TestEv(1, t("2024-01-01 10:00:00"), 1, "click", 1.0),
                 TestEv(2, t("2024-01-01 10:05:00"), 1, "click", 2.0))
      q.processAllAvailable()
      ms.addData(TestEv(3, t("2024-01-01 11:30:00"), 1, "click", 1.0))
      q.processAllAvailable()
      ms.addData(TestEv(4, t("2024-01-01 11:35:00"), 1, "click", 1.0))
      q.processAllAvailable() // watermark closes [10:00, 11:00)
      val rows = spark.read.parquet(s"$dir/out").collect()
      assert(rows.length == 1 && rows(0).getAs[Long]("n") == 2)
    } finally q.stop()
  }

  test("stream-stream interval join: streaming equals batch, state expires") {
    val s = spark
    implicit val sql = s.sqlContext
    import s.implicits._
    val rows = Seq(
      TestEv(1, t("2024-01-01 10:00:00"), 1, "click", 0.0),
      TestEv(2, t("2024-01-01 10:10:00"), 1, "purchase", 9.99),  // joins 1
      TestEv(3, t("2024-01-01 10:50:00"), 1, "purchase", 5.00),  // >30m after 1
      TestEv(4, t("2024-01-01 10:05:00"), 2, "click", 0.0),
      TestEv(5, t("2024-01-01 10:20:00"), 2, "purchase", 1.50),  // joins 4
      TestEv(6, t("2024-01-01 12:00:00"), 3, "purchase", 7.77))  // no click
    val clicks = MemoryStream[TestEv]
    val purchases = MemoryStream[TestEv]
    val joined = StreamQueries.attributionJoin(
      StreamQueries.clickSide(clicks.toDF())
        .withWatermark("click_ts", "1 hour"),
      StreamQueries.purchaseSide(purchases.toDF())
        .withWatermark("purchase_ts", "1 hour"))
    val q = joined.writeStream.format("memory").queryName("attrib_stream")
      .outputMode("append").start()
    try {
      // split across micro-batches so the join must buffer click state
      clicks.addData(rows.filter(_.event_type == "click"): _*)
      q.processAllAvailable()
      purchases.addData(rows.filter(_.event_type == "purchase"): _*)
      q.processAllAvailable()
      val streamed = spark.table("attrib_stream")
        .select("click_id", "purchase_id", "amount")
        .collect().map(_.toSeq).toSet
      val batchEv = rows.toDF()
      val batch = StreamQueries.attributionJoin(
          StreamQueries.clickSide(batchEv),
          StreamQueries.purchaseSide(batchEv))
        .select("click_id", "purchase_id", "amount")
        .collect().map(_.toSeq).toSet
      assert(batch == Set(Seq(1L, 2L, 9.99), Seq(4L, 5L, 1.5)))
      assert(streamed == batch)
    } finally q.stop()
  }

  test("left-outer stream join: unmatched click emits nulls after watermark") {
    val s = spark
    implicit val sql = s.sqlContext
    import s.implicits._
    val clicks = MemoryStream[TestEv]
    val purchases = MemoryStream[TestEv]
    val joined = StreamQueries.attributionJoinLeft(
      StreamQueries.clickSide(clicks.toDF())
        .withWatermark("click_ts", "10 minutes"),
      StreamQueries.purchaseSide(purchases.toDF())
        .withWatermark("purchase_ts", "10 minutes"))
    val q = joined.writeStream.format("memory").queryName("attrib_left")
      .outputMode("append").start()
    try {
      clicks.addData(TestEv(1, t("2024-01-01 10:00:00"), 1, "click", 0.0),
                     TestEv(2, t("2024-01-01 10:01:00"), 2, "click", 0.0))
      purchases.addData(TestEv(3, t("2024-01-01 10:10:00"), 1, "purchase", 4.0))
      q.processAllAvailable()
      // matched row may emit immediately; the unmatched click (user 2)
      // must NOT have emitted yet — a purchase could still arrive
      val early = spark.table("attrib_left")
        .where(col("click_id") === 2).count()
      assert(early == 0, "unmatched click emitted before watermark closed it")
      // advance both watermarks far past click+30min+delay
      clicks.addData(TestEv(8, t("2024-01-01 12:00:00"), 9, "click", 0.0))
      purchases.addData(
        TestEv(9, t("2024-01-01 12:00:00"), 9, "purchase", 1.0))
      q.processAllAvailable()
      clicks.addData(TestEv(10, t("2024-01-01 13:00:00"), 9, "click", 0.0))
      purchases.addData(
        TestEv(11, t("2024-01-01 13:00:00"), 9, "purchase", 1.0))
      q.processAllAvailable()
      val unmatched = spark.table("attrib_left")
        .where(col("click_id") === 2).collect()
      assert(unmatched.length == 1 && unmatched(0).isNullAt(
        unmatched(0).fieldIndex("purchase_id")),
        "user-2 click should emit exactly once, with null purchase")
      val matched = spark.table("attrib_left")
        .where(col("click_id") === 1).collect()
      assert(matched.length == 1 &&
        matched(0).getAs[Long]("purchase_id") == 3L)
    } finally q.stop()
  }

  test("full-outer stream join: BOTH sides' unmatched rows emit nulls " +
    "after watermark") {
    val s = spark
    implicit val sql = s.sqlContext
    import s.implicits._
    val clicks = MemoryStream[TestEv]
    val purchases = MemoryStream[TestEv]
    val joined = StreamQueries.attributionJoinFull(
      StreamQueries.clickSide(clicks.toDF())
        .withWatermark("click_ts", "10 minutes"),
      StreamQueries.purchaseSide(purchases.toDF())
        .withWatermark("purchase_ts", "10 minutes"))
    val q = joined.writeStream.format("memory").queryName("attrib_full")
      .outputMode("append").start()
    try {
      // user 1: matched pair; user 2: click only; user 3: purchase only
      clicks.addData(TestEv(1, t("2024-01-01 10:00:00"), 1, "click", 0.0),
                     TestEv(2, t("2024-01-01 10:01:00"), 2, "click", 0.0))
      purchases.addData(
        TestEv(3, t("2024-01-01 10:10:00"), 1, "purchase", 4.0),
        TestEv(4, t("2024-01-01 10:02:00"), 3, "purchase", 6.0))
      q.processAllAvailable()
      // neither unmatched row may emit while its partner could still arrive
      val early = spark.table("attrib_full")
        .where(col("click_id") === 2 || col("purchase_id") === 4).count()
      assert(early == 0,
        "unmatched row emitted before its watermark closed the join window")
      // advance both watermarks far past the interval + delay, twice (state
      // eviction runs on the NEXT batch after the watermark moves)
      for (h <- Seq("12", "13")) {
        clicks.addData(TestEv(80, t(s"2024-01-01 $h:00:00"), 9, "click", 0.0))
        purchases.addData(
          TestEv(90, t(s"2024-01-01 $h:00:00"), 9, "purchase", 1.0))
        q.processAllAvailable()
      }
      val out = spark.table("attrib_full")
      val clickOnly = out.where(col("click_id") === 2).collect()
      assert(clickOnly.length == 1 && clickOnly(0).isNullAt(
        clickOnly(0).fieldIndex("purchase_id")),
        "user-2 click should emit exactly once with null purchase side")
      val purchaseOnly = out.where(col("purchase_id") === 4).collect()
      assert(purchaseOnly.length == 1 && purchaseOnly(0).isNullAt(
        purchaseOnly(0).fieldIndex("click_id")),
        "user-3 purchase should emit exactly once with null click side")
      val matched = out.where(col("click_id") === 1).collect()
      assert(matched.length == 1 &&
        matched(0).getAs[Long]("purchase_id") == 3L)
    } finally q.stop()
  }

  test("stream-static enrich: broadcast dim join, streaming equals batch") {
    val s = spark
    implicit val sql = s.sqlContext
    import s.implicits._
    val dim = Seq((1L, "FRANCE"), (2L, "KENYA")).toDF("user_id", "n_name")
    val rows = Seq(
      TestEv(1, t("2024-01-01 10:00:00"), 1, "click", 1.0),
      TestEv(2, t("2024-01-01 10:05:00"), 2, "view", 2.0),
      TestEv(3, t("2024-01-01 10:10:00"), 9, "click", 3.0)) // no dim row
    val ms = MemoryStream[TestEv]
    val q = StreamQueries.enrich(ms.toDF(), dim)
      .select("event_id", "user_id", "n_name")
      .writeStream.format("memory").queryName("enrich_stream")
      .outputMode("append").start()
    try {
      ms.addData(rows: _*)
      q.processAllAvailable()
      val streamed = spark.table("enrich_stream")
        .orderBy("event_id").collect().toSeq
      val batch = StreamQueries.enrich(rows.toDF(), dim)
        .select("event_id", "user_id", "n_name")
        .orderBy("event_id").collect().toSeq
      // stateless inner join: user 9 drops, others enrich — identically
      assert(streamed == batch && streamed.length == 2)
    } finally q.stop()
  }

  test("foreachBatch idempotent sink: epoch replay does not duplicate rows") {
    val s = spark
    implicit val sql = s.sqlContext
    import s.implicits._
    val out = tmpDir("eos_sink")
    val sink = StreamQueries.idempotentParquetSink(out)
    val ms = MemoryStream[TestEv]
    val q = ms.toDF().select("event_id", "user_id")
      .writeStream.foreachBatch(sink).start()
    try {
      ms.addData(TestEv(1, t("2024-01-01 10:00:00"), 1, "click", 1.0),
                 TestEv(2, t("2024-01-01 10:01:00"), 2, "view", 2.0))
      q.processAllAvailable()
      val once = spark.read.parquet(out).count()
      // simulate the recovery path: the SAME epoch re-delivered with the
      // same batchId must overwrite its own directory, not append
      sink(Seq((1L, 1L), (2L, 2L)).toDF("event_id", "user_id"), 0L)
      assert(spark.read.parquet(out).count() == once)
      // a genuinely new epoch adds its own directory
      sink(Seq((3L, 3L)).toDF("event_id", "user_id"), 1L)
      assert(spark.read.parquet(out).count() == once + 1)
    } finally q.stop()
  }

  test("mapGroupsWithState running totals accumulate across micro-batches") {
    val s = spark
    implicit val sql = s.sqlContext
    import s.implicits._
    val ms = MemoryStream[UserEvent]
    val q = StreamQueries.runningTotals(ms.toDS())
      .writeStream.format("memory").queryName("totals_stream")
      .outputMode("update").start()
    try {
      ms.addData(UserEvent(1, 1.0), UserEvent(2, 5.0))
      q.processAllAvailable()
      ms.addData(UserEvent(1, 2.0))
      q.processAllAvailable()
      val latest = spark.table("totals_stream").as[UserTotal].collect()
        .groupBy(_.user_id).map { case (_, v) => v.maxBy(_.n) }.toSet
      assert(latest == Set(UserTotal(1, 2, 3.0), UserTotal(2, 1, 5.0)))
    } finally q.stop()
  }
}
