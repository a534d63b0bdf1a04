package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.streaming.StreamOps

class StreamingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", TimestampType),
    StructField("user_id", LongType), StructField("value", DoubleType)))

  private def writeBatch(dir: String, name: String, rows: Seq[(Long, String, Long, Double)]): Unit =
    rows.map { case (id, ts, uid, v) => (id, java.sql.Timestamp.valueOf(ts), uid, v) }
      .toDF("event_id", "ts", "user_id", "value")
      .coalesce(1).write.mode("append").json(s"$dir")

  private def tmp() = java.nio.file.Files.createTempDirectory("graft_stream").toString

  test("T1+T2: file stream → tumbling window stats (memory sink)") {
    val dir = tmp()
    writeBatch(dir, "b1", Seq(
      (1L, "2024-01-01 10:05:00", 1L, 10.0),
      (2L, "2024-01-01 10:20:00", 1L, 20.0),
      (3L, "2024-01-01 11:05:00", 1L, 40.0),
      (4L, "2024-01-01 10:10:00", 2L, 5.0)))
    val stream = StreamOps.fileStream(spark, dir, schema)
    assert(stream.isStreaming)
    val agg = StreamOps.windowedStats(stream, "ts", "user_id", "value", "1 hour")
    val q = agg.writeStream.outputMode("complete")
      .format("memory").queryName("t2out").start()
    StreamOps.runOnce(q)
    val out = spark.table("t2out")
      .select("user_id", "window_start", "n", "sum_value")
      .as[(Long, java.sql.Timestamp, Long, Double)].collect().toSet
    assert(out == Set(
      (1L, java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), 2L, 30.0),
      (1L, java.sql.Timestamp.valueOf("2024-01-01 11:00:00"), 1L, 40.0),
      (2L, java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), 1L, 5.0)))
  }

  test("T2 sliding: overlapping windows double-count as expected") {
    val dir = tmp()
    writeBatch(dir, "b1", Seq((1L, "2024-01-01 10:30:00", 1L, 7.0)))
    val stream = StreamOps.fileStream(spark, dir, schema)
    val agg = StreamOps.windowedStats(stream, "ts", "user_id", "value",
      "1 hour", slide = Some("30 minutes"))
    val q = agg.writeStream.outputMode("complete").format("memory")
      .queryName("t2slide").start()
    StreamOps.runOnce(q)
    // event at 10:30 belongs to [10:00,11:00) and [10:30,11:30)
    assert(spark.table("t2slide").count() == 2)
  }

  test("T4: watermark drops late data that batch keeps (documented divergence)") {
    val dir = tmp()
    writeBatch(dir, "b1", Seq(
      (1L, "2024-01-01 10:00:00", 1L, 1.0),
      (2L, "2024-01-01 12:00:00", 1L, 2.0))) // advances watermark to 11:50
    val stream = StreamOps.fileStream(spark, dir, schema)
    val agg = StreamOps.windowedStats(stream, "ts", "user_id", "value",
      "1 hour", watermark = Some("10 minutes"))
    val q = agg.writeStream.outputMode("append").format("memory")
      .queryName("t4out").start()
    q.processAllAvailable()
    // second batch arrives far behind the watermark
    writeBatch(dir, "b2", Seq((3L, "2024-01-01 09:00:00", 1L, 100.0)))
    q.processAllAvailable()
    // third batch pushes watermark far forward, closing all open windows
    writeBatch(dir, "b3", Seq((4L, "2024-01-01 20:00:00", 1L, 3.0)))
    q.processAllAvailable()
    q.stop()
    val sums = spark.table("t4out").select("sum_value").as[Double].collect().toSet
    assert(!sums.contains(100.0), s"late row must be dropped, got $sums")
    assert(sums.contains(1.0) && sums.contains(2.0))
    // batch over the same files KEEPS the late row — the divergence
    val batch = spark.read.schema(schema).json(dir)
    assert(batch.agg(sum("value")).head.getDouble(0) == 106.0)
  }

  test("A5 streaming twin: hour-interval stats over a stream match batch") {
    val dir = tmp()
    writeBatch(dir, "b1", Seq(
      (1L, "2024-01-01 10:00:00", 1L, 5.0),   // in 09-17
      (2L, "2024-01-01 23:00:00", 1L, 7.0),   // in 22-05 (wrap)
      (3L, "2024-01-02 03:00:00", 1L, 9.0),   // in 22-05 next day
      (4L, "2024-01-01 20:00:00", 1L, 100.0)))// in neither
    val stream = StreamOps.fileStream(spark, dir, schema)
    val agg = StreamOps.intervalStats(stream, "ts", "user_id", "value",
      Seq(("09:00:00", "17:00:00"), ("22:00:00", "05:00:00")))
    val q = agg.writeStream.outputMode("complete").format("memory")
      .queryName("a5s").start()
    StreamOps.runOnce(q)
    val r = spark.table("a5s").head
    assert(r.getAs[Double]("sum_value_090000_170000") == 5.0)
    assert(r.getAs[Double]("sum_value_220000_050000") == 16.0)
    assert(r.getAs[Long]("count_value_220000_050000") == 2L)
  }

  test("T5: dropDuplicatesWithinWatermark dedups by key") {
    val dir = tmp()
    writeBatch(dir, "b1", Seq(
      (1L, "2024-01-01 10:00:00", 1L, 1.0),
      (1L, "2024-01-01 10:00:05", 1L, 1.0), // dup event_id
      (2L, "2024-01-01 10:01:00", 2L, 2.0)))
    val stream = StreamOps.fileStream(spark, dir, schema)
    val dedup = StreamOps.streamingDedup(stream, "ts", "1 hour", Seq("event_id"))
    val q = dedup.writeStream.outputMode("append").format("memory")
      .queryName("t5out").start()
    StreamOps.runOnce(q)
    assert(spark.table("t5out").count() == 2)
  }

  test("T3: session windows merge events within gap") {
    val dir = tmp()
    writeBatch(dir, "b1", Seq(
      (1L, "2024-01-01 10:00:00", 1L, 1.0),
      (2L, "2024-01-01 10:10:00", 1L, 1.0),  // same session (gap 30m)
      (3L, "2024-01-01 12:00:00", 1L, 1.0))) // new session
    val stream = StreamOps.fileStream(spark, dir, schema)
    val sess = StreamOps.sessionStats(stream, "ts", "user_id", "30 minutes", "0 seconds")
    val q = sess.writeStream.outputMode("complete").format("memory")
      .queryName("t3out").start()
    StreamOps.runOnce(q)
    val out = spark.table("t3out").select("n_events").as[Long].collect().sorted
    assert(out.toSeq == Seq(1L, 2L))
  }

  test("T3 custom state: flatMapGroupsWithState sessionizer closes sessions across batches") {
    import graft.streaming.StreamOps.{SessionEvent, ClosedSession}
    val dir = tmp()
    // batch 1: two events in one session for user 1
    writeBatch(dir, "b1", Seq(
      (1L, "2024-01-01 10:00:00", 1L, 1.0),
      (2L, "2024-01-01 10:10:00", 1L, 2.0)))
    val stream = StreamOps.fileStream(spark, dir, schema).as[SessionEvent]
    val sessions = StreamOps.statefulSessionize(stream, java.time.Duration.ofMinutes(30),
      org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout)
    val q = sessions.writeStream.outputMode("append").format("memory")
      .queryName("t3state").start()
    q.processAllAvailable()
    assert(spark.table("t3state").count() == 0) // session still open
    // batch 2: event far later → closes the first session (state crossed batches)
    writeBatch(dir, "b2", Seq((3L, "2024-01-01 15:00:00", 1L, 5.0)))
    q.processAllAvailable()
    val closed = spark.table("t3state").as[ClosedSession].collect()
    q.stop()
    assert(closed.length == 1)
    assert(closed.head.n_events == 2 && closed.head.sum_value == 3.0)
    assert(closed.head.session_start == ts("2024-01-01 10:00:00"))
    assert(closed.head.session_end == ts("2024-01-01 10:10:00"))
  }

  test("T-state: statefulDailyCusum accumulates drift, merges straddled days") {
    import graft.streaming.StreamOps.{KeyedStamp, CusumDayOut}
    val dir = tmp()
    // mu0=3, slack=0, h=4: day1 n=5 -> S+=2; day2 n=6 -> S+=5 ALARM
    writeBatch(dir, "b1",
      (1 to 5).map(i => (i.toLong, "2024-01-01 10:00:00", 1L, 1.0)) ++
      (6 to 11).map(i => (i.toLong, "2024-01-02 10:00:00", 1L, 1.0)))
    val stream = StreamOps.fileStream(spark, dir, schema)
      .select(lit("k").as("key"), col("ts")).as[KeyedStamp]
    val out = StreamOps.statefulDailyCusum(stream, mu0 = 3L, slack = 0L,
      h = 4L)
    val q = out.writeStream.outputMode("append").format("memory")
      .queryName("tcusum").start()
    q.processAllAvailable()
    val r1 = spark.table("tcusum").as[CusumDayOut].collect().sortBy(_.day)
    assert(r1.map(_.s_pos).toSeq == Seq(2L, 5L))
    assert(r1.map(_.alarm).toSeq == Seq(false, true))
    // straddle: 2 more day-2 events -> n 6->8, S+ recomputed 2+(8-3)=7
    writeBatch(dir, "b2",
      (12 to 13).map(i => (i.toLong, "2024-01-02 14:00:00", 1L, 1.0)))
    q.processAllAvailable()
    val r2 = spark.table("tcusum").as[CusumDayOut].collect()
    val fin = r2.filter(_.day.toString == "2024-01-02").maxBy(_.n)
    assert(fin.n == 8L && fin.s_pos == 7L && fin.alarm)
    // a quiet day drains the positive sum: n=1 -> max(0, 7 + (1-3)) = 5
    writeBatch(dir, "b3", Seq((20L, "2024-01-03 10:00:00", 1L, 1.0)))
    q.processAllAvailable()
    val r3 = spark.table("tcusum").as[CusumDayOut].collect()
    q.stop()
    val d3 = r3.filter(_.day.toString == "2024-01-03").maxBy(_.n)
    assert(d3.s_pos == 5L && d3.s_neg == 2L, s"drain: $d3")
  }

  test("T-state: statefulDailyEwma folds across batches, drops replays") {
    import graft.streaming.StreamOps.{KeyedStamp, EwmaDayOut}
    val dir = tmp()
    // batch 1: day 1 has 4 events, day 2 has 8 -> ewma 4 then
    // (1*8 + 3*4)/4 = 5
    writeBatch(dir, "b1",
      (1 to 4).map(i => (i.toLong, "2024-01-01 10:00:00", 1L, 1.0)) ++
      (5 to 12).map(i => (i.toLong, "2024-01-02 10:00:00", 1L, 1.0)))
    val stream = StreamOps.fileStream(spark, dir, schema)
      .select(lit("k").as("key"), col("ts")).as[KeyedStamp]
    val out = StreamOps.statefulDailyEwma(stream, aNum = 1, aDen = 4)
    val q = out.writeStream.outputMode("append").format("memory")
      .queryName("tewma").start()
    q.processAllAvailable()
    val r1 = spark.table("tewma").as[EwmaDayOut].collect().sortBy(_.day)
    assert(r1.map(_.n).toSeq == Seq(4L, 8L))
    assert(r1.map(_.ewma).toSeq == Seq(4L, 5L))
    // batch 2: day 3 (4 events) folds against carried state ->
    // (1*4 + 3*5)/4 = 4; a replayed day-1 event is DROPPED
    writeBatch(dir, "b2",
      (13 to 16).map(i => (i.toLong, "2024-01-03 10:00:00", 1L, 1.0)) ++
      Seq((99L, "2024-01-01 23:00:00", 1L, 1.0)))
    q.processAllAvailable()
    val r2 = spark.table("tewma").as[EwmaDayOut].collect().sortBy(_.day)
    assert(r2.length == 3) // the replayed day emitted nothing
    assert(r2.last.n == 4L && r2.last.ewma == 4L)
    // batch 3: the OPEN day 3 straddles the batch boundary — 4 more
    // events merge into its count and the day RE-EMITS corrected:
    // n 4->8, ewma recomputed from the pre-day-3 fold (1*8+3*5)/4 = 5
    writeBatch(dir, "b3",
      (17 to 20).map(i => (i.toLong, "2024-01-03 14:00:00", 1L, 1.0)))
    q.processAllAvailable()
    val r3 = spark.table("tewma").as[EwmaDayOut].collect()
    assert(r3.length == 4) // 3 days + one correction row
    // changelog semantics: largest-n row is the day's final value
    val fin3 = r3.filter(_.day.toString == "2024-01-03").maxBy(_.n)
    assert(fin3.n == 8L && fin3.ewma == 5L,
      s"straddled day must merge, got $fin3")
    // batch 4: day 4 folds against the CORRECTED day-3 value:
    // (1*4 + 3*5)/4 = 4
    writeBatch(dir, "b4",
      (25 to 28).map(i => (i.toLong, "2024-01-04 10:00:00", 1L, 1.0)))
    q.processAllAvailable()
    val r4 = spark.table("tewma").as[EwmaDayOut].collect()
    q.stop()
    val fin4 = r4.filter(_.day.toString == "2024-01-04").maxBy(_.n)
    assert(fin4.n == 4L && fin4.ewma == 4L,
      s"day after a straddle must fold on the corrected state, got $fin4")
  }

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("T7: stream-stream join matches right rows within the event-time bound") {
    val ldir = tmp(); val rdir = tmp()
    // impressions
    writeBatch(ldir, "b1", Seq(
      (1L, "2024-01-01 10:00:00", 1L, 0.0),
      (2L, "2024-01-01 10:00:00", 2L, 0.0),
      (3L, "2024-01-01 12:00:00", 1L, 0.0)))
    // clicks: one in-window per user 1 impression, one too late, one for user 2
    val clickSchema = StructType(Seq(
      StructField("click_id", LongType), StructField("cts", TimestampType),
      StructField("user_id", LongType), StructField("amount", DoubleType)))
    Seq((10L, java.sql.Timestamp.valueOf("2024-01-01 10:20:00"), 1L, 1.0),
        (11L, java.sql.Timestamp.valueOf("2024-01-01 11:10:00"), 1L, 2.0),
        (12L, java.sql.Timestamp.valueOf("2024-01-01 10:29:00"), 2L, 3.0))
      .toDF("click_id", "cts", "user_id", "amount")
      .coalesce(1).write.mode("append").json(rdir)
    val li = StreamOps.fileStream(spark, ldir, schema)
    val ri = StreamOps.fileStream(spark, rdir, clickSchema)
    val joined = StreamOps.streamStreamJoin(li, ri, "user_id",
      "ts", "cts", watermark = "1 hour", within = "30 minutes")
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("t7out").start()
    StreamOps.runOnce(q)
    val out = spark.table("t7out").select("event_id", "click_id")
      .as[(Long, Long)].collect().toSet
    // impression 1 ↔ click 10 (20 min later); impression 2 ↔ click 12;
    // click 11 is 70 min after impression 1 (out of window) and 50 min
    // BEFORE impression 3 (right must not precede left)
    assert(out == Set((1L, 10L), (2L, 12L)))
  }

  test("T7: right-outer join keeps the join key on unmatched right rows") {
    val ldir = tmp(); val rdir = tmp()
    val clickSchema = StructType(Seq(
      StructField("click_id", LongType), StructField("cts", TimestampType),
      StructField("user_id", LongType), StructField("amount", DoubleType)))
    def writeClicks(rows: Seq[(Long, String, Long, Double)]): Unit =
      rows.map { case (i, t, u, a) => (i, ts(t), u, a) }
        .toDF("click_id", "cts", "user_id", "amount")
        .coalesce(1).write.mode("append").json(rdir)
    // batch 1: one matched pair (user 1) and one unmatched click (user 99)
    writeBatch(ldir, "b1", Seq((1L, "2024-01-01 10:00:00", 1L, 0.0)))
    writeClicks(Seq((10L, "2024-01-01 10:20:00", 1L, 1.0),
      (99L, "2024-01-01 10:00:00", 99L, 9.0)))
    val li = StreamOps.fileStream(spark, ldir, schema)
    val ri = StreamOps.fileStream(spark, rdir, clickSchema)
    val joined = StreamOps.streamStreamJoin(li, ri, "user_id",
      "ts", "cts", watermark = "1 hour", within = "30 minutes",
      joinType = "right_outer")
    val qn = "t7ro_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName(qn).start()
    try {
      q.processAllAvailable()
      // advance both watermarks past click 99's match horizon, then one
      // more batch so the eviction (computed at batch N's start from
      // batch N-1's max event time) actually runs
      writeBatch(ldir, "b2", Seq((2L, "2024-01-01 20:00:00", 2L, 0.0)))
      writeClicks(Seq((11L, "2024-01-01 20:00:00", 2L, 1.0)))
      q.processAllAvailable()
      writeBatch(ldir, "b3", Seq((3L, "2024-01-01 21:00:00", 3L, 0.0)))
      q.processAllAvailable()
      val rows = spark.table(qn)
        .select("click_id", "user_id", "event_id").collect()
      val unmatched = rows.filter(_.getLong(0) == 99L)
      assert(unmatched.length == 1, s"click 99 must be emitted, got ${rows.toSeq}")
      // the regression this pins: before the coalesce fix the key of a
      // null-padded right row was dropped with the left side → null here
      assert(!unmatched.head.isNullAt(1) && unmatched.head.getLong(1) == 99L,
        s"unmatched right row must keep its join key: ${unmatched.head}")
      assert(unmatched.head.isNullAt(2), "left side must be null-padded")
      // matched rows keep their key too (identity on the inner path)
      assert(rows.filter(_.getLong(0) == 10L).forall(_.getLong(1) == 1L))
    } finally q.stop()
  }

  test("T6: parquet sink + stream-static enrichment via foreachBatch") {
    val dir = tmp(); val out = tmp(); val ckpt = tmp()
    writeBatch(dir, "b1", Seq(
      (1L, "2024-01-01 10:00:00", 1L, 10.0),
      (2L, "2024-01-01 10:30:00", 2L, 20.0)))
    val users = Seq((1L, "alice"), (2L, "bob")).toDF("user_id", "name")
    val stream = StreamOps.fileStream(spark, dir, schema)
    val agg = StreamOps.windowedStats(stream, "ts", "user_id", "value",
      "1 hour", watermark = Some("1 minute"))
    val q = StreamOps.enrichedSink(agg, users, "user_id", s"$out/data", s"$ckpt/c")
      .outputMode("update").start()
    StreamOps.runOnce(q)
    val res = spark.read.parquet(s"$out/data")
    assert(res.count() == 2)
    assert(res.filter(col("name") === "alice").count() == 1)
  }

  test("E6: count-min grid is micro-batch-split invariant (one file per trigger)") {
    import graft.ext.Sketches
    val dir = java.nio.file.Files.createTempDirectory("graft_cm_stream")
    val all = (1 to 900).map(i => ((i * 131) % 97).toLong)
    // three staged files = three micro-batches with maxFilesPerTrigger=1
    all.grouped(300).zipWithIndex.foreach { case (chunk, i) =>
      chunk.toDF("k").coalesce(1).write.parquet(s"$dir/part_$i")
    }
    val batchGrid = Sketches.countMinBuild(all.toDF("k"), col("k"), 32, 4)
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val kSchema = StructType(Seq(StructField("k", LongType)))
    val stream = spark.readStream.schema(kSchema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$dir/part_*")
    val qname = "cm_stream_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val q = Sketches.countMinBuild(stream, col("k"), 32, 4)
      .writeStream.format("memory").queryName(qname)
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      assert(q.recentProgress.length >= 3, "expected >= 3 micro-batches")
      val streamGrid = spark.table(qname)
        .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
      assert(streamGrid == batchGrid,
        "stream-built grid must equal the batch-built grid")
    } finally { q.stop() }
  }

  test("T-state: statefulFunnel — ordered stages across batches, horizon gates") {
    import graft.streaming.StreamOps
    import graft.streaming.StreamOps.{TypedStamp, FunnelOut}
    val dir = tmp()
    // value encodes the stage: 1=view, 2=click, 3=purchase
    def toTyped(df: org.apache.spark.sql.DataFrame) =
      df.select(col("user_id").cast("string").as("key"),
        unix_micros(col("ts")).as("us"),
        when(col("value") === 1.0, "view").when(col("value") === 2.0, "click")
          .otherwise("purchase").as("etype")).as[TypedStamp]
    // batch 1: user 1 clicks BEFORE any view (must not count), then views;
    // user 2 views (their click comes 10 days later — outside the horizon)
    writeBatch(dir, "b1", Seq(
      (1L, "2024-01-01 09:00:00", 1L, 2.0),
      (2L, "2024-01-01 10:00:00", 1L, 1.0),
      (3L, "2024-01-01 10:00:00", 2L, 1.0)))
    val q = StreamOps.statefulFunnel(
        toTyped(StreamOps.fileStream(spark, dir, schema)),
        Seq("view", "click", "purchase"), horizonUs = 7L * 86400000000L)
      .writeStream.outputMode("append").format("memory")
      .queryName("tfunnel").start()
    q.processAllAvailable()
    val r1 = spark.table("tfunnel").as[FunnelOut].collect()
    assert(r1.map(o => o.user_id -> o.furthest).toSet ==
      Set("1" -> 1L, "2" -> 1L), s"got ${r1.toSeq}")
    // batch 2: user 1's purchase at 10:20 precedes the click at 10:30
    // within the SAME batch — event-time order means it cannot count;
    // the click advances the funnel to 2. User 2's click is 10 days
    // out: horizon-gated, no emission.
    writeBatch(dir, "b2", Seq(
      (4L, "2024-01-01 10:20:00", 1L, 3.0),
      (5L, "2024-01-01 10:30:00", 1L, 2.0),
      (6L, "2024-01-11 10:00:00", 2L, 2.0)))
    q.processAllAvailable()
    val r2 = spark.table("tfunnel").as[FunnelOut].collect()
    assert(r2.count(_.user_id == "1") == 2)
    assert(r2.filter(_.user_id == "1").map(_.furthest).max == 2L)
    assert(r2.count(_.user_id == "2") == 1) // nothing new for user 2
    // batch 3: a purchase after the click completes user 1's funnel
    writeBatch(dir, "b3", Seq((7L, "2024-01-01 11:00:00", 1L, 3.0)))
    q.processAllAvailable()
    val r3 = spark.table("tfunnel").as[FunnelOut].collect()
    q.stop()
    val fin = r3.filter(_.user_id == "1").maxBy(_.furthest)
    assert(fin.furthest == 3L)
    assert(fin.t1_us == unixMicrosOf("2024-01-01 10:00:00"))
    assert(fin.t2_us == unixMicrosOf("2024-01-01 10:30:00"))
    assert(fin.t3_us == unixMicrosOf("2024-01-01 11:00:00"))
  }

  private def unixMicrosOf(s: String): Long =
    java.sql.Timestamp.valueOf(s).getTime * 1000L

  test("T-state: transformWithState drawdown carries peak across batches") {
    import graft.streaming.StreamOps.{DrawdownIn, DrawdownOut}
    val dir = tmp()
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "org.apache.spark.sql.execution.streaming.state." +
      "RocksDBStateStoreProvider")
    try {
      // batch 1: user 1 climbs to 10 then dips to 7 -> dd = 3e6
      writeBatch(dir, "b1", Seq(
        (1L, "2024-01-01 10:00:00", 1L, 4.0),
        (2L, "2024-01-01 10:01:00", 1L, 10.0),
        (3L, "2024-01-01 10:02:00", 1L, 7.0)))
      val stream = StreamOps.fileStream(spark, dir, schema)
        .select(col("user_id").as("key"), unix_micros(col("ts")).as("us"),
          col("event_id").as("tie"),
          floor(col("value") * 1e6 + 0.5).cast("long").as("vMicro"))
        .as[DrawdownIn]
      val q = StreamOps.statefulDrawdown(stream).writeStream
        .outputMode("update").format("memory").queryName("twsdd").start()
      q.processAllAvailable()
      val r1 = spark.table("twsdd").as[DrawdownOut].collect().last
      assert(r1.n_events == 3 && r1.peak_micro == 10000000L &&
        r1.max_drawdown_micro == 3000000L)
      // batch 2: dip to 2 -> dd vs the REMEMBERED peak 10 = 8e6
      writeBatch(dir, "b2", Seq((4L, "2024-01-01 11:00:00", 1L, 2.0)))
      q.processAllAvailable()
      val rows = spark.table("twsdd").as[DrawdownOut].collect()
      q.stop()
      val r2 = rows.maxBy(_.n_events)
      assert(r2.n_events == 4 && r2.peak_micro == 10000000L &&
        r2.max_drawdown_micro == 8000000L,
        s"state must cross batches, got $r2")
    } finally prev match {
      case Some(p) => spark.conf.set(key, p)
      case None => spark.conf.unset(key)
    }
  }

  test("T-state: state survives a query RESTART from the checkpoint") {
    import graft.streaming.StreamOps.{DrawdownIn, DrawdownOut}
    val dir = tmp(); val ckpt = tmp(); val out = tmp()
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "org.apache.spark.sql.execution.streaming.state." +
      "RocksDBStateStoreProvider")
    def start() = {
      val stream = StreamOps.fileStream(spark, dir, schema)
        .select(col("user_id").as("key"), unix_micros(col("ts")).as("us"),
          col("event_id").as("tie"),
          floor(col("value") * 1e6 + 0.5).cast("long").as("vMicro"))
        .as[DrawdownIn]
      StreamOps.statefulDrawdown(stream).writeStream
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[DrawdownOut],
            id: Long) =>
          batch.withColumn("batch_id", lit(id))
            .write.mode("append").parquet(s"$out/rows")
          ()
        }
        .start()
    }
    try {
      writeBatch(dir, "b1", Seq(
        (1L, "2024-01-01 10:00:00", 1L, 4.0),
        (2L, "2024-01-01 10:01:00", 1L, 10.0),
        (3L, "2024-01-01 10:02:00", 1L, 7.0)))
      val q1 = start()
      q1.processAllAvailable(); q1.stop()
      // a SECOND query instance resumes from the checkpoint: offsets
      // (b1 must not reprocess) AND RocksDB state (the peak) carry over
      writeBatch(dir, "b2", Seq((4L, "2024-01-01 11:00:00", 1L, 2.0)))
      val q2 = start()
      q2.processAllAvailable(); q2.stop()
      val rows = spark.read.parquet(s"$out/rows")
        .orderBy(col("batch_id")).collect()
      val last = rows.last
      assert(last.getAs[Long]("n_events") == 4L &&
        last.getAs[Long]("peak_micro") == 10000000L &&
        last.getAs[Long]("max_drawdown_micro") == 8000000L,
        s"restarted query must fold batch 2 onto the checkpointed peak: " +
          s"${rows.toSeq}")
      // exactly-once offsets: batch 1's rows appear once, not twice
      assert(rows.count(_.getAs[Long]("n_events") == 3L) == 1,
        s"b1 must not reprocess after restart: ${rows.toSeq}")
    } finally prev match {
      case Some(p) => spark.conf.set(key, p)
      case None => spark.conf.unset(key)
    }
  }

  test("T-state: event-time TIMER flushes the idle session, not batch end") {
    import graft.streaming.StreamOps.{ClosedSession, SessionEvent}
    val dir = tmp()
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "org.apache.spark.sql.execution.streaming.state." +
      "RocksDBStateStoreProvider")
    try {
      writeBatch(dir, "b1", Seq(
        (1L, "2024-01-01 10:00:00", 1L, 4.0),
        (2L, "2024-01-01 10:05:00", 1L, 6.0)))
      val stream = StreamOps.fileStream(spark, dir, schema).as[SessionEvent]
      val qn = "twstimer_" + java.util.UUID.randomUUID().toString.replace("-", "")
      val q = StreamOps.statefulTimerSessions(stream,
          gap = java.time.Duration.ofMinutes(30), watermark = "10 minutes")
        .writeStream.outputMode("append").format("memory").queryName(qn).start()
      try {
        q.processAllAvailable()
        // session open, timer armed at 10:35; watermark ~9:55 — nothing out
        assert(spark.table(qn).isEmpty,
          "open session must not emit before its timer fires")
        // user 2 at 12:00 drags the watermark past 10:35…
        writeBatch(dir, "b2", Seq((3L, "2024-01-01 12:00:00", 2L, 1.0)))
        q.processAllAvailable()
        // …and the NEXT batch's timer sweep flushes user 1's session
        writeBatch(dir, "b3", Seq((4L, "2024-01-01 12:01:00", 2L, 1.0)))
        q.processAllAvailable()
        val out = spark.table(qn).as[ClosedSession].collect()
        val u1 = out.filter(_.user_id == 1L)
        assert(u1.length == 1, s"timer must flush user 1 once, got ${out.toSeq}")
        assert(u1.head.n_events == 2 && u1.head.sum_value == 10.0 &&
          u1.head.session_start.toString.startsWith("2024-01-01 10:00:00") &&
          u1.head.session_end.toString.startsWith("2024-01-01 10:05:00"))
        // user 2's session is still open (watermark hasn't passed 12:31)
        assert(out.forall(_.user_id == 1L), s"user 2 must stay open: ${out.toSeq}")
      } finally q.stop()
    } finally prev match {
      case Some(p) => spark.conf.set(key, p)
      case None => spark.conf.unset(key)
    }
  }

  test("T-state: MapState top-k accumulates totals across batches") {
    import graft.streaming.StreamOps.{ContribIn, TopContribOut}
    val dir = tmp()
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "org.apache.spark.sql.execution.streaming.state." +
      "RocksDBStateStoreProvider")
    try {
      // batch 1: user 1 leads type A with 300, user 2 has 200
      writeBatch(dir, "b1", Seq(
        (1L, "2024-01-01 10:00:00", 1L, 3.0),
        (2L, "2024-01-01 10:01:00", 2L, 2.0)))
      val stream = StreamOps.fileStream(spark, dir, schema)
        .select(lit("A").as("key"), col("user_id").cast("long").as("user"),
          floor(col("value") * 100 + 0.5).cast("long").as("cents"))
        .as[ContribIn]
      val q = StreamOps.statefulTopContributors(stream, k = 2).writeStream
        .outputMode("update").format("memory").queryName("twstopk").start()
      q.processAllAvailable()
      val r1 = spark.table("twstopk").as[TopContribOut].collect()
      assert(r1.filter(_.rank == 1).last.user_id == 1L)
      // batch 2: user 2 adds 250 -> REMEMBERED 200 + 250 = 450 takes
      // the lead; a fresh processor would rank user 2 at only 250
      writeBatch(dir, "b2", Seq((3L, "2024-01-01 11:00:00", 2L, 2.5)))
      q.processAllAvailable()
      val rows = spark.table("twstopk").as[TopContribOut].collect()
      q.stop()
      val last = rows.takeRight(2).sortBy(_.rank)
      assert(last(0).user_id == 2L && last(0).total_cents == 450L,
        s"map state must cross batches, got ${last.toSeq}")
      assert(last(1).user_id == 1L && last(1).total_cents == 300L)
    } finally prev match {
      case Some(p) => spark.conf.set(key, p)
      case None => spark.conf.unset(key)
    }
  }

  test("T-state: ListState pattern match fires across the batch boundary") {
    import graft.streaming.StreamOps.{PatternIn, PatternHit}
    val dir = tmp()
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "org.apache.spark.sql.execution.streaming.state." +
      "RocksDBStateStoreProvider")
    try {
      // batch 1 ends mid-pattern: view, click (no hit yet)
      writeBatch(dir, "b1", Seq(
        (1L, "2024-01-01 10:00:00", 1L, 1.0),
        (2L, "2024-01-01 10:01:00", 1L, 1.0)))
      val stream = StreamOps.fileStream(spark, dir, schema)
        .withColumn("event_type",
          expr("CASE event_id WHEN 1 THEN 'view' WHEN 2 THEN 'click' " +
            "WHEN 3 THEN 'purchase' ELSE 'view' END"))
        .select(col("user_id").cast("long").as("key"),
          unix_micros(col("ts")).as("us"), col("event_id").as("tie"),
          col("event_type").as("etype"))
        .as[PatternIn]
      val q = StreamOps.statefulPatternMatch(stream,
          Seq("view", "click", "purchase")).writeStream
        .outputMode("append").format("memory").queryName("twspat").start()
      q.processAllAvailable()
      assert(spark.table("twspat").count() == 0, "no hit mid-pattern")
      // batch 2 completes the pattern with the purchase
      writeBatch(dir, "b2", Seq((3L, "2024-01-01 10:02:00", 1L, 1.0)))
      q.processAllAvailable()
      val hits = spark.table("twspat").as[PatternHit].collect()
      q.stop()
      assert(hits.toSeq == Seq(PatternHit(1L, 3L)),
        s"buffer must cross batches, got ${hits.toSeq}")
    } finally prev match {
      case Some(p) => spark.conf.set(key, p)
      case None => spark.conf.unset(key)
    }
  }
}
