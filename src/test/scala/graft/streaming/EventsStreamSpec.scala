package graft.streaming

import graft.SparkTestBase
import graft.queries.Tables
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import java.sql.Timestamp

class EventsStreamSpec extends SparkTestBase {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("windowed stats over a real stream equal the batch plan") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext

    val input = MemoryStream[(Timestamp, String, Double)]
    val events = input.toDF().toDF("ts", "event_type", "value")

    val query = EventsStream
      .windowedStatsStream(events, "1 hour", "2 hours")
      .writeStream.format("memory").queryName("win_out")
      .outputMode("append").start()
    try {
      input.addData(
        (ts("2024-01-01 00:10:00"), "click", 1.0),
        (ts("2024-01-01 00:40:00"), "click", 2.0),
        (ts("2024-01-01 01:10:00"), "view", 5.0))
      query.processAllAvailable()
      // advance watermark far enough to close the first windows
      input.addData((ts("2024-01-01 10:00:00"), "click", 0.0))
      query.processAllAvailable()

      val streamed = s.table("win_out")
        .select("window_start", "event_type", "n_events", "total_value")
        .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2),
          r.getDouble(3))).toSet

      val batch = EventsStream.windowedStats(
        Seq((ts("2024-01-01 00:10:00"), "click", 1.0),
          (ts("2024-01-01 00:40:00"), "click", 2.0),
          (ts("2024-01-01 01:10:00"), "view", 5.0)).toDF("ts", "event_type", "value"),
        "1 hour")
        .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2),
          r.getDouble(3))).toSet

      assert(batch.subsetOf(streamed ++ batch))
      assert(streamed.nonEmpty)
      assert((streamed -- batch).forall(_._1 == ts("2024-01-01 10:00:00")))
    } finally query.stop()
  }

  test("session_window merges events within gap") {
    val s = spark
    import s.implicits._
    val events = Seq(
      (ts("2024-01-01 00:00:00"), 1L, 1.0),
      (ts("2024-01-01 00:10:00"), 1L, 2.0),  // same session (10 min gap)
      (ts("2024-01-01 02:00:00"), 1L, 3.0),  // new session
      (ts("2024-01-01 00:05:00"), 2L, 4.0)
    ).toDF("ts", "user_id", "value")
    val out = EventsStream.sessions(events, "30 minutes")
      .orderBy("user_id", "session_start").collect()
    assert(out.length == 3)
    val first = out(0)
    assert(first.getLong(0) == 1L)
    assert(first.getTimestamp(1) == ts("2024-01-01 00:00:00"))
    assert(first.getTimestamp(2) == ts("2024-01-01 00:10:00"))
    assert(first.getLong(3) == 2L)
  }

  test("flatMapGroupsWithState sessionization emits closed sessions on a stream") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext

    val input = MemoryStream[(Long, Timestamp, Double)]
    val events = input.toDF().toDF("user_id", "ts", "value")
    val query = EventsStream.sessionizeWithState(s, events, gapMillis = 30 * 60 * 1000)
      .writeStream.format("memory").queryName("sess_out")
      .outputMode("append").start()
    try {
      input.addData((1L, ts("2024-01-01 00:00:00"), 1.0),
        (1L, ts("2024-01-01 00:10:00"), 2.0))
      query.processAllAvailable()
      // a later event closes the first session
      input.addData((1L, ts("2024-01-01 03:00:00"), 5.0))
      query.processAllAvailable()
      val rows = s.table("sess_out").collect()
      assert(rows.length == 1)
      val r = rows.head
      assert(r.getLong(0) == 1L)
      assert(r.getTimestamp(1) == ts("2024-01-01 00:00:00"))
      assert(r.getTimestamp(2) == ts("2024-01-01 00:10:00"))
      assert(r.getLong(3) == 2L)
      assert(r.getDouble(4) == 3.0)
    } finally query.stop()
  }

  test("sessionizeStatefulStream equals the batch sessionizer, numbering " +
      "across timeout-closed visits") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext

    // user 1's visit A spans the batch-1/2 boundary, then user 1 goes
    // idle: user 2's later data advances the watermark past visit A's
    // timeout, so the EVENT-TIME TIMEOUT closes it mid-stream (no user-1
    // data in that batch) — and when user 1 returns in batch 4, the
    // tombstone makes the new visit number 2, never restarting at 1.
    val gapUs = 30L * 60 * 1000000
    val b1 = Seq((1L, ts("2024-01-01 00:00:00"), 10L),
      (1L, ts("2024-01-01 00:20:00"), 11L),
      (2L, ts("2024-01-01 00:05:00"), 20L))
    val b2 = Seq((1L, ts("2024-01-01 00:45:00"), 12L), // visit A continues
      (2L, ts("2024-01-01 05:00:00"), 21L))            // watermark → 05:00
    val b3 = Seq((2L, ts("2024-01-01 06:00:00"), 22L)) // u1 timeout fires here
    val b4 = Seq((1L, ts("2024-01-01 10:00:00"), 13L)) // u1 returns: visit 2
    val all = b1 ++ b2 ++ b3 ++ b4

    val input = MemoryStream[(Long, Timestamp, Long)]
    val query = EventsStream.sessionizeStatefulStream(
        s, input.toDF().toDF("user_id", "ts", "event_id"),
        gapMicros = gapUs, flushUser = Some(-1L))
      .writeStream.format("memory").queryName("sfs_out")
      .outputMode("append").start()
    try {
      Seq(b1, b2, b3).foreach { b =>
        input.addData(b); query.processAllAvailable()
      }
      // user 1 had NO data in batch 3 — visit A must have closed via
      // the event-time timeout (batch 3 runs against batch 2's 05:00
      // watermark, past visit A's 01:15 timeout)
      val afterB3 = s.table("sfs_out").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(afterB3.contains((1L, 1L)))

      input.addData(b4); query.processAllAvailable()
      // flush: tick 1 advances the watermark, tick 2's batch fires the
      // remaining timeouts (evaluated against the PREVIOUS watermark)
      input.addData(Seq((-1L, ts("2024-01-01 20:00:00"), -1L)))
      query.processAllAvailable()
      input.addData(Seq((-1L, ts("2024-01-01 21:00:00"), -1L)))
      query.processAllAvailable()

      val streamed = s.table("sfs_out").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4))).toSet
      val batch = graft.operators.Sessions.sessionize(
          all.toDF("user_id", "ts", "event_id"),
          "user_id", "ts", "event_id", gapMicros = gapUs)
        .select(col("user_id"), col("session_idx"),
          unix_micros(col("session_start")), unix_micros(col("session_end")),
          col("n_events"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4))).toSet
      assert(streamed == batch)
      // the returning user's visit numbered 2 (the tombstone carried
      // the counter across the timeout close)
      assert(streamed.exists { case (u, idx, _, _, _) => u == 1L && idx == 2L })
      assert(streamed.size == 5) // u1: 2 visits, u2: 3 visits
    } finally query.stop()
  }

  test("sessionizeStatefulStream: a gap of exactly gapMicros stays " +
      "in-session (µs boundary)") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val gapUs = 1000000L // 1 second
    val t0 = ts("2024-01-01 00:00:00")
    val exactly = new Timestamp(t0.getTime + 1000) // +gap: stays
    val over = new Timestamp(t0.getTime + 2000)
    over.setNanos(1000) // +gap + 1 µs past `exactly`: breaks
    val input = MemoryStream[(Long, Timestamp, Long)]
    val query = EventsStream.sessionizeStatefulStream(
        s, input.toDF().toDF("user_id", "ts", "event_id"),
        gapMicros = gapUs, flushUser = Some(-1L))
      .writeStream.format("memory").queryName("sfs_us_out")
      .outputMode("append").start()
    try {
      input.addData(Seq((1L, t0, 1L), (1L, exactly, 2L), (1L, over, 3L)))
      query.processAllAvailable()
      val rows = s.table("sfs_us_out").collect()
      assert(rows.length == 1)
      // the closed visit is (t0, exactly) with 2 events — `over` broke
      // the gap by exactly one microsecond
      assert(rows.head.getLong(1) == 1L)
      assert(rows.head.getLong(3) ==
        EventsStream.micros(exactly))
      assert(rows.head.getLong(4) == 2L)
    } finally query.stop()
  }

  test("funnelStatefulStream equals batch earliestCompletion under " +
      "adversarial chunking, incl. equal-ts steps split across batches") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val steps = Seq("view", "click", "purchase")
    // u1: clean conversion across batches; u2: stalls at click (never
    // emits); u3: all three steps at the SAME timestamp, deliberately
    // split so click+purchase arrive one batch BEFORE the view — only
    // the last-seen cascade can complete it (the cross-batch tie the
    // in-order contract allows); u4: purchase BEFORE view, never
    // converts; u5: converts within one batch at one ts
    val t0 = ts("2024-01-01 00:00:00")
    def at(m: Int) = new Timestamp(t0.getTime + m * 60000L)
    val b1 = Seq((1L, at(0), "view"), (4L, at(0), "purchase"),
      (3L, at(5), "click"), (3L, at(5), "purchase"))
    val b2 = Seq((1L, at(3), "click"), (2L, at(4), "view"),
      (3L, at(5), "view"),
      (5L, at(6), "view"), (5L, at(6), "click"), (5L, at(6), "purchase"))
    val b3 = Seq((1L, at(9), "purchase"), (2L, at(10), "click"),
      (4L, at(11), "view"))
    val all = b1 ++ b2 ++ b3

    val input = MemoryStream[(Long, Timestamp, String)]
    val query = EventsStream.funnelStatefulStream(
        s, input.toDF().toDF("user_id", "ts", "event_type"), steps)
      .writeStream.format("memory").queryName("funnel_out")
      .outputMode("append").start()
    val streamed = try {
      Seq(b1, b2, b3).foreach { b =>
        input.addData(b); query.processAllAvailable()
      }
      s.table("funnel_out").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    } finally query.stop()

    val batch = graft.operators.Funnel.earliestCompletion(
        all.toDF("user_id", "ts", "event_type"),
        "user_id", "event_type", "ts", steps)
      .where(col("t3").isNotNull)
      .select(col("user"), unix_micros(col("t1")), unix_micros(col("t3")))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(streamed == batch)
    // the equal-ts cross-batch user DID convert (cascade), at one instant
    assert(streamed.exists { case (u, a, b) => u == 3L && a == b })
    assert(streamed.map(_._1) == Set(1L, 3L, 5L))

    // a completion must emit exactly ONCE: replaying a later event of a
    // completed user adds nothing
    val input2 = MemoryStream[(Long, Timestamp, String)]
    val q2 = EventsStream.funnelStatefulStream(
        s, input2.toDF().toDF("user_id", "ts", "event_type"), steps)
      .writeStream.format("memory").queryName("funnel_once")
      .outputMode("append").start()
    try {
      input2.addData(Seq((1L, at(0), "view"), (1L, at(1), "click"),
        (1L, at(2), "purchase")))
      q2.processAllAvailable()
      input2.addData(Seq((1L, at(3), "purchase"), (1L, at(4), "view")))
      q2.processAllAvailable()
      assert(s.table("funnel_once").count() == 1)
    } finally q2.stop()
  }

  test("funnelStatefulStream: randomized chunkings reproduce the batch " +
      "completions on a generated event log") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val steps = Seq("view", "click", "purchase")
    val rng = new scala.util.Random(29)
    val types = Vector("view", "click", "purchase", "scroll")
    // 40 users × 12 events at COARSE timestamps (minute grid) so
    // equal-ts collisions within and across chunks actually occur
    val t0 = ts("2024-01-01 00:00:00")
    val rows = (for {
      u <- 1L to 40L
      _ <- 0 until 12
    } yield (u, new Timestamp(t0.getTime + rng.nextInt(10) * 60000L),
      types(rng.nextInt(types.length)))).toIndexedSeq
    val sorted = rows.sortBy(r => (r._2.getTime, r._1, r._3))
    val batch = graft.operators.Funnel.earliestCompletion(
        sorted.toDF("user_id", "ts", "event_type"),
        "user_id", "event_type", "ts", steps)
      .where(col("t3").isNotNull)
      .select(col("user"), unix_micros(col("t1")), unix_micros(col("t3")))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(batch.nonEmpty, "generator must produce some conversions")

    for (trial <- 0 until 3) {
      val input = MemoryStream[(Long, Timestamp, String)]
      val q = EventsStream.funnelStatefulStream(
          s, input.toDF().toDF("user_id", "ts", "event_type"), steps)
        .writeStream.format("memory")
        .queryName(s"funnel_fuzz_$trial").outputMode("append").start()
      val got = try {
        var rest = sorted
        while (rest.nonEmpty) {
          val n = 1 + rng.nextInt(math.min(rest.length, 97))
          input.addData(rest.take(n)); q.processAllAvailable()
          rest = rest.drop(n)
        }
        s.table(s"funnel_fuzz_$trial").collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      } finally q.stop()
      assert(got == batch, s"trial $trial diverged from batch")
    }
  }

  test("funnelStatefulStream: a generous stateTtl leaves the semantics " +
      "untouched (TTL arm exercised, nothing evicted in-window)") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val steps = Seq("view", "click", "purchase")
    val t0 = ts("2024-01-01 00:00:00")
    def at(m: Int) = new Timestamp(t0.getTime + m * 60000L)
    val b1 = Seq((1L, at(0), "view"), (3L, at(5), "click"),
      (3L, at(5), "purchase"))
    val b2 = Seq((1L, at(3), "click"), (3L, at(5), "view"))
    val b3 = Seq((1L, at(9), "purchase"), (1L, at(10), "view"))
    val input = MemoryStream[(Long, Timestamp, String)]
    val q = EventsStream.funnelStatefulStream(
        s, input.toDF().toDF("user_id", "ts", "event_type"), steps,
        stateTtlUs = Some(3600L * 1000000L))
      .writeStream.format("memory").queryName("funnel_ttl_big")
      .outputMode("append").start()
    try {
      Seq(b1, b2, b3).foreach { b =>
        input.addData(b); q.processAllAvailable()
      }
      val got = s.table("funnel_ttl_big").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      // identical to the NoTimeout semantics on this log: u1 converts
      // across batches, u3 via the equal-ts cascade, exactly once each
      assert(got.map(_._1) == Set(1L, 3L))
      assert(got.size == 2)
    } finally q.stop()
  }

  test("funnelStatefulStream: a passed event-time stateTtl evicts " +
      "stalled progress — later steps restart from empty (documented " +
      "caveat); the same feed converts under NoTimeout") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val steps = Seq("view", "click", "purchase")
    val t0 = ts("2024-01-01 00:00:00")
    def at(m: Int) = new Timestamp(t0.getTime + m * 60000L)
    // u1 views, stalls 7 event-time minutes (far past the 1 ms TTL),
    // then clicks+purchases; u99's events advance the watermark so the
    // eviction can fire while u1 is idle
    val batches = Seq(
      Seq((1L, at(0), "view")),
      Seq((99L, at(5), "view")),
      Seq((99L, at(6), "view")), // watermark now ≈ at(5): u1 evicted
      Seq((1L, at(7), "click"), (1L, at(8), "purchase")))

    val input = MemoryStream[(Long, Timestamp, String)]
    val q = EventsStream.funnelStatefulStream(
        s, input.toDF().toDF("user_id", "ts", "event_type"), steps,
        stateTtlUs = Some(1000L))
      .writeStream.format("memory").queryName("funnel_ttl_evict")
      .outputMode("append").start()
    try {
      batches.foreach { b => input.addData(b); q.processAllAvailable() }
      // u1's click found no t1 (progress evicted) — no completion
      assert(s.table("funnel_ttl_evict").count() == 0)
    } finally q.stop()

    // control: the identical feed with no TTL converts u1
    val input2 = MemoryStream[(Long, Timestamp, String)]
    val q2 = EventsStream.funnelStatefulStream(
        s, input2.toDF().toDF("user_id", "ts", "event_type"), steps)
      .writeStream.format("memory").queryName("funnel_ttl_control")
      .outputMode("append").start()
    try {
      batches.foreach { b => input2.addData(b); q2.processAllAvailable() }
      val got = s.table("funnel_ttl_control").collect()
      assert(got.length == 1 && got.head.getLong(0) == 1L)
    } finally q2.stop()
  }

  test("sessionizeStatefulStream: no default sentinel — user_id -1 " +
      "sessionizes like any other user") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val gapUs = 1000000L
    val t0 = ts("2024-01-01 00:00:00")
    val later = new Timestamp(t0.getTime + 10000) // 10 s >> gap: breaks
    val input = MemoryStream[(Long, Timestamp, Long)]
    // default flushUser = None: -1 is a REAL user id here (pre-r15 the
    // -1L sentinel default silently swallowed these events)
    val query = EventsStream.sessionizeStatefulStream(
        s, input.toDF().toDF("user_id", "ts", "event_id"),
        gapMicros = gapUs)
      .writeStream.format("memory").queryName("sfs_neg_out")
      .outputMode("append").start()
    try {
      input.addData(Seq((-1L, t0, 1L), (-1L, later, 2L)))
      query.processAllAvailable()
      val rows = s.table("sfs_neg_out").collect()
      assert(rows.length == 1)
      assert(rows.head.getLong(0) == -1L)
      assert(rows.head.getLong(1) == 1L)
      assert(rows.head.getLong(4) == 1L)
    } finally query.stop()
  }

  test("dedupStream keeps one arrival per key across at-least-once replays") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext

    val input = MemoryStream[(Long, Timestamp, String)]
    val events = input.toDF().toDF("event_id", "ts", "payload")
    val query = EventsStream.dedupStream(events, Seq("event_id"), "1 hour")
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try {
      input.addData(
        (1L, ts("2024-01-01 00:00:00"), "a"),
        (1L, ts("2024-01-01 00:00:00"), "a"), // duplicate delivery
        (2L, ts("2024-01-01 00:01:00"), "b"))
      query.processAllAvailable()
      input.addData((1L, ts("2024-01-01 00:02:00"), "a-replay")) // replayed id
      query.processAllAvailable()
      val rows = s.table("dedup_out").collect()
      assert(rows.map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L))
    } finally query.stop()
  }

  test("firstEventPerKey is the deterministic batch face of stream dedup") {
    val s = spark
    import s.implicits._
    val events = Seq(
      (10L, ts("2024-01-01 00:05:00"), 1L, "click", 1.0),
      (11L, ts("2024-01-01 00:01:00"), 1L, "click", 2.0), // earliest for (1, click)
      (12L, ts("2024-01-01 00:01:00"), 1L, "view", 3.0),
      (13L, ts("2024-01-01 00:09:00"), 2L, "click", 4.0)
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = EventsStream.firstEventPerKey(events,
      Seq("user_id", "event_type"), Seq("event_id"))
      .orderBy("user_id", "event_type")
      .collect().map(_.getLong(0)).toSeq
    assert(out == Seq(11L, 12L, 13L))
  }

  test("stream-static enrichment joins a broadcast dim under readStream") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext

    val dim = Seq((1L, "gold"), (2L, "silver")).toDF("k", "tier")
    val input = MemoryStream[(Long, Timestamp)]
    val events = input.toDF().toDF("user_id", "ts")
    val query = EventsStream.enrich(events, dim, "user_id", "k")
      .select("user_id", "tier")
      .writeStream.format("memory").queryName("enrich_out")
      .outputMode("append").start()
    try {
      input.addData((1L, ts("2024-01-01 00:00:00")),
        (3L, ts("2024-01-01 00:01:00")))
      query.processAllAvailable()
      val rows = s.table("enrich_out").collect()
        .map(r => (r.getLong(0), Option(r.getString(1)))).toSet
      assert(rows == Set((1L, Some("gold")), (3L, None)))
    } finally query.stop()
  }

  test("events table loads with exact microsecond timestamps") {
    val df = Tables.events(spark, sf())
    assert(df.schema("ts").dataType.typeName == "timestamp")
    assert(df.count() == 1000)
  }

  test("stream-stream interval join matches the batch plan") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext

    val clicks = MemoryStream[(Long, Long, Timestamp)]
    val views = MemoryStream[(Long, Long, Timestamp)]
    val c = clicks.toDF().toDF("cid", "k", "cts")
    val v = views.toDF().toDF("vid", "k", "vts")

    val query = EventsStream
      .intervalJoinStream(c, v, Seq("k"), "cts", "vts",
        window = "30 minutes", watermark = "1 hour")
      .select("cid", "vid")
      .writeStream.format("memory").queryName("ij_out")
      .outputMode("append").start()
    try {
      clicks.addData((1L, 5L, ts("2024-01-01 00:00:00")),
        (2L, 5L, ts("2024-01-01 02:00:00")),
        (3L, 6L, ts("2024-01-01 00:05:00")))
      views.addData((10L, 5L, ts("2024-01-01 00:10:00")), // joins click 1
        (11L, 5L, ts("2024-01-01 01:00:00")),             // outside window
        (12L, 6L, ts("2024-01-01 00:05:00")),             // joins click 3 (inclusive)
        (13L, 7L, ts("2024-01-01 00:10:00")))             // no such key
      query.processAllAvailable()
      val streamed = s.table("ij_out").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(streamed == Set((1L, 10L), (3L, 12L)))
    } finally query.stop()
  }
}
