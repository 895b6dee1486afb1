package graft.streaming

import java.sql.Timestamp

import graft.SparkSpecBase
import graft.corpus.{Transcripts, Turn}
import graft.ops.Sessions
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

class TurnStreamsSpec extends SparkSpecBase {

  private def ts(min: Long): Timestamp = new Timestamp((1000 + min) * 60000L)

  private val turns = Seq(
    Turn("c1", 0, "user", "hello there", "", ts(0)),
    Turn("c1", 1, "assistant", "hi", "", ts(1)),
    Turn("c1", 2, "tool", "result", "search", ts(2)),
    Turn("c2", 0, "user", "other conv", "", ts(3)),
    Turn("c2", 1, "assistant", "sure", "", ts(4)))

  test("windowed turn stats (batch semantics)") {
    import spark.implicits._
    val res = TurnStreams.windowedTurnStats(spark.createDataset(turns))
      .collect().map(r => (r.getAs[String]("role"), r.getAs[Long]("n_turns")))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    assert(res("user") == 2 && res("assistant") == 2 && res("tool") == 1)
  }

  test("sessionize (batch): per-conversation fold") {
    import spark.implicits._
    val sessions = TurnStreams.sessionize(spark.createDataset(turns))
      .collect().map(s => s.conv_id -> s).toMap
    assert(sessions("c1").n_turns == 3)
    assert(sessions("c1").n_user == 1)
    assert(sessions("c1").n_tool_calls == 1)
    assert(sessions("c1").duration_ms == 2 * 60000L)
    assert(sessions("c2").n_turns == 2)
  }

  test("sessionize skips null-ts turns instead of NPEing the job") {
    import spark.implicits._
    // the ingest schema declares ts nullable: one malformed row must
    // not kill the fold (a null has no place in a gap-defined session)
    val withNull = turns :+ Turn("c1", 3, "user", "late malformed", "", null)
    val sessions = TurnStreams.sessionize(spark.createDataset(withNull))
      .collect().map(s => s.conv_id -> s).toMap
    assert(sessions("c1").n_turns == 3, "null-ts turn must be excluded")
    assert(sessions("c2").n_turns == 2)
  }

  test("sessionize (streaming): event-time timeout emits finished sessions") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Turn]
    val query = TurnStreams.sessionize(input.toDS(), gapMs = 5 * 60000L,
      watermark = "10 minutes")
      .writeStream.format("memory").queryName("sessions")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    try {
      input.addData(turns.filter(_.conv_id == "c1"): _*)
      query.processAllAvailable()
      // watermark still at c1's max ts; no timeout yet
      // advance event time far past c1's last turn + gap
      input.addData(Turn("c9", 0, "user", "advance wm", "", ts(100)))
      query.processAllAvailable()
      input.addData(Turn("c9", 1, "user", "fire timeouts", "", ts(101)))
      query.processAllAvailable()
      val out = spark.table("sessions").as[TurnStreams.ConvSession].collect()
      val c1 = out.find(_.conv_id == "c1")
      assert(c1.isDefined, s"c1 session not emitted; got ${out.toSeq}")
      assert(c1.get.n_turns == 3 && c1.get.n_tool_calls == 1)
    } finally query.stop()
  }

  test("windowed stats with watermark run as a streaming query") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Turn]
    val query = TurnStreams.windowedTurnStats(input.toDS(),
      windowLen = "5 minutes", watermark = "1 minutes")
      .writeStream.format("memory").queryName("winstats")
      .outputMode("append").start()
    try {
      input.addData(turns: _*)
      query.processAllAvailable()
      input.addData(Turn("c9", 0, "user", "advance watermark", "", ts(30)))
      query.processAllAvailable()
      val rows = spark.table("winstats").collect()
      assert(rows.nonEmpty, "finalized windows should have been appended")
    } finally query.stop()
  }

  test("streaming exact dedup drops repeated content within the horizon") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Turn]
    val query = TurnStreams.dedupedTurns(input.toDS(), watermark = "10 minutes")
      .writeStream.format("memory").queryName("dedup_turns")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    try {
      input.addData(
        Turn("c1", 0, "user", "same text", "", ts(0)),
        Turn("c2", 0, "user", "same text", "", ts(1)), // dup content
        Turn("c3", 0, "user", "unique text", "", ts(1)))
      query.processAllAvailable()
      input.addData(Turn("c4", 0, "user", "same text", "", ts(2))) // still in horizon
      query.processAllAvailable()
      val texts = spark.table("dedup_turns").as[Turn].collect().map(_.text)
      assert(texts.count(_ == "same text") == 1, texts.mkString(","))
      assert(texts.count(_ == "unique text") == 1)
    } finally query.stop()

    // batch path: same function, deterministic min-representative
    val batch = TurnStreams.dedupedTurns(spark.createDataset(Seq(
      Turn("a", 0, "user", "x y", "", ts(0)),
      Turn("b", 0, "user", "x y", "", ts(1))))).collect()
    assert(batch.length == 1)
    assert(batch.head.conv_id == "a", "must keep the min (conv_id, turn_idx) rep")
    // exact replay: a byte-identical row ingested twice in one batch
    // (at-least-once upstream) must still collapse to ONE — the tie
    // case the former groupBy + join-back form emitted twice
    val replay = TurnStreams.dedupedTurns(spark.createDataset(Seq(
      Turn("a", 0, "user", "x y", "", ts(0)),
      Turn("a", 0, "user", "x y", "", ts(0)),
      Turn("b", 1, "user", "z", "", ts(1))))).collect()
    assert(replay.length == 2,
      s"replayed identical row survived dedup: ${replay.toSeq}")
    // null-text rows pass through: md5(null) = null and null dedup keys
    // compare EQUAL, so without the guard two unrelated text-less turns
    // would silently collapse into one
    val withNulls = TurnStreams.dedupedTurns(spark.createDataset(Seq(
      Turn("a", 0, "user", null, "", ts(0)),
      Turn("b", 0, "user", null, "", ts(1)),
      Turn("c", 0, "user", "x", "", ts(2))))).collect()
    assert(withNulls.length == 3, s"null-text turns were deduped: ${withNulls.toSeq}")
  }

  test("sessionization parity: streaming == batch == Sessions.sessionizeEvents") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val gapMs = 5 * 60000L
    // one deterministic event log: two users, intra-user gaps both over
    // and under the threshold, plus a same-timestamp tie (broken by
    // event id in every implementation)
    val events = Seq( // (user, eventId, minute)
      ("u1", 0, 0L), ("u1", 1, 2L), ("u1", 2, 2L),   // session 0 (tie at min 2)
      ("u1", 3, 10L), ("u1", 4, 13L),                  // session 1 (gap 8 > 5)
      ("u1", 5, 30L),                                  // session 2
      ("u2", 0, 1L), ("u2", 1, 5L),                    // session 0 (gap 4 <= 5)
      ("u2", 2, 20L))                                  // session 1
    def sessKey(rows: Seq[(String, Long, Long, Long)]) = rows.sorted
    // (user, n_events, first_ms, last_ms) sorted — the identity compared
    // across all three implementations

    // path A: the batch window-function form (the q44 oracle shape)
    val eventsDf = events
      .map { case (u, e, m) => (u, e.toLong, ts(m), 1.0) }
      .toDF("user_id", "event_id", "ts", "value")
    val a = Sessions.sessionizeEvents(eventsDf, gapMs).collect()
      .map(r => (r.getAs[String]("user_id"), r.getAs[Long]("n_events"),
        r.getAs[Long]("first_ms"), r.getAs[Long]("last_ms"))).toSeq

    // path B: the batch fold of TurnStreams.sessionize (events as turns)
    val asTurns = events.map { case (u, e, m) => Turn(u, e, "user", "ev", "", ts(m)) }
    val b = TurnStreams.sessionize(spark.createDataset(asTurns), gapMs).collect()
      .map(s => (s.conv_id, s.n_turns.toLong,
        s.first_ts.getTime, s.last_ts.getTime)).toSeq

    // path C: the streaming fold (two micro-batches split MID-SESSION at
    // u1 minute 10, so state carry-over is exercised; a sentinel user
    // advances the watermark to flush the open sessions)
    val input = MemoryStream[Turn]
    val query = TurnStreams.sessionize(input.toDS(), gapMs, watermark = "1 minutes")
      .writeStream.format("memory").queryName("parity_sessions")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    val c = try {
      val (chunk1, chunk2) = asTurns.partition(t => t.ts.getTime <= ts(10L).getTime)
      input.addData(chunk1: _*)
      query.processAllAvailable()
      input.addData(chunk2: _*)
      query.processAllAvailable()
      input.addData(Turn("wm", 0, "user", "advance", "", ts(1000L)))
      query.processAllAvailable()
      input.addData(Turn("wm", 1, "user", "fire timeouts", "", ts(1001L)))
      query.processAllAvailable()
      spark.table("parity_sessions").as[TurnStreams.ConvSession].collect()
        .filter(_.conv_id != "wm")
        .map(s => (s.conv_id, s.n_turns.toLong,
          s.first_ts.getTime, s.last_ts.getTime)).toSeq
    } finally query.stop()

    assert(sessKey(a) == sessKey(b),
      s"window form != batch fold\n a=${sessKey(a)}\n b=${sessKey(b)}")
    assert(sessKey(b) == sessKey(c),
      s"batch fold != streaming fold\n b=${sessKey(b)}\n c=${sessKey(c)}")
    assert(a.length == 5, s"expected 5 sessions, got ${a.length}")
  }
}
