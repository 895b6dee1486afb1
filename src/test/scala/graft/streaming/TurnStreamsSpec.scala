package graft.streaming

import java.sql.Timestamp

import graft.SparkSpecBase
import graft.corpus.{Transcripts, Turn}
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

    // batch path: same function, plain dropDuplicates
    val batch = TurnStreams.dedupedTurns(spark.createDataset(Seq(
      Turn("a", 0, "user", "x y", "", ts(0)),
      Turn("b", 0, "user", "x y", "", ts(1))))).collect()
    assert(batch.length == 1)
  }
}
