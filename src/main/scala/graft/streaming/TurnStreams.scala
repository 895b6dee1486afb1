package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.corpus.Turn

/** Streaming analytics over a transcript turn stream — the Structured
  * Streaming surface of the engine (watermarks + event-time windows +
  * custom state via flatMapGroupsWithState), beyond the reference (which
  * has no streaming, SURVEY.md §2.8).
  *
  * All transforms take a streaming OR batch Dataset[Turn] — identical
  * code path, which is how the batch tests pin the streaming semantics.
  */
object TurnStreams {

  /** Event-time windowed turn counts with a watermark: turns later than
    * `watermark` past the max event time are dropped; windows finalize
    * incrementally (append-mode compatible).
    */
  def windowedTurnStats(turns: Dataset[Turn], windowLen: String = "5 minutes",
      watermark: String = "10 minutes"): DataFrame = {
    turns.toDF()
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen), col("role"))
      .agg(count(lit(1)).as("n_turns"),
        sum(length(col("text"))).as("n_chars"))
  }

  final case class ConvSession(
      conv_id: String,
      n_turns: Int,
      n_user: Int,
      n_tool_calls: Int,
      first_ts: Timestamp,
      last_ts: Timestamp,
      duration_ms: Long)

  /** Conversation sessionization (gaps-and-islands): a conversation's
    * turns split into sessions wherever the idle gap exceeds `gapMs` —
    * IDENTICAL semantics in both modes (TurnStreamsSpec pins streaming
    * == batch == ops.Sessions.sessionizeEvents on one event log):
    *
    *  - streaming: sessions closed by an in-batch gap emit immediately;
    *    the open session sits in GroupState with an event-time timeout
    *    at last_ts + gapMs, emitting when the watermark passes it. The
    *    custom-state analog of the reference's per-document accumulation
    *    loop, lifted to conversations. (Cross-batch LATE turns — within
    *    the watermark but older than the open session — fold into it
    *    rather than re-splitting an already-emitted boundary: the
    *    standard streaming approximation, bounded by the watermark.)
    *  - batch: every group ends, so the per-group fold emits every
    *    session, closed and final.
    */
  def sessionize(turnsIn: Dataset[Turn], gapMs: Long = 10 * 60 * 1000L,
      watermark: String = "10 minutes"): Dataset[ConvSession] = {
    import turnsIn.sparkSession.implicits._
    // a turn without a timestamp cannot be placed in any gap-defined
    // session — and the ingest schema declares ts nullable, so without
    // this filter one malformed row would NPE the whole job (batch) or
    // kill the streaming query (the sort key calls ts.getTime)
    val turns = turnsIn.filter(col("ts").isNotNull)

    def one(t: Turn): ConvSession = ConvSession(t.conv_id, 1,
      if (t.role == "user") 1 else 0,
      if (t.tool != null && t.tool.nonEmpty) 1 else 0,
      t.ts, t.ts, 0L)

    def add(s: ConvSession, t: Turn): ConvSession = {
      val first = if (t.ts.before(s.first_ts)) t.ts else s.first_ts
      val last = if (t.ts.after(s.last_ts)) t.ts else s.last_ts
      s.copy(
        n_turns = s.n_turns + 1,
        n_user = s.n_user + (if (t.role == "user") 1 else 0),
        n_tool_calls = s.n_tool_calls +
          (if (t.tool != null && t.tool.nonEmpty) 1 else 0),
        first_ts = first,
        last_ts = last,
        duration_ms = last.getTime - first.getTime)
    }

    /** One step of the gaps-and-islands fold over TIME-ORDERED turns of
      * one conversation: (session closed by this turn if any, the new
      * open session). Shared by both modes so the boundary rule cannot
      * drift.
      */
    def step(open: Option[ConvSession], t: Turn): (Option[ConvSession], ConvSession) =
      open match {
        case Some(s) if t.ts.getTime - s.last_ts.getTime > gapMs => (Some(s), one(t))
        case Some(s) => (None, add(s, t))
        case None => (None, one(t))
      }

    if (turns.isStreaming) {
      turns
        .withWatermark("ts", watermark)
        .groupByKey(_.conv_id)
        .flatMapGroupsWithState[ConvSession, ConvSession](
          OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
          (convId: String, batch: Iterator[Turn], state: GroupState[ConvSession]) =>
            if (state.hasTimedOut) {
              val out = state.getOption
              state.remove()
              out.iterator
            } else {
              // group iterators arrive UNORDERED; the buffer+sort here
              // is bounded by ONE MICRO-BATCH of one conversation, not
              // its full history (which lives in the one-row GroupState)
              val sorted = batch.toArray.sortBy(t => (t.ts.getTime, t.turn_idx))
              var open = state.getOption
              val closed = Seq.newBuilder[ConvSession]
              sorted.foreach { t =>
                val (c, o) = step(open, t)
                c.foreach(closed += _)
                open = Some(o)
              }
              open.foreach { s =>
                state.update(s)
                state.setTimeoutTimestamp(s.last_ts.getTime + gapMs)
              }
              closed.result().iterator
            }
        }
    } else {
      // batch: SECONDARY SORT (repartition by conv_id, sort within
      // partitions by (conv_id, ts, turn_idx)) + a streaming
      // mapPartitions fold — NEVER a per-group toArray, which would
      // buffer a conversation's entire history in one task (the same
      // single-key hotspot exactDedup's groupBy form exists to avoid).
      // Memory per task is one open session + one pending emission.
      turns
        .repartition(col("conv_id"))
        .sortWithinPartitions(col("conv_id"), col("ts"), col("turn_idx"))
        .as[Turn]
        .mapPartitions { it =>
          new Iterator[ConvSession] {
            private var open: Option[ConvSession] = None
            private val out = scala.collection.mutable.Queue.empty[ConvSession]
            private def pump(): Unit = {
              while (out.isEmpty && it.hasNext) {
                val t = it.next()
                if (open.exists(_.conv_id != t.conv_id)) {
                  out += open.get
                  open = None
                }
                val (closed, nowOpen) = step(open, t)
                closed.foreach(out += _)
                open = Some(nowOpen)
              }
              if (out.isEmpty && !it.hasNext && open.isDefined) {
                out += open.get
                open = None
              }
            }
            def hasNext: Boolean = { pump(); out.nonEmpty }
            def next(): ConvSession = { pump(); out.dequeue() }
          }
        }
    }
  }

  /** Streaming exact dedup at ingest: drop turns whose content hash was
    * already seen within the watermark horizon — the streaming
    * counterpart of ops.Dedup.exactDedup. Uses
    * `dropDuplicatesWithinWatermark` (NOT plain dropDuplicates on the
    * hash alone: Spark only evicts dedup state when the watermark can
    * reach it, so the plain form would hold one state row per distinct
    * hash forever and OOM a long-running ingest; the WithinWatermark
    * variant bounds state by the horizon). Batch datasets take the same
    * code path minus the watermark semantics (plain dropDuplicates).
    */
  def dedupedTurns(turns: Dataset[Turn],
      watermark: String = "10 minutes"): Dataset[Turn] = {
    import turns.sparkSession.implicits._
    val withHash = turns
      .withColumn("content_hash", md5(col("text")))
    // NULL-text rows pass through untouched: md5(null) = null, and both
    // dedup mechanisms treat null keys as EQUAL — two unrelated turns
    // that merely lack text would silently collapse into one. NOTE this
    // deliberately DIFFERS from ops.Dedup.exactDedup, which conflates
    // null with "" (document-pipeline semantics: both are "no
    // content"). Here a null text marks a MALFORMED record to preserve,
    // while "" is a real, if empty, message that dedups normally.
    val nullText = withHash.filter(col("content_hash").isNull)
    val hashed = withHash.filter(col("content_hash").isNotNull)
    val deduped =
      if (turns.isStreaming)
        hashed.withWatermark("ts", watermark)
          .dropDuplicatesWithinWatermark("content_hash")
      else {
        // batch: keep the DETERMINISTIC representative (min (conv_id,
        // turn_idx) — exactDedup's min-doc rule; the remaining fields
        // complete a TOTAL order so even byte-identical replayed rows
        // collapse to ONE). The agg carries the representative row
        // itself — one map-side-combined shuffle, no join back. The
        // former groupBy + join-back form kept EVERY row tying on
        // (conv_id, turn_idx): a record ingested twice into one batch
        // passed the filter twice and the dedup operator emitted the
        // duplicate (test-pinned). Still no content_hash-partitioned
        // window: a boilerplate hash with 10^8 copies would put the
        // whole group through one WindowExec task; and still no plain
        // dropDuplicates, which keeps whichever row a partition
        // delivers first, breaking run-to-run reproducibility.
        hashed.groupBy(col("content_hash"))
          .agg(min(struct(col("conv_id"), col("turn_idx"), col("role"),
            col("text"), col("tool"), col("ts"))).as("_rep"))
          .select(col("content_hash"), col("_rep.*"))
      }
    deduped.unionByName(nullText).drop("content_hash").as[Turn]
  }
}
