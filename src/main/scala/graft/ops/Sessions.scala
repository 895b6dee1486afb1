package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization of an event log (gaps-and-islands): a user's
  * events split into sessions wherever the idle gap exceeds `gapMs`.
  *
  * This is the batch form — two window passes over the same
  * (user-partitioned, time-ordered) sort: a lag() flags session starts,
  * a running sum numbers them, then one aggregation per (user, session).
  * The streaming counterpart with identical semantics is the
  * flatMapGroupsWithState + event-time-timeout pattern in
  * [[graft.streaming.TurnStreams.sessionize]]; this form is what the
  * driver's DuckDB oracle can replicate exactly (q44).
  *
  * All time arithmetic is integer epoch-milliseconds (unix_millis /
  * epoch_ms truncate identically), so the session boundaries are
  * engine-portable. Ties on ms order by event_id — a total order, or
  * two engines could number interleaved same-ms events differently.
  *
  * Scale shape: both windows and the final aggregation share ONE
  * hash-partitioning by user_id (a single exchange + sort feeds all
  * three); per-key window state is one row of lag/sum, never a
  * materialized session list.
  */
object Sessions {

  def sessionizeEvents(events: DataFrame, gapMs: Long): DataFrame = {
    // the cast lifts TIMESTAMP_NTZ columns (parquet isAdjustedToUTC =
    // false) to an instant in the session timezone — pin the session to
    // UTC for engine-portable boundaries, as Verify/Bench do
    val base = events.select(col("user_id"), col("event_id"),
      unix_millis(col("ts").cast("timestamp")).as("ms"), col("value"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ms").asc, col("event_id").asc)
    base
      .withColumn("new_s",
        when(lag(col("ms"), 1).over(w).isNull ||
          col("ms") - lag(col("ms"), 1).over(w) > gapMs, 1L).otherwise(0L))
      .withColumn("session_idx",
        sum(col("new_s")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)) - 1L)
      .groupBy(col("user_id"), col("session_idx"))
      .agg(count(lit(1)).as("n_events"),
        min(col("ms")).as("first_ms"),
        max(col("ms")).as("last_ms"),
        (max(col("ms")) - min(col("ms"))).as("duration_ms"),
        round(sum(col("value")), 4).as("sum_value"))
  }
}
