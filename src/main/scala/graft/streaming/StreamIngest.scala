package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

import graft.corpus.Turn
import graft.index.{Generations, IndexConf}

/** Structured Streaming ingest: new transcript files landing under a
  * directory are indexed incrementally — each micro-batch becomes one
  * immutable index generation (graft.index.Generations), queryable mid-
  * stream via MultiGenEngine and compactable via Compactor.
  *
  * The reference has no streaming (SURVEY.md §2.8); this is the Spark-
  * native extension of its mpsc-channel pipelining (src/indexer/
  * indexer.rs:195-204): the channel becomes a checkpointed file stream,
  * and doc_ids keep the reference's arrival-order semantics across
  * batches (each generation's ids start where the previous ended).
  */
object StreamIngest {

  val turnSchema: StructType = StructType(Seq(
    StructField("conv_id", StringType),
    StructField("turn_idx", IntegerType),
    StructField("role", StringType),
    StructField("text", StringType),
    StructField("tool", StringType),
    StructField("ts", TimestampType)))

  /** Start the ingest stream. `Trigger.AvailableNow()` drains what is
    * present and stops (batch-catchup mode); a processing-time trigger
    * keeps it running.
    */
  def start(spark: SparkSession, inputDir: String, indexRoot: String,
      lemmas: Map[String, String], conf: IndexConf = IndexConf(),
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    import spark.implicits._
    spark.readStream
      .schema(turnSchema)
      .parquet(inputDir)
      .as[Turn]
      .writeStream
      .trigger(trigger)
      .option("checkpointLocation", s"$indexRoot/_stream_checkpoint")
      .foreachBatch { (batch: Dataset[Turn], batchId: Long) =>
        // Generation dir keyed by batchId => micro-batch REPLAY after a
        // crash between append and checkpoint commit is idempotent
        // (appendAt skips dirs with a complete index_meta.json) instead
        // of duplicating the batch under fresh doc_ids. The "gen-b"
        // prefix keeps the batchId namespace disjoint from manual
        // Generations.append names (gen-00000...), so a mixed root can
        // never mistake an unrelated complete generation for a replay.
        if (!batch.isEmpty)
          Generations.appendAt(batch.sparkSession, batch, indexRoot,
            f"$indexRoot/gen-b$batchId%05d", lemmas, conf)
        ()
      }
      .start()
  }
}
