package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.corpus.Transcripts.mix

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, processed in partition-sized batches.
  *
  * The actual media DECODE is a clearly-marked deterministic STUB
  * (no image/audio libraries exist in this container — task brief); the
  * Spark-side contract is real and tested: schema, batch iteration shape
  * (mapPartitions = the Scala analog of mapInPandas batch processing),
  * partition sizing, and the feature-vector output schema that downstream
  * dedup/similarity consume.
  */
object Multimodal {

  final case class MediaRow(
      media_id: Long,
      kind: String, // "image" | "audio" | "video"
      bytes: Array[Byte],
      width: Int,
      height: Int,
      sample_rate: Int,
      duration_ms: Long)

  final case class MediaFeatures(
      media_id: Long,
      kind: String,
      n_bytes: Long,
      // STUB: deterministic pseudo-features standing in for a real
      // decoder's embedding; real pipelines swap `decodeStub` only.
      features: Seq[Float])

  val FeatureDim = 16

  /** Deterministic synthetic media table (for tests/bench): payload bytes
    * are a pure function of media_id.
    */
  def synthesize(spark: SparkSession, n: Long, seed: Long = 42L): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(0L, n).map { i =>
      val kind = Seq("image", "audio", "video")((i % 3).toInt)
      val len = 256 + (mix(seed ^ i).abs % 768).toInt
      val bytes = Array.tabulate(len)(j => mix(seed ^ i ^ j.toLong).toByte)
      MediaRow(i, kind, bytes,
        width = if (kind == "image") 64 + (i % 64).toInt else 0,
        height = if (kind == "image") 64 + (i % 48).toInt else 0,
        sample_rate = if (kind == "audio") 16000 else 0,
        duration_ms = if (kind != "image") 1000 + (i % 9000) else 0)
    }
  }

  /** ??? in spirit — the decode seam. Deterministic fake: features are a
    * folded hash of the payload, so tests can assert exact values and the
    * whole pipeline stays reproducible. A real deployment replaces this
    * single function with an actual decoder (JNI/onnx/...).
    */
  private[ops] def decodeStub(kind: String, bytes: Array[Byte]): Array[Float] = {
    val out = new Array[Float](FeatureDim)
    var h = mix(kind.hashCode.toLong)
    var i = 0
    while (i < bytes.length) { h = mix(h ^ bytes(i).toLong ^ i.toLong); i += 1 }
    var d = 0
    while (d < FeatureDim) {
      h = mix(h)
      out(d) = (h.toDouble / Long.MaxValue).toFloat
      d += 1
    }
    out
  }

  /** Batch feature extraction: mapPartitions so a real decoder can
    * amortize model/codec init per PARTITION (the mapInPandas batch
    * shape), not per row. Input partitioning should target
    * ~spark.sql.files.maxPartitionBytes of media per task.
    */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition init happens HERE in a real decoder
      rows.map { r =>
        MediaFeatures(r.media_id, r.kind, r.bytes.length.toLong,
          decodeStub(r.kind, r.bytes).toSeq)
      }
    }
  }

  /** Frame-sampling plan for video: one output row per sampled frame
    * offset (stubbed decode; real schema + explode shape).
    */
  def sampleFrames(media: Dataset[MediaRow], everyMs: Long): DataFrame = {
    media.toDF()
      .filter(col("kind") === "video")
      .select(col("media_id"), explode(
        sequence(lit(0L), col("duration_ms"), lit(everyMs))).as("frame_ts_ms"))
      .withColumn("frame_key", concat_ws(":", col("media_id"), col("frame_ts_ms")))
  }
}
