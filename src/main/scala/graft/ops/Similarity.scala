package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.corpus.Transcripts.mix

/** Similarity search over an embedding column (`array<float>`).
  *
  *  - Brute-force cosine top-k: one scan + TakeOrderedAndProject — the
  *    exact baseline; the dot product is a codegen'd `aggregate(zip_with)`
  *    expression, no UDF.
  *  - LSH-bucketed ANN: deterministic random-hyperplane signatures;
  *    query probes its own bucket plus all Hamming-1 neighbor buckets,
  *    then exact-scores candidates. At 100 TB the bucketed path turns a
  *    full scan into a handful of bucket lookups (bucket column is
  *    writable/partitionable for storage-side pruning).
  */
object Similarity {

  /** Cosine similarity of two float-array columns, as a single codegen'd
    * expression: dot / (|a| * |b|).
    */
  def cosineCol(a: Column, b: Column): Column = {
    val dot = aggregate(zip_with(a, b, (x, y) => x * y),
      lit(0.0), (acc, v) => acc + v)
    val na = sqrt(aggregate(a, lit(0.0), (acc, v) => acc + v * v))
    val nb = sqrt(aggregate(b, lit(0.0), (acc, v) => acc + v * v))
    dot / (na * nb)
  }

  /** Exact top-k by cosine against a literal query vector. Planner emits
    * TakeOrderedAndProject (bounded heap per partition + merge).
    */
  def bruteForceTopK(embeddings: DataFrame, query: Array[Float], k: Int,
      excludeId: Option[Long] = None): DataFrame = {
    val q = array(query.map(v => lit(v.toDouble)): _*)
    val base = excludeId.map(id => embeddings.filter(col("vec_id") =!= id))
      .getOrElse(embeddings)
    base.select(col("vec_id"),
        round(cosineCol(col("embedding").cast("array<double>"), q), 4).as("cos"))
      .orderBy(col("cos").desc, col("vec_id").asc)
      .limit(k)
  }

  /** Deterministic pseudo-random hyperplanes: plane p, dim d weight =
    * mapped SplitMix64 of (p, d) to [-1, 1). Same planes on every
    * executor / run — no wall-clock, no RNG state.
    */
  def planeWeight(p: Int, d: Int): Double =
    (mix(0x9E37L * (p.toLong << 20) + d).toDouble / Long.MaxValue)

  /** Adds an integer LSH signature column `sig`: bit p = sign of the dot
    * product with hyperplane p. Typed mapPartitions with a precomputed
    * plane matrix — a (nPlanes x dim) expression tree would defeat
    * codegen and was ~10x slower at sf0.1.
    */
  def withHyperplaneSig(embeddings: DataFrame, nPlanes: Int, dim: Int): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    embeddings.select(col("vec_id"), col("embedding"))
      .as[(Long, Seq[Float])]
      .mapPartitions { it =>
        val planes = Array.tabulate(nPlanes, dim)((p, d) => planeWeight(p, d))
        it.map { case (id, emb) =>
          var sig = 0L
          var p = 0
          while (p < nPlanes) {
            var dot = 0.0
            val w = planes(p)
            var d = 0
            val n = math.min(dim, emb.length)
            while (d < n) { dot += emb(d) * w(d); d += 1 }
            if (dot > 0) sig |= (1L << p)
            p += 1
          }
          (id, emb, sig)
        }
      }.toDF("vec_id", "embedding", "sig")
  }

  /** ANN top-k: candidates = vectors whose signature is within Hamming
    * distance `probeHamming` of the query signature (enumerated buckets,
    * so the scan prunes on `sig IN (...)`), exact cosine on candidates.
    * Recall is tested against bruteForceTopK in AnnSpec.
    */
  def annTopK(embeddings: DataFrame, query: Array[Float], k: Int,
      nPlanes: Int = 12, probeHamming: Int = 2,
      excludeId: Option[Long] = None): DataFrame = {
    val dim = query.length
    val qSig = (0 until nPlanes).map { p =>
      val dot = (0 until dim).map(d => query(d) * planeWeight(p, d)).sum
      if (dot > 0) 1L << p else 0L
    }.sum

    // enumerate probe buckets: all signatures within hamming distance
    val buckets = scala.collection.mutable.ArrayBuffer(qSig)
    if (probeHamming >= 1)
      (0 until nPlanes).foreach(i => buckets += (qSig ^ (1L << i)))
    if (probeHamming >= 2)
      for (i <- 0 until nPlanes; j <- (i + 1) until nPlanes)
        buckets += (qSig ^ (1L << i) ^ (1L << j))

    val sig = withHyperplaneSig(embeddings, nPlanes, dim)
    val base = excludeId.map(id => sig.filter(col("vec_id") =!= id)).getOrElse(sig)
    val q = array(query.map(v => lit(v.toDouble)): _*)
    base.filter(col("sig").isin(buckets.toSeq: _*))
      .select(col("vec_id"),
        round(cosineCol(col("embedding").cast("array<double>"), q), 4).as("cos"))
      .orderBy(col("cos").desc, col("vec_id").asc)
      .limit(k)
  }

  /** All-pairs top-k neighbors via LSH buckets (batch kNN join): each
    * vector meets only its bucket's vectors; exact cosine within bucket,
    * per-vector top-k via window rank. The at-scale alternative to a
    * quadratic cross join.
    */
  def knnJoin(embeddings: DataFrame, k: Int, nPlanes: Int = 10,
      dim: Int = 64): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val sig = withHyperplaneSig(embeddings, nPlanes, dim)
    val a = sig.select(col("sig"), col("vec_id").as("id_a"), col("embedding").as("e_a"))
    val b = sig.select(col("sig"), col("vec_id").as("id_b"), col("embedding").as("e_b"))
    val pairs = a.join(b, Seq("sig")).filter(col("id_a") =!= col("id_b"))
      .select(col("id_a"), col("id_b"),
        cosineCol(col("e_a").cast("array<double>"), col("e_b").cast("array<double>")).as("cos"))
    val w = Window.partitionBy(col("id_a")).orderBy(col("cos").desc, col("id_b").asc)
    pairs.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }
}
