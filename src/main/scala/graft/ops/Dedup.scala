package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.corpus.Transcripts.mix

/** Deduplication operators for training-data pipelines, over
  * `documents(doc_id, text)`. Scale notes per operator:
  *
  *  - exact: one hash-aggregate shuffle on a 128-bit content hash —
  *    embarrassingly scalable.
  *  - MinHash+LSH / SimHash: candidate generation via band-bucket
  *    self-joins — only docs sharing a band bucket ever meet, so the
  *    shuffle is keyed on (band, bucket), never a cross join.
  *  - n-gram Jaccard: exact verification on candidate pairs only.
  */
object Dedup {

  /** Exact dedup: md5 of content; keep = lowest doc_id in the group.
    * At 100 TB this is a single groupBy on the digest (map-side partial
    * aggregation applies); no text comparison ever shuffles.
    */
  def exactDedup(docs: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("content_hash"))
    docs.select(col("doc_id"), md5(col("text")).as("content_hash"))
      .withColumn("group_size", count(lit(1)).over(w))
      .withColumn("rep_id", min(col("doc_id")).over(w))
      .withColumn("is_dup", col("doc_id") =!= col("rep_id"))
      .select("doc_id", "content_hash", "group_size", "rep_id", "is_dup")
  }

  /** Word k-shingles per doc: (doc_id, shingle) distinct. */
  def shingles(docs: DataFrame, k: Int): DataFrame =
    docs.select(col("doc_id"), split(col("text"), " ").as("toks"))
      .select(col("doc_id"), explode(
        transform(sequence(lit(0), size(col("toks")) - k),
          i => concat_ws(" ", slice(col("toks"), i + 1, lit(k))))).as("shingle"))
      .distinct()

  /** Deterministic 64-bit hash family: h_i(x) = mix(seed_i ^ x64). */
  private def hashFamily(shingleHash: org.apache.spark.sql.Column, i: Int) = {
    // xxhash64 with per-function seed column-side; mix constants derive
    // from SplitMix64 so the family is deterministic everywhere.
    xxhash64(lit(mix(0xC0FFEE0L + i)), shingleHash)
  }

  /** MinHash signatures: n independent 64-bit min-hashes over a doc's
    * shingle set. One narrow aggregation; signature is a fixed-size array.
    */
  def minHashSignatures(docs: DataFrame, k: Int = 3, nHashes: Int = 32): DataFrame = {
    val sh = shingles(docs, k).select(col("doc_id"), xxhash64(col("shingle")).as("h"))
    val aggs = (0 until nHashes).map(i => min(hashFamily(col("h"), i)).as(s"mh_$i"))
    sh.groupBy("doc_id").agg(aggs.head, aggs.tail: _*)
      .select(col("doc_id"), array((0 until nHashes).map(i => col(s"mh_$i")): _*).as("signature"))
  }

  /** MinHash LSH candidate pairs: split the signature into `bands` bands
    * of `rowsPerBand` values; docs sharing any band bucket become a
    * candidate pair. Self-join is keyed on (band, bucket-hash) — the
    * classic MinHash-LSH shuffle shape (Broder '97 / MMDS ch.3).
    * Returns (doc_a, doc_b, est_jaccard) with doc_a < doc_b, where
    * est_jaccard = fraction of matching signature positions.
    */
  def minHashCandidates(signatures: DataFrame, bands: Int, rowsPerBand: Int,
      minEstJaccard: Double = 0.0): DataFrame = {
    val banded = signatures.select(col("doc_id"), col("signature"),
        posexplode(transform(sequence(lit(0), lit(bands - 1)),
          b => xxhash64(concat_ws(",",
            slice(col("signature"), b * rowsPerBand + 1, lit(rowsPerBand)))))
        ).as(Seq("band", "bucket")))
    val a = banded.select(col("band"), col("bucket"),
      col("doc_id").as("doc_a"), col("signature").as("sig_a"))
    val b = banded.select(col("band"), col("bucket"),
      col("doc_id").as("doc_b"), col("signature").as("sig_b"))
    a.join(b, Seq("band", "bucket"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        (size(filter(zip_with(col("sig_a"), col("sig_b"), (x, y) => x === y),
          (m: org.apache.spark.sql.Column) => m)).cast("double") /
          size(col("sig_a"))).as("est_jaccard"))
      .distinct()
      .filter(col("est_jaccard") >= minEstJaccard)
  }

  /** Exact k-shingle Jaccard for a given pair relation (doc_a, doc_b) —
    * the verification step after LSH candidate generation.
    */
  def jaccardForPairs(docs: DataFrame, pairs: DataFrame, k: Int): DataFrame = {
    val sets = shingles(docs, k).groupBy("doc_id")
      .agg(collect_set(col("shingle")).as("sh"))
    pairs
      .join(sets.select(col("doc_id").as("doc_a"), col("sh").as("sh_a")), Seq("doc_a"))
      .join(sets.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")), Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        round(size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))), 4).as("jaccard"))
  }

  /** n-gram Jaccard similarity of consecutive doc_id pairs — a cheap,
    * fully-oracle-able slice of the Jaccard machinery (the LSH pipeline
    * above covers the at-scale path).
    */
  def jaccardAdjacent(docs: DataFrame, k: Int): DataFrame = {
    val pairs = docs.select(col("doc_id").as("doc_a"),
      (col("doc_id") + 1).as("doc_b"))
    jaccardForPairs(docs, pairs, k)
      .join(docs.select(col("doc_id").as("doc_b")), Seq("doc_b"), "left_semi")
  }

  /** SimHash: 64-bit signature where bit j is the sign of the tf-weighted
    * sum of token-hash bit j (Charikar '02). Near-dups = small Hamming
    * distance. Bit-majority is computed with array expressions (no UDF).
    */
  def simHash(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    // One typed map, ZERO shuffles: a doc's token stream fits in a task,
    // so the tf-weighted bit-majority folds locally. Term hash = SplitMix64
    // of the JVM string hash (spec-stable across JVMs/executors).
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .map { case (id, text) =>
        val tf = scala.collection.mutable.HashMap.empty[String, Int]
        text.split(' ').foreach(t => if (t.nonEmpty) tf(t) = tf.getOrElse(t, 0) + 1)
        val w = new Array[Long](64)
        tf.foreach { case (term, n) =>
          val h = mix(term.hashCode.toLong)
          var j = 0
          while (j < 64) {
            if (((h >>> j) & 1L) == 1L) w(j) += n else w(j) -= n
            j += 1
          }
        }
        var sig = 0L
        var j = 0
        while (j < 64) { if (w(j) > 0) sig |= (1L << j); j += 1 }
        (id, sig)
      }.toDF("doc_id", "simhash")
  }

  /** SimHash near-dup candidate pairs: band the 64-bit signature into 4
    * 16-bit keys; pairs sharing a band are checked for Hamming <= maxHam.
    */
  def simHashCandidates(sim: DataFrame, maxHam: Int = 3): DataFrame = {
    val banded = sim.select(col("doc_id"), col("simhash"),
      posexplode(transform(sequence(lit(0), lit(3)),
        b => call_function("shiftright", col("simhash"), b * 16).bitwiseAND(0xffffL))).as(Seq("band", "key")))
    val a = banded.select(col("band"), col("key"), col("doc_id").as("doc_a"), col("simhash").as("sh_a"))
    val b = banded.select(col("band"), col("key"), col("doc_id").as("doc_b"), col("simhash").as("sh_b"))
    a.join(b, Seq("band", "key")).filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        bit_count(col("sh_a").bitwiseXOR(col("sh_b"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHam)
  }

  /** Embedding near-dup: pairs with cosine >= minCos. Candidates via
    * random-hyperplane LSH buckets (see Similarity.hyperplaneSig), exact
    * cosine verification on candidates only.
    */
  def embeddingNearDups(embeddings: DataFrame, minCos: Double,
      nPlanes: Int = 12, dim: Int = 64): DataFrame = {
    val sig = Similarity.withHyperplaneSig(embeddings, nPlanes, dim)
    val a = sig.select(col("sig").as("bucket"), col("vec_id").as("id_a"), col("embedding").as("e_a"))
    val b = sig.select(col("sig").as("bucket"), col("vec_id").as("id_b"), col("embedding").as("e_b"))
    a.join(b, Seq("bucket")).filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        Similarity.cosineCol(col("e_a"), col("e_b")).as("cos"))
      .filter(col("cos") >= minCos)
      .distinct()
  }
}
