package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-assembly operators for a training-data pipeline — the steps
  * between "clean deduped documents" and "token stream on the trainer":
  * packing documents into fixed token budgets, deterministic sampling,
  * and benchmark-contamination screening. All are pure column
  * expressions / windows (codegen'd, no UDFs), and all are deterministic
  * so the driver's DuckDB oracle replicates them exactly.
  */
object Pipeline {

  /** Pack documents into fixed token-budget sequences — the GPT-style
    * "concatenate and slice" layout: documents are concatenated in a
    * deterministic order (doc_id here; any sort key works) and the token
    * stream is sliced at every multiple of `budget`. A document STARTS in
    * pack floor(cum_tokens_before / budget) at offset
    * (cum_tokens_before mod budget), and may straddle into the next pack
    * (standard pretraining packing; no padding waste).
    *
    * Returns (doc_id, n_tokens, pack_id, pack_pos).
    *
    * Scale shape: ONE window over the layout order. At 100 TB a single
    * global window would serialize, so the layout key becomes
    * (shard, doc_id): partition the window by shard — one independent
    * pack stream per shard, embarrassingly parallel, identical
    * arithmetic. This entry runs the single-stream form the oracle can
    * check end-to-end.
    */
  def packSequences(docs: DataFrame, budget: Int): DataFrame = {
    val w = Window.orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .select(col("doc_id"), size(split(col("text"), " ")).as("n_tokens"))
      .withColumn("cum_before",
        coalesce(sum(col("n_tokens")).over(w) - col("n_tokens"), lit(0L)))
      .withColumn("pack_id", (col("cum_before") / budget).cast("long"))
      .withColumn("pack_pos",
        (col("cum_before") % budget).cast("long"))
      .select("doc_id", "n_tokens", "pack_id", "pack_pos")
  }

  /** The at-scale form of [[packSequences]]: one independent pack stream
    * per shard (window partitioned by `shardCol` — embarrassingly
    * parallel; no global window). pack_id is (shard, local_pack_id);
    * callers give shards capacity ~(executor-memory worth of docs).
    */
  def packSequencesSharded(docs: DataFrame, budget: Int,
      shardCol: String): DataFrame = {
    val w = Window.partitionBy(col(shardCol)).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .select(col(shardCol), col("doc_id"),
        size(split(col("text"), " ")).as("n_tokens"))
      .withColumn("cum_before",
        coalesce(sum(col("n_tokens")).over(w) - col("n_tokens"), lit(0L)))
      .withColumn("pack_id", (col("cum_before") / budget).cast("long"))
      .withColumn("pack_pos", (col("cum_before") % budget).cast("long"))
      .select(shardCol, "doc_id", "n_tokens", "pack_id", "pack_pos")
  }

  /** Deterministic stratified sampling: keep a document iff the fractional
    * value derived from md5(doc_id) falls under the per-stratum rate.
    * Engine-portable (any md5 + modulo) and stable across runs/cluster
    * sizes — re-running the pipeline reproduces the same sample, which is
    * what makes ablations comparable. `rates` maps stratum -> keep rate;
    * missing strata default to 0.
    *
    * The hash domain is the first 15 md5 hex chars (60 bits) mod 10^6,
    * compared against rate * 10^6 — integer arithmetic both engines
    * round identically.
    */
  def stratifiedSample(docs: DataFrame, stratumCol: String,
      rates: Map[String, Double], salt: String = "graft"): DataFrame = {
    // cutoffs rounded DRIVER-side: (rate * 1e6).cast(long) would truncate
    // (0.3 * 1e6 = 299999.9999... -> 299999), silently shifting the
    // boundary by one for non-dyadic rates
    val cutoffCol = rates.foldLeft(lit(0L)) { case (acc, (s, r)) =>
      when(col(stratumCol) === s, lit(math.round(r * 1000000L))).otherwise(acc)
    }
    docs
      .withColumn("_u",
        pmod(graft.core.StableHash.h60Col(
          concat(lit(salt + ":"), col("doc_id").cast("string"))), lit(1000000L)))
      .filter(col("_u") < cutoffCol)
      .drop("_u")
  }

  /** Benchmark-contamination screen: flag documents sharing any k-token
    * shingle with a benchmark/eval set. The shingle relation is the same
    * as dedup's; the join is a LEFT SEMI against the (small) benchmark
    * shingle set — broadcast at any corpus scale, since the benchmark
    * side is the small one. Returns (doc_id, n_hits) for contaminated
    * docs only.
    */
  def contaminationCheck(docs: DataFrame, benchmark: DataFrame,
      k: Int): DataFrame = {
    // RAW shingles into the semi-join, distinct AFTER: n_hits counts a
    // doc's DISTINCT contaminated shingles, and semi-join/distinct
    // commute ((doc_id, shingle) pairs surviving the join are the same
    // set either way) — but distinct-first shuffles the corpus's ENTIRE
    // shingle relation, while distinct-after shuffles only the
    // contaminated survivors (rare by construction: the benchmark side
    // is small). The benchmark side deduplicates once on the bare
    // shingle (its per-doc dedup was subsumed by that).
    val docSh = Dedup.shinglesRaw(docs, k)
    val benchSh = Dedup.shinglesRaw(benchmark, k)
      .select(col("shingle")).distinct()
    docSh.join(broadcast(benchSh), Seq("shingle"), "left_semi")
      .distinct()
      .groupBy("doc_id").agg(count(lit(1)).as("n_hits"))
  }

  /** Skew-safe top-k rows per group — the "keep the k best-quality docs
    * per bucket" selection step. A single `row_number() over (partition
    * by group)` window puts EVERY row of a group in one task: a
    * boilerplate bucket with 10^8 docs is a straggler cliff. Instead,
    * two phases with the heap property that makes phase 1 lossless: a
    * group's global top-k rows are top-k within whatever partition they
    * sit in, so keeping top-k per (group, input-partition) always
    * retains them. Phase 1 prunes each group to <= k * nPartitions rows
    * with NO shuffle of the full relation (window keyed by the physical
    * partition id); phase 2 runs the tiny global per-group window on the
    * survivors. Output is independent of the physical partitioning
    * because the (score desc, tie asc) order is total — which REQUIRES
    * `tieCol` to be unique (a non-unique tie makes phase 1's pruning
    * layout-dependent, silently reintroducing the nondeterminism this
    * helper exists to prevent; pass a unique id).
    *
    * `scoreCol` descending, ties broken by `tieCol` ascending; returns
    * the input columns + `rank` (1-based).
    */
  def topKPerGroup(df: DataFrame, groupCol: String, scoreCol: String,
      tieCol: String, k: Int): DataFrame = {
    val reserved = Seq("rank", "__pid", "__lr")
    require(!df.columns.exists(reserved.contains),
      s"topKPerGroup reserves columns ${reserved.mkString(", ")}; " +
        "rename them on the input (a caller 'rank' would be silently " +
        "overwritten, __pid/__lr silently dropped)")
    val order = Seq(col(scoreCol).desc, col(tieCol).asc)
    val local = Window.partitionBy(col(groupCol), col("__pid"))
      .orderBy(order: _*)
    val global = Window.partitionBy(col(groupCol)).orderBy(order: _*)
    df.withColumn("__pid", spark_partition_id())
      .withColumn("__lr", row_number().over(local))
      .filter(col("__lr") <= k)
      .withColumn("rank", row_number().over(global))
      .filter(col("rank") <= k)
      .drop("__pid", "__lr")
  }
}
