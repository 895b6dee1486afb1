package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.{Dedup, Similarity}

/** Dev-only measurement harness (guide §1.4): decomposes the expensive
  * catalog rows into stages, times each against the noop sink in the
  * SAME session shape Bench uses, and counts Spark jobs per stage.
  * Never run by the driver; Bench.scala stays frozen. Usage:
  *
  *   SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_CPUS=32 \
  *     sbt -batch "runMain graft.BenchExtra [piece...]"
  */
object BenchExtra {

  private def newSession(cpus: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-benchextra-$cpus")
      .config("spark.sql.shuffle.partitions", (cpus * 2).toString)
      .config("spark.sql.files.maxPartitionBytes", (1024 * 1024).toString)
      .config("spark.sql.files.openCostInBytes", (64 * 1024).toString)
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes",
        (2 * 1024 * 1024).toString)
      .config("spark.local.dir", "/dev/shm/graft/spark-local")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "localhost")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  private def noop(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get("/dev/shm/graft/spark-local"))
    val spark = newSession(cpus)
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            s: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobs.incrementAndGet()
      })
    val out = scala.collection.mutable.LinkedHashMap.empty[String, (Double, Int)]
    def t(label: String)(body: => Unit): Unit = {
      // two passes: pass 1 pays JIT/codegen/file-listing warmup, pass 2
      // is the steady-state number (the bench's own min-of-2 shape)
      spark.sparkContext.setJobDescription(label)
      val times = (1 to 2).map { _ =>
        Thread.sleep(200); jobs.set(0)
        val t0 = System.nanoTime()
        body
        (System.nanoTime() - t0) / 1e9
      }
      Thread.sleep(200)
      out(label) = (times.min, jobs.get())
      println(f"STAGE $label%-40s cold=${times.head}%8.3f s warm=${times.last}%8.3f s  jobs=${jobs.get()}")
      spark.sparkContext.setJobDescription(null)
    }
    val pieces = if (args.isEmpty) Set("q48", "q25", "q18", "q41", "q21", "q56")
      else args.toSet

    val sketch = graft.core.HashFamily.Xx64
    def documents = GraftQueries.documents(spark, sfDir)

    // cat:<prefix>[,<prefix>...] — time whole catalog rows (the bench's
    // own fn(spark, sfDir).count() action, min-of-2) without paying for
    // the full Bench build stages; engine roots are built/warmed on
    // first touch exactly as in Bench's pass 1.
    pieces.filter(_.startsWith("cat:")).foreach { spec =>
      val ps = spec.stripPrefix("cat:").split(',').map(_.trim).filter(_.nonEmpty)
      GraftQueries.benchQueries.toSeq.sortBy(_._1)
        .filter(q => ps.exists(q._1.startsWith))
        .foreach { case (name, fn) => t(s"cat.$name")(fn(spark, sfDir).count()) }
    }

    if (pieces("q48")) {
      val docs = documents.select(col("doc_id"), col("text"))
      def planted(offset: Long, bound: Int, tag: String) =
        docs.filter(col("doc_id") < bound)
          .select((col("doc_id") + offset).as("doc_id"),
            concat(lit(s"planted $tag "), col("doc_id").cast("string"))
              .as("text"))
      val all = docs.union(planted(1000000L, 20, "hopone"))
        .union(planted(2000000L, 10, "hoptwo"))
      t("q48.sigs")(noop(Dedup.minHashSignatures(all, k = 3, nHashes = 32,
        family = sketch)))
      val sigs = Dedup.minHashSignatures(all, k = 3, nHashes = 32,
        family = sketch)
      t("q48.candidates")(noop(Dedup.minHashCandidates(sigs, bands = 8,
        rowsPerBand = 4, minEstJaccard = 0.9, family = sketch)))
      val chain = docs.filter(col("doc_id") < 20).select(
          col("doc_id").as("doc_a"), (col("doc_id") + 1000000).as("doc_b"))
        .union(docs.filter(col("doc_id") < 10).select(
          (col("doc_id") + 1000000).as("doc_a"),
          (col("doc_id") + 2000000).as("doc_b")))
      val edgesPath = "/tmp/graft_extra_q48_edges"
      t("q48.edges_write")(
        Dedup.minHashCandidates(sigs, bands = 8, rowsPerBand = 4,
            minEstJaccard = 0.9, family = sketch)
          .select(col("doc_a"), col("doc_b")).union(chain)
          .write.mode("overwrite").parquet(edgesPath))
      t("q48.clusterDocs_local")(noop(
        Dedup.clusterDocs(all, spark.read.parquet(edgesPath))))
      t("q48.clusterDocs_distributed")(noop(
        Dedup.clusterDocs(all, spark.read.parquet(edgesPath),
          localMaxEdges = 0L)))
    }

    if (pieces("q38")) {
      val eng = GraftQueries.engineLemmaFor(spark, sfDir)
      t("q38.handleQuery")(noop(eng.handleQuery("merge sort table", 100)))
      t("q38.phraseMatch")(
        eng.phraseMatch(Seq("merge", "sort", "table")).limit(300001).collect())
      t("q38.bigramConj")(
        eng.conjunctive(Seq("merge sort", "sort table")).limit(300001).collect())
      t("q38.row_full")(noop(
        GraftQueries.benchQueries("q38_handle_query_tiers")(spark, sfDir)))
    }

    if (pieces("q25")) {
      val eng = GraftQueries.engineFor(spark, sfDir)
      t("q25.engine_warm_noop")(eng.docs.select("doc_id").limit(1).collect())
      t("q25.handleQuery_full")(noop(eng.handleQuery("table scan", 100)))
      t("q25.handleQuery_again")(noop(eng.handleQuery("table scan", 100)))
      t("q25.lookupTerms")(eng.lookupTerms(Seq("table", "scan")))
      t("q25.phraseMatch_count")(
        eng.phraseMatch(Seq("table", "scan")).limit(300001).collect())
      t("q25.withOrigDocId_finish")(noop(
        GraftQueries.queries("q25_handle_query")(spark, sfDir)))
    }

    if (pieces("q18")) {
      val docs = documents.select(col("doc_id"), col("text"))
      val planted = docs.filter(col("doc_id") < 20)
        .select((col("doc_id") + 1000000).as("doc_id"), col("text"))
      val all = docs.union(planted)
      t("q18.shingles")(noop(all.select(col("doc_id"),
        split(col("text"), " ").as("toks"))))
      t("q18.sigs")(noop(Dedup.minHashSignatures(all, k = 3, nHashes = 32,
        family = sketch)))
      val sigs = Dedup.minHashSignatures(all, k = 3, nHashes = 32,
        family = sketch)
      t("q18.banded")(noop(Dedup.minHashBanded(sigs, 8, 4, sketch)))
      t("q18.cands_full")(noop(Dedup.minHashCandidates(sigs, bands = 8,
        rowsPerBand = 4, minEstJaccard = 0.5, family = sketch)))
    }

    if (pieces("q41")) {
      val emb = GraftQueries.embeddings(spark, sfDir)
        .select(col("vec_id"), col("embedding"))
      t("q41.sig")(noop(Similarity.withHyperplaneSig(emb, 24, 64)))
      t("q41.cand_pairs")(noop(
        Similarity.knnCandidatePairs(emb, 24, 3, 64)
          .filter(col("id_a") < 50)))
      val pairsPath = "/tmp/graft_extra_q41_pairs"
      t("q41.cand_write_coalesce1")(
        Similarity.knnCandidatePairs(emb, 24, 3, 64)
          .filter(col("id_a") < 50)
          .coalesce(1).write.mode("overwrite").parquet(pairsPath))
      t("q41.cand_write_plain")(
        Similarity.knnCandidatePairs(emb, 24, 3, 64)
          .filter(col("id_a") < 50)
          .write.mode("overwrite").parquet(pairsPath + "2"))
      t("q41.rank")(noop(Similarity.knnRank(emb,
        spark.read.parquet(pairsPath), k = 5, roundTo = 4)))
    }

    if (pieces("q21")) {
      val emb = GraftQueries.embeddings(spark, sfDir)
        .select(col("vec_id"), col("embedding"))
      val planted = emb.filter(col("vec_id") < 5)
        .select((col("vec_id") + 1000000).as("vec_id"), col("embedding"))
      val all = emb.union(planted)
      t("q21.neardups_full")(noop(Dedup.embeddingNearDups(all,
        minCos = 0.999, nPlanes = 24, bands = 3, dim = 64)))
    }

    if (pieces("q56")) {
      val docs = documents.select(col("doc_id"), col("text"))
      val planted = docs.filter(col("doc_id") < 20)
        .select((col("doc_id") + 1000000).as("doc_id"), col("text"))
      val sigs = Dedup.minHashSignatures(docs.union(planted), k = 3,
        nHashes = 32, family = sketch)
      t("q56.star_full")(noop(Dedup.minHashStarEdges(sigs, bands = 8,
        rowsPerBand = 4, minEstJaccard = 0.5, family = sketch)))
    }

    println("EXTRA " + out.map { case (k, (s, j)) =>
      "\"" + k + "\":[" + f"$s%.3f" + "," + j + "]" }.mkString("{", ",", "}"))
    spark.stop()
  }
}
