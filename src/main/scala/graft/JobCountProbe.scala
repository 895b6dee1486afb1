package graft

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

import graft.corpus.Transcripts
import graft.query.QueryEngine

/** Diagnostic main: count Spark JOBS per warm query on the serving paths
  * (pruned top-k, filtered search). Job count is a deterministic,
  * noise-free proxy for per-query fixed cost — each job pays scheduler +
  * task-launch latency regardless of data size, so the count is what the
  * round-over-round "fewer jobs on the hot path" claims are pinned to.
  *
  * Usage: `sbt -batch "runMain graft.JobCountProbe"`. Builds (or reuses)
  * a small index at /tmp/jobcount_idx, then prints JOBS=N lines.
  */
object JobCountProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .appName("jobcount").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions._

    val dir = "/tmp/jobcount_idx"
    if (!graft.index.Fs.exists(graft.index.IndexPaths(dir).meta)) {
      val turns = Transcripts.generate(spark, nConvs = 3000)
      new graft.index.IndexBuilder(spark, Transcripts.lemmas,
        graft.index.IndexConf(numParts = 8)).build(turns, dir)
    }

    val jobs = new AtomicInteger(0)
    val sites = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(s: SparkListenerJobStart): Unit = {
        jobs.incrementAndGet()
        sites.add(s.stageInfos.map(_.name).mkString(" | ") +
          s" [${s.stageInfos.size}st]")
      }
    })
    def measure(label: String)(body: => Unit): Unit = {
      // listener bus is async: settle before and after sampling
      Thread.sleep(500)
      jobs.set(0); sites.clear()
      body
      Thread.sleep(500)
      println(s"JOBS $label=${jobs.get()}")
      sites.forEach(s => println(s"  SITE $label: $s"))
    }

    val e = new QueryEngine(spark, dir, Transcripts.lemmas)
    e.warmDictionaryLocal()
    e.wandMinPostings = 0 // force the pruned path at this corpus size
    // a frozen-fixture-style query over the synthetic vocab (stopword +
    // content words → mixed df, the pruned path's natural shape)
    val q = Bench.referenceQueries(3)
    // warm-up: plans, file listings, codegen
    e.bm25TopK(q, 10).collect()
    measure("bm25_pruned")(e.bm25TopK(q, 10).collect())
    println(s"PATH bm25=${e.lastWandPath}")

    val pred = col("role") === "user"
    e.bm25ScoresFiltered(e.queryTerms(q), pred, candidateCap = 2000000)
      .collect() // warm-up, selective route
    measure("filtered_selective")(
      e.bm25ScoresFiltered(e.queryTerms(q), pred, candidateCap = 2000000).collect())
    measure("filtered_broad")(
      e.bm25ScoresFiltered(e.queryTerms(q), pred, candidateCap = 1).collect())

    e.searchWithSnippets(q, 10).collect() // warm-up
    measure("search_snippets")(e.searchWithSnippets(q, 10).collect())

    spark.stop()
  }
}
