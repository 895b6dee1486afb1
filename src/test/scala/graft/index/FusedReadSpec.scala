package graft.index

import graft.SparkSpecBase
import graft.corpus.Transcripts
import graft.oracle.Oracle

/** The fused multi-generation postings read (one multi-path scan, gen
  * recovered from the file path) vs the per-generation union form
  * (fusedRead = false). Contract: bit-identical results on every
  * scoring surface, on exact AND block-max-pruned paths, with
  * tombstones, and on a MERGED root whose generation doc ranges are
  * non-contiguous (the case that rules out interval-mapping).
  */
class FusedReadSpec extends SparkSpecBase {

  private val lemmas = Transcripts.lemmas
  private val conf = IndexConf(numParts = 4, skewDfThreshold = 300, nSalts = 4)
  private lazy val allTurns = Transcripts.generateLocal(40L)
  private lazy val oracle = new Oracle(allTurns, lemmas)

  private lazy val root: String = {
    val dir = tmpDir("graft-fused")
    import spark.implicits._
    val (b1, rest) = allTurns.splitAt(allTurns.size / 3)
    val (b2, b3) = rest.splitAt(rest.size / 2)
    Seq(b1, b2, b3).foreach(b =>
      Generations.append(spark, spark.createDataset(b), dir, lemmas, conf))
    val victims = oracle.bm25TopK("the of", 5).map(_._1).take(2)
    Generations.deleteDocs(spark, spark.createDataset(victims), dir)
    dir
  }

  private def engines(r: String): (MultiGenEngine, MultiGenEngine) = {
    val fused = new MultiGenEngine(spark, r, lemmas)
    val legacy = new MultiGenEngine(spark, r, lemmas)
    legacy.fusedRead = false
    (fused, legacy)
  }

  private def snap(m: MultiGenEngine): Map[String, Seq[Any]] = {
    import org.apache.spark.sql.functions.col
    Map(
      "bm25" -> m.bm25TopK("the of table", 10)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq,
      "handle" -> m.handleQuery("table scan", 10)
        .collect().map(r => (r.getLong(0), r.getDouble(1), r.getInt(2))).toSeq,
      "filtered" -> m.bm25TopKFiltered("the of", 10, col("doc_len") % 2 === 0)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq,
      "conj" -> m.conjunctive(Seq("the", "of"))
        .collect().map(_.getLong(0)).toSeq.sorted,
      "phrase" -> m.phraseMatch(Seq("the", "of"))
        .collect().map(_.getLong(0)).toSeq.sorted,
      "phrase1" -> m.phraseMatch(Seq(Transcripts.contentWords(5)))
        .collect().map(_.getLong(0)).toSeq.sorted,
      "conjMissing" -> m.conjunctive(Seq("the", "zzzznotaterm"))
        .collect().map(_.getLong(0)).toSeq.sorted,
      "prox" -> m.proximity("the", "of", 3)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
        .toSeq.sorted,
      "snippets" -> {
        val ids = m.bm25TopK("the of table", 5).collect().map(_.getLong(0))
        m.snippetsFor(Seq("the", "of", "table"), ids)
          .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
          .toSeq.sortBy(_._1)
      },
      "search" -> m.searchWithSnippets("the of table", 5)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq)
  }

  test("genSegOf: per-range layout, URI schemes, degenerate paths") {
    assert(Generations.genSegOf(
      "/tmp/r/gen-00003/postings/range-000/part-0.parquet") == "gen-00003")
    assert(Generations.genSegOf(
      "file:/tmp/r/gen-00000/postings/part-0.parquet") == "gen-00000")
    assert(Generations.genSegOf("/no/postings-free/path.parquet") == "")
  }

  test("fused == legacy on exact, pruned, tiered and filtered paths (with tombstones)") {
    val (fused, legacy) = engines(root)
    assert(fused.fusedRead && !legacy.fusedRead)
    assert(snap(fused) == snap(legacy))

    // force the block-max pruned path (candidate-pruned chunk reads)
    fused.wandMinPostings = 0L
    legacy.wandMinPostings = 0L
    fused.refineMinCandidates = 0L
    legacy.refineMinCandidates = 0L
    val fTop = fused.bm25TopK("the of table", 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val lTop = legacy.bm25TopK("the of table", 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(fused.lastPath == "pruned", s"expected pruned, got ${fused.lastPath}")
    assert(legacy.lastPath == "pruned")
    assert(fTop == lTop)
  }

  test("fused positional plans: forced candidate-pruned and forced shuffle both match legacy") {
    def phr(m: MultiGenEngine): Seq[Long] =
      m.phraseMatch(Seq("the", Transcripts.contentWords(5)))
        .collect().map(_.getLong(0)).toSeq.sorted
    for (density <- Seq(0L, 10000000000L)) {
      val (fused, legacy) = engines(root)
      (fused.engines ++ legacy.engines)
        .foreach(_.positionalPruneDensity = density)
      assert(phr(fused) == phr(legacy), s"density=$density diverged")
      assert(phr(fused).nonEmpty || density > 0,
        "forced-pruned phrase matched nothing — weak test")
    }
  }

  test("pruned-path job count is FLAT in generation count (and legacy pays the fan-out tax)") {
    // Spark JOB count is the deterministic, noise-free proxy for the
    // per-query fixed cost the fused read removes: the per-generation
    // union form runs one chunk-metadata collect job PER GENERATION on
    // the candidate-pruned path, the fused form exactly one multi-path
    // pre-pass — so fused jobs must not grow with generation count.
    import spark.implicits._
    val oneDir = tmpDir("graft-fused-onegen")
    Generations.append(spark, spark.createDataset(allTurns), oneDir, lemmas, conf)
    val one = new MultiGenEngine(spark, oneDir, lemmas)
    val (fused3, legacy3) = engines(root) // 3 generations + tombstones
    val q = "the of table"
    Seq(one, fused3, legacy3).foreach { m =>
      m.warmDictionariesLocal()
      m.wandMinPostings = 0L // force the candidate-pruned path
      m.bm25TopK(q, 10).collect() // warm: plans, liveDocs, file listings
      assert(m.lastPath == "pruned")
    }
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          s: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    })
    def jobsOf(body: => Unit): Int = {
      Thread.sleep(300); jobs.set(0); body; Thread.sleep(300); jobs.get()
    }
    val j1 = jobsOf(one.bm25TopK(q, 10).collect())
    val j3f = jobsOf(fused3.bm25TopK(q, 10).collect())
    val j3l = jobsOf(legacy3.bm25TopK(q, 10).collect())
    assert(j3f == j1, s"fused jobs grew with generations: 1 gen=$j1, 3 gens=$j3f")
    assert(j3l > j3f, s"expected the legacy per-gen form to pay extra jobs: " +
      s"legacy=$j3l fused=$j3f")
  }

  test("over-cap survivors fallback (shuffled semi-join) still recovers generations") {
    // chunkMetaCollectCap < 0 forces fusedFoldRows' over-cap branch: the
    // chunk-metadata pre-pass is semi-joined distributed instead of
    // collected. autoBroadcastJoinThreshold = -1 forces that un-hinted
    // semi-join to SHUFFLE (explicit broadcast() hints elsewhere are
    // unaffected) — the plan shape this branch exists for at 100-TB
    // survivor counts. Generation recovery must survive the exchange:
    // input_file_name() returns "" once rows cross a shuffle, so it has
    // to be captured in the scan stage, below any join.
    val (fused, legacy) = engines(root)
    fused.engines.foreach(_.chunkMetaCollectCap = -1.0)
    Seq(fused, legacy).foreach { m =>
      m.wandMinPostings = 0L; m.refineMinCandidates = 0L
    }
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      import org.apache.spark.sql.functions.col
      def probe(m: MultiGenEngine): Seq[Any] = Seq(
        m.bm25TopK("the of table", 10)
          .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq,
        m.bm25TopKFiltered("the of", 10, col("doc_len") % 2 === 0)
          .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq)
      val f = probe(fused)
      assert(fused.lastPath == "pruned", s"expected pruned, got ${fused.lastPath}")
      assert(f == probe(legacy))
      assert(f.head.asInstanceOf[Seq[Any]].nonEmpty, "empty top-k — weak test")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("fused == legacy on a merged root (non-contiguous generation ranges)") {
    // fresh root so the sibling test's engines are undisturbed
    val dir = tmpDir("graft-fused-merged")
    import spark.implicits._
    val thirds = allTurns.grouped(math.max(1, allTurns.size / 3 + 1)).toSeq
    thirds.foreach(b =>
      Generations.append(spark, spark.createDataset(b), dir, lemmas, conf))
    // merge FIRST and LAST -> the merged generation's doc ranges are
    // non-contiguous and sort AFTER the untouched middle generation
    val gens = Generations.genDirs(dir)
    Compactor.mergeGenerations(spark, dir, Seq(gens.head, gens.last),
      lemmas, conf)
    val (fused, legacy) = engines(dir)
    assert(fused.gens.size == 2)
    assert(snap(fused) == snap(legacy))
    fused.wandMinPostings = 0L
    legacy.wandMinPostings = 0L
    assert(snap(fused) == snap(legacy))
  }
}
