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
        .toSeq.sorted)
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
