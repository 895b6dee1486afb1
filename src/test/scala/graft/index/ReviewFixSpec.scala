package graft.index

import org.apache.spark.sql.functions._

import graft.SparkSpecBase
import graft.corpus.Transcripts
import graft.oracle.Oracle
import graft.query.QueryEngine

/** Pins the round-5 full-tree review fixes:
  *  - the docs table retains `ts`, so the documented time-window
  *    predicates (filtered search, deleteWhere takedowns) are
  *    expressable;
  *  - build() refuses an empty input with a clear error instead of an
  *    NPE mid-build;
  *  - an empty tombstone batch never commits a marker (and executes the
  *    caller's plan exactly once — write-first, decide from footers);
  *  - a rebuild at the same root with a DIFFERENT lemma map must not
  *    resume stale stage manifests (the lemma map is part of the build
  *    fingerprint).
  */
class ReviewFixSpec extends SparkSpecBase {

  private val lemmas = Transcripts.lemmas
  private val conf = IndexConf(numParts = 4, skewDfThreshold = 300, nSalts = 2)
  private lazy val allTurns = Transcripts.generateLocal(30L)
  private lazy val oracle = new Oracle(allTurns, lemmas)

  private lazy val root: String = {
    val dir = tmpDir("graft-rf")
    import spark.implicits._
    new IndexBuilder(spark, lemmas, conf)
      .build(spark.createDataset(allTurns), dir)
    dir
  }

  // conversations are minted one minute apart (Transcripts.turnsFor), so
  // this cut keeps roughly the first half of the corpus
  private val tsCut =
    new java.sql.Timestamp(Transcripts.epochMs + 15L * 60000L)

  test("filtered search accepts a ts predicate (docs table retains ts)") {
    val eng = new QueryEngine(spark, root, lemmas)
    val tsOf: Map[Long, java.sql.Timestamp] = eng.docs
      .select(col("doc_id"), col("ts")).collect()
      .map(r => r.getLong(0) -> r.getTimestamp(1)).toMap
    assert(tsOf.nonEmpty && tsOf.values.exists(_.before(tsCut)) &&
      tsOf.values.exists(t => !t.before(tsCut)),
      "fixture: the cut must split the corpus")

    val terms = eng.queryTerms("the of")
    val got = eng.bm25TopKFiltered("the of", 10, col("ts") < lit(tsCut))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val want = oracle.bm25TopKForTerms(terms, Int.MaxValue)
      .filter { case (d, _) => tsOf(d).before(tsCut) }.take(10)
    assert(got == want, s"ts-filtered top-k mismatch\n got=$got\nwant=$want")
  }

  test("deleteWhere accepts a ts predicate (time-window takedown)") {
    val genRoot = tmpDir("graft-rf-gen")
    import spark.implicits._
    Generations.append(spark, spark.createDataset(allTurns), genRoot,
      lemmas, conf)
    Generations.deleteWhere(spark, genRoot, col("ts") < lit(tsCut))

    val multi = new MultiGenEngine(spark, genRoot, lemmas)
    val live = multi.bm25TopK("the of", 1000).collect().map(_.getLong(0))
    val tsOf: Map[Long, java.sql.Timestamp] = multi.engines.head.docs
      .select(col("doc_id"), col("ts")).collect()
      .map(r => r.getLong(0) -> r.getTimestamp(1)).toMap
    assert(live.nonEmpty, "fixture: some docs must survive the takedown")
    assert(live.forall(d => !tsOf(d).before(tsCut)),
      "a doc inside the deleted time window survived the takedown")
  }

  test("build() refuses an empty input with a clear error, not an NPE") {
    import spark.implicits._
    val dir = tmpDir("graft-rf-empty")
    val ex = intercept[IllegalArgumentException] {
      new IndexBuilder(spark, lemmas, conf)
        .build(spark.emptyDataset[graft.corpus.Turn], dir)
    }
    assert(ex.getMessage.contains("empty input"), ex.getMessage)
  }

  test("an empty tombstone batch never commits (and leaves no dir)") {
    val dir = cloneRoot(root, "graft-rf-emptydel")
    import spark.implicits._
    val before = Generations.delDirs(dir)
    Generations.deleteDocs(spark, spark.emptyDataset[Long], dir)
    assert(Generations.delDirs(dir) == before,
      "empty batch must not commit a tombstone marker")
    // the uncommitted batch dir itself is removed, so nextNumbered can
    // reuse the slot and delDirs/readers never see a meta-less partial
    assert(!Fs.listNames(dir).exists(n => n.startsWith("del-") &&
      !before.exists(_.endsWith(n))),
      "empty batch must not leave a partial del- dir behind")
  }

  test("rebuild with a different lemma map does not resume stale stages") {
    import spark.implicits._
    val dir = tmpDir("graft-rf-lemma")
    val turns = spark.createDataset(allTurns)
    new IndexBuilder(spark, lemmas, conf).build(turns, dir)
    val v1 = new QueryEngine(spark, dir, lemmas)
    // pick an inflected surface form the v1 map rewrites: under v1 the
    // dictionary holds only the base, so an engine WITHOUT the map
    // (queries pass the surface form through) finds nothing
    val surfaceTerms: Set[String] = allTurns.iterator
      .flatMap(t => graft.core.Tokenizer.tokenize(t.text, Map.empty))
      .map(_.term).toSet
    val surface = lemmas.keys.find(surfaceTerms.contains)
      .getOrElse(fail("fixture: no inflected surface form in corpus"))
    assert(v1.conjunctive(Seq(lemmas(surface))).count() > 0)

    // rebuild the SAME root with no lemma map: every stage input
    // changes; a config-only fingerprint would resume every manifest
    // and silently serve the v1 lemmatization
    new IndexBuilder(spark, Map.empty, conf).build(turns, dir)
    val v2 = new QueryEngine(spark, dir, Map.empty)
    assert(v2.conjunctive(Seq(surface)).count() > 0,
      s"rebuild with a different lemma map served the stale index: " +
        s"surface term '$surface' missing from the rebuilt dictionary")
  }
}
