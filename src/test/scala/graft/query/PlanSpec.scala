package graft.query

import graft.SparkSpecBase
import graft.corpus.Transcripts
import graft.index.{IndexBuilder, IndexConf}
import org.apache.spark.sql.functions._

/** Physical-plan assertions: the things that make the design hold at
  * 100 TB must be visible in `explain` — predicate pushdown into the
  * postings Parquet scan, column pruning, and whole-stage codegen on the
  * scoring path.
  */
class PlanSpec extends SparkSpecBase {

  private lazy val indexDir: String = {
    val dir = tmpDir("graft-plan-index")
    new IndexBuilder(spark, Transcripts.lemmas, IndexConf(numParts = 4))
      .build(Transcripts.generate(spark, 30L), dir)
    dir
  }
  private lazy val engine = new QueryEngine(spark, indexDir, Transcripts.lemmas)

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("term_id predicate pushes down to the postings Parquet scan") {
    val plan = planOf(engine.postings.filter(col("term_id") === 7L))
    assert(plan.contains("PushedFilters") &&
      plan.contains("EqualTo(term_id,7)"), s"no pushdown in:\n$plan")
  }

  test("fuzzy lookup is a keyed probe of the deletion index, not a dictionary scan") {
    val plan = planOf(engine.fuzzyTerms("alba", 1))
    // the SymSpell path probes the persisted variant table with a pushed
    // IN filter (row-group pruned: the table is sorted by variant)
    assert(plan.contains("PushedFilters") && plan.contains("In(variant"),
      s"no variant-IN pushdown in:\n$plan")
    assert(!plan.contains("pos_blob"), "fuzzy probe must not touch postings columns")
  }

  test("fuzzy d=2 is ALSO a pushed variant-IN probe (lazy-backfilled table)") {
    val plan = planOf(engine.fuzzyTerms("alba", 2))
    assert(plan.contains("PushedFilters") && plan.contains("In(variant"),
      s"d=2 should probe a variant table, got:\n$plan")
    assert(!plan.contains("pos_blob"), "fuzzy probe must not touch postings columns")
  }

  test("fuzzy d=4 (above the variant-table cap) is a PUSHED cp_len range probe") {
    val plan = planOf(engine.fuzzyTerms("alba", 4))
    assert(plan.contains("PushedFilters") &&
      plan.contains("GreaterThanOrEqual(cp_len") &&
      plan.contains("LessThanOrEqual(cp_len"),
      s"d=4 should push a cp_len range into the dict_by_len scan, got:\n$plan")
    assert(!plan.contains("In(variant"), "d=4 must not probe a variant table")
    assert(!plan.contains("pos_blob"), "fuzzy probe must not touch postings columns")
  }

  test("fuzzy beyond MaxTermLen ALSO takes the cp_len range probe (not a full scan)") {
    val longQ = "a" * (graft.core.Fuzzy.MaxTermLen + 1)
    val plan = planOf(engine.fuzzyTerms(longQ, 1))
    assert(plan.contains("GreaterThanOrEqual(cp_len"),
      s"over-long query should range-probe dict_by_len:\n$plan")
    assert(!plan.contains("In(variant"), "over-long query must not probe the variant table")
    assert(!plan.contains("pos_blob"), "fuzzy probe must not touch postings columns")
  }

  test("dictionary layout: term IN pushdown over a term-sorted, range-partitioned table") {
    val plan = planOf(engine.dictionary.filter(col("term").isin("the", "alba")))
    assert(plan.contains("PushedFilters") && plan.contains("In(term"),
      s"no term-IN pushdown in:\n$plan")
    // layout: every parquet file covers a disjoint term range (so the
    // pushed filter prunes to O(query terms) row groups at any lexicon
    // size) and is sorted within
    val perFile = spark.read.parquet(s"$indexDir/dictionary")
      .select(col("term"), input_file_name().as("f"))
      .groupBy("f").agg(min("term").as("lo"), max("term").as("hi"))
      .collect().map(r => (r.getString(1), r.getString(2)))
      .sortBy(_._1)
    assert(perFile.nonEmpty)
    perFile.sliding(2).foreach {
      case Array(a, b) => assert(a._2 <= b._1,
        s"dictionary files overlap in term ranges: $a vs $b")
      case _ => ()
    }
  }

  test("scoring path pruned: decode reads only the needed columns") {
    val entries = engine.lookupTerms(Seq("the"))
    val plan = planOf(
      engine.postings.filter(col("term_id").isin(entries.map(_.term_id): _*))
        .select(col("term_id"), col("n_postings"), col("doc_gaps"),
          col("tfs"), col("dls")))
    assert(plan.contains("ReadSchema") && !plan.contains("pos_blob"),
      s"scoring scan should not read pos_blob:\n$plan")
  }

  test("top-k plans as TakeOrderedAndProject (bounded heap, no full sort)") {
    val scored = engine.bm25Scores(Seq("the", "alba"))
    val plan = planOf(scored.orderBy(col("score").desc, col("doc_id").asc).limit(10))
    assert(plan.contains("TakeOrderedAndProject"), s"expected bounded top-k in:\n$plan")
  }

  test("conjunctive chain broadcasts the rare side") {
    val plan = planOf(engine.conjunctive(Seq("the", "alba")))
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast join in:\n$plan")
  }

  test("conjunctive chain hints ONE BroadcastExchange total, not one per join step") {
    // hinting the ACCUMULATED join result each step (the round-4 shape)
    // would re-broadcast the shrinking accumulator at every join; only
    // the first (rarest) relation carries the hint, later steps are
    // AQE's call at runtime. Auto-broadcast is disabled so the static
    // plan shows hint-driven exchanges ONLY.
    val terms = engine.dictionary
      .filter(col("df") >= 2).orderBy(col("term")).limit(3)
      .collect().map(_.getAs[String]("term")).toSeq
    assert(terms.size == 3, "corpus too small for a 3-term conjunctive")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = planOf(engine.conjunctive(terms))
      val n = "BroadcastExchange".r.findAllIn(plan).size
      assert(n == 1,
        s"expected exactly 1 hint-driven BroadcastExchange for 3 rare terms, got $n in:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("whole-stage codegen covers the quality-scoring expressions") {
    // parquet-backed input (a literal local relation constant-folds away)
    val docs = engine.docs.select(col("doc_id"), col("text"))
    val plan = planOf(graft.ops.TextOps.qualityScore(docs))
    // executedPlan.toString renders WholeStageCodegen stages as "*(n)"
    assert(plan.contains("*(1)"), s"no codegen span in:\n$plan")
  }
}
