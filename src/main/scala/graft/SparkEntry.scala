package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * The operator catalog lives in [[GraftQueries]].
  */
object SparkEntry {

  /** Flagship: BM25 top-10 for a mixed-df query through the full engine
    * (SPIMI build -> compressed postings -> WAND top-k) on sf0.001.
    */
  def entry(spark: SparkSession): DataFrame = {
    val eng = GraftQueries.engineFor(spark, "/root/testdata/sf0.001")
    GraftQueries.withOrigDocId(eng,
      eng.bm25TopKForTerms(Seq("query", "join", "the"), 10))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    GraftQueries.queries

  /** DuckDB-equivalent ANSI SQL per query (rows-only checks for the
    * non-SQL-expressible LSH/ANN/codec operators).
    */
  def oracleSql: Map[String, String] = GraftQueries.oracleSql
}
