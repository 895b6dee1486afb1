package graft.corpus

import graft.SparkSpecBase
import graft.index.{IndexBuilder, IndexConf}
import graft.query.QueryEngine
import org.apache.spark.sql.functions._

/** End-to-end over the reference's REAL ingest format: bz2-compressed
  * JSON-lines of WikiArticle {url, text: [[sentences]], id, title}
  * (reference src/indexer/indexer.rs:21-27, 88-130) -> plaintext
  * extraction -> full index build -> query + DocumentMetadata join.
  */
class WikiSourceSpec extends SparkSpecBase {

  private def writeDump(path: String): Unit = {
    val spark0 = spark
    import spark0.implicits._
    val arts = Seq(
      ("https://x/1", Seq(Seq("the quick ", "brown fox"), Seq("jumps <b>over</b> the dog")), "a1", "Foxes"),
      ("https://x/2", Seq(Seq("spark builds <i>inverted</i> indexes")), "a2", "Indexing"),
      ("https://x/3", Seq(Seq("unrelated text entirely")), "a3", "Other"))
      .toDF("url", "text", "id", "title")
    arts.coalesce(1).write.mode("overwrite")
      .option("compression", "bzip2").json(path)
  }

  test("bz2 json dump -> plaintext -> index -> query -> doc metadata") {
    val dump = tmpDir("graft-wiki-dump")
    writeDump(dump)
    // files really are bz2
    val files = new java.io.File(dump).listFiles().map(_.getName)
    assert(files.exists(_.endsWith(".json.bz2")), files.mkString(","))

    val articles = WikiSource.readArticles(spark, dump)
    assert(articles.count() == 3)

    // plaintext semantics: sentences joined with "", paragraphs with
    // \n\n, tags stripped (reference extract_plaintext)
    val plain = articles.filter(col("id") === "a1")
      .select(WikiSource.plaintext(col("text"))).head().getString(0)
    assert(plain == "the quick brown fox\n\njumps over the dog")

    // full pipeline: ingest -> build -> BM25 -> DocumentMetadata
    val idxDir = tmpDir("graft-wiki-idx")
    new IndexBuilder(spark, Map.empty, IndexConf(numParts = 2))
      .build(WikiSource.asTurns(articles), idxDir)
    val eng = new QueryEngine(spark, idxDir, Map.empty)
    val hits = eng.bm25TopK("fox", 5)
    val withMeta = WikiSource.docMeta(articles, eng.docs)
      .join(hits, Seq("doc_id")).collect()
    assert(withMeta.length == 1)
    assert(withMeta.head.getAs[String]("doc_name") == "Foxes")
    assert(withMeta.head.getAs[String]("doc_url") == "https://x/1")
  }
}
