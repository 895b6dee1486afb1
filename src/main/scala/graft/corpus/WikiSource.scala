package graft.corpus

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The reference engine's actual input source: bz2-compressed JSON-lines
  * of wiki articles (reference src/indexer/indexer.rs:21-27 WikiArticle
  * {url, text: Vec<Vec<String>>, id, title}; read_bz2_file at
  * indexer.rs:88-130). Spark-first: `spark.read.json` decompresses .bz2
  * transparently through the Hadoop codec and splits files across tasks,
  * so ingest parallelizes per file with no custom decoder code; the
  * plaintext extraction (paragraph sentences joined with "", paragraphs
  * joined with "\n\n", HTML/XML tags stripped — indexer.rs:59-70) is a
  * pure codegen'd column expression.
  */
object WikiSource {

  val articleSchema: StructType = StructType(Seq(
    StructField("url", StringType),
    StructField("text", ArrayType(ArrayType(StringType))),
    StructField("id", StringType),
    StructField("title", StringType)))

  /** Read a dump directory/glob of (optionally .bz2-compressed) JSON-lines
    * article files.
    */
  def readArticles(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(articleSchema).json(path)

  /** extract_plaintext as a column: sentences of a paragraph joined with
    * "", paragraphs joined with "\n\n", tags removed (reference
    * indexer.rs:59-70).
    */
  def plaintext(text: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    regexp_replace(
      array_join(transform(text, p => array_join(p, "")), "\n\n"),
      "<[^>]*>", "")

  /** Articles as the engine's ingest rows: one article = one document.
    * conv_id carries the article id (the stable key back to metadata),
    * `tool` carries the url — so `docMeta` below can re-attach
    * DocumentMetadata (doc_name/doc_url, reference indexer.rs:46-50)
    * to query results without a second source scan.
    */
  def asTurns(articles: DataFrame): Dataset[Turn] = {
    val spark = articles.sparkSession
    import spark.implicits._
    articles
      // PERMISSIVE json turns a corrupt line (or a text-less redirect
      // stub) into null fields; one such row must not NPE a multi-TB
      // ingest inside the tokenizer
      .filter(col("id").isNotNull && col("text").isNotNull)
      .select(col("id"), coalesce(col("url"), lit("")).as("url"),
        plaintext(col("text")).as("plain"))
      .as[(String, String, String)]
      .map { case (id, url, plain) =>
        Turn(id, 0, "article", if (plain == null) "" else plain, url,
          new Timestamp(0L))
      }
  }

  /** (doc_id, doc_name, doc_url) for a built index over asTurns input:
    * joins the engine's docs table back to the article metadata — the
    * reference's DocumentMetadata map, as a relation.
    */
  def docMeta(articles: DataFrame, docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("conv_id").as("id"))
      .join(articles.select(col("id"), col("title").as("doc_name"),
        col("url").as("doc_url")), Seq("id"))
      .select("doc_id", "doc_name", "doc_url")
}
