package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for a large-scale training-data pipeline, over
  * a `documents(doc_id, text, ...)` table. Everything is built from
  * codegen'd `org.apache.spark.sql.functions` (no UDFs in the hot path),
  * so filters/projections push down and whole-stage codegen applies.
  */
object TextOps {

  val stopwords: Seq[String] = graft.corpus.Transcripts.stopwords

  /** (doc_id, pos, term) exploded tokens; positions are 0-based split
    * indices. For pre-cleaned single-space text this equals the engine
    * tokenizer's output (no empty tokens); raw text goes through
    * graft.core.Tokenizer instead.
    */
  def tokens(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
        posexplode(split(col("text"), " ")).as(Seq("pos", "term")))
      .filter(col("term") =!= "")

  /** Document frequency per term. */
  def termDf(docs: DataFrame): DataFrame =
    tokens(docs).groupBy("term")
      .agg(countDistinct("doc_id").as("df"), count(lit(1)).as("cf"))

  /** Per-doc token statistics: raw token count, distinct terms, TTR. */
  def tokenStats(docs: DataFrame): DataFrame =
    tokens(docs).groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        countDistinct("term").as("n_distinct"),
        round(countDistinct("term").cast("double") / count(lit(1)), 4).as("ttr"))

  /** Whitespace + BPE-ish token counting: words and punctuation runs as
    * separate tokens (`\w+` | single non-space-non-word) — a cheap,
    * deterministic proxy for subword token counts.
    */
  def tokenCounts(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      size(split(col("text"), " ")).as("n_ws_tokens"),
      size(filter(split(regexp_replace(col("text"),
        "([^\\w\\s])", " $1 "), "\\s+"), t => t =!= "")).as("n_bpeish_tokens"))

  /** Intra-document repetition: fraction of repeated k-token shingles
    * (1 - distinct/total), the standard cheap signal for boilerplate /
    * degenerate generation loops in pretraining data. Pure column
    * expressions; docs shorter than k tokens score 0.
    */
  def repetitionScore(docs: DataFrame, k: Int): DataFrame = {
    val sh = Dedup.shingleArrayCol(split(col("text"), " "), k)
    docs.select(col("doc_id"),
        size(sh).as("n_shingles"),
        size(array_distinct(sh)).as("n_distinct_shingles"))
      .withColumn("repetition",
        when(col("n_shingles") > 0,
          round(lit(1.0) - col("n_distinct_shingles").cast("double") /
            col("n_shingles"), 4)).otherwise(lit(0.0)))
  }

  /** Quality scoring: length, punctuation ratio, stopword ratio, mean
    * token length — the standard cheap pretraining-quality heuristics.
    * All ratios rounded to 4 decimals for cross-engine comparability.
    */
  def qualityScore(docs: DataFrame): DataFrame = {
    // null text scores as empty text: a null would propagate through
    // EVERY metric (even the div-by-zero when-guard's condition is
    // null) and a null quality passes neither side of a threshold
    // gate — the doc would vanish from both partitions of a quality
    // split, the exact hazard the guard below exists for
    val txt = coalesce(col("text"), lit(""))
    val toks = split(txt, " ")
    val nTok = size(toks)
    val stopArr = array(stopwords.map(lit): _*)
    val nStop = size(filter(toks, t => array_contains(stopArr, t)))
    val nPunct = length(txt) - length(regexp_replace(txt, "[^\\w\\s]", ""))
    docs.select(
      col("doc_id"),
      length(txt).as("n_chars_actual"),
      nTok.as("n_tokens"),
      round(nStop.cast("double") / nTok, 4).as("stopword_ratio"),
      // guarded: an empty text would make this NULL (x/0), and a NULL
      // quality passes NEITHER side of a threshold gate
      when(length(txt) > 0,
        round(nPunct.cast("double") / length(txt), 4))
        .otherwise(lit(0.0)).as("punct_ratio"),
      round((length(txt) - (nTok - lit(1))).cast("double") / nTok, 4)
        .as("mean_token_len"))
      .withColumn("quality",
        round(least(lit(1.0), col("n_tokens").cast("double") / lit(20.0)) *
          (lit(1.0) - col("punct_ratio")) *
          when(col("stopword_ratio").between(0.1, 0.6), lit(1.0)).otherwise(lit(0.7)),
          4))
  }

  private val langMarkers: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "mit"),
    "en" -> Seq("the", "a", "of", "to", "and", "is", "it", "you"),
    "es" -> Seq("el", "la", "de", "que", "y", "los", "una", "por"),
    "fr" -> Seq("le", "la", "les", "et", "des", "une", "est", "dans"),
    "it" -> Seq("il", "la", "che", "di", "e", "un", "per", "non"))

  /** Language-ID heuristic: argmax over per-language marker-word counts
    * (n-gram-style scoring over the cheapest possible features); ties and
    * all-zero scores resolve alphabetically / to "und". Deterministic and
    * SQL-expressible, so the DuckDB oracle replicates it exactly.
    */
  def langId(docs: DataFrame): DataFrame = {
    val toks = split(col("text"), " ")
    val scored = langMarkers.foldLeft(docs.select(col("doc_id"), toks.as("toks"))) {
      case (df, (lang, markers)) =>
        val arr = array(markers.map(lit): _*)
        df.withColumn(s"score_$lang",
          size(filter(col("toks"), t => array_contains(arr, t))))
    }
    val bestScore = greatest(langMarkers.map(m => col(s"score_${m._1}")): _*)
    // alphabetical-first tie-break: scan langs in order, take first match
    val pred = langMarkers.map(_._1).foldRight(lit("und"): Column) {
      case (lang, elseCol) =>
        when(col(s"score_$lang") === bestScore && bestScore > 0, lit(lang))
          .otherwise(elseCol)
    }
    scored.select(col("doc_id"), bestScore.as("score"), pred.as("lang_pred"))
  }

  /** Training-text normalization: engine tokenization (cleanWord +
    * optional lemmas), optional stopword removal, single-space rejoin —
    * the standard cleaning step before corpus dedup/packing.
    */
  def normalizeText(docs: DataFrame, lemmas: Map[String, String] = Map.empty,
      dropStopwords: Boolean = true): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val bcLem = spark.sparkContext.broadcast(lemmas)
    val stop = stopwords.toSet
    // coalesce: one null-text row (corrupt record, outer-join artifact)
    // must not NPE a whole job in the typed map below
    docs.select(col("doc_id"), coalesce(col("text"), lit("")))
      .as[(Long, String)]
      .map { case (id, text) =>
        val toks = graft.core.Tokenizer.tokenize(text, bcLem.value).map(_.term)
        val kept = if (dropStopwords) toks.filterNot(stop) else toks
        (id, kept.mkString(" "), kept.length)
      }.toDF("doc_id", "text_norm", "n_tokens_kept")
  }

  /** Content fingerprint: md5 of the text bytes — identical content,
    * identical fingerprint, on any engine. (A round-3 form split and
    * re-joined the text first, which is the identity — runs of spaces
    * survive a split/concat_ws round trip — so the values are unchanged
    * and the no-op is gone.)
    */
  def fingerprintMd5(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), md5(col("text")).as("fingerprint"))

  /** Rolling polynomial fingerprint (Karp-Rabin style) over token hashes:
    * h = fold(acc * B + token_hash mod M) mod M — order-sensitive,
    * incremental, and cheap to compute distributed. Token hash is the
    * family's 60-bit column hash: under the Md5 family any engine with
    * md5 + list_reduce replicates the fingerprint exactly (the DuckDB
    * oracle does); xxhash64 is the cheaper production default.
    * acc < M ~ 2^30, so acc*B + h stays far below 2^63.
    */
  def rollingFingerprint(docs: DataFrame,
      family: graft.core.HashFamily = graft.core.HashFamily.default): DataFrame = {
    val M = 1000000007L
    val B = 31L
    docs.select(col("doc_id"),
      aggregate(split(col("text"), " "), lit(0L),
        (acc, t) => pmod(acc * B + pmod(family.h60Col(t), lit(M)), lit(M)))
        .as("fingerprint"))
  }

  /** PII-style pattern redaction — the scrub step of a training-data
    * pipeline. Three patterns, replaced in a fixed sequence (emails
    * first — an email's local part may itself contain a long digit run,
    * which must not be re-matched after the address is gone):
    * emails -> `<EMAIL>`, dotted-quad IPv4 -> `<IP>`, standalone runs of
    * 7+ digits -> `<NUM>`.
    *
    * Per-pattern counts are measured on the ORIGINAL text (so an email
    * whose local part has 7+ digits counts under both n_emails and
    * n_longnums — documented overlap, not a bug). Everything is
    * codegen'd `regexp_replace`/`regexp_extract_all` column expressions
    * — embarrassingly parallel, no shuffle, no UDF. The patterns use
    * only character classes, bounded repetition and `\b`, which behave
    * identically under Java regex (Spark) and RE2 (common oracle
    * engines).
    */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val LongNumRe = "\\d{7,}"

  def redact(docs: DataFrame): DataFrame = {
    val t = coalesce(col("text"), lit(""))
    docs.select(col("doc_id"),
      regexp_replace(
        regexp_replace(
          regexp_replace(t, EmailRe, "<EMAIL>"),
          Ipv4Re, "<IP>"),
        LongNumRe, "<NUM>").as("text_redacted"),
      size(regexp_extract_all(t, lit(EmailRe), lit(0)))
        .cast("long").as("n_emails"),
      size(regexp_extract_all(t, lit(Ipv4Re), lit(0)))
        .cast("long").as("n_ips"),
      size(regexp_extract_all(t, lit(LongNumRe), lit(0)))
        .cast("long").as("n_longnums"))
  }
}
