package graft.index

import java.nio.file.{Files, Paths, Path}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{ChunkCodec, Tokenizer}
import graft.corpus.Turn

/** Index build configuration.
  *
  * @param numParts       shuffle/range parallelism for the build
  * @param skewDfThreshold terms with df above this get salted (split by
  *                        doc_id range) in the SPIMI stage — the explicit
  *                        stopword-skew handling of the north rule
  * @param nSalts         number of doc-range salt buckets for skewed terms
  */
final case class IndexConf(
    numParts: Int = 32,
    skewDfThreshold: Long = 50000L,
    nSalts: Int = 16,
    k1: Double = Bm25.K1,
    b: Double = Bm25.B)

final case class IndexPaths(root: String) {
  def docs = s"$root/docs"
  def segments = s"$root/segments"
  def dictionary = s"$root/dictionary"
  def postings = s"$root/postings"
  def meta = s"$root/index_meta.json"
}

/** Distributed SPIMI -> shuffle-merge -> compressed-postings index build
  * (SURVEY.md §3.1 / §7.1; reference pipeline: src/indexer/indexer.rs:193-210
  * -> src/spimi.rs:28-121 -> src/indexer/index_merge_writer.rs:86-209).
  *
  * Spark-first shape — each reference control boundary becomes a shuffle:
  *
  *   transcripts --flatMap tokenize--> TermDoc rows            (producer)
  *     --repartition(term, salt) + sortWithinPartitions-->
  *   segments checkpoint (sorted runs + manifest = SPIMI spills)
  *     --re-sort + streaming per-term chunker (mapPartitions)-->
  *   postings chunks  --join dictionary--> final postings table
  *
  * Every stage writes a `_manifest.json` with input fingerprint, row/byte
  * counts and wall time; a re-run with the same fingerprint skips the
  * stage (resumability + lineage, BASELINE.json north_rule).
  */
class IndexBuilder(spark: SparkSession, lemmas: Map[String, String],
    conf: IndexConf = IndexConf()) {
  import spark.implicits._

  private val bcLemmas = spark.sparkContext.broadcast(lemmas)

  // ---------------------------------------------------------------- docs

  /** Assign dense 1-based doc_ids in stable (conv_id, turn_idx) order and
    * compute doc lengths. Returns (docs-with-text DF for tokenization).
    */
  def buildDocs(turns: Dataset[Turn]): DataFrame = {
    val lem = bcLemmas
    val withLen = turns.map { t =>
      val toks = Tokenizer.tokenize(t.text, lem.value)
      (t.conv_id, t.turn_idx, t.role, t.text, toks.length)
    }.toDF("conv_id", "turn_idx", "role", "text", "doc_len")
    RangeRank.withRank(withLen, Seq("conv_id", "turn_idx"), "doc_id", conf.numParts)
  }

  // ------------------------------------------------------------- stage 1

  /** Tokenize into per-(term, doc) postings. One turn is one document, so
    * per-doc position grouping happens inside the flatMap (the reference
    * groups per doc at src/indexer/indexer.rs:118-124) — zero shuffles.
    */
  def tokenizeDocs(docsWithText: DataFrame): Dataset[TermDoc] = {
    val lem = bcLemmas
    docsWithText.select($"doc_id", $"doc_len", $"text")
      .as[(Long, Int, String)]
      .flatMap { case (docId, dl, text) =>
        val toks = Tokenizer.tokenize(text, lem.value)
        // group positions per term, insertion order = ascending positions
        val byTerm = scala.collection.mutable.LinkedHashMap.empty[String, scala.collection.mutable.ArrayBuffer[Int]]
        toks.foreach(t => byTerm.getOrElseUpdate(t.term, scala.collection.mutable.ArrayBuffer.empty) += t.position)
        byTerm.iterator.map { case (term, ps) => TermDoc(term, docId, dl, ps.length, ps.toSeq) }
      }
  }

  /** SPIMI stage: salt high-df terms by doc_id RANGE (so per-salt chunks
    * concatenate in global doc order), shuffle on (term, salt), sort runs,
    * checkpoint as the `segments` table. The reference's 10 MB in-memory
    * spill (src/dictionary/mod.rs:31-33) is Catalyst's partial-agg spill;
    * the explicit checkpoint is what makes the build resumable.
    */
  def buildSegments(termDocs: Dataset[TermDoc], nDocs: Long,
      highDfTerms: Set[String]): Dataset[SegmentRow] = {
    val bcHigh = spark.sparkContext.broadcast(highDfTerms)
    val saltWidth = math.max(1L, (nDocs + conf.nSalts - 1) / conf.nSalts)
    val salted = termDocs.map { td =>
      val salt = if (bcHigh.value.contains(td.term)) (td.doc_id / saltWidth).toInt else 0
      SegmentRow(td.term, salt, td.doc_id, td.dl, td.tf, td.positions)
    }
    salted
      .repartition(conf.numParts, $"term", $"salt")
      .sortWithinPartitions($"term", $"salt", $"doc_id")
  }

  // ------------------------------------------------------------- stage 2

  /** Shuffle-merge + chunking: stream doc_id-sorted postings of each
    * (term, salt) group through a 128-posting chunker (reference k-way
    * merge src/spimi.rs:50-121 + chunk cut index_merge_writer.rs:148).
    * Works partition-locally after a (term, salt) shuffle; memory is
    * bounded by one chunk, not one term (stopword-safe).
    * chunk_seq = salt * 2^32 + localSeq keeps chunks globally doc-ordered
    * because salts partition the doc_id space into ranges.
    */
  def buildRawChunks(segments: Dataset[SegmentRow], avgdl: Double): Dataset[RawChunk] = {
    val k1 = conf.k1; val b = conf.b
    segments
      .repartition(conf.numParts, $"term", $"salt")
      .sortWithinPartitions($"term", $"salt", $"doc_id")
      .mapPartitions { it =>
        new Iterator[RawChunk] {
          private var cur: SegmentRow = _
          private var curTerm: String = null
          private var curSalt: Int = -1
          private var localSeq: Long = 0L
          private val ids = new scala.collection.mutable.ArrayBuffer[Long](ChunkCodec.ChunkSize)
          private val tfs = new scala.collection.mutable.ArrayBuffer[Int](ChunkCodec.ChunkSize)
          private val dls = new scala.collection.mutable.ArrayBuffer[Int](ChunkCodec.ChunkSize)
          private val poss = new scala.collection.mutable.ArrayBuffer[Array[Int]](ChunkCodec.ChunkSize)
          private var pending: RawChunk = null

          private def emit(): RawChunk = {
            val docIds = ids.toArray
            val positions = poss.toArray
            var maxNorm = 0.0
            var i = 0
            while (i < tfs.length) {
              val v = Bm25.norm(tfs(i), dls(i), avgdl, k1, b)
              if (v > maxNorm) maxNorm = v
              i += 1
            }
            val chunk = RawChunk(
              term = curTerm,
              chunk_seq = (curSalt.toLong << 32) | localSeq,
              min_doc_id = docIds(0),
              max_doc_id = docIds(docIds.length - 1),
              n_postings = docIds.length,
              doc_gaps = ChunkCodec.encodeDocGaps(docIds),
              tfs = tfs.toSeq,
              dls = dls.toSeq,
              pos_blob = ChunkCodec.encodePositions(positions),
              max_tf = tfs.max,
              max_norm = maxNorm)
            localSeq += 1L
            ids.clear(); tfs.clear(); dls.clear(); poss.clear()
            chunk
          }

          private def advance(): Unit = {
            while (pending == null && it.hasNext) {
              val r = it.next()
              if (r.term != curTerm || r.salt != curSalt) {
                if (ids.nonEmpty) pending = emit()
                curTerm = r.term; curSalt = r.salt; localSeq = 0L
              }
              ids += r.doc_id; tfs += r.tf; dls += r.dl
              poss += r.positions.toArray
              if (ids.length == ChunkCodec.ChunkSize) pending = emit()
            }
            if (pending == null && !it.hasNext && ids.nonEmpty) pending = emit()
          }

          def hasNext: Boolean = { if (pending == null) advance(); pending != null }
          def next(): RawChunk = {
            if (pending == null) advance()
            val out = pending; pending = null; out
          }
        }
      }
  }

  /** Dictionary: df/cf aggregation (map-side partials tame skew for a
    * count agg) + dense term_id in byte-order term sort via RangeRank.
    * idf + per-term global max_impact land here too.
    */
  def buildDictionary(rawChunks: Dataset[RawChunk], nDocs: Long): Dataset[DictRow] = {
    val stats = rawChunks
      .map(c => (c.term, c.n_postings.toLong, c.tfs.map(_.toLong).sum, c.max_norm))
      .toDF("term", "df_part", "cf_part", "norm_part")
      .groupBy($"term")
      .agg(sum($"df_part").as("df"), sum($"cf_part").as("cf"),
        max($"norm_part").as("max_norm"))
    val ranked = RangeRank.withRank(stats, Seq("term"), "term_id", conf.numParts)
    val n = nDocs
    ranked.select($"term", $"term_id", $"df", $"cf", $"max_norm")
      .as[(String, Long, Long, Long, Double)]
      .map { case (term, termId, df, cf, maxNorm) =>
        val idf = Bm25.idf(n, df)
        DictRow(term, termId, df, cf, idf, idf * maxNorm)
      }
  }

  // ------------------------------------------------------------ manifests

  private def writeManifest(dir: String, fingerprint: String, rows: Long,
      wallMs: Long, extra: Map[String, String] = Map.empty): Unit = {
    val p = Paths.get(dir)
    Files.createDirectories(p)
    val files = Files.walk(p).iterator().asScala
      .filter(f => f.toString.endsWith(".parquet") && Files.isRegularFile(f)).toSeq
    val bytes = files.map(Files.size).sum
    val extraJson = extra.map { case (k, v) => s""","$k":"$v"""" }.mkString
    val json =
      s"""{"status":"complete","fingerprint":"$fingerprint","rows":$rows,
         |"bytes":$bytes,"n_files":${files.size},"wall_ms":$wallMs,
         |"files":[${files.map(f => s"""{"name":"${f.getFileName}","bytes":${Files.size(f)}}""").mkString(",")}]$extraJson}""".stripMargin.replace("\n", "")
    Files.writeString(p.resolve("_manifest.json"), json)
  }

  private def manifestComplete(dir: String, fingerprint: String): Boolean = {
    val f = Paths.get(dir, "_manifest.json")
    Files.exists(f) && {
      val s = Files.readString(f)
      s.contains("\"status\":\"complete\"") && s.contains(s""""fingerprint":"$fingerprint"""")
    }
  }

  // ----------------------------------------------------------- full build

  /** End-to-end build with per-stage resumable checkpoints. Returns meta. */
  def build(turns: Dataset[Turn], root: String): IndexMeta = {
    val paths = IndexPaths(root)
    Files.createDirectories(Paths.get(root))
    val fp = s"v1-np${conf.numParts}-salt${conf.nSalts}-thr${conf.skewDfThreshold}"

    // Stage 0: docs (doc_id assignment + doc lengths)
    if (!manifestComplete(paths.docs, fp)) {
      val t0 = System.nanoTime()
      val docsWithText = buildDocs(turns)
      docsWithText.write.mode("overwrite").parquet(paths.docs)
      val rows = spark.read.parquet(paths.docs).count()
      writeManifest(paths.docs, fp, rows, (System.nanoTime() - t0) / 1000000)
    }
    val docsWithText = spark.read.parquet(paths.docs)
    val agg = docsWithText.agg(count(lit(1)), avg($"doc_len"), sum($"doc_len")).head()
    val nDocs = agg.getLong(0)
    val avgdl = agg.getDouble(1)

    // Stage 1: SPIMI segments (sorted runs, salted for skew)
    if (!manifestComplete(paths.segments, fp)) {
      val t0 = System.nanoTime()
      val termDocs = tokenizeDocs(docsWithText)
      // exact df (partial aggregation collapses skew before the shuffle)
      val highDf = termDocs.groupBy($"term").count()
        .filter($"count" > conf.skewDfThreshold)
        .select($"term").as[String].collect().toSet
      buildSegments(termDocs, nDocs, highDf)
        .write.mode("overwrite").parquet(paths.segments)
      val rows = spark.read.parquet(paths.segments).count()
      writeManifest(paths.segments, fp, rows, (System.nanoTime() - t0) / 1000000,
        Map("salted_terms" -> highDf.size.toString))
    }
    val segments = spark.read.parquet(paths.segments).as[SegmentRow]

    // Stage 2: merge + chunk + dictionary + final postings
    if (!manifestComplete(paths.dictionary, fp) || !manifestComplete(paths.postings, fp)) {
      val t0 = System.nanoTime()
      val rawChunks = buildRawChunks(segments, avgdl)
      rawChunks.cache()
      val dict = buildDictionary(rawChunks, nDocs)
      dict.write.mode("overwrite").parquet(paths.dictionary)
      val dictDf = spark.read.parquet(paths.dictionary)
      val postings = rawChunks.toDF()
        .join(dictDf.select($"term", $"term_id", $"idf"), Seq("term"))
        .withColumn("max_impact", col("idf") * col("max_norm"))
        .select($"term_id", $"chunk_seq", $"min_doc_id", $"max_doc_id",
          $"n_postings", $"doc_gaps", $"tfs", $"dls", $"pos_blob", $"max_tf",
          $"max_impact")
      postings
        .repartitionByRange(conf.numParts, $"term_id", $"chunk_seq")
        .sortWithinPartitions($"term_id", $"chunk_seq")
        .write.mode("overwrite").parquet(paths.postings)
      rawChunks.unpersist()
      val dictRows = dictDf.count()
      val postRows = spark.read.parquet(paths.postings).count()
      writeManifest(paths.dictionary, fp, dictRows, (System.nanoTime() - t0) / 1000000)
      writeManifest(paths.postings, fp, postRows, (System.nanoTime() - t0) / 1000000)
    }

    val nTerms = spark.read.parquet(paths.dictionary).count()
    val nPostings = spark.read.parquet(paths.postings)
      .agg(sum($"n_postings")).head().getLong(0)
    val meta = IndexMeta(nDocs, avgdl, nTerms, nPostings, conf.k1, conf.b)
    Files.writeString(Paths.get(paths.meta),
      s"""{"n_docs":$nDocs,"avgdl":$avgdl,"n_terms":$nTerms,""" +
      s""""n_postings":$nPostings,"k1":${conf.k1},"b":${conf.b},"fingerprint":"$fp"}""")
    meta
  }
}

object IndexBuilder {
  def readMeta(root: String): IndexMeta = {
    val s = Files.readString(Paths.get(IndexPaths(root).meta))
    def num(k: String): String =
      s.split(s""""$k":""")(1).takeWhile(c => c != ',' && c != '}')
    IndexMeta(num("n_docs").toLong, num("avgdl").toDouble,
      num("n_terms").toLong, num("n_postings").toLong,
      num("k1").toDouble, num("b").toDouble)
  }
}
