package graft
import graft.corpus.Transcripts
import graft.index._
object Stage2Probe {
  def main(args: Array[String]): Unit = {
    val c = args(0).toInt
    val s = org.apache.spark.sql.SparkSession.builder().master(s"local[$c]")
      .config("spark.sql.shuffle.partitions", (c * 2).toString)
      .config("spark.sql.files.maxPartitionBytes", (1024*1024).toString)
      .config("spark.sql.files.openCostInBytes", (64*1024).toString)
      .config("spark.local.dir", "/dev/shm/graft/spark-local")
      .config("spark.ui.enabled", "false").config("spark.driver.host", "localhost")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    import s.implicits._
    import org.apache.spark.sql.functions._
    def time(tag: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"S2 $tag sec=${(System.nanoTime()-t0)/1e9}%.2f")
    }
    val b = new IndexBuilder(s, Transcripts.lemmas, IndexConf(numParts = math.max(c,8), skewDfThreshold = 20000L, nSalts = 8))
    val root = "/dev/shm/graft/buildonly_c8"
    val paths = IndexPaths(root)
    var nDocs = 0L; var avgdl = 0.0
    time("meta_agg") {
      val agg = s.read.parquet(paths.docs).agg(count(lit(1)), avg($"doc_len")).head()
      nDocs = agg.getLong(0); avgdl = agg.getDouble(1)
    }
    var raw: org.apache.spark.sql.Dataset[RawChunk] = null
    time("chunk_materialize") {
      raw = b.chunkSorted(s.read.parquet(paths.segments).as[SegmentRow], avgdl)
      raw.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      raw.count()
    }
    var dict: org.apache.spark.sql.Dataset[DictRow] = null
    time("dictionary_build_write") {
      dict = b.buildDictionary(raw, nDocs)
      dict.write.mode("overwrite").parquet("/dev/shm/graft/probe_dict")
    }
    time("postings_join_sort_write") {
      val dictDf = s.read.parquet("/dev/shm/graft/probe_dict")
      raw.toDF().join(dictDf.select($"term", $"term_id", $"idf"), Seq("term"))
        .withColumn("max_impact", col("idf") * col("max_norm"))
        .select($"term_id", $"chunk_seq", $"min_doc_id", $"max_doc_id",
          $"n_postings", $"doc_gaps", $"tfs", $"dls", $"pos_blob", $"max_tf", $"max_impact")
        .repartitionByRange(math.max(c,8), $"term_id", $"chunk_seq")
        .sortWithinPartitions($"term_id", $"chunk_seq")
        .write.mode("overwrite").parquet("/dev/shm/graft/probe_postings")
    }
    time("manifest_count_postings") { s.read.parquet("/dev/shm/graft/probe_postings").count() }
    time("manifest_count_dict") { s.read.parquet("/dev/shm/graft/probe_dict").count() }
    time("npostings_agg") { s.read.parquet("/dev/shm/graft/probe_postings").agg(sum($"n_postings")).head() }
    s.stop()
  }
}
