package graft
import graft.corpus.Transcripts
import graft.index.{IndexBuilder, IndexConf}
object BuildProbe {
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
    val docs = s.read.parquet("/dev/shm/graft/buildonly_c32/docs")
    val b = new IndexBuilder(s, Transcripts.lemmas, IndexConf(numParts = c, skewDfThreshold = 20000L, nSalts = 8))
    def time(tag: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"PROBE $tag c=$c sec=${(System.nanoTime()-t0)/1e9}%.2f")
    }
    time("tokenize_count") { b.tokenizeDocs(docs).filter(_.tf >= 0).count() }
    time("tokenize_count2") { b.tokenizeDocs(docs).filter(_.tf >= 0).count() }
    time("segments_write") {
      b.buildSegments(docs, 1052746L, Set("the","a","of","to"))
        .write.mode("overwrite").parquet("/dev/shm/graft/probe_segs")
    }
    s.stop()
  }
}
