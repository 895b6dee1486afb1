package graft
import graft.corpus.Transcripts
import graft.index.{IndexBuilder, IndexConf}
object BigSoak {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "128")
      .config("spark.local.dir", "/dev/shm/graft/spark-local")
      .config("spark.driver.host", "localhost")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val root = "/dev/shm/graft/bigsoak"
    val f = new java.io.File(root)
    if (f.exists()) java.nio.file.Files.walk(f.toPath)
      .sorted(java.util.Comparator.reverseOrder()).forEach(p => java.nio.file.Files.delete(p))
    val turns = Transcripts.generate(spark, 400000L, partitions = 512)
    val t0 = System.nanoTime()
    val meta = new IndexBuilder(spark, Transcripts.lemmas,
      IndexConf(numParts = 128, skewDfThreshold = 100000L, nSalts = 32))
      .build(turns, root)
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"BIGSOAK turns=${meta.n_docs} sec=$sec%.1f tps=${meta.n_docs / sec}%.0f postings=${meta.n_postings}")
    val eng = new graft.query.QueryEngine(spark, root, Transcripts.lemmas)
    val t1 = System.nanoTime()
    val top = eng.bm25TopK("the kelba fraba", 10).collect()
    println(f"BIGSOAK query_sec=${(System.nanoTime() - t1) / 1e9}%.2f top1=${top.head}")
    spark.stop()
  }
}
