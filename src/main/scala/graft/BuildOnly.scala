package graft
import graft.corpus.Transcripts
import graft.index.{IndexBuilder, IndexConf}
object BuildOnly {
  def main(args: Array[String]): Unit = {
    val c = args(0).toInt
    val dir = s"/dev/shm/graft/buildonly_c$c"
    val f = new java.io.File(dir)
    if (f.exists()) java.nio.file.Files.walk(f.toPath)
      .sorted(java.util.Comparator.reverseOrder()).forEach(p => java.nio.file.Files.delete(p))
    val s = org.apache.spark.sql.SparkSession.builder().master(s"local[$c]")
      .config("spark.sql.shuffle.partitions", (c * 2).toString)
      .config("spark.sql.files.maxPartitionBytes", (1024*1024).toString)
      .config("spark.sql.files.openCostInBytes", (64*1024).toString)
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", (2*1024*1024).toString)
      .config("spark.local.dir", "/dev/shm/graft/spark-local").config("spark.ui.enabled", "false").config("spark.driver.host", "localhost")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val turns = s.read.parquet(sys.env.getOrElse("GRAFT_TURNS", "/dev/shm/graft/bench_turns_20000")).as(
      org.apache.spark.sql.Encoders.product[graft.corpus.Turn])
    val t0 = System.nanoTime()
    val meta = new IndexBuilder(s, Transcripts.lemmas,
      IndexConf(numParts = c, skewDfThreshold = 20000L, nSalts = 8)).build(turns, dir)
    println(s"BUILDONLY c=$c sec=${(System.nanoTime()-t0)/1e9} turns=${meta.n_docs}")
    s.stop()
  }
}
