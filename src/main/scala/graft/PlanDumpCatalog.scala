package graft

import org.apache.spark.sql.SparkSession

/** Dev-only: write `explain("formatted")` of named benchQueries catalog
  * entries to <outDir>/<name>_<suffix>.txt — the round's plan-evidence
  * deliverable (plans/r06, before and after suffixes). Runs in the same
  * session shape as Bench so routing knobs see the same statistics.
  *
  * Usage: sbt -batch "runMain graft.PlanDumpCatalog <outDir> <suffix> q18 q25 ..."
  */
object PlanDumpCatalog {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = args(1)
    val prefixes = args.drop(2).toSeq
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get("/dev/shm/graft/spark-local"))
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-plandump-catalog")
      .config("spark.sql.shuffle.partitions", (cpus * 2).toString)
      .config("spark.sql.files.maxPartitionBytes", (1024 * 1024).toString)
      .config("spark.sql.files.openCostInBytes", (64 * 1024).toString)
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes",
        (2 * 1024 * 1024).toString)
      .config("spark.local.dir", "/dev/shm/graft/spark-local")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "localhost")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftQueries.benchQueries.toSeq.sortBy(_._1)
      .filter { case (n, _) => prefixes.exists(n.startsWith) }
      .foreach { case (name, fn) =>
        try {
          val df = fn(spark, sfDir)
          val txt = df.queryExecution.explainString(
            org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
          java.nio.file.Files.writeString(
            java.nio.file.Paths.get(s"$outDir/${name}_$suffix.txt"), txt)
          println(s"PLAN $name -> $outDir/${name}_$suffix.txt (${txt.length} chars)")
        } catch { case t: Throwable =>
          println(s"PLAN $name FAILED: $t")
        }
      }
    spark.stop()
  }
}
