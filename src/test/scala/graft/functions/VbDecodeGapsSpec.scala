package graft.functions

import graft.SparkSpecBase
import graft.core.Gaps
import org.apache.spark.sql.functions._

class VbDecodeGapsSpec extends SparkSpecBase {

  test("expression decodes blobs inside a relational plan (codegen path)") {
    GraftFunctions.register(spark)
    val spark0 = spark
    import spark0.implicits._
    val rows = Seq(
      (1L, Gaps.encode(Array(3L, 9L, 10L)), 3),
      (2L, Gaps.encode(Array(0L, 16384L, 16384L + 16384L)), 3),
      (3L, Gaps.encode(Array.empty[Long]), 0))
      .toDF("id", "blob", "n")
    val out = rows.select($"id",
        GraftFunctions.vb_decode_gaps($"blob", $"n").as("ids"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(out(1L) == Seq(3L, 9L, 10L))
    assert(out(2L) == Seq(0L, 16384L, 32768L))
    assert(out(3L) == Seq.empty)
  }

  test("usable from SQL after registration") {
    GraftFunctions.register(spark)
    val spark0 = spark
    import spark0.implicits._
    Seq((Gaps.encode(Array(5L, 7L)), 2)).toDF("blob", "n")
      .createOrReplaceTempView("blobs")
    val got = spark.sql("SELECT vb_decode_gaps(blob, n) AS ids FROM blobs")
      .head().getSeq[Long](0)
    assert(got == Seq(5L, 7L))
  }

  test("type check rejects wrong argument types") {
    GraftFunctions.register(spark)
    val spark0 = spark
    import spark0.implicits._
    val err = intercept[org.apache.spark.sql.AnalysisException] {
      Seq((1, 2)).toDF("a", "b")
        .select(GraftFunctions.vb_decode_gaps($"a", $"b")).collect()
    }
    assert(err.getMessage.contains("vb_decode_gaps"))
  }

  test("SparkSessionExtensions injection registers the function") {
    // a separate session in the same JVM, with the extension class
    val s2 = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-test")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.driver.host", "localhost")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      val got = s2.sql(
        s"SELECT vb_decode_gaps(X'${Gaps.encode(Array(42L)).map("%02x".format(_)).mkString}', 1) AS ids")
        .head().getSeq[Long](0)
      assert(got == Seq(42L))
    } finally {
      // do not stop: same-JVM shared context; just drop the session state
    }
  }
}
