package graft.core

import graft.SparkSpecBase

class HashFamilySpec extends SparkSpecBase {

  test("Md5 family kernel reproduces StableHash h60 over prefixed strings") {
    val kernel = HashFamily.Md5.signatureKernel(4)
    Seq("a b c", "héllo wörld", "").foreach { s =>
      val got = kernel(s)
      (0 until 4).foreach { i =>
        assert(got(i) == StableHash.h60(s"$i:$s"), s"h_$i('$s')")
      }
    }
  }

  test("Xx64 JVM u64/h60 agree with Spark's xxhash64 column (seed 42)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val vals = Seq("a b c", "héllo wörld", "x", "0:shingle one")
    val rows = vals.toDF("s")
      .select(col("s"), xxhash64(col("s")).as("hx"),
        HashFamily.Xx64.h60Col(col("s")).as("h60"))
      .collect()
    rows.foreach { r =>
      val s = r.getString(0)
      assert(r.getLong(1) == HashFamily.Xx64.u64(s), s"u64('$s')")
      assert(r.getLong(2) == (HashFamily.Xx64.u64(s) >>> 4), s"h60Col('$s')")
    }
  }

  test("Xx64 kernel values equal the codegen'd h60iCol column form") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val vals = Seq("a b c", "héllo wörld", "x", "0:shingle one")
    val kernel = HashFamily.Xx64.signatureKernel(4)
    val rows = vals.toDF("s")
      .select(col("s") +: (0 until 4).map(i =>
        HashFamily.Xx64.h60iCol(i, col("s")).get.as(s"h$i")): _*)
      .collect()
    rows.foreach { r =>
      val want = kernel(r.getString(0))
      (0 until 4).foreach { i =>
        assert(r.getLong(i + 1) == want(i), s"h_$i('${r.getString(0)}')")
      }
    }
  }

  test("both families: non-negative 60-bit signature values") {
    Seq(HashFamily.Md5, HashFamily.Xx64).foreach { fam =>
      val kernel = fam.signatureKernel(8)
      (0 until 50).foreach { i =>
        kernel(s"probe-$i").foreach { v =>
          assert(v >= 0L && v < (1L << 60), s"${fam.name} out of range")
        }
      }
    }
  }

  test("MinHash LSH finds the same planted dup pairs under both families") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import graft.ops.Dedup
    val docs = (1L to 80L).map { i =>
      (i, (0 until 30).map(j => graft.corpus.Transcripts.mix(i * 31 + j) % 50)
        .map(w => s"w$w").mkString(" "))
    }.toDF("doc_id", "text")
    val planted = docs.filter(col("doc_id") <= 10)
      .select((col("doc_id") + 1000L).as("doc_id"), col("text"))
    val all = docs.union(planted)
    val expected = (1L to 10L).map(i => (i, i + 1000L)).toSet
    Seq(HashFamily.Md5, HashFamily.Xx64).foreach { fam =>
      val sigs = Dedup.minHashSignatures(all, k = 3, nHashes = 32, family = fam)
      val pairs = Dedup.minHashCandidates(sigs, bands = 8, rowsPerBand = 4,
          minEstJaccard = 0.99, family = fam)
        .select("doc_a", "doc_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(expected.subsetOf(pairs),
        s"${fam.name}: missing planted dups ${expected -- pairs}")
    }
  }
}
