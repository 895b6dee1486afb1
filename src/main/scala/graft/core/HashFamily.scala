package graft.core

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Hash family behind the sketch operators (MinHash signatures, LSH band
  * buckets, SimHash bit source, rolling fingerprints). Two members:
  *
  *  - [[HashFamily.Md5]] — engine-portable ([[StableHash]] conventions):
  *    any engine with an md5 function (the driver's DuckDB oracle)
  *    reproduces every signature bit-for-bit. CPU-heavy (~2 cycles/byte
  *    plus digest setup per hash).
  *  - [[HashFamily.Xx64]] — Spark's xxhash64 (XXH64, the codegen'd
  *    column function's algorithm), several times cheaper; the
  *    PRODUCTION default. Signatures are not reproducible from SQL
  *    engines without xxhash64, so verification against the DuckDB
  *    oracle pins Md5 instead (graft.Verify sets the default).
  *
  * The banding / bucket-cap / candidate-join machinery is agnostic to
  * the family; only signature VALUES differ. Recall/precision behavior
  * of both families is covered by OpsSpec's planted-duplicate tests.
  */
sealed trait HashFamily {
  def name: String

  /** Per-partition MinHash kernel: maps a shingle to its n family
    * hashes (non-negative 60-bit each, so min() semantics agree across
    * engines). Called once per partition — closures may carry reusable
    * scratch state (e.g. a MessageDigest).
    */
  def signatureKernel(n: Int): String => Array[Long]

  /** 64-bit bit-pattern hash of a term (SimHash bit source). */
  def u64(s: String): Long

  /** Non-negative 60-bit hash as a codegen'd Column expression
    * (rolling-fingerprint term hashes).
    */
  def h60Col(c: Column): Column

  /** LSH band-bucket hash of a string column (string-typed for a
    * uniform bucket schema across families).
    */
  def bucketCol(c: Column): Column

  /** Fully-codegen'd column form of the i-th signature hash, when the
    * family has one that's FASTER than the typed kernel (keeps MinHash
    * inside whole-stage codegen: scan -> explode -> hash -> partial-min
    * with no serialization boundary). None for md5, whose 32 expression
    * trees measured ~6x slower than the reused-MessageDigest kernel.
    */
  def h60iCol(i: Int, c: Column): Option[Column] = None
}

object HashFamily {

  /** md5 / StableHash conventions — see [[StableHash]]. */
  case object Md5 extends HashFamily {
    val name = "md5"

    def signatureKernel(n: Int): String => Array[Long] = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val prefixes = Array.tabulate(n)(i =>
        s"$i:".getBytes(StandardCharsets.UTF_8))
      s => {
        val bytes = s.getBytes(StandardCharsets.UTF_8)
        val arr = new Array[Long](n)
        var i = 0
        while (i < n) {
          md.reset()
          md.update(prefixes(i))
          md.update(bytes)
          arr(i) = StableHash.h60FromDigest(md.digest())
          i += 1
        }
        arr
      }
    }

    def u64(s: String): Long = StableHash.u64(s)
    def h60Col(c: Column): Column = StableHash.h60Col(c)
    def bucketCol(c: Column): Column = md5(c)
  }

  /** XXH64 with Spark's conventions: column forms are the built-in
    * xxhash64 (seed 42); the i-th MinHash uses seed = i over the raw
    * shingle bytes (no prefix concatenation needed — the seed IS the
    * family index).
    */
  case object Xx64 extends HashFamily {
    val name = "xxhash64"

    import org.apache.spark.sql.catalyst.expressions.XXH64
    import org.apache.spark.unsafe.Platform

    /** Same values as the column form xxhash64(lit(i), c): Spark's
      * multi-arg xxhash64 chains acc = 42 -> hashInt(i, acc) ->
      * hashBytes(utf8(c), acc). Parity asserted in HashFamilySpec.
      */
    def signatureKernel(n: Int): String => Array[Long] = {
      // per-partition scratch, as the trait contract invites: the n
      // per-index seeds are shingle-independent (Md5's kernel hoists
      // its prefixes the same way)
      val seeds = Array.tabulate(n)(i => XXH64.hashInt(i, 42L))
      s => {
        val bytes = s.getBytes(StandardCharsets.UTF_8)
        val arr = new Array[Long](n)
        var i = 0
        while (i < n) {
          arr(i) = XXH64.hashUnsafeBytes(
            bytes, Platform.BYTE_ARRAY_OFFSET, bytes.length, seeds(i)) >>> 4
          i += 1
        }
        arr
      }
    }

    def u64(s: String): Long = {
      val bytes = s.getBytes(StandardCharsets.UTF_8)
      XXH64.hashUnsafeBytes(bytes, Platform.BYTE_ARRAY_OFFSET, bytes.length, 42L)
    }

    /** Matches shiftrightunsigned(xxhash64(c), 4): xxhash64 on a string
      * column hashes its UTF-8 bytes with seed 42 — JVM/column parity is
      * asserted in StableHashSpec.
      */
    def h60Col(c: Column): Column = shiftrightunsigned(xxhash64(c), 4)

    def bucketCol(c: Column): Column = xxhash64(c).cast("string")

    override def h60iCol(i: Int, c: Column): Option[Column] =
      Some(shiftrightunsigned(xxhash64(lit(i), c), 4))
  }

  /** Process-wide default: Xx64 in production and benchmarks;
    * graft.Verify pins Md5 so the driver's DuckDB correctness rows
    * check the oracle-exact family end-to-end.
    */
  @volatile var default: HashFamily = Xx64
}
