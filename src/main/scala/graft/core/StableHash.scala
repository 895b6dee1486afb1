package graft.core

import java.nio.charset.StandardCharsets

/** Engine-portable deterministic hashes, all derived from md5 so ANY
  * engine with an md5 function (DuckDB, Trino, Spark itself) reproduces
  * them bit-for-bit — the property that lets the driver's DuckDB oracle
  * verify MinHash/SimHash/rolling-fingerprint pipelines exactly, instead
  * of settling for rows-only checks.
  *
  * Conventions (shared with the oracle SQL in GraftQueries):
  *  - h60(s)  = first 15 hex chars of md5(s) parsed base-16 — a
  *    non-negative 60-bit value that fits a signed int64 in every engine
  *    (`('0x' || substring(md5(s),1,15))::BIGINT` in DuckDB,
  *    `conv(substring(md5(s),1,15),16,10)` in Spark SQL).
  *  - u64(s)  = first 16 hex chars as a full 64-bit pattern (sign-agnostic
  *    bit source for SimHash; DuckDB reads it as UBIGINT).
  */
object StableHash {

  def md5Hex(s: String): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val d = md.digest(s.getBytes(StandardCharsets.UTF_8))
    val sb = new java.lang.StringBuilder(32)
    var i = 0
    while (i < d.length) {
      sb.append(Character.forDigit((d(i) >> 4) & 0xf, 16))
      sb.append(Character.forDigit(d(i) & 0xf, 16))
      i += 1
    }
    sb.toString
  }

  /** Non-negative 60-bit md5 prefix. */
  def h60(s: String): Long =
    java.lang.Long.parseLong(md5Hex(s).substring(0, 15), 16)

  /** h60 straight from digest bytes (no hex round-trip): the first 15 hex
    * chars are bytes 0..6 plus the high nibble of byte 7. Equals
    * h60(s) for digest = md5(s) — asserted in StableHashSpec.
    */
  def h60FromDigest(d: Array[Byte]): Long = {
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    (v << 4) | ((d(7) & 0xffL) >>> 4)
  }

  /** Full 64-bit md5 prefix (bit pattern; may be negative as a long). */
  def u64(s: String): Long =
    java.lang.Long.parseUnsignedLong(md5Hex(s).substring(0, 16), 16)

  import org.apache.spark.sql.Column
  import org.apache.spark.sql.functions._

  /** Column form of h60 — codegen'd md5 + conv, no UDF. */
  def h60Col(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")
}
