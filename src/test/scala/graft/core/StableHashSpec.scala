package graft.core

import org.scalatest.funsuite.AnyFunSuite

class StableHashSpec extends AnyFunSuite {

  test("h60/u64 match independently computed values (DuckDB parity anchors)") {
    // anchors computed in DuckDB:
    //   ('0x'||substring(md5('hello'),1,15))::BIGINT  = 419982666956583591
    //   ('0x'||substring(md5('hello'),1,16))::UBIGINT = 6719722671305337462
    assert(StableHash.h60("hello") == 419982666956583591L)
    assert(StableHash.u64("hello") == 6719722671305337462L)
  }

  test("h60FromDigest equals the hex-parse path for arbitrary strings") {
    val md = java.security.MessageDigest.getInstance("MD5")
    Seq("", "a", "0:abc def", "31:x", "héllo wörld", "ᵉC plane").foreach { s =>
      md.reset()
      val d = md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      assert(StableHash.h60FromDigest(d) == StableHash.h60(s), s"mismatch for '$s'")
    }
  }

  test("h60 is non-negative and within 60 bits") {
    (0 until 200).foreach { i =>
      val v = StableHash.h60(s"probe-$i")
      assert(v >= 0L && v < (1L << 60))
    }
  }
}
