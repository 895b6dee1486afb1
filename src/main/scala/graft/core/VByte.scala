package graft.core

import java.io.ByteArrayOutputStream

/** Variable-byte integer codec, Manning-IR convention: 7 value bits per
  * byte, big-endian byte groups, +128 marks the LAST byte of a value.
  * Behavior-compatible with the reference codec
  * (reference: src/compressors/vb_encode.rs:1-31), extended from u32 to
  * non-negative Long for 10^12-turn doc_id headroom (SURVEY.md §1).
  *
  * Exact reference vectors preserved: 0 -> [128], 1097 -> [8, 201],
  * 16384 -> [1, 0, 128].
  */
object VByte {

  /** Append the encoding of `n` (must be >= 0) to `out`. */
  def encodeTo(n: Long, out: ByteArrayOutputStream): Unit = {
    require(n >= 0, s"VByte requires non-negative input, got $n")
    // At most 10 groups of 7 bits for a non-negative Long (63 bits).
    val buf = new Array[Byte](10)
    var i = 9
    var v = n
    // Last (least-significant) group gets the +128 continuation-stop mark.
    buf(i) = ((v % 128) + 128).toByte
    v /= 128
    while (v > 0) {
      i -= 1
      buf(i) = (v % 128).toByte
      v /= 128
    }
    out.write(buf, i, 10 - i)
  }

  def encode(n: Long): Array[Byte] = {
    val out = new ByteArrayOutputStream(10)
    encodeTo(n, out)
    out.toByteArray
  }

  /** Decode one value starting at `offset`; returns (value, bytesRead). */
  def decode(bytes: Array[Byte], offset: Int): (Long, Int) = {
    var number = 0L
    var i = offset
    var done = false
    while (!done && i < bytes.length) {
      val b = bytes(i) & 0xff
      i += 1
      if (b < 128) number = number * 128 + b
      else { number = number * 128 + (b - 128); done = true }
    }
    // a blob ending without a stop byte is CORRUPTION, not a value —
    // silently returning the partial accumulator would convert a
    // truncated write into a plausible wrong integer (Reader.next()
    // already throws on the same condition)
    if (!done) throw new IllegalArgumentException(
      s"truncated VByte value at offset $offset (blob length ${bytes.length})")
    (number, i - offset)
  }

  /** Streaming decoder cursor over a blob of concatenated VByte values. */
  final class Reader(bytes: Array[Byte]) {
    private var pos = 0
    def hasNext: Boolean = pos < bytes.length
    def next(): Long = {
      var number = 0L
      var done = false
      while (!done) {
        val b = bytes(pos) & 0xff
        pos += 1
        if (b < 128) number = number * 128 + b
        else { number = number * 128 + (b - 128); done = true }
      }
      number
    }
    def nextInt(): Int = next().toInt
  }
}

/** Delta-gap + VByte codec for sorted non-negative sequences.
  *
  * Layout: vb(first absolute value), then vb(v(i) - v(i-1)) for i >= 1.
  * The element COUNT is stored externally (an explicit column), never as
  * an in-band 0x00 sentinel: the reference's 0x00 delimiter is ambiguous
  * for gaps >= 16384 whose VByte encoding legally contains a 0x00 byte
  * (reference: src/indexer/helper.rs:6-44 + src/indexer/chunk.rs:46-53;
  * latent bug noted in SURVEY.md §2.7/F5). Explicit counts are
  * behavior-compatible on all decodable inputs and never ambiguous.
  */
object Gaps {

  def encodeTo(sorted: Array[Long], out: ByteArrayOutputStream): Unit = {
    var prev = 0L
    var i = 0
    while (i < sorted.length) {
      val v = sorted(i)
      if (i == 0) VByte.encodeTo(v, out)
      else {
        require(v >= prev, s"Gaps.encode requires sorted input: $prev > $v")
        VByte.encodeTo(v - prev, out)
      }
      prev = v
      i += 1
    }
  }

  def encode(sorted: Array[Long]): Array[Byte] = {
    val out = new ByteArrayOutputStream(sorted.length * 2 + 8)
    encodeTo(sorted, out)
    out.toByteArray
  }

  def decode(bytes: Array[Byte], n: Int): Array[Long] = {
    // clear per-row errors for the SQL-facing vb_decode_gaps expression:
    // a negative n would throw NegativeArraySizeException and an
    // over-long n a raw AIOOBE from inside whole-stage codegen
    if (n < 0) throw new IllegalArgumentException(
      s"vb_decode_gaps: negative count $n")
    val out = new Array[Long](n)
    val r = new VByte.Reader(bytes)
    var prev = 0L
    var i = 0
    while (i < n) {
      if (!r.hasNext) throw new IllegalArgumentException(
        s"vb_decode_gaps: blob exhausted after $i of $n values " +
          s"(${bytes.length} bytes) — truncated row or wrong count")
      prev = if (i == 0) r.next() else prev + r.next()
      out(i) = prev
      i += 1
    }
    out
  }

  /** Decode `n` values from a shared reader (for concatenated lists). */
  def decodeFrom(r: VByte.Reader, n: Int): Array[Int] = {
    val out = new Array[Int](n)
    var prev = 0L
    var i = 0
    while (i < n) {
      prev = if (i == 0) r.next() else prev + r.next()
      out(i) = prev.toInt
      i += 1
    }
    out
  }
}
