package graft.core

import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** Codec tests incl. the reference's exact byte vectors
  * (reference: src/compressors/vb_encode.rs:33-111). Property tests use a
  * fixed-seed Random (the scalatest-scalacheck bridge is not in the
  * offline dep cache), which keeps them deterministic.
  */
class VByteSpec extends AnyFunSuite {

  private def bytes(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray

  test("reference byte vectors") {
    assert(VByte.encode(0L).sameElements(bytes(128)))
    assert(VByte.encode(1L).sameElements(bytes(129)))
    assert(VByte.encode(127L).sameElements(bytes(255)))
    assert(VByte.encode(128L).sameElements(bytes(1, 128)))
    assert(VByte.encode(1097L).sameElements(bytes(8, 201)))
    assert(VByte.encode(16384L).sameElements(bytes(1, 0, 128)))
  }

  test("u32 max and beyond (Long headroom)") {
    val u32max = 0xffffffffL
    assert(VByte.decode(VByte.encode(u32max), 0)._1 == u32max)
    val big = (1L << 44) + 12345L
    assert(VByte.decode(VByte.encode(big), 0)._1 == big)
    assert(VByte.decode(VByte.encode(Long.MaxValue), 0)._1 == Long.MaxValue)
  }

  test("decode reports bytes read") {
    val blob = VByte.encode(1097L) ++ VByte.encode(5L)
    val (v1, r1) = VByte.decode(blob, 0)
    assert(v1 == 1097L && r1 == 2)
    val (v2, r2) = VByte.decode(blob, r1)
    assert(v2 == 5L && r2 == 1)
  }

  test("round-trip property") {
    val rnd = new Random(42)
    (0 until 2000).foreach { _ =>
      val n = rnd.nextLong().abs
      assert(VByte.decode(VByte.encode(n), 0)._1 == n)
    }
  }

  test("corruption is an ERROR, never a silent partial value") {
    // blob ends without a stop byte: returning the partial accumulator
    // would turn a truncated write into a plausible wrong integer
    intercept[IllegalArgumentException](VByte.decode(Array[Byte](0x01, 0x00), 0))
    // count exceeding the encoded values (truncated row / wrong count)
    intercept[IllegalArgumentException](Gaps.decode(Gaps.encode(Array(5L, 9L)), 3))
    // negative count (the SQL-facing vb_decode_gaps path)
    intercept[IllegalArgumentException](Gaps.decode(Array.empty[Byte], -1))
  }

  test("gaps round-trip: empty, single, max ids, long lists") {
    assert(Gaps.decode(Gaps.encode(Array.empty[Long]), 0).isEmpty)
    assert(Gaps.decode(Gaps.encode(Array(0L)), 1).sameElements(Array(0L)))
    val maxish = Array(0xfffffff0L, 0xffffffffL)
    assert(Gaps.decode(Gaps.encode(maxish), 2).sameElements(maxish))
    val thousand = Array.tabulate(1000)(i => i.toLong * 7 + 3)
    assert(Gaps.decode(Gaps.encode(thousand), 1000).sameElements(thousand))
  }

  test("gaps round-trip property (sorted vectors, duplicates allowed)") {
    val rnd = new Random(7)
    (0 until 300).foreach { _ =>
      val n = rnd.nextInt(200)
      val xs = Array.fill(n)(rnd.nextLong().abs % (1L << 40)).sorted
      assert(Gaps.decode(Gaps.encode(xs), xs.length).sameElements(xs))
    }
  }

  test("gap of 16384 is unambiguous (reference 0x00-sentinel latent bug)") {
    // vb(16384) = [1, 0, 128] contains 0x00; the reference's 0x00-delimited
    // stream cannot represent this gap; explicit counts can.
    val xs = Array(5L, 5L + 16384L, 5L + 16384L + 16384L)
    assert(Gaps.decode(Gaps.encode(xs), 3).sameElements(xs))
  }
}

class ChunkCodecSpec extends AnyFunSuite {

  test("chunk round-trip with positions") {
    val docIds = Array(3L, 9L, 10L, 5000000L)
    val positions = Array(Array(0, 4, 7), Array(1), Array(2, 3), Array(0))
    val (dg, pb) = ChunkCodec.encode(Chunk(docIds, positions.map(_.length), positions))
    val back = ChunkCodec.decode(dg, pb, 4)
    assert(back.docIds.sameElements(docIds))
    assert(back.positions.map(_.toSeq).toSeq == positions.map(_.toSeq).toSeq)
    assert(back.tfs.sameElements(Array(3, 1, 2, 1)))
    assert(back.maxDocId == 5000000L && back.minDocId == 3L && back.maxTf == 3)
  }

  test("chunkify cuts at exactly 128 postings (reference boundary 128/129)") {
    // reference: src/indexer/index_merge_writer.rs:555-586
    def mk(n: Int) = {
      val ids = Array.tabulate(n)(i => i.toLong * 2)
      val pos = Array.tabulate(n)(i => Array(i))
      ChunkCodec.chunkify(ids, pos).toSeq
    }
    assert(mk(128).map(_.n) == Seq(128))
    assert(mk(129).map(_.n) == Seq(128, 1))
    assert(mk(257).map(_.n) == Seq(128, 128, 1))
    val cs = mk(129)
    assert(cs(0).maxDocId == 254L && cs(1).minDocId == 256L)
  }

  test("positions round-trip property") {
    val rnd = new scala.util.Random(13)
    (0 until 200).foreach { _ =>
      val pss = Array.fill(1 + rnd.nextInt(20))(
        Array.fill(rnd.nextInt(50))(rnd.nextInt(1 << 20)).sorted)
      val blob = ChunkCodec.encodePositions(pss)
      val back = ChunkCodec.decodePositions(blob, pss.length)
      assert(back.map(_.toSeq).toSeq == pss.map(_.toSeq).toSeq)
    }
  }
}
