package graft.core

import java.io.ByteArrayOutputStream

/** One compressed posting chunk of a single term: at most
  * [[ChunkCodec.ChunkSize]] postings (mirrors the reference's 128-posting
  * cap, src/indexer/index_merge_writer.rs:148), doc_ids delta-gap+VByte
  * compressed, per-posting position lists delta-gap+VByte compressed with
  * explicit per-posting counts (see [[Gaps]] for why counts are explicit).
  *
  * This is the decoded, in-memory form; the on-disk form is one row of the
  * `postings` Parquet table (SURVEY.md §7.0) where `minDocId`/`maxDocId`/
  * `maxTf` are plain columns so Parquet min/max stats + explicit predicates
  * implement the reference's chunk skip-pointers (src/indexer/block.rs:73-86)
  * and our block-max WAND pruning.
  */
final case class Chunk(
    docIds: Array[Long],
    tfs: Array[Int],
    positions: Array[Array[Int]]) {
  def n: Int = docIds.length
  def minDocId: Long = docIds(0)
  def maxDocId: Long = docIds(docIds.length - 1)
  def maxTf: Int = { var m = 0; var i = 0; while (i < tfs.length) { if (tfs(i) > m) m = tfs(i); i += 1 }; m }
}

object ChunkCodec {
  /** Max postings per chunk (reference: index_merge_writer.rs:148). */
  val ChunkSize = 128

  /** Encode sorted doc_ids as a delta-gap VByte blob. */
  def encodeDocGaps(docIds: Array[Long]): Array[Byte] = Gaps.encode(docIds)

  def decodeDocGaps(blob: Array[Byte], n: Int): Array[Long] = Gaps.decode(blob, n)

  /** One posting's position-list unit: vb(nPositions) + delta-gapped
    * VByte positions. `encodePositions` output is exactly the
    * concatenation of these units, so pre-encoded units can be
    * concatenated without re-encoding (the SPIMI segments carry them).
    */
  def encodePostingUnit(ps: Array[Int]): Array[Byte] = {
    val out = new ByteArrayOutputStream(ps.length * 2 + 4)
    VByte.encodeTo(ps.length.toLong, out)
    var prev = 0L
    var j = 0
    while (j < ps.length) {
      val v = ps(j).toLong
      if (j == 0) VByte.encodeTo(v, out) else VByte.encodeTo(v - prev, out)
      prev = v
      j += 1
    }
    out.toByteArray
  }

  /** Concatenate pre-encoded posting units into a chunk pos_blob. */
  def concatUnits(units: Array[Array[Byte]]): Array[Byte] = {
    var total = 0
    var i = 0
    while (i < units.length) { total += units(i).length; i += 1 }
    val out = new Array[Byte](total)
    var off = 0
    i = 0
    while (i < units.length) {
      System.arraycopy(units(i), 0, out, off, units(i).length)
      off += units(i).length
      i += 1
    }
    out
  }

  /** Encode per-posting position lists: for each posting,
    * vb(nPositions) then delta-gapped VByte positions.
    */
  def encodePositions(positions: Array[Array[Int]]): Array[Byte] =
    // by construction the exact concatenation of per-posting units (the
    // SPIMI path encodes units individually and concatenates them with
    // concatUnits) — one loop, no twin to drift from
    concatUnits(positions.map(encodePostingUnit))

  def decodePositions(blob: Array[Byte], nPostings: Int): Array[Array[Int]] = {
    val out = new Array[Array[Int]](nPostings)
    val r = new VByte.Reader(blob)
    var i = 0
    while (i < nPostings) {
      val np = r.nextInt()
      out(i) = Gaps.decodeFrom(r, np)
      i += 1
    }
    out
  }

  def encode(chunk: Chunk): (Array[Byte], Array[Byte]) =
    (encodeDocGaps(chunk.docIds), encodePositions(chunk.positions))

  def decode(docGaps: Array[Byte], posBlob: Array[Byte], n: Int): Chunk = {
    val docIds = decodeDocGaps(docGaps, n)
    val positions = decodePositions(posBlob, n)
    val tfs = positions.map(_.length)
    Chunk(docIds, tfs, positions)
  }

  /** Split a doc_id-sorted posting run into <=ChunkSize chunks. */
  def chunkify(
      docIds: Array[Long],
      positions: Array[Array[Int]]): Iterator[Chunk] = {
    val n = docIds.length
    (0 until n by ChunkSize).iterator.map { start =>
      val end = math.min(start + ChunkSize, n)
      val ids = java.util.Arrays.copyOfRange(docIds, start, end)
      val pos = java.util.Arrays.copyOfRange(positions, start, end)
      Chunk(ids, pos.map(_.length), pos)
    }
  }
}
