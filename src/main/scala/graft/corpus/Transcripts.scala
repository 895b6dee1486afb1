package graft.corpus

import java.sql.Timestamp
import org.apache.spark.sql.{Dataset, SparkSession}

/** One turn of a multi-turn transcript — the engine's input row shape
  * (BASELINE.json input_hint): one turn = one document (the reference's
  * WikiArticle analog, reference: src/indexer/indexer.rs:21-27).
  */
final case class Turn(
    conv_id: String,
    turn_idx: Int,
    role: String,
    text: String,
    tool: String,
    ts: Timestamp)

/** Deterministic synthetic transcript corpus (FIXTURES.md §1).
  *
  * Every field of every turn is a pure function of (seed, convIdx,
  * turnIdx) via SplitMix64, so the corpus is identical regardless of
  * Spark partitioning or parallelism level — this is what makes the
  * local[8]-vs-local[32] rank-identity and scaling checks meaningful.
  * `generate` (distributed) and `generateLocal` (scalar oracle input)
  * share `turnsFor` and therefore produce byte-identical rows.
  */
object Transcripts {

  /** SplitMix64 finalizer — a public-domain mixing function. */
  @inline def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Stateless counter RNG: n-th draw for a (seed, conv, turn) stream. */
  @inline private def draw(seed: Long, conv: Long, turn: Int, n: Int): Long =
    mix(mix(mix(seed) ^ conv * 0x9e3779b97f4a7c15L) ^ (turn.toLong << 20) ^ n.toLong)

  @inline private def unit(x: Long): Double = (x >>> 11).toDouble / (1L << 53).toDouble

  // ~30 stopwords that the Zipf head lands on — the skew drivers.
  val stopwords: Vector[String] = Vector(
    "the", "a", "of", "to", "and", "in", "is", "it", "you", "that", "was",
    "for", "on", "are", "as", "with", "his", "they", "i", "at", "be",
    "this", "have", "from", "or", "one", "had", "by", "not", "but")

  private val syllA = Vector("al", "be", "cor", "dex", "el", "fra", "gam",
    "hol", "ix", "jun", "kel", "lom", "mar", "nor", "ost", "pel", "qua",
    "ril", "sor", "tam")
  private val syllB = Vector("ba", "ce", "di", "fo", "gu", "ha", "ji",
    "ko", "lu", "ma", "ne", "pi", "ro", "su", "te", "vo", "wi", "xa",
    "ye", "zo")
  private val syllC = Vector("", "n", "r", "st", "l", "m", "x", "d", "k", "t")

  /** 4000 deterministic content words (20*20*10). */
  val contentWords: Vector[String] = (for {
    a <- syllA; b <- syllB; c <- syllC
  } yield a + b + c).toVector

  val vocab: Vector[String] = stopwords ++ contentWords

  /** Lemma table in the reference's lemmas.txt spirit: inflected variants
    * of the first 300 content words map back to their lemma.
    */
  val lemmas: Map[String, String] = {
    val b = Map.newBuilder[String, String]
    contentWords.take(300).foreach { w =>
      b += (w + "s") -> w
      b += (w + "ing") -> w
      b += (w + "ed") -> w
    }
    b.result()
  }

  /** Lemma file content in the reference's `lemma,"v1, v2"` format. */
  def lemmaFileLines: Seq[String] =
    contentWords.take(300).map(w => s"""$w,"${w}s, ${w}ing, ${w}ed"""")

  // Zipf(s=1.07) over the vocab; stopwords occupy the head ranks, which
  // makes a handful of terms cover >30% of tokens (the skew knob).
  private val zipfCdf: Array[Double] = {
    val s = 1.07
    val w = Array.tabulate(vocab.size)(r => 1.0 / math.pow(r + 1.0, s))
    val total = w.sum
    val cdf = new Array[Double](w.length)
    var acc = 0.0
    var i = 0
    while (i < w.length) { acc += w(i) / total; cdf(i) = acc; i += 1 }
    cdf(w.length - 1) = 1.0
    cdf
  }

  private def zipfPick(u: Double): Int = {
    var lo = 0
    var hi = zipfCdf.length - 1
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (zipfCdf(mid) < u) lo = mid + 1 else hi = mid
    }
    lo
  }

  private val tools = Vector("", "", "", "", "", "", "search", "calc", "browse", "exec")
  private val lemmaVariantSuffix = Vector("s", "ing", "ed")
  private val lemmaBases: Set[String] = contentWords.take(300).toSet

  /** `x.abs mod k` with the Long.MinValue hole closed (abs(MinValue) ==
    * MinValue, whose modulus is negative and would break the documented
    * ranges). MinValue maps to 0 — output is IDENTICAL to the old
    * expression for every other input, so the deterministic corpus
    * contract (FIXTURES.md) is unchanged in practice (P(draw ==
    * MinValue) = 2^-64 per draw).
    */
  private def absMod(x: Long, k: Long): Long =
    (if (x == Long.MinValue) 0L else x.abs) % k

  val epochMs: Long = 1700000000000L // fixed; no wall-clock anywhere

  def turnsOf(convIdx: Long, seed: Long): Int =
    2 + absMod(mix(mix(seed) ^ convIdx), 39).toInt // 2..40

  /** All turns of one conversation — pure function of (convIdx, seed). */
  def turnsFor(convIdx: Long, seed: Long): Seq[Turn] = {
    val convId = f"conv-$convIdx%08d"
    val nTurns = turnsOf(convIdx, seed)
    (0 until nTurns).map { t =>
      var n = 0
      def nxt(): Long = { n += 1; draw(seed, convIdx, t, n) }
      val role =
        if (unit(nxt()) < 0.10) "tool"
        else if (t % 2 == 0) "user" else "assistant"
      val nWords = 5 + absMod(nxt(), 116).toInt // 5..120
      val sb = new StringBuilder
      var i = 0
      while (i < nWords) {
        if (i > 0) sb.append(' ')
        var w = vocab(zipfPick(unit(nxt())))
        val r = unit(nxt())
        // inflected variants (exercise the lemmatizer)
        if (r < 0.06 && lemmaBases.contains(w))
          w = w + lemmaVariantSuffix(absMod(nxt(), 3).toInt)
        // MixedCase + punctuation wrapping (exercise cleanWord)
        val r2 = unit(nxt())
        if (r2 < 0.05) w = w.capitalize
        else if (r2 < 0.08) w = w.toUpperCase(java.util.Locale.ROOT)
        val r3 = unit(nxt())
        if (r3 < 0.04) w = "\"" + w + ","
        else if (r3 < 0.06) w = "(" + w + ")"
        else if (r3 < 0.07) w = "..." // cleans to empty; position still advances
        sb.append(w)
        i += 1
      }
      val tool = if (role == "tool") tools(absMod(nxt(), tools.size).toInt) else ""
      Turn(convId, t, role, sb.toString,
        tool, new Timestamp(epochMs + convIdx * 60000L + t * 1000L))
    }
  }

  /** Distributed generation: one task range per slice of conversations. */
  def generate(spark: SparkSession, nConvs: Long, seed: Long = 42L,
      partitions: Int = 0): Dataset[Turn] = {
    import spark.implicits._
    val p = if (partitions > 0) partitions
      else spark.sparkContext.defaultParallelism
    spark.range(0L, nConvs, 1L, p).flatMap(i => turnsFor(i, seed))
  }

  /** Scalar generation for the oracle — identical rows to `generate`. */
  def generateLocal(nConvs: Long, seed: Long = 42L): Seq[Turn] =
    (0L until nConvs).flatMap(i => turnsFor(i, seed))
}
