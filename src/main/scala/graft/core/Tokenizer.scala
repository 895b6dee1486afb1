package graft.core

import java.util.Locale

/** Tokenization with the reference engine's exact semantics
  * (reference: src/query_parser/tokenizer.rs:89-225):
  *
  *  - split on whitespace runs (Rust `split_whitespace`);
  *  - `cleanWord`: lowercase, then strip LEADING and TRAILING
  *    non-alphanumeric chars, keeping interior ones
  *    ("test-case" -> "test-case", "\"hello,\"" -> "hello");
  *  - a token whose cleaned form is empty is dropped, but the position
  *    counter still advances (tokenizer.rs:169,220) — positions are raw
  *    whitespace-token indices, 0-based;
  *  - surviving tokens are lemmatized by exact-map lookup, pass-through
  *    on miss (tokenizer.rs:33-41);
  *  - query bigrams join consecutive SURVIVING lemmas with a single
  *    space at position (currentRawPos - 1) (tokenizer.rs:159-164).
  */
object Tokenizer {

  final case class Token(position: Int, term: String)

  /** UTF-8 byte-wise string comparison — Rust `String: Ord` and Spark's
    * default binary collation order. Java's String.compareTo is UTF-16
    * code-unit order, which DIFFERS for supplementary characters
    * (e.g. emoji sort below U+E000 in UTF-16 but above it in UTF-8), so
    * every term ordering in this engine must go through this comparator.
    */
  def compareUtf8(a: String, b: String): Int = {
    // allocation-free: UTF-8 byte order equals CODE POINT order for
    // valid strings, so an iterative codePointAt walk gives the same
    // total order without encoding two byte arrays per comparison —
    // this comparator sits under lexicon-sized driver sorts
    // (Generations' global term order, the oracle's term ranks), where
    // the per-compare allocations were pure GC churn
    var i = 0
    var j = 0
    while (i < a.length && j < b.length) {
      var ca = a.codePointAt(i)
      var cb = b.codePointAt(j)
      i += Character.charCount(ca)
      j += Character.charCount(cb)
      // an UNPAIRED surrogate (codePointAt returns the surrogate code
      // unit itself) is encoded as '?' (0x3F) by Java's UTF-8 encoder —
      // and therefore by Spark's UTF8String, which fixes the on-disk
      // dictionary sort and the dense term_ids. Mirror it, or a lone
      // surrogate would sort ABOVE all BMP letters here (0xD800+) while
      // sorting as '?' on disk — the drift this comparator exists to
      // forbid. Paired surrogates never hit this: codePointAt returns
      // the supplementary code point, whose 4-byte UTF-8 order equals
      // code point order.
      if (ca >= Character.MIN_SURROGATE && ca <= Character.MAX_SURROGATE)
        ca = '?'
      if (cb >= Character.MIN_SURROGATE && cb <= Character.MAX_SURROGATE)
        cb = '?'
      if (ca != cb) return java.lang.Integer.compare(ca, cb)
    }
    java.lang.Integer.compare(a.length - i, b.length - j)
  }

  val utf8Ordering: Ordering[String] = (a, b) => compareUtf8(a, b)

  /** Rust `char::is_alphanumeric` = Alphabetic | Nd | Nl | No. Java's
    * `Character.isAlphabetic` IS the Unicode derived Alphabetic property
    * (L* | Nl | Other_Alphabetic) — `isLetter` alone would miss
    * Other_Alphabetic code points (e.g. U+24D0 CIRCLED LATIN SMALL A)
    * that the reference keeps. Operates on full code points (Rust chars
    * are scalar values), so supplementary-plane letters/digits count.
    */
  def isAlnum(cp: Int): Boolean =
    Character.isAlphabetic(cp) || {
      val t = Character.getType(cp)
      t == Character.DECIMAL_DIGIT_NUMBER ||
      t == Character.OTHER_NUMBER
    }

  /** Code-point-wise edge strip (a UTF-16 code-unit loop would strip the
    * surrogate halves of supplementary-plane alphanumerics).
    */
  def cleanWord(word: String): String = {
    val lower = word.toLowerCase(Locale.ROOT)
    var start = 0
    var end = lower.length
    while (start < end && !isAlnum(lower.codePointAt(start)))
      start += Character.charCount(lower.codePointAt(start))
    while (end > start && !isAlnum(lower.codePointBefore(end)))
      end -= Character.charCount(lower.codePointBefore(end))
    lower.substring(start, end)
  }

  /** Parse the reference's lemma-file format (tokenizer.rs:52-87):
    * `lemma,"variant1, variant2, …"` per line; maps variant -> lemma.
    */
  def parseLemmas(lines: Iterator[String]): Map[String, String] = {
    val b = Map.newBuilder[String, String]
    lines.foreach { line =>
      if (line.trim.nonEmpty) {
        val comma = line.indexOf(',')
        if (comma >= 0) {
          val key = line.substring(0, comma).trim
          val values = line.substring(comma + 1).trim
            .stripPrefix("\"").stripSuffix("\"")
          values.split(',').iterator.map(_.trim).filter(_.nonEmpty)
            .foreach(v => b += (v -> key))
        }
      }
    }
    b.result()
  }

  /** Tag-strip projection (P1): remove markup before tokenizing, the
    * reference's extract_plaintext regex `<[^>]*>`
    * (src/indexer/indexer.rs:59-70). Relational form:
    * regexp_replace(col, "<[^>]*>", "").
    */
  private val TagPattern = java.util.regex.Pattern.compile("<[^>]*>")
  def stripTags(text: String): String =
    TagPattern.matcher(text).replaceAll("")

  /** Load a lemma file in the reference's lemmas.txt format (S7). */
  def loadLemmasFile(path: String): Map[String, String] = {
    val src = scala.io.Source.fromFile(path, "UTF-8")
    try parseLemmas(src.getLines()) finally src.close()
  }

  /** Rust `char::is_whitespace` = the Unicode White_Space property.
    * Java's Character.isWhitespace diverges both ways: it EXCLUDES the
    * non-breaking separators U+00A0/U+2007/U+202F and NEL U+0085 (so
    * "New York" — an &nbsp; in wiki text — would tokenize as ONE
    * term and shift every later position), and it INCLUDES the
    * U+001C-001F information separators that White_Space does not.
    */
  private def isWs(c: Char): Boolean =
    (Character.isWhitespace(c) && (c < '\u001C' || c > '\u001F')) ||
      c == '\u00A0' || c == '\u0085' || c == '\u2007' || c == '\u202F'

  /** Split on whitespace runs, yielding (rawPosition, word). Matches Rust
    * `split_whitespace`: runs collapse, leading/trailing ignored, and the
    * position index counts non-empty whitespace-separated words.
    */
  def splitWhitespace(text: String): Iterator[String] = new Iterator[String] {
    private var i = 0
    private def skipWs(): Unit = while (i < text.length && isWs(text.charAt(i))) i += 1
    skipWs()
    def hasNext: Boolean = i < text.length
    def next(): String = {
      val start = i
      while (i < text.length && !isWs(text.charAt(i))) i += 1
      val w = text.substring(start, i)
      skipWs()
      w
    }
  }

  /** Document tokenization (tokenizer.rs:178-225). */
  def tokenize(text: String, lemmas: Map[String, String]): Seq[Token] = {
    if (text.isEmpty) return Nil   // ws-only yields no words below; no trim copy
    val out = Seq.newBuilder[Token]
    var position = 0
    splitWhitespace(text).foreach { word =>
      val cleaned = cleanWord(word)
      if (cleaned.nonEmpty) {
        val term = lemmas.getOrElse(cleaned, cleaned)
        out += Token(position, term)
      }
      position += 1
    }
    out.result()
  }

  /** Raw whitespace-token count (positions domain size). */
  def rawTokenCount(text: String): Int = splitWhitespace(text).size

  /** Document-side bigram tokens: consecutive SURVIVING lemmas joined by
    * one space, at position (currentRawPos - 1) — the doc-side version of
    * the reference's commented-out index bigrams (tokenizer.rs:159-164,
    * 211-217) whose query side is live in tokenizeQuery.
    */
  def bigrams(text: String, lemmas: Map[String, String]): Seq[Token] =
    tokenizeQuery(text, lemmas).bigrams

  /** Single-pass document tokenization: `tokenize(text) ++ bigrams(text)`
    * element-for-element, in ONE split/clean/lemma traversal. The fold
    * itself lives in [[tokenizeQuery]] — ONE home for the subtle
    * skip-over-empty bigram position rule (position - 1 of the SECOND
    * surviving word), so the index side cannot drift from the query
    * side.
    */
  def tokenizeWithBigrams(text: String, lemmas: Map[String, String]): Seq[Token] = {
    val q = tokenizeQuery(text, lemmas)
    q.unigrams ++ q.bigrams
  }

  final case class QueryTokens(unigrams: Seq[Token], bigrams: Seq[Token])

  /** Query tokenization: unigrams + skip-over-empty bigrams
    * (tokenizer.rs:123-176).
    */
  def tokenizeQuery(text: String, lemmas: Map[String, String]): QueryTokens = {
    if (text.isEmpty) return QueryTokens(Nil, Nil)
    val unis = Seq.newBuilder[Token]
    val bis = Seq.newBuilder[Token]
    var position = 0
    var prev: Option[String] = None
    splitWhitespace(text).foreach { word =>
      val cleaned = cleanWord(word)
      if (cleaned.nonEmpty) {
        val term = lemmas.getOrElse(cleaned, cleaned)
        unis += Token(position, term)
        prev.foreach(p => bis += Token(position - 1, s"$p $term"))
        prev = Some(term)
      }
      position += 1
    }
    QueryTokens(unis.result(), bis.result())
  }
}
