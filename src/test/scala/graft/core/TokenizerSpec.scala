package graft.core

import org.scalatest.funsuite.AnyFunSuite
import graft.core.Tokenizer._

/** Reference tokenizer semantics (src/query_parser/tokenizer.rs). */
class TokenizerSpec extends AnyFunSuite {

  test("cleanWord strips edges, keeps interior, lowercases") {
    assert(cleanWord("\"Hello,\"") == "hello")
    assert(cleanWord("test-case") == "test-case")
    assert(cleanWord("--test-case!!") == "test-case")
    assert(cleanWord("...") == "")
    assert(cleanWord("Don't") == "don't")
    assert(cleanWord("42") == "42")
    assert(cleanWord("ümlaut") == "ümlaut")
  }

  test("positions advance on tokens that clean to empty (tokenizer.rs:169)") {
    val toks = tokenize("alpha --- beta", Map.empty)
    assert(toks == Seq(Token(0, "alpha"), Token(2, "beta")))
  }

  test("whitespace runs collapse like Rust split_whitespace") {
    val toks = tokenize("  a \t\n b  ", Map.empty)
    assert(toks == Seq(Token(0, "a"), Token(1, "b")))
  }

  test("whitespace = Unicode White_Space (Rust char::is_whitespace parity)") {
    // NBSP / NNBSP / NEL / FIGURE SPACE all split (Java's
    // Character.isWhitespace says no — an &nbsp;-derived U+00A0 in wiki
    // text would glue "new york" into one term and shift every later
    // position off the reference's)
    val toks = tokenize(
      "new\u00A0york\u202Fcity\u0085here\u2007now", Map.empty)
    assert(toks.map(_.term) == Seq("new", "york", "city", "here", "now"))
    assert(toks.map(_.position) == Seq(0, 1, 2, 3, 4))
    // the U+001C-001F information separators are NOT White_Space
    // (Java says they are): they stay interior, like any non-alnum
    val t2 = tokenize("a\u001Cb", Map.empty)
    assert(t2.map(_.term) == Seq("a\u001Cb"))
  }

  test("tokenizeWithBigrams == tokenize ++ bigrams (single-pass fusion)") {
    val text = "The quick \"brown,\" fox ... jumps over the lazy dog"
    val lem = Map("jumps" -> "jump")
    assert(Tokenizer.tokenizeWithBigrams(text, lem) ==
      Tokenizer.tokenize(text, lem) ++ Tokenizer.bigrams(text, lem))
    assert(Tokenizer.tokenizeWithBigrams("", lem).isEmpty)
    assert(Tokenizer.tokenizeWithBigrams("   ", lem).isEmpty)
  }

  test("lemmatize: exact lookup, pass-through on miss") {
    val lemmas = Map("was" -> "be", "running" -> "run")
    val toks = tokenize("He was running fast", lemmas)
    assert(toks.map(_.term) == Seq("he", "be", "run", "fast"))
  }

  test("empty / blank input yields no tokens") {
    assert(tokenize("", Map.empty).isEmpty)
    assert(tokenize("   \t ", Map.empty).isEmpty)
  }

  test("query bigrams join surviving lemmas at position-1 (tokenizer.rs:159-164)") {
    val q = tokenizeQuery("big --- data systems", Map.empty)
    assert(q.unigrams == Seq(Token(0, "big"), Token(2, "data"), Token(3, "systems")))
    // bigram position = current raw position - 1, even across a dropped token
    assert(q.bigrams == Seq(Token(1, "big data"), Token(2, "data systems")))
  }

  test("parseLemmas: reference format lemma,\"v1, v2\"") {
    val lines = Iterator(
      """be,"is, was, are"""",
      "",
      """have,"had, has"""")
    val m = parseLemmas(lines)
    assert(m("is") == "be" && m("was") == "be" && m("had") == "have")
    assert(m.size == 5)
  }

  test("rawTokenCount counts whitespace tokens incl. dropped ones") {
    assert(rawTokenCount("a --- b ...") == 4)
    assert(rawTokenCount("") == 0)
  }

  test("stripTags removes markup like extract_plaintext (indexer.rs:59-70)") {
    assert(stripTags("a <b>bold</b> move <br/> here") == "a bold move  here")
    assert(stripTags("no tags at all") == "no tags at all")
    assert(stripTags("<unclosed") == "<unclosed") // no '>' -> untouched
  }

  test("byte-order case-sensitive term sort (dictionary/mod.rs:193-203)") {
    // Spark StringType default binary collation matches Rust String Ord.
    val sorted = Seq("apple", "Banana", "Zebra").sorted
    assert(sorted == Seq("Banana", "Zebra", "apple"))
  }
}
