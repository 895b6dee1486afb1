package graft.core

/** SymSpell deletion-neighborhood primitives (Garbe 2012) — the engine's
  * sub-linear fuzzy-match machinery, shared by the index-time variant
  * table writer (graft.index.IndexBuilder.writeFuzzyIndex) and the
  * query-side probe (graft.query.QueryEngine.fuzzyTerms).
  */
object Fuzzy {

  /** Terms longer than this get no deletion variants (just themselves):
    * variants of an L-char term cost O(L^2) characters, so one unbroken
    * 100 KB junk token (base64 blob, URL) would otherwise materialize
    * ~10 GB of variants inside a single task. Fuzzy recall is therefore
    * limited to terms <= MaxTermLen code points — matching the practical
    * domain of edit-distance-1 lexical lookup.
    */
  val MaxTermLen = 64

  /** All strings reachable from `s` by deleting up to d code points,
    * INCLUDING s itself (SymSpell requires 0..d deletions on both sides:
    * lev(a,b) <= d implies a and b share a string reachable by <= d
    * deletions from each). Deletions operate on code points, matching
    * Spark's levenshtein.
    *
    * Strings longer than `maxLen` code points emit only themselves. The
    * INDEX writer passes maxLen = MaxTermLen + d so that every term
    * reachable from a <= MaxTermLen-cp query still has its variants in
    * the table (a 65-cp term is 1 deletion from a 64-cp query); the
    * query side keeps the MaxTermLen default, and over-long QUERIES are
    * routed to the scan fallback by QueryEngine.fuzzyTerms.
    */
  def deleteVariants(s: String, d: Int, maxLen: Int = MaxTermLen): Set[String] = {
    if (s.codePointCount(0, s.length) > maxLen) return Set(s)
    def delOne(w: String): Iterator[String] = {
      val cps = w.codePoints().toArray
      cps.indices.iterator.map { j =>
        val rest = new Array[Int](cps.length - 1)
        System.arraycopy(cps, 0, rest, 0, j)
        System.arraycopy(cps, j + 1, rest, j, cps.length - 1 - j)
        new String(rest, 0, rest.length)
      }
    }
    var cur = Set(s)
    var all = Set(s)
    var i = 0
    while (i < d) {
      cur = cur.flatMap(delOne)
      all ++= cur
      i += 1
    }
    all
  }
}
