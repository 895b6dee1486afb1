package graft.oracle

import graft.core.Tokenizer
import graft.corpus.Turn
import graft.index.Bm25

/** Single-node scalar oracle: plain Scala collections, written
  * independently of the Spark path, computing the same semantics —
  * tokenize -> postings -> df/tf -> BM25 -> top-k. The golden source for
  * rank-identity tests (SURVEY.md §5(3), BASELINE.md top-k fidelity).
  */
class Oracle(turns: Seq[Turn], lemmas: Map[String, String],
    k1: Double = Bm25.K1, b: Double = Bm25.B,
    /** Model an index built with IndexConf.indexBigrams: handleQuery's
      * bigram tier only exists when the index carries bigram postings.
      */
    indexBigrams: Boolean = false) {

  /** doc_id = dense 1-based rank under (conv_id, turn_idx) order —
    * conv_id in UTF-8 BYTE order (Tokenizer.utf8Ordering), matching the
    * engine's RangeRank over Spark's binary string collation; Java's
    * default UTF-16 compare would swap doc_ids for supplementary-plane
    * conv_ids (same divergence the term order already guards against).
    */
  val docsSorted: Vector[Turn] =
    turns.sortBy(t => (t.conv_id, t.turn_idx))(
      Ordering.Tuple2(Tokenizer.utf8Ordering, Ordering.Int)).toVector

  val docIdOf: Map[(String, Int), Long] =
    docsSorted.zipWithIndex.map { case (t, i) => (t.conv_id, t.turn_idx) -> (i + 1L) }.toMap

  /** doc_id -> (term -> sorted positions). */
  val forward: Vector[(Long, Map[String, Vector[Int]], Int)] =
    docsSorted.zipWithIndex.map { case (t, i) =>
      val toks = Tokenizer.tokenize(t.text, lemmas)
      val byTerm = toks.groupBy(_.term).map { case (term, ts) =>
        term -> ts.map(_.position).toVector
      }
      (i + 1L, byTerm, toks.length)
    }

  val nDocs: Long = docsSorted.size.toLong
  val docLen: Map[Long, Int] = forward.map(f => f._1 -> f._3).toMap
  val avgdl: Double = {
    // Same expression the Spark side computes via avg(doc_len).
    if (nDocs == 0) 0.0 else docLen.values.map(_.toLong).sum.toDouble / nDocs
  }

  /** term -> sorted (doc_id, tf, positions). */
  val postings: Map[String, Vector[(Long, Int, Vector[Int])]] = {
    val m = scala.collection.mutable.HashMap
      .empty[String, scala.collection.mutable.ArrayBuffer[(Long, Int, Vector[Int])]]
    forward.foreach { case (docId, byTerm, _) =>
      byTerm.foreach { case (term, ps) =>
        m.getOrElseUpdate(term, scala.collection.mutable.ArrayBuffer.empty)
          .append((docId, ps.length, ps))
      }
    }
    m.map { case (t, v) => t -> v.sortBy(_._1).toVector }.toMap
  }

  /** term_id = dense 1-based rank in UTF-8 byte-order term sort (Rust
    * String Ord / Spark binary collation — NOT Java UTF-16 order).
    */
  val termId: Map[String, Long] =
    postings.keys.toVector.sorted(Tokenizer.utf8Ordering).zipWithIndex
      .map { case (t, i) => t -> (i + 1L) }.toMap

  def df(term: String): Long = postings.get(term).map(_.size.toLong).getOrElse(0L)
  def idf(term: String): Double = Bm25.idf(nDocs, df(term))

  /** BM25 top-k: per-doc sum in ascending term_id order; tie-break
    * (score desc, doc_id asc). Identical formula and fold order to the
    * Spark path, so scores match bit-for-bit.
    */
  def bm25TopK(query: String, k: Int): Seq[(Long, Double)] = {
    val terms = Tokenizer.tokenizeQuery(query, lemmas).unigrams.map(_.term).distinct
    bm25TopKForTerms(terms, k)
  }

  def bm25TopKForTerms(terms: Seq[String], k: Int): Seq[(Long, Double)] = {
    val present = terms.distinct.filter(postings.contains).sortBy(termId)
    val perDoc = scala.collection.mutable.HashMap.empty[Long, List[(Long, Double)]]
    present.foreach { t =>
      val w = idf(t)
      postings(t).foreach { case (docId, tf, _) =>
        val imp = Bm25.impact(w, tf, docLen(docId), avgdl, k1, b)
        perDoc(docId) = (termId(t), imp) :: perDoc.getOrElse(docId, Nil)
      }
    }
    val scored = perDoc.toVector.map { case (docId, imps) =>
      // ascending term_id fold, exactly like sort_array + aggregate
      val score = imps.sortBy(_._1).foldLeft(0.0)((acc, x) => acc + x._2)
      (docId, score)
    }
    scored.sortBy { case (docId, score) => (-score, docId) }.take(k)
  }

  /** Bigram "postings" — sorted (doc_id, tf) per bigram term, built from
    * the same consecutive-surviving-lemma rule the index uses
    * (Tokenizer.bigrams); empty unless indexBigrams.
    */
  lazy val bigramPostings: Map[String, Vector[(Long, Int)]] =
    if (!indexBigrams) Map.empty
    else {
      val m = scala.collection.mutable.HashMap
        .empty[String, scala.collection.mutable.ArrayBuffer[(Long, Int)]]
      docsSorted.zipWithIndex.foreach { case (t, i) =>
        Tokenizer.bigrams(t.text, lemmas).groupBy(_.term).foreach {
          case (bg, occ) =>
            m.getOrElseUpdate(bg, scala.collection.mutable.ArrayBuffer.empty)
              .append(((i + 1).toLong, occ.size))
        }
      }
      m.map { case (t, v) => t -> v.sortBy(_._1).toVector }.toMap
    }

  /** Bigram BM25 over the docs containing EVERY query bigram. Fold order:
    * ascending utf8 byte order of the bigram strings == ascending engine
    * term_id (dense ranking is monotone in byte order), so scores are
    * bit-identical to the Spark path's sorted-term_id fold.
    */
  private def bigramScores(bigrams: Seq[String]): Map[Long, Double] = {
    val uniq = bigrams.distinct
    if (uniq.isEmpty || uniq.exists(b => !bigramPostings.contains(b)))
      return Map.empty
    val docs = uniq.map(b => bigramPostings(b).map(_._1).toSet)
      .reduceLeft(_ intersect _)
    val ordered = uniq.sorted(Tokenizer.utf8Ordering)
    docs.iterator.map { d =>
      val score = ordered.foldLeft(0.0) { (acc, bg) =>
        val ps = bigramPostings(bg)
        val tf = ps.find(_._1 == d).get._2
        acc + Bm25.impact(Bm25.idf(nDocs, ps.size.toLong), tf, docLen(d), avgdl,
          k1, b)
      }
      d -> score
    }.toMap
  }

  /** Reference handle_query semantics (src/search_engine/mod.rs:118-206,
    * three strategies appended in precedence order): tier 0 = phrase
    * matches (unigram-scored), tier 1 = docs containing every query
    * bigram as an INDEXED bigram (bigram-scored; empty unless
    * indexBigrams), tier 2 = the remaining disjunctive BM25 matches.
    */
  def handleQuery(query: String, k: Int): Seq[(Long, Double, Int)] = {
    val qt = Tokenizer.tokenizeQuery(query, lemmas)
    // phrase tier matches the FULL lemma sequence (dups kept: "to be or
    // not to be" must not phrase-match "to be or not"); scoring dedups
    val phraseSeq = qt.unigrams.map(_.term)
    val terms = phraseSeq.distinct
    if (terms.isEmpty) return Nil
    val scoredAll = bm25TopKForTerms(terms, Int.MaxValue)
    if (phraseSeq.size == 1)
      return scoredAll.map { case (d, s) => (d, s, 2) }
        .sortBy { case (d, s, t) => (t, -s, d) }.take(k)
    val phraseDocs = if (terms.forall(postings.contains))
      phraseMatch(phraseSeq) else Set.empty[Long]
    val bgScores = bigramScores(qt.bigrams.map(_.term).distinct)
    val unigramRest = scoredAll.collect {
      case (d, s) if !phraseDocs(d) && !bgScores.contains(d) => (d, s, 2)
    }
    (phraseDocs.toSeq.map(d =>
        (d, scoredAll.find(_._1 == d).map(_._2).getOrElse(0.0), 0)) ++
      bgScores.collect { case (d, s) if !phraseDocs(d) => (d, s, 1) } ++
      unigramRest)
      .sortBy { case (d, s, t) => (t, -s, d) }
      .take(k)
  }

  /** tf-idf parity scorer (reference src/scoring/mod.rs:34-48). */
  def tfIdfScores(terms: Seq[String]): Map[Long, Double] = {
    val present = terms.distinct.filter(postings.contains).sortBy(termId)
    val perDoc = scala.collection.mutable.HashMap.empty[Long, List[(Long, Double)]]
    present.foreach { t =>
      postings(t).foreach { case (docId, tf, _) =>
        val w = Bm25.tfIdf(nDocs, df(t), tf)
        perDoc(docId) = (termId(t), w) :: perDoc.getOrElse(docId, Nil)
      }
    }
    perDoc.map { case (d, ws) =>
      d -> ws.sortBy(_._1).foldLeft(0.0)((acc, x) => acc + x._2)
    }.toMap
  }

  /** A9 — the reference's abandoned vector-space doc norm
    * (src/helpers/mod.rs:191-218, commented): sqrt(Σ_t (tf·df)²) —
    * tf·DF, the reference's literal semantics. Each addend is an exact
    * integer in a Double, so summation order is immaterial here.
    */
  lazy val vsmNorms: Map[Long, Double] = {
    val sums = scala.collection.mutable.HashMap.empty[Long, Double]
    postings.foreach { case (t, ps) =>
      val d = ps.size.toDouble
      ps.foreach { case (docId, tf, _) =>
        val w = tf.toDouble * d
        sums(docId) = sums.getOrElse(docId, 0.0) + w * w
      }
    }
    sums.map { case (d, s) => d -> math.sqrt(s) }.toMap
  }

  /** A9 scorer: tf-idf numerator (same fold as [[tfIdfScores]]) over
    * [[vsmNorms]].
    */
  def vsmScores(terms: Seq[String]): Map[Long, Double] =
    tfIdfScores(terms).map { case (d, num) => d -> num / vsmNorms(d) }

  /** Conjunctive AND intersection, rarest-first. */
  def conjunctive(terms: Seq[String]): Set[Long] = {
    val uniq = terms.distinct
    if (uniq.exists(t => !postings.contains(t))) return Set.empty
    val byDf = uniq.sortBy(t => (df(t), termId(t)))
    byDf.map(t => postings(t).map(_._1).toSet).reduceLeft(_ intersect _)
  }

  /** Phrase: strictly consecutive positions (reference
    * src/positional_intersect/mod.rs:11-35).
    */
  def phraseMatch(terms: Seq[String]): Set[Long] = {
    if (terms.isEmpty) return Set.empty
    if (terms.exists(t => !postings.contains(t))) return Set.empty
    val docSets = conjunctive(terms)
    docSets.filter { docId =>
      val posOf = terms.map(t => postings(t).find(_._1 == docId).get._3)
      posOf.head.exists(start =>
        terms.indices.tail.forall(i => posOf(i).contains(start + i)))
    }
  }

  /** Directional proximity pairs (pp2 > pp1, diff <= k; reference
    * src/positional_intersect/mod.rs:579-604).
    */
  def proximity(t1: String, t2: String, k: Int): Seq[(Long, Int, Int)] = {
    (for {
      p1 <- postings.getOrElse(t1, Vector.empty)
      p2 <- postings.getOrElse(t2, Vector.empty)
      if p1._1 == p2._1
      pos1 <- p1._3
      pos2 <- p2._3
      if pos2 > pos1 && pos2 - pos1 <= k
    } yield (p1._1, pos1, pos2))
  }

  /** Fuzzy: dictionary terms within Levenshtein distance d. Unigrams
    * only — bigram pseudo-terms are composition artifacts, not
    * dictionary words (the engine filters them identically).
    */
  def fuzzyTerms(q: String, d: Int): Set[String] =
    postings.keySet.filter(t => levenshtein(t, q) <= d)

  /** CODE-POINT Levenshtein — the engine compares code points (Spark's
    * levenshtein; Fuzzy.deleteVariants walks code points), so a
    * UTF-16-unit DP here would count a supplementary-plane char (one
    * surrogate PAIR) as two edits and wrongly indict correct engine
    * output on emoji-bearing corpora.
    */
  def levenshtein(a: String, b: String): Int = {
    val ac = a.codePoints().toArray
    val bc = b.codePoints().toArray
    val dp = Array.tabulate(bc.length + 1)(identity)
    for (i <- 1 to ac.length) {
      var prev = dp(0)
      dp(0) = i
      for (j <- 1 to bc.length) {
        val tmp = dp(j)
        dp(j) = math.min(math.min(dp(j) + 1, dp(j - 1) + 1),
          prev + (if (ac(i - 1) == bc(j - 1)) 0 else 1))
        prev = tmp
      }
    }
    dp(bc.length)
  }
}
