package graft.index

import graft.SparkSpecBase
import graft.core.Tokenizer
import graft.corpus.Transcripts
import graft.query.QueryEngine

/** Bigram indexing (reference tokenizer.rs:211-217, commented intent):
  * the invariant is that the doc set of an indexed bigram term equals the
  * positional phrase match of its two words.
  */
class BigramSpec extends SparkSpecBase {

  private val lemmas = Transcripts.lemmas

  private lazy val (engine, turns) = {
    val dir = tmpDir("graft-bigram")
    val local = Transcripts.generateLocal(25L)
    import spark.implicits._
    new IndexBuilder(spark, lemmas,
      IndexConf(numParts = 4, indexBigrams = true))
      .build(spark.createDataset(local), dir)
    (new QueryEngine(spark, dir, lemmas), local)
  }

  test("bigram token positions follow the position-1 rule") {
    val toks = Tokenizer.bigrams("big --- data systems", Map.empty)
    assert(toks == Seq(Tokenizer.Token(1, "big data"),
      Tokenizer.Token(2, "data systems")))
  }

  test("positional phrase match is a subset of the indexed bigram docs") {
    // Reference semantics differ deliberately: a bigram joins consecutive
    // SURVIVING lemmas (skipping tokens that clean to empty,
    // tokenizer.rs:159-164), while a phrase requires consecutive
    // POSITIONS (positional_intersect/mod.rs:11-35). So phrase ⊆ bigram,
    // with equality except across dropped tokens.
    val sample = turns.flatMap(t => Tokenizer.bigrams(t.text, lemmas))
      .groupBy(_.term).toSeq.sortBy(-_._2.size).take(3).map(_._1)
    assert(sample.nonEmpty)
    sample.foreach { bg =>
      val Array(w1, w2) = bg.split(" ", 2)
      val viaBigram = engine.conjunctive(Seq(bg)).collect().map(_.getLong(0)).toSet
      val viaPhrase = engine.phraseMatch(Seq(w1, w2)).collect().map(_.getLong(0)).toSet
      assert(viaPhrase.subsetOf(viaBigram), s"bigram '$bg' missing phrase docs")
      assert(viaPhrase.nonEmpty && viaBigram.nonEmpty)
      // every doc in the difference has a dropped token between the words
      val docsByConv = turns.map(t => (t.conv_id, t.turn_idx) -> t.text).toMap
      val mapping = engine.docs.collect()
        .map(r => r.getAs[Long]("doc_id") -> ((r.getAs[String]("conv_id"), r.getAs[Int]("turn_idx")))).toMap
      (viaBigram -- viaPhrase).take(3).foreach { d =>
        val text = docsByConv(mapping(d))
        val toks = Tokenizer.tokenize(text, lemmas)
        val surviving = toks.map(_.term)
        val i = surviving.sliding(2).indexWhere(p => p == Seq(w1, w2))
        assert(i >= 0 && toks(i + 1).position - toks(i).position > 1,
          s"doc $d in bigram-only set without a dropped-token gap")
      }
    }
  }

  test("bigram df in dictionary matches scalar count") {
    val bg = turns.flatMap(t => Tokenizer.bigrams(t.text, lemmas))
      .groupBy(_.term).maxBy(_._2.size)._1
    val docsWith = turns.count(t =>
      Tokenizer.bigrams(t.text, lemmas).exists(_.term == bg))
    val entry = engine.lookupTerms(Seq(bg))
    assert(entry.nonEmpty && entry.head.df == docsWith)
  }
}
