package graft

import org.apache.spark.sql.functions._
import graft.functions.Bpe
import graft.ops.TextOps

/** Corpus-independent semantics of the BPE tokenizer (learner + greedy
  * encoder) — the algorithmic goldens backing the pinned `q_token_bpe`
  * oracle, the same discipline as the simhash/winnow suites.
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("learner reproduces the published example's merge order") {
    // Sennrich et al. 2016, section 3.2: {low x5, lower x2, newest x6,
    // widest x3}. Weighted pair counts put (e,s) and (s,t) first at 9;
    // the deterministic lexicographic tie-break picks (e,s), after which
    // ("es","t") merges at 9 and then ("est" pairs follow.
    val merges = Bpe.learn(
      Seq(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L)),
      numMerges = 4
    )
    assert(merges.head == ("e", "s"))
    assert(merges(1) == ("es", "t"))
    // 'est' now behaves as one symbol: "newest" ends in the learned unit
    val ranks = merges.take(2)
    assert(Bpe.encode("newest", ranks) == Seq("n", "e", "w", "est"))
  }

  test("encoding round-trips: concatenated tokens equal the original text") {
    val merges = Bpe.learn(
      Seq(("hello", 10L), ("help", 4L), ("world", 7L), (" the", 12L)),
      numMerges = 20
    )
    val texts = Seq(
      "hello world, the helper said hello",
      "  leading and   irregular   whitespace\nnewlines\ttabs",
      "digits 12345 and punct!!! mixed-case CamelCase it's don't",
      "unicode: café naïve 中文 emoji 😀 end",
      ""
    )
    texts.foreach { t =>
      assert(Bpe.encode(t, merges).mkString == t, s"round-trip failed for: $t")
      assert(Bpe.encode(t, Nil).mkString == t, s"0-merge round-trip: $t")
    }
  }

  test("token count is monotonically non-increasing in the merge count") {
    val corpus = Seq(
      ("the", 50L), ("thesis", 5L), ("then", 9L), ("therefore", 3L),
      ("cat", 7L), ("cats", 6L), ("catalog", 2L)
    )
    val all = Bpe.learn(corpus, numMerges = 30)
    val text = "the thesis then said: therefore the cats catalog cats"
    val counts = (0 to all.size).map(k => Bpe.encode(text, all.take(k)).size)
    counts.sliding(2).foreach { case Seq(a, b) =>
      assert(b <= a, s"count increased when adding a merge: $counts")
    }
    // with zero merges every token is a single code point of a word piece
    assert(
      counts.head ==
        Bpe.pretokenize(text).map(w => w.codePointCount(0, w.length)).sum
    )
  }

  test("wire form round-trips and the native expression matches driver encode") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "pack my box with five dozen liquor jugs, quickly!"),
      (3L, "the the the thesis therefore then"),
      (4L, ""),
      (5L, "café 中文 123 it's")
    ).toDF("doc_id", "text")
    val merges = TextOps.learnBpe(docs, "text", numMerges = 50)
    assert(Bpe.decodeMerges(Bpe.encodeMerges(merges)) == merges)

    graft.functions.GraftFunctions.register(spark)
    val got = docs
      .select(col("doc_id"), TextOps.bpeTokenCount(col("text"), merges).as("n"))
      .as[(Long, Int)]
      .collect()
      .toMap
    Seq(
      1L -> "the quick brown fox jumps over the lazy dog",
      2L -> "pack my box with five dozen liquor jugs, quickly!",
      3L -> "the the the thesis therefore then",
      4L -> "",
      5L -> "café 中文 123 it's"
    ).foreach { case (id, t) =>
      assert(got(id) == Bpe.encode(t, merges).size, s"doc $id")
    }
  }

  test("learnBpe is deterministic across invocations") {
    val docs = (0 until 50)
      .map(i => (i.toLong, s"sample document number $i with shared shared words word$i"))
      .toDF("doc_id", "text")
    val m1 = TextOps.learnBpe(docs, "text", numMerges = 40)
    val m2 = TextOps.learnBpe(docs.repartition(7), "text", numMerges = 40)
    assert(m1 == m2)
    assert(m1.nonEmpty)
  }
}
