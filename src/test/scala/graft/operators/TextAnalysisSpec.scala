package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("tokenCount and bpeishTokenCount") {
    val df = Seq("the cat  sat", "hello, world!").toDF("text")
    val out = df.select(
      TextAnalysis.tokenCount(col("text")).as("n"),
      TextAnalysis.bpeishTokenCount(col("text")).as("b")).collect()
    assert(out(0).getInt(0) == 3) // double space collapses
    assert(out(1).getInt(0) == 2)
    assert(out(1).getInt(1) == 4) // hello , world !
  }

  test("langId picks the language with most marker words") {
    val df = Seq(
      "the cat is in the house and a dog",
      "el perro y la casa en los campos",
      "le chat et les maisons des villes",
      "der hund ist ein tier und das haus",
      "zzz qqq xxx"
    ).toDF("text")
    val langs = df.select(TextAnalysis.langId(col("text"))).as[String].collect().toSeq
    assert(langs == Seq("en", "es", "fr", "de", "und"))
  }

  test("qualityScore fields on a known sentence") {
    val df = Seq((1L, "the quick fox!")).toDF("doc_id", "text")
    val r = TextAnalysis.qualityScore(df, "text").head()
    assert(r.getAs[Int]("n_chars_q") == 14)
    assert(r.getAs[Int]("n_words") == 3)
    assert(r.getAs[Double]("stopword_ratio") == 0.3333) // "the" of 3
    assert(r.getAs[Double]("punct_ratio") == 0.0714)    // 1 of 14
  }

  test("fingerprint: order-sensitive, exact-dup stable") {
    val df = Seq((1L, "alpha beta gamma"), (2L, "alpha beta gamma"),
      (3L, "gamma beta alpha")).toDF("id", "text")
    val fp = df.select(col("id"), TextAnalysis.fingerprint(col("text")).as("f"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fp(1L) == fp(2L))
    assert(fp(1L) != fp(3L))
  }

  test("unigramLogProbScore: hand-computed means, OOV floor, in-vocab passthrough") {
    // counts: a=2, b=2, c=1; total=5; vocab(top-2, ties on token) = {a, b}
    val docs = Seq((1L, "a a b"), (2L, "b c")).toDF("doc_id", "text")
    val out = TextAnalysis.unigramLogProbScore(docs, "doc_id", "text", vocabSize = 2)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out(1L) == BigDecimal(math.log(0.4))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    val d2 = (math.log(2d / 5) + math.log(0.5 / 5)) / 2
    assert(out(2L) == BigDecimal(d2).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    // with the whole vocab in range, no OOV floor applies anywhere
    val full = TextAnalysis.unigramLogProbScore(docs, "doc_id", "text", vocabSize = 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val d2full = (math.log(2d / 5) + math.log(1d / 5)) / 2
    assert(full(2L) == BigDecimal(d2full).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("ngramDocFreqTopK counts document frequency with deterministic tie order") {
    val docs = Seq(
      (1L, "a b c"), (2L, "a b d"), (3L, "z")).toDF("doc_id", "text")
    val out = TextAnalysis.ngramDocFreqTopK(docs, "text", k = 2, topK = 2)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    // "a b" in two docs; ties at df=1 break on ngram asc → "b c" first
    assert(out.toSeq == Seq(("a b", 2L), ("b c", 1L)))
  }

  test("linearClassifierScore: hand-computed sigmoid, null text, shuffle-free plan") {
    // weight of token t = w(hashBucket256(t, seed)); recompute the bucket
    // on the driver through the same md5-nibble arithmetic
    def bucket(tok: String, seed: String): Int = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest((seed + tok).getBytes("UTF-8"))
      val hex = md.map("%02x".format(_)).mkString
      "0123456789abcdef".indexOf(hex(0)) * 16 + "0123456789abcdef".indexOf(hex(1))
    }
    val weights = Array.tabulate(256)(b => b / 256.0 - 0.5)
    val docs = Seq(
      (1L, Option("alpha beta beta")), (2L, Option.empty[String]))
      .toDF("doc_id", "text")
    val out = TextAnalysis.linearClassifierScore(docs, "text", weights,
        bias = 0.25, seed = "s1")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(r.fieldIndex("clf_score"))) None
         else Some(r.getDouble(r.fieldIndex("clf_score"))))).toMap
    val pooled = (weights(bucket("alpha", "s1")) + 2 * weights(bucket("beta", "s1"))) / 3
    val expect = 1.0 / (1.0 + math.exp(-(0.25 + pooled)))
    assert(math.abs(out(1L).get - expect) < 1e-12,
      s"doc 1 must score the hand-computed sigmoid, got ${out(1L)}")
    assert(out(2L).isEmpty, "null text must score null, not bias-only")
    // scale promise: inference is row-local — no Exchange anywhere
    val plan = TextAnalysis.linearClassifierScore(docs, "text", weights, 0.0)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"classifier inference must not shuffle:\n$plan")
    intercept[IllegalArgumentException] {
      TextAnalysis.linearClassifierScore(docs, "text", Array(1.0), 0.0)
    }
  }

  test("bigramLogProbScore: context-aware (scrambled word salad scores below fluent text)") {
    // 20 copies of a fluent sentence dominate the bigram table; one doc
    // reuses EXACTLY the same words in a novel order — identical unigram
    // distribution, unseen bigrams. The unigram score cannot tell them
    // apart; the bigram score must.
    val fluent = "the cat sat on the mat"
    val salad = "mat the on sat cat the"
    val docs = (1L to 20L).map(i => (i, fluent)) :+ (21L, salad)
    val df = docs.toDF("doc_id", "text")
    val bi = TextAnalysis.bigramLogProbScore(df, "doc_id", "text",
        vocabSize = 16, bigramTopB = 64)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(bi(1L) == bi(2L), "identical docs score identically")
    assert(bi(1L) > bi(21L),
      s"fluent ${bi(1L)} must beat scrambled ${bi(21L)} under bigram scoring")
    val uni = TextAnalysis.unigramLogProbScore(df, "doc_id", "text", vocabSize = 16)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(uni(1L) == uni(21L),
      "unigram scoring is blind to order — the bigram upgrade is the point")
    // single-token and null-text contracts follow the unigram operator
    val edge = Seq((1L, "hello"), (2L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val e = TextAnalysis.bigramLogProbScore(edge, "doc_id", "text",
        vocabSize = 4, bigramTopB = 4)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(e.contains(1L) && !e.contains(2L))
    intercept[IllegalArgumentException] {
      TextAnalysis.bigramLogProbScore(df, "doc_id", "text", alpha = 0.0)
    }
  }

  test("topVocab mg path equals exact; LM scores identical under either vocab") {
    // Zipf head: "alpha" everywhere, "beta" in half, tail singletons —
    // the top-2 frequencies clear n/budget by orders of magnitude
    val docs = (1 to 120).map { i =>
      (i.toLong, s"alpha ${if (i % 2 == 0) "beta" else s"tail$i"} alpha word$i")
    }.toDF("doc_id", "text")
    val exact = TextAnalysis.topVocab(docs, "text", 2, via = "exact")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val mg = TextAnalysis.topVocab(docs, "text", 2, via = "mg", mgBudget = 256)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(mg == exact, s"mg $mg vs exact $exact")
    // the scorer is vocab-path-agnostic when the guarantee holds
    def score(via: String) = TextAnalysis.unigramLogProbScore(
        docs, "doc_id", "text", vocabSize = 2, vocabVia = via)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(score("mg") == score("exact"))
    intercept[IllegalArgumentException] {
      TextAnalysis.topVocab(docs, "text", 2, via = "bogus")
    }
  }

  test("trainTextClassifier: converges on separable text and serves via clf_score") {
    val docs = (1 to 200).map { i =>
      if (i % 2 == 0) (i.toLong, s"buy cheap pills now offer $i click win prize", 1)
      else (i.toLong, s"the quiet study of rivers and mountains $i continues", 0)
    }.toDF("doc_id", "text", "label")
    val (w, b, losses) = TextAnalysis.trainTextClassifier(
      docs, "text", "label", iters = 30, lr = 2.0)
    assert(w.length == 256)
    // first loss is the zero model's ln 2; a decreasing tail is the
    // convergence certificate
    assert(math.abs(losses.head - math.log(2)) < 1e-9)
    assert(losses.sliding(2).forall(p => p(1) <= p(0) + 1e-9),
      s"loss must not climb: $losses")
    assert(losses.last < 0.4, s"should fit separable data, loss=${losses.last}")
    // the learned model, served through the SAME native clf_score path,
    // separates the classes with a clean margin
    val scored = TextAnalysis.linearClassifierScore(docs, "text", w, b)
      .select(col("label"), col("clf_score"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1))
    val spamMin = scored.filter(_._1 == 1).map(_._2).min
    val hamMax = scored.filter(_._1 == 0).map(_._2).max
    assert(spamMin > hamMax,
      s"classes must separate: min(spam)=$spamMin max(ham)=$hamMax")
    assert(spamMin > 0.5 && hamMax < 0.5)
  }

  test("trainTextClassifier: drops null/token-less rows, validates args") {
    val docs = Seq(
      (1L, "alpha beta", 1), (2L, null.asInstanceOf[String], 0),
      (3L, "gamma delta", 0)).toDF("doc_id", "text", "label")
    // the null-text row carries no features; training still runs on the rest
    val (w, b, losses) = TextAnalysis.trainTextClassifier(
      docs, "text", "label", iters = 2)
    assert(losses.size == 2 && w.length == 256)
    assert(!b.isNaN && w.forall(!_.isNaN))
    intercept[IllegalArgumentException] {
      TextAnalysis.trainTextClassifier(docs, "text", "label", iters = 0)
    }
    intercept[IllegalArgumentException] {
      TextAnalysis.trainTextClassifier(docs, "text", "label", lr = 0.0)
    }
    intercept[IllegalArgumentException] {
      TextAnalysis.trainTextClassifier(
        docs.filter(col("doc_id") < 0), "text", "label")
    }
  }
}
