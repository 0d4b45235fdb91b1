package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.ops.Dedup

/** CJK tokenizer mode ([[TextFunctions.tokensCjk]] / `tokenMode`) —
  * pins the unigram semantics and the threading through shingles,
  * TF-IDF, BM25, repetition and the dedup entry points: on a CJK
  * corpus the word tokenizer produces NOTHING (Java's ASCII \w) and
  * the cjk mode produces real results.
  */
class CjkTokensSpec extends AnyFunSuite {
  import SparkFixture._

  private def toks(mode: String, ss: String*): Seq[Seq[String]] = {
    val s = spark
    import s.implicits._
    ss.toDF("t")
      .select(TextFunctions.tokensMode(col("t"), mode).as("tk"))
      .collect().map(_.getSeq[String](0).toSeq).toSeq
  }

  test("tokensCjk: han/kana/hangul unigrams + latin/digit word runs, " +
      "document order; ideographic punctuation delimits") {
    assert(toks("cjk",
      "機械学習 deep-learning モデル123",
      "한글과 English mixed",
      "句読点、テスト。end_2") == Seq(
      Seq("機", "械", "学", "習", "deep", "learning", "モ", "デ", "ル",
        "123"),
      Seq("한", "글", "과", "english", "mixed"),
      Seq("句", "読", "点", "テ", "ス", "ト", "end_2")))
    // the word mode on the same inputs: CJK chars are delimiters
    assert(toks("word", "機械学習モデル") == Seq(Seq()))
    assert(toks("word", "機械 deep 学習") == Seq(Seq("deep")))
  }

  test("tokensMode: unknown mode fails loud (silent word fallback " +
      "would reproduce the blind spot)") {
    val e = intercept[IllegalArgumentException] {
      TextFunctions.tokensMode(col("x"), "wrod")
    }
    assert(e.getMessage.contains("wrod"))
  }

  test("shingles in cjk mode: character bigrams over unigram tokens") {
    val s = spark
    import s.implicits._
    val got = Seq("機械学習").toDF("t")
      .select(TextFunctions.shingles(col("t"), 2, "cjk").as("sh"))
      .collect().head.getSeq[String](0).toSeq
    assert(got == Seq("機 械", "械 学", "学 習"))
  }

  private lazy val cjkDocs = {
    val s = spark
    import s.implicits._
    Seq(
      (1L, "機械学習の手法を説明する文書です機械学習"),
      (2L, "機械学習の手法を説明する文書です機械学習だ"), // near-dup of 1
      (3L, "全然別の内容について語る長い記事となります"),
      (4L, "전혀 다른 한국어 문서입니다 기계 학습")
    ).toDF("id", "text")
  }

  test("tfidfTopTerms + bm25TopK in cjk mode return real terms on a " +
      "CJK corpus where word mode returns nothing") {
    val s = spark
    import s.implicits._
    val tfW = TextFunctions.tfidfTopTerms(cjkDocs, "text", "id", 3)
    val tfC = TextFunctions.tfidfTopTerms(cjkDocs, "text", "id", 3,
      tokenMode = "cjk")
    assert(tfW.count() === 0)
    assert(tfC.count() > 0)
    assert(tfC.where(col("word") === "機").count() > 0)
    val queries = Seq((100L, "機械学習")).toDF("qid", "qtext")
    val bmW = TextFunctions.bm25TopK(cjkDocs, "text", "id",
      queries, "qid", "qtext", 3)
    val bmC = TextFunctions.bm25TopK(cjkDocs, "text", "id",
      queries, "qid", "qtext", 3, tokenMode = "cjk")
    assert(bmW.count() === 0)
    val hits = bmC.orderBy(col("rank")).select(col("id")).collect()
      .map(_.getLong(0)).toSeq
    // docs 1/2 carry the query terms twice -> they outrank doc 3;
    // the korean doc shares no term
    assert(hits.nonEmpty && Set(1L, 2L).contains(hits.head))
    assert(!hits.contains(4L))
  }

  test("repetitionStats in cjk mode: repeated han bigram and token " +
      "run are visible; word mode sees nothing") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, "火火火火水")).toDF("id", "text")
    val w = TextFunctions.repetitionStats(df, "text", "id")
      .collect().head
    assert(w.getAs[Long]("max_token_run") === 0L)
    val c = TextFunctions.repetitionStats(df, "text", "id",
        tokenMode = "cjk")
      .collect().head
    assert(c.getAs[Long]("max_token_run") === 4L)
    // bigrams: 火火 ×3 of 4 -> 0.75
    assert(math.abs(c.getAs[Double]("top_bigram_fraction") - 0.75) < 1e-9)
  }

  test("nearDupPairs (minhash LSH) in cjk mode finds the planted CJK " +
      "near-dup the word mode provably misses") {
    val w = Dedup.nearDupPairs(cjkDocs, "text", "id",
      shingleN = 2, minJaccard = 0.7)
    assert(w.count() === 0)
    val c = Dedup.nearDupPairs(cjkDocs, "text", "id",
      shingleN = 2, minJaccard = 0.7, tokenMode = "cjk")
      .select(col("id_a"), col("id_b")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(c == Seq((1L, 2L)))
  }

  test("zero-token docs are excluded from near-dup candidacy (r16 " +
      "finding: the empty-input fallback shingle is a constant that " +
      "made ALL zero-token docs mutual jaccard-1.0 dups)") {
    val s = spark
    import s.implicits._
    // four DISTINCT docs that all tokenize to [] under the word mode:
    // empty, whitespace, punctuation, CJK — none may pair with another
    val zero = Seq((1L, ""), (2L, "   "), (3L, "!!! ???"),
      (4L, "機械学習")).toDF("id", "text")
    assert(Dedup.nearDupPairs(zero, "text", "id",
      shingleN = 2, minJaccard = 0.5).count() === 0)
    assert(Dedup.fuzzyContamination(zero, zero, "text", "id",
      minJaccard = 0.5).count() === 0)
    // zero-token corpus docs report 0 shared n-grams, never a false
    // hit against a zero-token benchmark doc
    val cont = Dedup.ngramContamination(zero, zero, "text", "id", n = 3)
      .where(col("shared_ngrams") > 0).count()
    assert(cont === 0)
    // incremental dedup: a zero-token batch row with a DISTINCT
    // content key survives against a zero-token history doc (layer c
    // must not near-match them); a byte-identical one still dies at
    // the exact layer
    val hist = Seq((10L, "機械学習")).toDF("id", "text")
    val idx = Dedup.buildDedupIndex(hist, "text", "id")
    val batch = Seq((20L, "別物テキスト"), (21L, "機械学習")).toDF("id", "text")
    val survived = Dedup.incrementalDedup(batch, idx, "text", "id")
      .select(col("id")).collect().map(_.getLong(0)).toSeq.sorted
    assert(survived == Seq(20L))
  }
}
