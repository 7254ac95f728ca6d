package graft

import org.apache.spark.sql.functions._

import graft.text.TextAnalysis

/** The CJK dictionary seam past literal arrays: the broadcast-kernel FMM
  * ([[TextAnalysis.cjkTokensDictBig]]) must produce IDENTICAL tokens to
  * the literal-array path for the same dictionary, its plan must stay
  * O(1) in dictionary size, and the auto chooser must pick the right
  * side of the [[TextAnalysis.CjkDictInlineMax]] threshold. */
class CjkDictSpec extends SparkSpec {

  private val fixture = Seq(
    "向量数据库支持高效相似度搜索",
    "分布式计算引擎处理大规模数据",
    "机器学习模型需要大量训练数据 and mixed latin text",
    "去重管道是关键步骤",
    "倒排索引加速关键词检索",
    "abc数据xyz", // mixed-script single token: singles around a dict hit
    "短", // single char, no dict hit
    "数据库") // exact dict word, token == word

  private def df = {
    import spark.implicits._
    fixture.toDF("text")
  }

  private def tokensOf(c: org.apache.spark.sql.Column): Seq[Seq[String]] =
    df.select(c.as("t")).collect().map(_.getSeq[String](0).toSeq).toSeq

  /** Driver-side expected value: whitespace split, CJK-containing tokens
    * through [[TextAnalysis.fmmSegment]], others pass through. */
  private def expected(dict: Set[String]): Seq[Seq[String]] =
    fixture.map(_.split(" ", -1).toSeq.flatMap { t =>
      if (t.exists(ch => ch >= '一' && ch <= '鿿')) TextAnalysis.fmmSegment(t, dict)
      else Seq(t)
    })

  test("broadcast-kernel FMM tokens == literal-array FMM tokens == driver mirror (same dict)") {
    val lit = tokensOf(TextAnalysis.cjkTokensDict(col("text")))
    val big = tokensOf(TextAnalysis.cjkTokensDictBig(col("text"), TextAnalysis.CjkDict))
    val exp = expected(TextAnalysis.CjkDict.toSet)
    assert(big === lit)
    assert(big === exp)
  }

  test("jieba-scale dictionary: bounded plan, identical tokens where the dicts agree") {
    // a synthetic 20k-word dictionary containing the curated words —
    // far past anything the literal path could inline
    val bigDict = TextAnalysis.CjkDict ++ (0 until 20000).map { i =>
      val a = ('一' + (i % 4000)).toChar
      val b = ('一' + ((i * 7 + 13) % 4000)).toChar
      s"$a${b}龿" // 3-char words ending in a rare char: no fixture hits
    }
    val bigCol = TextAnalysis.cjkTokensDictBig(col("text"), bigDict)
    // plan size is O(1) in the dictionary: the 20k-word plan must not be
    // meaningfully larger than the 29-word literal plan (which inlines
    // every word into every candidate check)
    val bigPlan = df.select(bigCol).queryExecution.analyzed.toString
    val litPlan = df.select(TextAnalysis.cjkTokensDict(col("text")))
      .queryExecution.analyzed.toString
    assert(bigPlan.length < litPlan.length,
      s"broadcast plan ${bigPlan.length} chars vs literal ${litPlan.length}")
    // none of the synthetic words occur in the fixture, so tokens must
    // equal the curated-dict segmentation exactly
    assert(tokensOf(bigCol) === expected(TextAnalysis.CjkDict.toSet))
  }

  test("auto chooser: literal plan under the threshold, kernel plan past it") {
    val small = df.select(TextAnalysis.cjkTokensDictAuto(col("text")))
      .queryExecution.analyzed.toString
    assert(small.contains("array_contains") && !small.contains("cjk_fmm"))
    val over = TextAnalysis.CjkDict ++ (0 until TextAnalysis.CjkDictInlineMax)
      .map(i => s"${('一' + i).toChar}龿")
    val large = df.select(TextAnalysis.cjkTokensDictAuto(col("text"), over))
      .queryExecution.analyzed.toString
    assert(large.contains("cjk_fmm"))
  }
}
