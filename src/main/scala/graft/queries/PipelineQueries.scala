package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.model.VectorModel
import graft.text.TextAnalysis

/** The composed training-data cleaning pipeline — the end-to-end shape the
  * individual operators exist for: exact dedup (keep first copy) → quality
  * floor → language filter. One oracle-backed query proves the operators
  * compose without semantic drift.
  *
  * Pipeline order matters at scale: exact dedup first (cheapest shuffle,
  * biggest row reduction on crawl data), then pure-expression filters
  * (no shuffle at all), leaving fuzzy dedup/embedding stages the smallest
  * candidate set. */
object PipelineQueries {

  val QualityFloor = 0.5

  def cleanCorpus(spark: SparkSession, dir: String): DataFrame = {
    val docs = VectorModel.documents(spark, dir)
    val keepers = Dedup.exactGroups(docs, "doc_id", "text").select(col("keeper").as("doc_id"))
    docs
      .join(keepers, Seq("doc_id"), "left_semi")
      .where(TextAnalysis.qualityScore(col("text")) >= QualityFloor)
      .where(TextAnalysis.langId(col("text")) === "en")
      .select(
        col("doc_id"),
        round(TextAnalysis.qualityScore(col("text")), 6).as("quality"),
        TextAnalysis.tokenCount(col("text")).cast("long").as("n_tokens"))
      .orderBy("doc_id")
  }

  val cleanCorpusSql: String = {
    val nTok = "CAST(len(string_split(text, ' ')) AS DOUBLE)"
    def markerCount(markers: Seq[String]): String =
      s"len(list_filter(string_split(text, ' '), t -> t IN (${markers.map(m => s"'$m'").mkString(", ")})))"
    val stopRatio = s"CAST(${markerCount(TextAnalysis.Stopwords)} AS DOUBLE) / $nTok"
    val lenFactor = s"least($nTok / CAST('100.0' AS DOUBLE), CAST('1.0' AS DOUBLE))"
    val quality = s"(CAST('1.0' AS DOUBLE) - $stopRatio) * $lenFactor"
    val scores = TextAnalysis.LangMarkers.map { case (lang, markers) => lang -> markerCount(markers) }
    val allZero = scores.map { case (_, s) => s"$s = 0" }.mkString(" AND ")
    val chain = scores.zipWithIndex.map { case ((lang, s), i) =>
      scores.drop(i + 1).map(_._2) match {
        case Seq() => s"ELSE '$lang'"
        case Seq(only) => s"WHEN $s >= $only THEN '$lang'"
        case many => s"WHEN $s >= greatest(${many.mkString(", ")}) THEN '$lang'"
      }
    }
    val langPred = s"CASE WHEN $allZero THEN 'und' ${chain.init.mkString(" ")} ${chain.last} END"
    s"""WITH keepers AS (SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text))
       |SELECT doc_id, round($quality, 6) AS quality,
       |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
       |FROM documents
       |WHERE doc_id IN (SELECT doc_id FROM keepers)
       |  AND $quality >= CAST('$QualityFloor' AS DOUBLE)
       |  AND $langPred = 'en'
       |ORDER BY doc_id""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "pipe_clean_corpus" -> (cleanCorpus _))

  val oracleSql: Map[String, String] = Map(
    "pipe_clean_corpus" -> cleanCorpusSql)
}
