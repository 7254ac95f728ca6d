package graft

import org.apache.spark.sql.functions._

import graft.model.VectorModel
import graft.text.{LangIdModel, QualityModel, TextAnalysis}

/** Gates the SPEC-GATED half of tx_langid_model — that training actually
  * learned the planted multilingual fixture (held-out generalization) —
  * plus the quantized-serving invariants the oracle leans on and the
  * agreement report vs the heuristic `tx_langid`. */
class LangIdModelSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs =
    VectorModel.documents(spark, Sf0001).select("doc_id", "text")
  private lazy val model = LangIdModel.train(docs)

  test("model shape: one bounded weight table per language, no degenerate class") {
    assert(model.wq.keySet === LangIdModel.Langs.toSet)
    model.wq.foreach { case (l, w) =>
      assert(w.length === LangIdModel.D)
      // log-probabilities of a smoothed multinomial: strictly negative,
      // far inside the Long headroom the integer dot assumes
      assert(w.forall(x => x < 0L && math.abs(x) < (1L << 32)), s"class $l")
      assert(w.distinct.length > 1, s"degenerate flat class $l")
    }
  }

  test("held-out langified fixture classifies at >= 95% accuracy per language") {
    val holdout = docs.where(!QualityModel.trainFilter(col("doc_id")))
    val nHold = holdout.count()
    assert(nHold > 10, s"held-out sample too small: $nHold")
    LangIdModel.Langs.foreach { l =>
      val fixture = holdout.select(col("doc_id"),
        LangIdModel.langify(col("text"), l).as("text"))
      val got = LangIdModel.classify(fixture, model)
      val acc = got.where(col("lang") === l).count().toDouble / nHold
      assert(acc >= 0.95, s"held-out accuracy for $l: $acc < 0.95")
    }
  }

  test("serving is the quantized closed form (driver-side recompute)") {
    val sample = docs.orderBy("doc_id").limit(10).collect()
    val got = LangIdModel.classify(docs, model)
      .orderBy("doc_id").limit(10).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    sample.foreach { r =>
      val prefix = r.getString(1).take(LangIdModel.PrefixChars)
      val grams =
        if (prefix.length < LangIdModel.GramLen) Seq.empty[String]
        else (0 to prefix.length - LangIdModel.GramLen)
          .map(i => prefix.substring(i, i + LangIdModel.GramLen))
      val scores = LangIdModel.Langs.map { l =>
        l -> grams.map { g =>
          val md5 = java.security.MessageDigest.getInstance("MD5")
            .digest(g.getBytes("UTF-8")).map("%02x".format(_)).mkString
          model.wq(l)(
            (java.lang.Long.parseLong(md5.take(15), 16) % LangIdModel.D).toInt)
        }.sum
      }
      val expect =
        if (grams.isEmpty) ("und", 0L)
        else scores.maxBy { case (l, s) =>
          (s, -LangIdModel.Langs.indexOf(l))
        }
      assert(got(r.getLong(0)) === expect, s"doc ${r.getLong(0)}")
    }
  }

  test("no-trigram documents verdict 'und' at score 0") {
    val tiny = Seq((1L, "ab"), (2L, ""), (3L, "abc")).toDF("doc_id", "text")
    val got = LangIdModel.classify(tiny, model)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(got(1L) === (("und", 0L)))
    assert(got(2L) === (("und", 0L)))
    assert(got(3L)._1 !== "und") // exactly one trigram — classified
  }

  test("agreement report vs the heuristic langId on the corpus") {
    val learned = LangIdModel.classify(docs, model)
      .select(col("doc_id"), col("lang").as("learned"))
    val heuristic = docs.select(col("doc_id"),
      TextAnalysis.langId(col("text")).as("heur"))
    val joined = learned.join(heuristic, "doc_id").cache()
    try {
      val n = joined.count()
      val agree = joined.where(col("learned") === col("heur")).count()
      val decided = joined.where(col("heur") =!= "und")
      val nDec = decided.count()
      val agreeDec =
        decided.where(col("learned") === col("heur")).count()
      info(f"overall agreement ${agree.toDouble / n}%.3f ($agree/$n); " +
        f"on heuristic-decided docs ${agreeDec.toDouble / math.max(nDec, 1)}%.3f ($agreeDec/$nDec)")
      // the corpus is English-dominant: where the heuristic is confident
      // (non-und), the learned model should broadly concur — a REPORTED
      // floor, not a tight gate (the two detectors are different designs)
      assert(nDec > 0)
      assert(agreeDec.toDouble / nDec >= 0.7,
        s"learned model agrees with the heuristic on only $agreeDec/$nDec decided docs")
    } finally { joined.unpersist(); () }
  }
}
