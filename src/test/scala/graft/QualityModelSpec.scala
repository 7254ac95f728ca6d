package graft

import org.apache.spark.sql.functions._

import graft.model.VectorModel
import graft.text.QualityModel

/** Gates the SPEC-GATED half of tx_quality_model — that training actually
  * learned the planted fixture (held-out generalization, not memorization)
  * — plus the quantized-serving invariants the oracle leans on. */
class QualityModelSpec extends SparkSpec {

  private lazy val docs =
    VectorModel.documents(spark, Sf0001).select("doc_id", "text")
  private lazy val model = QualityModel.train(docs)

  test("model shape: D weights, bounded magnitudes, intercept finite") {
    assert(model.wq.length === QualityModel.D)
    // regularized fit on tf features: fixed-point weights stay far inside
    // the Long headroom the serving sum assumes
    assert(model.wq.forall(w => math.abs(w) < (1L << 40)))
    assert(model.wq.exists(_ != 0L), "degenerate all-zero model")
  }

  test("held-out split: originals score positive, reversed negative") {
    val holdout = docs.where(!QualityModel.trainFilter(col("doc_id")))
    val nHold = holdout.count()
    assert(nHold > 50, s"held-out sample too small: $nHold")
    val pos = QualityModel.score(holdout, model)
    val neg = QualityModel.score(
      holdout.select(col("doc_id"), reverse(col("text")).as("text")), model)
    val posAcc = pos.where(col("is_quality") === 1L).count().toDouble / nHold
    val negAcc = neg.where(col("is_quality") === 0L).count().toDouble / nHold
    assert(posAcc >= 0.95, s"held-out positive accuracy $posAcc < 0.95")
    assert(negAcc >= 0.95, s"held-out negative accuracy $negAcc < 0.95")
  }

  test("scores are the quantized closed form (driver-side recompute)") {
    val sample = docs.orderBy("doc_id").limit(20).collect()
    val got = QualityModel.score(docs, model)
      .orderBy("doc_id").limit(20).collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2))).toMap
    sample.foreach { r =>
      val toks = r.getString(1).split(" ", -1)
      val dot = toks.map { t =>
        val md5 = java.security.MessageDigest.getInstance("MD5")
          .digest(t.getBytes("UTF-8")).map("%02x".format(_)).mkString
        model.wq((java.lang.Long.parseLong(md5.take(15), 16) % QualityModel.D).toInt)
      }.sum
      val logit = (model.bq.toDouble + dot.toDouble / toks.length.toDouble) /
        QualityModel.Scale
      val (gLogit, gQ) = got(r.getLong(0))
      assert(gLogit === logit, s"doc ${r.getLong(0)}: $gLogit vs $logit")
      assert(gQ === (if (logit > 0.0) 1L else 0L))
    }
  }

  test("scoring every document classifies the corpus as quality") {
    val scored = QualityModel.score(docs, model)
    assert(scored.count() === docs.count())
    val frac = scored.where(col("is_quality") === 1L).count().toDouble /
      scored.count()
    assert(frac >= 0.95, s"only $frac of real docs classified quality")
  }
}
