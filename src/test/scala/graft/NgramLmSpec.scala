package graft

import org.apache.spark.sql.functions._

import graft.model.VectorModel
import graft.text.NgramLm

/** Gates the SPEC-GATED half of tx_perplexity / pipe_perplexity_gate —
  * that the reference-trained bigram LM actually SEPARATES in-domain from
  * off-domain text (the semantic claim no arithmetic oracle can check) —
  * plus the serving invariants the hash gate leans on. */
class NgramLmSpec extends SparkSpec {

  import spark.implicits._

  // planted two-domain fixture: the reference speaks in a small repeated
  // phrase family; off-domain docs draw from a disjoint vocabulary with
  // no repeated bigrams
  private lazy val reference = (0 until 60).map { i =>
    (i.toLong, s"the quick fox jumps over the lazy dog ${i % 3} and the fox runs")
  }.toDF("doc_id", "text")
  private lazy val inDomain = (100 until 120).map { i =>
    (i.toLong, s"the quick fox jumps over the lazy dog ${i % 3}")
  }.toDF("doc_id", "text")
  private lazy val offDomain = (200 until 220).map { i =>
    (i.toLong, s"zx$i qq${i * 7} ww${i * 13} ee${i * 29} rr${i * 31} tt${i * 37}")
  }.toDF("doc_id", "text")
  private lazy val model = NgramLm.fit(reference)

  test("planted fixture: every in-domain doc scores under every off-domain doc") {
    val in = NgramLm.score(inDomain, model).select("nats").as[Double].collect()
    val off = NgramLm.score(offDomain, model).select("nats").as[Double].collect()
    assert(in.nonEmpty && off.nonEmpty)
    assert(in.max < off.min,
      s"no separation: in-domain max ${in.max} vs off-domain min ${off.min}")
  }

  test("no-bigram docs carry the empty-product (0, 0, 0.0)") {
    val rows = NgramLm.score(
      Seq((1L, ""), (2L, "single"), (3L, "two tokens")).toDF("doc_id", "text"),
      model)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows(0) === ((1L, 0L, 0L, 0.0)))
    assert(rows(1) === ((2L, 0L, 0L, 0.0)))
    assert(rows(2)._2 === 1L)
    assert(rows(2)._4 > 0.0)
  }

  test("corpus entry: reference language passes the gate at a higher rate") {
    val rows = graft.queries.PipelineQueries.perplexityGate(spark, Sf001)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(3))).toMap
    val (enDocs, enKept) = rows(graft.queries.TextQueries.LmReferenceLang)
    val enRate = enKept.toDouble / enDocs
    rows.removed(graft.queries.TextQueries.LmReferenceLang).foreach {
      case (lang, (n, kept)) =>
        val rate = kept.toDouble / n
        assert(rate < enRate,
          s"$lang keep rate $rate not under reference rate $enRate")
    }
    assert(enRate >= 0.6, s"reference keep rate $enRate implausibly low")
  }

  test("scores are the quantized closed form (driver-side recompute)") {
    val sample = inDomain.limit(5).collect().map(r => r.getLong(0) -> r.getString(1))
    val got = NgramLm.score(inDomain, model).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    def bucket(t: String): Int = {
      val md5 = java.security.MessageDigest.getInstance("MD5")
        .digest(s"lm:$t".getBytes("UTF-8")).map("%02x".format(_)).mkString
      (java.lang.Long.parseLong(md5.take(15), 16) % NgramLm.B).toInt
    }
    sample.foreach { case (id, text) =>
      val toks = text.split(" ", -1)
      val qs = toks.sliding(2).map { case Array(t1, t2) =>
        val b = (bucket(t1), bucket(t2))
        model.pairs.getOrElse(b, model.ctxDefault(b._1))
      }.toSeq
      assert(got(id) === ((qs.length.toLong, qs.sum)),
        s"doc $id: engine ${got(id)} vs recomputed (${qs.length}, ${qs.sum})")
    }
  }

  test("deterministic: refit and rescore are value-identical") {
    val m2 = NgramLm.fit(reference)
    assert(m2.pairs === model.pairs)
    assert(m2.ctxDefault.toSeq === model.ctxDefault.toSeq)
    val a = NgramLm.score(inDomain, model).orderBy("doc_id").collect().toSeq
    val b = NgramLm.score(inDomain, m2).orderBy("doc_id").collect().toSeq
    assert(a === b)
  }
}
