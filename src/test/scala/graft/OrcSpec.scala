package graft

import org.apache.spark.sql.functions._

import graft.model.VectorModel
import graft.sources.OrcSource

/** ORC source/sink ([[graft.sources.OrcSource]]): lossless round-trip and
  * the fail-loud schema seam. The corpus-level aggregate is the driver's
  * DuckDB gate (`src_orc_agg`). */
class OrcSpec extends SparkSpec {

  test("documents round-trip ORC row-identically") {
    val docs = VectorModel.documents(spark, Sf0001)
    val path = graft.store.Fs.scratchDir(spark, "orc_spec") + "/docs"
    OrcSource.write(docs, path)
    val back = OrcSource.readDocuments(spark, path)
    assert(back.schema == docs.schema)
    val a = docs.collect().map(_.toSeq).toSet
    val b = back.collect().map(_.toSeq).toSet
    assert(a == b && a.nonEmpty)
  }

  test("a type-drifted file fails loudly at the read seam") {
    val path = graft.store.Fs.scratchDir(spark, "orc_spec_bad") + "/docs"
    VectorModel.documents(spark, Sf0001)
      .withColumn("doc_id", col("doc_id").cast("int")) // upstream drift
      .write.mode("overwrite").orc(path)
    val e = intercept[IllegalArgumentException] {
      OrcSource.readDocuments(spark, path)
    }
    assert(e.getMessage.contains("doc_id"))
  }
}
