package graft

import org.apache.spark.sql.functions._

import graft.model.VectorModel
import graft.sources.AvroSource

/** Avro source/sink ([[graft.sources.AvroSource]], the avro-mapred seam):
  * lossless round-trip, the fail-loud writer-schema checks (type drift
  * AND missing column — Avro resolution would silently null the latter),
  * and the unsupported-type write guard. The corpus-level aggregate is
  * the driver's DuckDB gate (`src_avro_agg`). */
class AvroSpec extends SparkSpec {
  import spark.implicits._

  test("documents round-trip Avro row-identically") {
    val docs = VectorModel.documents(spark, Sf0001)
    val path = graft.store.Fs.scratchDir(spark, "avro_spec") + "/docs"
    AvroSource.write(docs, path)
    val back = AvroSource.readDocuments(spark, path)
    assert(back.schema.fields.map(f => (f.name, f.dataType)).toSeq ===
      docs.schema.fields.map(f => (f.name, f.dataType)).toSeq)
    val a = docs.collect().map(_.toSeq).toSet
    val b = back.collect().map(_.toSeq).toSet
    assert(a == b && a.nonEmpty)
  }

  test("a type-drifted file fails loudly at the read seam") {
    val path = graft.store.Fs.scratchDir(spark, "avro_spec_bad") + "/docs"
    AvroSource.write(
      VectorModel.documents(spark, Sf0001)
        .withColumn("doc_id", col("doc_id").cast("string")), // upstream drift
      path)
    val e = intercept[IllegalArgumentException] {
      AvroSource.readDocuments(spark, path)
    }
    assert(e.getMessage.contains("doc_id"))
    assert(e.getMessage.contains("LONG"))
  }

  test("a missing canonical column fails loudly instead of resolving to null") {
    val path = graft.store.Fs.scratchDir(spark, "avro_spec_miss") + "/docs"
    AvroSource.write(
      VectorModel.documents(spark, Sf0001).drop("n_chars"), path)
    val e = intercept[IllegalArgumentException] {
      AvroSource.readDocuments(spark, path)
    }
    assert(e.getMessage.contains("n_chars"))
    assert(e.getMessage.contains("missing"))
  }

  test("extra writer columns pass through ignored (open-schema contract)") {
    val path = graft.store.Fs.scratchDir(spark, "avro_spec_extra") + "/docs"
    val docs = VectorModel.documents(spark, Sf0001)
    AvroSource.write(docs.withColumn("extra", lit(7L)), path)
    val back = AvroSource.readDocuments(spark, path)
    assert(back.columns.toSeq === docs.columns.toSeq)
    assert(back.count() === docs.count())
  }

  test("an unsupported column type fails the WRITE loudly, not stringified") {
    val df = Seq((1L, Seq(1.0, 2.0))).toDF("doc_id", "vec")
    val e = intercept[IllegalArgumentException] {
      AvroSource.write(df, graft.store.Fs.scratchDir(spark, "avro_spec_arr") + "/x")
    }
    assert(e.getMessage.contains("vec"))
  }
}
