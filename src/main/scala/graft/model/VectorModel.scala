package graft.model

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Canonical vector-record data model.
  *
  * The reference engine holds a single collection of float32 vectors with a
  * string id and dynamic metadata (vervectordb/__init__.py:221-245). Here the
  * canonical shape is a DataFrame:
  *
  *   (id LONG, vector ARRAY<DOUBLE>, category STRING, status STRING)
  *
  * Ids are deterministic (derived from row keys) instead of the reference's
  * uuid4 (vervectordb/__init__.py:251) so results are reproducible and
  * oracle-comparable. The test vectors are derived with pure arithmetic from
  * `lineitem` columns so a DuckDB oracle recomputes bit-identical inputs
  * (FIXTURES.md §A). At production scale the same schema holds real
  * embeddings (see the `embeddings` table: vec_id, embedding ARRAY<FLOAT>).
  */
object VectorModel {

  /** Dimensionality of the lineitem-derived test vectors. */
  val Dim = 8

  def lineitem(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/lineitem.parquet")

  /** Deterministic vector view over lineitem. Every component is pure
    * double arithmetic over stored columns — identically recomputable in
    * DuckDB SQL ([[OracleSql.vectorCte]]). The id is a bijective packing of
    * (orderkey, linenumber, partkey, suppkey, quantity) — verified unique at
    * every scale factor. */
  def lineitemVectors(spark: SparkSession, sfDir: String): DataFrame =
    lineitem(spark, sfDir).select(
      (((col("l_orderkey") * 8 + col("l_linenumber")) * 32768 + col("l_partkey")) * 131072
        + col("l_suppkey") * 64 + col("l_quantity").cast("long")).as("id"),
      array(
        col("l_quantity").cast("double"),
        col("l_extendedprice") / 1000.0,
        col("l_discount") * 10.0,
        col("l_tax") * 10.0,
        (col("l_partkey") % 97).cast("double") / 97.0,
        (col("l_suppkey") % 89).cast("double") / 89.0,
        (col("l_orderkey") % 83).cast("double") / 83.0,
        col("l_linenumber").cast("double")
      ).as("vector"),
      col("l_returnflag").as("category"),
      col("l_linestatus").as("status"))

  /** Fixed flagship query vector (all components dyadic rationals, so the
    * SQL literal text parses to the identical double in any engine). */
  val Query: Seq[Double] = Seq(25.0, 30.0, 0.5, 0.5, 0.5, 0.5, 0.5, 3.0)

  /** A small deterministic set of query vectors derived from `part`
    * (the multi-query/batch-search input, SURVEY.md S4). */
  def partQueries(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/part.parquet")
      .where(col("p_partkey") <= 5)
      .select(
        col("p_partkey").as("query_id"),
        array(
          col("p_size").cast("double"),
          col("p_retailprice") / 100.0,
          (col("p_partkey") % 97).cast("double") / 97.0,
          (col("p_partkey") % 89).cast("double") / 89.0,
          (col("p_partkey") % 83).cast("double") / 83.0,
          lit(1.0), lit(2.0), lit(3.0)
        ).as("qvec"))

  /** Deterministic LARGE query batch for the big-batch serving paths: one
    * query per sampled part row (1/16 of the table — grows with SF:
    * ~12 at sf0.001, ~1.2k at sf0.1), same vector formula as
    * [[partQueries]]. Stays a DataFrame: the big-batch paths never
    * collect it. */
  def partQueriesBig(spark: SparkSession, sfDir: String,
      modulus: Int = 16): DataFrame =
    spark.read.parquet(s"$sfDir/part.parquet")
      .where(pmod(col("p_partkey"), lit(modulus)) === 0)
      .select(
        col("p_partkey").as("query_id"),
        array(
          col("p_size").cast("double"),
          col("p_retailprice") / 100.0,
          (col("p_partkey") % 97).cast("double") / 97.0,
          (col("p_partkey") % 89).cast("double") / 89.0,
          (col("p_partkey") % 83).cast("double") / 83.0,
          lit(1.0), lit(2.0), lit(3.0)
        ).as("qvec"))

  def documents(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/documents.parquet")

  /** `events.parquet` with `ts` normalized to nanos-since-epoch LONG — the
    * internal convention every events query buckets integrally on. The
    * driver's testdata has stored ts as parquet TIMESTAMP(NANOS) (which
    * Spark 4 reads as LONG only under `nanosAsLong`) and as
    * TIMESTAMP(MICROS) (read as TIMESTAMP_NTZ); this seam absorbs both so
    * queries and their DuckDB oracles (`epoch_ns(ts)`) agree either way.
    * Session TZ is UTC everywhere here, so the NTZ→timestamp cast is a
    * pure reinterpretation. */
  def events(spark: SparkSession, sfDir: String): DataFrame =
    normalizeEventsTs(spark.read.parquet(s"$sfDir/events.parquet"))

  /** See [[events]] — applied by every events entry point (batch AND the
    * streaming reader, which must agree on the convention or the
    * batch-twin equality specs compare different clocks). */
  def normalizeEventsTs(df: DataFrame): DataFrame =
    df.schema(df.schema.fieldIndex("ts")).dataType match {
      case org.apache.spark.sql.types.LongType => df
      case _ => df.withColumn("ts",
        unix_micros(col("ts").cast("timestamp")) * lit(1000L))
    }

  def embeddings(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/embeddings.parquet")

  /** Embedding dimensionality of the `embeddings` test table. */
  val EmbDim = 64

  /** Fixed 64-d query vector for ANN over `embeddings`; deterministic
    * closed-form components. */
  val AnnQuery: Seq[Double] = (0 until EmbDim).map(i => ((i * 37 + 11) % 101) / 101.0)

  /** The s-th synthetic [[EmbDim]]-d query of the deterministic family
    * every recall measurement draws from — ONE definition, so RecallSpec
    * gates, the H2 harness artifact, and the DevLshTune grid measure the
    * SAME workload (a drifted copy would silently gate one distribution
    * and publish another). */
  def syntheticQuery(s: Int): Seq[Double] =
    (0 until EmbDim).map(i => ((i * 31 + s * 17 + 7) % 97) / 97.0)
}
