package graft.sources

import org.apache.avro.Schema
import org.apache.avro.generic.{GenericData, GenericRecord}
import org.apache.avro.mapred.AvroKey
import org.apache.avro.mapreduce.{AvroJob, AvroKeyInputFormat, AvroKeyOutputFormat}
import org.apache.hadoop.io.NullWritable
import org.apache.hadoop.mapreduce.Job
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Avro readers/writers for the canonical tables — the remaining common
  * interchange format (Kafka-adjacent and schema-registry pipelines
  * exchange corpora as Avro container files the way lakehouse ones use
  * parquet). This container does not ship the `spark-avro` DataSource
  * module, so the seam rides the PUBLIC avro-mapred Hadoop formats that
  * predate it: `AvroKeyOutputFormat` on the write side and
  * `AvroKeyInputFormat` on the read side — fully distributed both ways
  * (container files are sync-marker splittable, so one big file still
  * fans out across tasks; this is the classic pre-module Spark/Avro
  * integration, not a driver-side loop).
  *
  * Schema discipline ([[JsonlSource]]'s explicit-schema rule, applied at
  * BOTH ends):
  *
  *  - writes derive the Avro schema from the DataFrame's own StructType
  *    over a bounded scalar subset (long/int/double/boolean/string,
  *    nullable unions) and FAIL LOUDLY on anything else — no silent
  *    stringification of arrays/structs;
  *  - reads verify the WRITER schema embedded in the files against the
  *    canonical column set before any record is decoded: Avro schema
  *    resolution would silently default a MISSING writer field to null
  *    (the reader fields are nullable unions), so trusting resolution
  *    alone is exactly the silent-type-drift hazard this family's
  *    readers exist to stop. Extra writer fields pass through ignored —
  *    the open-schema contract of the documents table. */
object AvroSource {

  private def avroType(name: String, dt: DataType): Schema.Type = dt match {
    case LongType => Schema.Type.LONG
    case IntegerType => Schema.Type.INT
    case DoubleType => Schema.Type.DOUBLE
    case BooleanType => Schema.Type.BOOLEAN
    case StringType => Schema.Type.STRING
    case other => throw new IllegalArgumentException(
      s"avro seam does not carry column $name: $other — supported scalar " +
        "types are long/int/double/boolean/string (project or encode first)")
  }

  /** Avro record schema for a StructType: each field a nullable union
    * (null default), matching parquet-sourced nullability. */
  private[graft] def avroSchema(st: StructType, name: String): Schema = {
    val rec = Schema.createRecord(name, null, "graft", false)
    rec.setFields(java.util.Arrays.asList(st.fields.map { f =>
      new Schema.Field(
        f.name,
        Schema.createUnion(
          Schema.create(Schema.Type.NULL),
          Schema.create(avroType(f.name, f.dataType))),
        null,
        Schema.Field.NULL_DEFAULT_VALUE)
    }: _*))
    rec
  }

  /** Write `df` as Avro container files under `path` (one per partition,
    * deflate-free default codec; overwrite semantics like the sibling
    * sources). Row→record conversion happens task-local — no shuffle, no
    * driver materialization. */
  def write(df: DataFrame, path: String): Unit = {
    val spark = df.sparkSession
    val schema = avroSchema(df.schema, "graft_row")
    val schemaJson = schema.toString
    val width = df.schema.length
    val records = df.rdd.mapPartitions { it =>
      val sch = new Schema.Parser().parse(schemaJson)
      it.map { row =>
        val rec = new GenericData.Record(sch)
        var i = 0
        while (i < width) {
          rec.put(i, if (row.isNullAt(i)) null else row.get(i))
          i += 1
        }
        (new AvroKey[GenericRecord](rec), NullWritable.get())
      }
    }
    val job = Job.getInstance(spark.sparkContext.hadoopConfiguration)
    AvroJob.setOutputKeySchema(job, schema)
    graft.store.Fs.delete(spark, path)
    records.saveAsNewAPIHadoopFile(path,
      classOf[AvroKey[GenericRecord]], classOf[NullWritable],
      classOf[AvroKeyOutputFormat[GenericRecord]], job.getConfiguration)
  }

  /** The writer schema embedded in the container files under `path` —
    * read from one file's HEADER (a bounded driver-side open, no record
    * decode), the authoritative input to the type-drift check. */
  private def writerSchemaOf(spark: SparkSession, path: String): Schema = {
    val (fs, p) = graft.store.Fs.pathFs(spark, path)
    val files = fs.listStatus(p).map(_.getPath)
      .filter(_.getName.endsWith(".avro")).sortBy(_.getName)
    require(files.nonEmpty, s"no .avro container files under $path")
    val in = fs.open(files.head)
    try {
      val stream = new org.apache.avro.file.DataFileStream[GenericRecord](
        in, new org.apache.avro.generic.GenericDatumReader[GenericRecord]())
      try stream.getSchema finally stream.close()
    } finally in.close()
  }

  /** Read a documents corpus, verifying the canonical columns exist in
    * the WRITER schema with the canonical types before any record
    * decodes (see object doc for why resolution alone is not the check).
    * Extra writer columns pass through ignored. */
  def readDocuments(spark: SparkSession, path: String): DataFrame =
    read(spark, path, JsonlSource.documentsSchema)

  /** Read Avro container files under `path` as `expected` (a scalar
    * schema per [[avroSchema]]'s subset), fail-loud on drift. */
  def read(spark: SparkSession, path: String, expected: StructType): DataFrame = {
    val writer = writerSchemaOf(spark, path)
    expected.fields.foreach { f =>
      val wf = writer.getField(f.name)
      require(wf != null,
        s"avro documents at $path: expected column ${f.name} missing from " +
          s"writer schema ${writer.getFields.size()} fields — schema " +
          "resolution would silently null it, refusing instead")
      val wTypes = (wf.schema().getType match {
        case Schema.Type.UNION =>
          wf.schema().getTypes.toArray.map(_.asInstanceOf[Schema].getType)
        case t => Array(t)
      }).filter(_ != Schema.Type.NULL)
      val want = avroType(f.name, f.dataType)
      require(wTypes.sameElements(Array(want)),
        s"avro documents at $path: expected column ${f.name}: $want, " +
          s"writer has ${wTypes.mkString("|")}")
    }
    val reader = avroSchema(expected, "graft_row")
    val job = Job.getInstance(spark.sparkContext.hadoopConfiguration)
    AvroJob.setInputKeySchema(job, reader)
    val rdd = spark.sparkContext.newAPIHadoopFile(
      path, classOf[AvroKeyInputFormat[GenericRecord]],
      classOf[AvroKey[GenericRecord]], classOf[NullWritable],
      job.getConfiguration)
    val width = expected.length
    // values are extracted synchronously per record (the reader REUSES
    // its datum object — rows must copy before the iterator advances;
    // Utf8 is materialized to String here for exactly that reason)
    val rows = rdd.mapPartitions(_.map { case (k, _) =>
      val rec = k.datum()
      Row.fromSeq((0 until width).map { i =>
        rec.get(i) match {
          case null => null
          case u: org.apache.avro.util.Utf8 => u.toString
          case other => other
        }
      })
    })
    spark.createDataFrame(rows, expected)
  }
}
