package graft

import scala.util.chaining._

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared session base — one SparkSession per suite (lazy), config matching
  * the driver contract (Verify/Bench builders). */
trait SparkSpec extends AnyFunSuite {

  val Sf0001 = "/root/testdata/sf0.001"
  val Sf001 = "/root/testdata/sf0.01"

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.extensions", "graft.GraftExtensions")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .pipe(graft.search.IdFetch.configure)
    .config("spark.sql.warehouse.dir", s"/tmp/graft_warehouse_${java.util.UUID.randomUUID()}")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
}
