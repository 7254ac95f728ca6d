package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Verify a SUBSET of registered queries in isolation: dump each named
  * entry's result + its oracle SQL to `outDir` in the exact shape
  * `graft.Verify` uses, so `scripts/local_verify.py <sfDir> <outDir>`
  * runs the driver's DuckDB compare on just those entries —
  * `Test/runMain graft.DevVerifyOne <sfDir> <outDir> <entry> [entry…]`.
  * Saves the ~150-entry full Verify pass while iterating on one oracle. */
object DevVerifyOne {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0); val outDir = args(1); val entries = args.drop(2).toSeq
    graft.queries.OracleSidecars.enableFor(sfDir)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("DevVerifyOne")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    entries.foreach { name =>
      SparkEntry.queries(name)(spark, sfDir)
        .coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
    }
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql.filter(kv => entries.contains(kv._1))
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
