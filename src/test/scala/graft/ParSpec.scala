package graft

import org.apache.spark.sql.functions._

import graft.operators.Par

/** Partition-width guards: widen raises narrow inputs to the session
  * default, is a no-op on wide inputs, and never changes data. */
class ParSpec extends SparkSpec {

  import spark.implicits._

  test("widen raises a single-partition input to default parallelism") {
    val narrow = (1 to 1000).toDF("x").coalesce(1)
    assert(narrow.rdd.getNumPartitions == 1)
    val wide = Par.widen(narrow)
    assert(wide.rdd.getNumPartitions == spark.sparkContext.defaultParallelism)
    assert(wide.agg(sum("x")).head.getLong(0) == 500500L)
  }

  test("widen is a no-op on an already-wide input") {
    val target = spark.sparkContext.defaultParallelism
    val wide = (1 to 1000).toDF("x").repartition(target + 4)
    assert(Par.widen(wide) eq wide)
  }

  test("widenBy hash-partitions on the keys") {
    val narrow = (1 to 1000).toDF("x").withColumn("k", col("x") % 7).coalesce(1)
    val wide = Par.widenBy(narrow, col("k"))
    assert(wide.rdd.getNumPartitions == spark.sparkContext.defaultParallelism)
    // co-partitioned: every key lives in exactly one partition
    val spread = wide.groupBy(spark_partition_id().as("p"), col("k")).count()
      .groupBy("k").count().where(col("count") > 1).count()
    assert(spread == 0L)
  }

  test("spread repartitions even a post-shuffle input") {
    val agg = (1 to 1000).toDF("x").withColumn("k", col("x") % 3)
      .groupBy("k").count()
    val s = Par.spread(agg)
    assert(s.rdd.getNumPartitions == spark.sparkContext.defaultParallelism)
    assert(s.count() == 3L)
  }
}
