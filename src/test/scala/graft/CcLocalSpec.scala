package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.dedup.Dedup

/** The driver-gated connected-components fast path (union-find under
  * [[Dedup.DriverContractEdges]]) must return EXACTLY the distributed
  * contraction's assignment — the label fixed point (min reachable id)
  * is a graph property, and every component-layout oracle hash rides on
  * it. Drives both paths over the same random graphs and compares. */
class CcLocalSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("cc-local-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def bothPaths(edges: Seq[(Long, Long)], vertices: Seq[Long])
      : (Map[Long, Long], Map[Long, Long]) = {
    import spark.implicits._
    val pairs = edges.toDF("da", "db")
    val verts = vertices.toDF("id")
    val viaGate = Dedup.connectedComponents(verts, "id", pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val medges0 = pairs
      .select(col("da").cast("long").as("src"), col("db").cast("long").as("dst"))
      .where(col("src") =!= col("dst"))
      .cache()
    val viaLoop = Dedup.connectedComponentsDistributed(verts, "id", medges0,
        medges0.count())
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    (viaGate, viaLoop)
  }

  test("driver union-find equals the distributed contraction on random graphs") {
    val rng = new scala.util.Random(7)
    (1 to 3).foreach { round =>
      val n = 200 + round * 150
      val vertices = (0L until n.toLong).map(v => v * 13 + 5) // non-dense ids
      val edges = Seq.fill(n / 2) {
        val a = vertices(rng.nextInt(n)); val b = vertices(rng.nextInt(n))
        (a, b)
      } ++ Seq.fill(10)((vertices(0), vertices(0))) // self-pairs drop
      val (gate, loop) = bothPaths(edges, vertices)
      assert(gate == loop, s"round $round: paths disagree")
      // labels are component minima: every label is <= its members and
      // is itself a member mapping to itself
      gate.foreach { case (v, l) =>
        assert(l <= v)
        assert(gate(l) == l)
      }
    }
  }

  test("chain graph (adversarial id ordering) agrees across paths") {
    // ids ordered along a path — the shape that forced the pointer-
    // doubling closure in the distributed loop
    val n = 500L
    val vertices = 0L until n
    val edges = (0L until n - 1).map(i => (i + 1, i))
    val (gate, loop) = bothPaths(edges, vertices)
    assert(gate == loop)
    assert(gate.values.toSet == Set(0L))
  }

  test("isolated vertices label themselves through the join-back") {
    val vertices = Seq(1L, 2L, 3L, 100L, 200L)
    val edges = Seq((2L, 3L))
    val (gate, loop) = bothPaths(edges, vertices)
    assert(gate == loop)
    assert(gate(1L) == 1L && gate(100L) == 100L && gate(200L) == 200L)
    assert(gate(2L) == 2L && gate(3L) == 2L)
  }
}
