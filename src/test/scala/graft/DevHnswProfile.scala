package graft

import graft.index.HnswIndex

/** Scratch profiler for HnswIndex build cost (dev-only). */
object DevHnswProfile {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 19000
    val d = 8
    val rng = new java.util.Random(7)
    val vecs = Array.fill(n)(Array.fill(d)(rng.nextDouble() * 50))
    for ((m, efc) <- Seq((16, 64), (32, 200))) {
      val t0 = System.nanoTime()
      val idx = new HnswIndex(m, efc, 42L)
      var i = 0
      while (i < n) { idx.insert(i.toLong, vecs(i)); i += 1 }
      val buildS = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      val res = idx.search(vecs(0), 10, 128)
      val searchMs = (System.nanoTime() - t1) / 1e6
      println(f"n=$n m=$m efC=$efc build=$buildS%.2fs search=$searchMs%.2fms top=${res.take(3)}")
    }
  }
}
