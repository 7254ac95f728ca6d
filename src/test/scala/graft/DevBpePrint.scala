package graft

/** Print the fixture-trained BPE merges and a sample encode — used to
  * eyeball the model while authoring its oracle mirror. */
object DevBpePrint {
  def main(args: Array[String]): Unit = {
    val m = graft.text.Bpe.FixtureModel
    m.merges.zipWithIndex.foreach { case ((a, b), i) =>
      println(s"MERGE ${i + 1}\t$a\t$b")
    }
    Seq("table", "tablet", "scanning", "windows", "a", "", "xyz",
      "customer", "queries").foreach { w =>
      println(s"ENC $w -> ${m.encodeWord(w).mkString("|")}")
    }
  }
}
