package graft.tools

/** Dev probe: pure-thread Beider-Morse encode scaling (no Spark) — is the
  * 4->16 efficiency loss the encoder's own allocation/GC coupling?
  */
object BmProbe {
  def main(args: Array[String]): Unit = {
    val engine = graft.phonetic.bm.BeiderMorse.default
    val base = graft.pipeline.NameFixtures.families.flatten
      .map(_.filter(_.isLetter).toLowerCase)
    val toks = (0 until 10000).map(i => base(i % base.length) + (i % 97)).toArray

    def mt(nThreads: Int, perThread: Int): Double = {
      val threads = (0 until nThreads).map { t =>
        new Thread(() => {
          var k = 0
          var acc = 0
          while (k < perThread) {
            acc += engine.encode(toks((k * 31 + t) % toks.length)).length
            k += 1
          }
          if (acc == -1) println(acc)
        })
      }
      val t0 = System.nanoTime()
      threads.foreach(_.start()); threads.foreach(_.join())
      nThreads.toLong * perThread / ((System.nanoTime() - t0) / 1e9)
    }
    graft.Bench.warmCpus(32)
    mt(16, 20000) // warm JIT
    Seq(1, 4, 16).foreach { n =>
      val best = (1 to 3).map(_ => mt(n, 60000)).max
      println(f"BMPROBE threads=$n%2d encodes_per_sec=${best.toLong}")
    }
    val e1 = (1 to 3).map(_ => mt(4, 60000)).max
    val e2 = (1 to 3).map(_ => mt(16, 60000)).max
    println(f"BMPROBE eff_4_to_16=${e2 / e1 / 4.0}%.3f")
  }
}
