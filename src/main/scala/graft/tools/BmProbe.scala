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

    def mt(nThreads: Int, perThread: Int, work: String => Int): Double = {
      val threads = (0 until nThreads).map { t =>
        new Thread(() => {
          var k = 0
          var acc = 0
          while (k < perThread) {
            acc += work(toks((k * 31 + t) % toks.length))
            k += 1
          }
          if (acc == -1) println(acc)
        })
      }
      val t0 = System.nanoTime()
      threads.foreach(_.start()); threads.foreach(_.join())
      nThreads.toLong * perThread / ((System.nanoTime() - t0) / 1e9)
    }
    val variants: Seq[(String, String => Int)] = Seq(
      ("encode", s => engine.encode(s).length),
      ("codes_via_split", { s =>
        val raw = engine.encode(s)
        val parts = graft.phonetic.bm.BeiderMorse.splitCodes(raw)
        var i = 0; var acc = 0
        while (i < parts.length) {
          acc += org.apache.spark.unsafe.types.UTF8String
            .fromString(parts(i)).numBytes()
          i += 1
        }
        acc
      }))
    graft.Bench.warmCpus(32)
    variants.foreach { case (_, w) => mt(16, 20000, w) } // warm JIT
    variants.foreach { case (name, w) =>
      val e1 = (1 to 3).map(_ => mt(4, 60000, w)).max
      val e2 = (1 to 3).map(_ => mt(16, 60000, w)).max
      println(f"BMPROBE $name%-16s tp4=${e1.toLong} tp16=${e2.toLong} " +
        f"eff=${e2 / e1 / 4.0}%.3f")
    }
  }
}
