package graft.tools

/** Pure-CPU host-window quality probe: prints 4- and 16-thread Phonex
  * throughput. Run before a ScalingBench pair to know whether the host is
  * inside a noisy-neighbor episode (normal: ~9-10M at 4 threads, ~35M at
  * 16; an episode reads a fraction of that).
  */
object WindowProbe {
  def main(args: Array[String]): Unit = {
    val base = graft.pipeline.NameFixtures.families.flatten
      .map(_.filter(_.isLetter).toLowerCase)
    val toks =
      (0 until 10000).map(i => base(i % base.length) + (i % 97)).toArray
    def mt(nThreads: Int, perThread: Int): Double = {
      val threads = (0 until nThreads).map { t =>
        new Thread(() => {
          var k = 0
          while (k < perThread) {
            graft.phonetic.Phonex.default.encode(toks((k + t) % toks.length))
            k += 1
          }
        })
      }
      val t0 = System.nanoTime()
      threads.foreach(_.start()); threads.foreach(_.join())
      nThreads.toLong * perThread / ((System.nanoTime() - t0) / 1e9)
    }
    graft.Bench.warmCpus(16)
    mt(16, 300000) // warm
    val p4 = (1 to 3).map(_ => mt(4, 1000000)).max.toLong
    val p16 = (1 to 3).map(_ => mt(16, 1000000)).max.toLong
    println(s"WINDOW_PROBE probe4=$p4 probe16=$p16 " +
      f"eff=${p16.toDouble / p4 / 4.0}%.2f")
  }
}
