package graft

/** Pure-JVM thread-scaling probe (no Spark): FSST-compresses independent
  * buffers on N threads. Separates "the engine doesn't scale" from "the
  * sandbox host has no idle cores to give" (heavy hypervisor steal).
  * Run: sbt "runMain graft.ThreadScale" */
object ThreadScale {
  def main(args: Array[String]): Unit = {
    val rnd = new scala.util.Random(42)
    val words = ("the of and to in is was for on that with as by at from it an " +
      "be this are which has had were their one all data page web site news").split(" ")
    val sb = new StringBuilder
    while (sb.length < (8 << 20)) sb.append(words(rnd.nextInt(words.length))).append(' ')
    val buf = sb.toString.getBytes("UTF-8")
    val table = graft.core.Fsst.train(java.util.Arrays.copyOf(buf, 1 << 14))

    def run(threads: Int, reps: Int): Double = {
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        val ts = (1 to threads).map { _ =>
          new Thread(() => { val c = table.compress(buf); if (c.length == 0) println("") })
        }
        ts.foreach(_.start()); ts.foreach(_.join())
        (System.nanoTime() - t0) / 1e9
      }
      val best = times.min
      threads * buf.length / best / 1e6 // MB/s aggregate
    }
    run(2, 2) // warmup
    Seq(1, 2, 4, 8, 16, 32).foreach { n =>
      println(f"[scale] threads=$n%2d aggregate=${run(n, 3)}%8.1f MB/s")
    }
  }
}
