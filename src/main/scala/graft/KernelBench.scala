package graft

import java.util.concurrent.{Callable, Executors, TimeUnit}
import graft.core.{HashingEmbedder, MinHash}

/** Pure-JVM thread-scaling microbenchmark of the per-doc kernel
  * (embed + shingle + OPH minhash + simhash) — isolates kernel contention
  * from Spark scheduling when diagnosing scaling anomalies.
  */
object KernelBench {
  def main(args: Array[String]): Unit = {
    val nDocs = 20000
    val rnd = new scala.util.Random(42)
    val words = Array.fill(2000)(rnd.alphanumeric.take(4 + rnd.nextInt(8)).mkString)
    val texts = Array.fill(nDocs)((1 to (80 + rnd.nextInt(81))).map(_ => words(rnd.nextInt(words.length))).mkString(" "))

    def run(threads: Int): Double = {
      val pool = Executors.newFixedThreadPool(threads)
      val chunk = nDocs / threads
      val t0 = System.nanoTime()
      val futures = (0 until threads).map { t =>
        pool.submit(new Callable[Long] {
          def call(): Long = {
            var acc = 0L
            var i = t * chunk
            while (i < math.min(nDocs, (t + 1) * chunk)) {
              val sh = MinHash.shingles(texts(i), 3)
              val sig = MinHash.signatureOPH(sh, 128)
              val sim = MinHash.simHash(sh)
              val v = HashingEmbedder.embed(texts(i))
              acc ^= sig(0) ^ sim ^ java.lang.Float.floatToIntBits(v(0))
              i += 1
            }
            acc
          }
        })
      }
      futures.foreach(_.get())
      pool.shutdown(); pool.awaitTermination(1, TimeUnit.MINUTES)
      (System.nanoTime() - t0) / 1e9
    }
    run(4) // warmup JIT
    Seq(1, 8, 32).foreach { t =>
      val s = run(t)
      println(f"[kernelbench] threads=$t%2d ${s}%6.2f s  ${nDocs / s}%8.0f docs/s")
    }
  }
}
