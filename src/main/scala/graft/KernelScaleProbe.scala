package graft
object KernelScaleProbe extends App {
  import graft.fixtures.Fixtures
  import graft.kernel.Extractor
  import java.util.concurrent._
  val giants = (0 until 192).map(i => Fixtures.gen(Fixtures.docId("skewed_giant", i))).toArray
  // warmup
  giants.take(16).foreach(Extractor.extractDoc(_))
  for (threads <- Seq(1, 8, 32)) {
    val pool = Executors.newFixedThreadPool(threads)
    val t0 = System.nanoTime()
    val futs = giants.map(d => pool.submit(new Callable[Int] { def call(): Int = Extractor.extractDoc(d).spans.length }))
    val total = futs.map(_.get()).sum
    val wall = (System.nanoTime() - t0) / 1e9
    println(f"KERNEL threads=$threads%2d wall=$wall%6.1fs docs/s=${giants.length / wall}%7.1f spans=$total")
    pool.shutdown()
  }
}
