package graft

/** Pure-JVM kernel scaling control — NO Spark: the extraction kernel alone
  * on a fixed in-memory corpus at several thread counts. Isolates the host
  * machine's per-thread capability envelope (SMT sharing / DRAM bandwidth on
  * this virtualized box) from anything the Spark plan adds: when the
  * Spark-level ladder (ScalingBench) tracks this curve, the framework
  * overhead is ~zero and the scaling limit is the hardware, not the plan.
  *
  * Usage: KernelScaleProbe [nGiants] [threadsCsv]   (defaults: 768  1,2,4,8,16,32)
  */
object KernelScaleProbe extends App {
  import graft.fixtures.Fixtures
  import graft.kernel.Extractor
  import java.util.concurrent._

  val nGiants = args.headOption.map(_.toInt).getOrElse(768)
  val threadsList = args.lift(1).map(_.split(",").map(_.trim.toInt).toSeq).getOrElse(Seq(1, 2, 4, 8, 16, 32))

  val giants = (0 until nGiants).map(i => Fixtures.gen(Fixtures.docId("skewed_giant", i))).toArray
  val pagesTotal = giants.iterator.map { d =>
    // ceiling division (ADVICE r02: n/SpansPerPage+1 overcounts exact multiples)
    if (d.spans.isEmpty) 1
    else (d.spans.length + graft.kernel.Parse.SpansPerPage - 1) / graft.kernel.Parse.SpansPerPage
  }.sum

  // JIT warmup to steady state
  giants.take(32).foreach(Extractor.extractDoc(_))
  giants.take(32).foreach(Extractor.extractDoc(_))

  for (threads <- threadsList) {
    val pool = Executors.newFixedThreadPool(threads)
    val t0 = System.nanoTime()
    val futs = giants.map(d => pool.submit(new Callable[Int] { def call(): Int = Extractor.extractDoc(d).spans.length }))
    val total = futs.map(_.get()).sum
    val wall = (System.nanoTime() - t0) / 1e9
    println(f"KERNEL threads=$threads%2d wall=$wall%7.1fs docs/s=${giants.length / wall}%8.1f pages/s=${pagesTotal / wall}%9.0f spans=$total")
    pool.shutdown()
  }
}
