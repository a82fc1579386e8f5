package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import java.nio.file.{Files, Paths}

/** Two-parallelism scaling experiment (BASELINE.md protocol): the sandbox
  * substitute for the north_rule's N vs 4N executor criterion. Runs the
  * IDENTICAL extraction job on the IDENTICAL pre-materialized corpus at
  * local[N] and local[4N] (default N=8), identical AQE + shuffle config,
  * skewed multi-hundred-page docs included, and reports throughput at both
  * plus efficiency = throughput(4N) / (4 * throughput(N)).
  *
  * Usage: ScalingBench [nDocs] [N]  -> writes BENCH/BASELINE.md
  */
object ScalingBench {

  private def session(cores: Int): SparkSession = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      // fine input splits: the corpus parquet is ~hundreds of MB in small
      // files; the 128 MB default packs them into ~3 read partitions and
      // starves the narrow mapPartitions stage of parallelism (identical at
      // both levels — on a real 100 TB table the file count provides this)
      .config("spark.sql.files.maxPartitionBytes", sys.env.getOrElse("SPARK_GRAFT_SPLIT", "4m"))
      .config("spark.sql.files.openCostInBytes", "1m")
      // span-array rows: columnar batch MEMORY scales with rowSize x
      // batchSize, and 1-in-20 giant docs dominate bytes — 64-row batches
      // keep giant batches ~20 MB/task (512 rows was ~150 MB -> GC churn;
      // the 4096 default also thrashed child-vector reserve()/realloc)
      // numeric placeholder; "auto" (or unset) is resolved per-corpus by
      // applyBatchSize before any timed work
      .config("spark.sql.parquet.columnarReaderBatchSize",
        sys.env.get("SPARK_GRAFT_BATCH").filter(_.forall(_.isDigit)).getOrElse("64"))
      .config("spark.sql.parquet.compression.codec",
        sys.env.getOrElse("SPARK_GRAFT_CODEC", "snappy"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** Columnar batch size for `path`: an explicit integer SPARK_GRAFT_BATCH
    * pins it (A/B runs); unset or "auto" derives the byte-budgeted size from
    * the corpus itself (TableIO.autoBatchSize — VERDICT r03 #3: the shipped
    * config must not hardcode the row count the skew profile happens to
    * need). Applied via dynamic conf BEFORE any timed work. */
  private def applyBatchSize(spark: SparkSession, path: String): Int = {
    val b = sys.env.get("SPARK_GRAFT_BATCH").filter(_ != "auto").map(_.toInt).getOrElse {
      val auto = graft.io.TableIO.autoBatchSize(spark.read.parquet(path))
      System.err.println(s"[scaling] auto columnarReaderBatchSize=$auto")
      auto
    }
    spark.conf.set("spark.sql.parquet.columnarReaderBatchSize", b.toString)
    b
  }

  final case class RunStats(cores: Int, wallSec: Double, docs: Long, pages: Long, spans: Long,
      checksum: Long = 0L) {
    def docsPerSec: Double = docs / wallSec
    def pagesPerSec: Double = pages / wallSec
  }

  private def runOnce(cores: Int, corpusPath: String, parts: Int,
      skewThresholdSpans: Int = 512 * graft.kernel.Parse.SpansPerPage): RunStats = {
    val spark = session(cores)
    import spark.implicits._
    try {
      applyBatchSize(spark, corpusPath)
      val docs = spark.read.parquet(corpusPath)
      // JIT/codegen warmup outside the timed region (same plan, small slice,
      // two passes so the kernel tiers up to C2 before the clock starts)
      graft.pipeline.Extract.extractContract(docs.limit(1500)).selectExpr("count(*)").collect()
      graft.pipeline.Extract.extractContract(docs.limit(1500)).selectExpr("count(*)").collect()
      val t0 = System.nanoTime()
      val row = graft.pipeline.Extract
        .extractContract(docs, skewSpanThreshold = skewThresholdSpans, pageParallelism = cores * 4)
        .filter(!col("quarantined"))
        .selectExpr("count(*) AS docs", "sum(num_pages) AS pages",
          "sum(coalesce(size(spans), 0)) AS spans",
          // order-independent checksum over every (doc_id, span sequence):
          // identical at every parallelism level iff results are identical
          "sum(cast(hash(doc_id, spans) AS BIGINT)) AS checksum")
        .collect()(0)
      val wall = (System.nanoTime() - t0) / 1e9
      RunStats(cores, wall, row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3))
    } finally spark.stop()
  }

  /** Subcommands (one JVM per measurement so heap zeroing / JIT / GC state
    * never leaks between runs — drive via tools/scaling.sh):
    *   gen <nDocs> <path>            materialize the corpus
    *   run <cores> <path>            one timed run; prints one JSON line
    *   report <nDocs> <n> <jsonN> <json4N>   write BENCH/BASELINE.md
    * No args: legacy single-JVM mode (gen + both runs + report).
    */
  def main(args: Array[String]): Unit = args.headOption match {
    case Some("gen") =>
      val nDocs = args(1).toInt
      val corpusPath = args(2)
      val gen = session(32)
      try {
        import gen.implicits._
        gen.createDataset(Fixtures0.ids(nDocs))
          .repartition(128)
          .map(graft.fixtures.Fixtures.gen _)
          .write.mode("overwrite").parquet(corpusPath)
      } finally gen.stop()

    case Some("run") =>
      val cores = args(1).toInt
      val thresholdPages = args.lift(3).map(_.toInt).getOrElse(512)
      val s = runOnce(cores, args(2), cores * 4, thresholdPages * graft.kernel.Parse.SpansPerPage)
      println(s"""{"cores":${s.cores},"wall_sec":${s.wallSec},"docs":${s.docs},"pages":${s.pages},"spans":${s.spans},"docs_per_sec":${s.docsPerSec},"pages_per_sec":${s.pagesPerSec},"checksum":${s.checksum}}""")

    // managed-input leg: same corpus rewritten once (untimed) via
    // TableIO.writeContractInput (pushable n_spans, size-clustered row
    // groups), then the timed pass uses extractContractFromTable — measures
    // what the stats column buys over the raw two-scan shape.
    case Some("stats") =>
      val cores = args(1).toInt
      val rawPath = args(2)
      val statsPath = rawPath.stripSuffix("/") + "_statted"
      val spark = session(cores)
      try {
        // Reuse the statted rewrite only if it was DERIVED FROM this raw
        // corpus: a stale dir from an earlier/different corpus would
        // silently bench the wrong input (ADVICE r03). Cheap validation —
        // row count, an order-independent doc_id checksum, AND a
        // content-sensitive term (total span count + per-doc size-keyed
        // hash) so a regenerated corpus with identical doc_ids but changed
        // span content cannot pass (ADVICE r04); all still stats-level
        // scans (size(spans) reads list lengths, not span bytes).
        val rawDf = spark.read.parquet(rawPath)
        def sig(df: org.apache.spark.sql.DataFrame): (Long, Long, Long, Long) = {
          val r = df.selectExpr("count(*) AS n",
            "sum(cast(hash(doc_id) AS BIGINT)) AS chk",
            "sum(cast(coalesce(size(spans), 0) AS BIGINT)) AS nsp",
            "sum(cast(hash(doc_id, coalesce(size(spans), 0)) AS BIGINT)) AS szchk").collect()(0)
          (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
        }
        val reusable = java.nio.file.Files.exists(java.nio.file.Paths.get(statsPath)) && {
          try sig(spark.read.parquet(statsPath)) == sig(rawDf)
          catch { case _: Throwable => false }
        }
        if (!reusable) {
          // row-group size adapted to the corpus (readers cannot split
          // inside a row group — see TableIO.writeContractInput scaladoc)
          val block = math.max(1L << 20, math.min(8L << 20,
            graft.io.TableIO.autoSplitBytes(rawPath, 512, 1)))
          graft.io.TableIO.writeContractInput(rawDf, statsPath, blockBytes = block)
        }
        applyBatchSize(spark, statsPath)
        spark.conf.set("spark.sql.files.maxPartitionBytes",
          graft.io.TableIO.autoSplitBytes(statsPath, cores).toString)
        graft.pipeline.Extract.extractContractFromTable(spark, statsPath,
          skewSpanThreshold = 512 * graft.kernel.Parse.SpansPerPage)
          .selectExpr("count(*)").collect() // warmup
        val t0 = System.nanoTime()
        val row = graft.pipeline.Extract.extractContractFromTable(spark, statsPath,
          skewSpanThreshold = 512 * graft.kernel.Parse.SpansPerPage, pageParallelism = cores * 4)
          .filter(!org.apache.spark.sql.functions.col("quarantined"))
          .selectExpr("count(*) AS docs", "sum(num_pages) AS pages",
            "sum(coalesce(size(spans), 0)) AS spans",
            "sum(cast(hash(doc_id, spans) AS BIGINT)) AS checksum")
          .collect()(0)
        val wall = (System.nanoTime() - t0) / 1e9
        println(s"""{"mode":"stats","cores":$cores,"wall_sec":$wall,"docs":${row.getLong(0)},"pages":${row.getLong(1)},"spans":${row.getLong(2)},"pages_per_sec":${row.getLong(1) / wall},"checksum":${row.getLong(3)}}""")
      } finally spark.stop()

    case Some("report") =>
      val nDocs = args(1).toInt
      val n = args(2).toInt
      def parse(j: String): RunStats = {
        def f(k: String): Double = s""""$k":([-0-9.eE]+)""".r.findFirstMatchIn(j).get.group(1).toDouble
        RunStats(f("cores").toInt, f("wall_sec"), f("docs").toLong, f("pages").toLong, f("spans").toLong)
      }
      writeReport(nDocs, n, parse(args(3)), parse(args(4)))

    case _ =>
      val nDocs = args.headOption.map(_.toInt).getOrElse(
        sys.env.getOrElse("SPARK_GRAFT_SCALING_DOCS", "24000").toInt)
      val n = args.lift(1).map(_.toInt).getOrElse(8)
      main(Array("gen", nDocs.toString, "target/scaling_corpus.parquet"))
      val statsN = runOnce(n, "target/scaling_corpus.parquet", n * 4)
      val stats4N = runOnce(n * 4, "target/scaling_corpus.parquet", n * 16)
      writeReport(nDocs, n, statsN, stats4N)
  }

  def writeReport(nDocs: Int, n: Int, statsN: RunStats, stats4N: RunStats): Unit = {
    val n4 = n * 4
    val efficiency = stats4N.docsPerSec / (4.0 * statsN.docsPerSec)
    val md =
      s"""# BENCH/BASELINE — scaling experiment (N vs 4N parallelism)
         |
         |Protocol: BASELINE.md (sandbox substitute for the two-cluster-size
         |criterion). Identical job — `Extract.extractSkewAware` over the
         |identical pre-materialized corpus parquet — at `local[$n]` and
         |`local[$n4]`, `spark.sql.shuffle.partitions` = cores, AQE on at both
         |levels. Corpus: $nDocs deterministic fixture docs (archetype mix incl.
         |1-in-20 multi-hundred-page skewed giants), ${statsN.pages} pages,
         |${statsN.spans} output spans.
         |
         || parallelism | wall (s) | docs/sec | pages/sec |
         ||---|---|---|---|
         || local[$n]  | ${f"${statsN.wallSec}%.1f"} | ${f"${statsN.docsPerSec}%.1f"} | ${f"${statsN.pagesPerSec}%.1f"} |
         || local[$n4] | ${f"${stats4N.wallSec}%.1f"} | ${f"${stats4N.docsPerSec}%.1f"} | ${f"${stats4N.pagesPerSec}%.1f"} |
         |
         |**Scaling efficiency (target >= 0.8):**
         |`throughput(4N) / (4 x throughput(N))` = **${f"$efficiency%.3f"}**
         |
         |Span counts identical at both levels: ${statsN.spans == stats4N.spans}
         |(docs ${statsN.docs}/${stats4N.docs}, pages ${statsN.pages}/${stats4N.pages}).
         |""".stripMargin
    Files.createDirectories(Paths.get("BENCH"))
    Files.writeString(Paths.get("BENCH/BASELINE.md"), md)
    println(md)
    println(s"""{"scaling_efficiency":$efficiency,"n":"local[$n]","t_n":${statsN.wallSec},"t_4n":${stats4N.wallSec},"docs":$nDocs}""")
  }
}

/** Corpus id helper kept serialization-free for the generator closure. */
private object Fixtures0 {
  def ids(n: Int): Seq[String] = graft.fixtures.Fixtures.corpusIds(n)
}
