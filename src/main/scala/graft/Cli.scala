package graft

import org.apache.spark.sql.SparkSession
import graft.model.ExtractConfig
import graft.pipeline.Extract
import graft.io.{Sinks, TableIO}
import graft.metrics.ExtractMetrics

/** spark-submit entry mirroring the reference CLI (reference: cli.py:25-150:
  * `extract <input> [--format text|json|structured] [-o out]`, `info`,
  * `languages`), generalized from one PDF file to an input span table.
  *
  * Usage:
  *   Cli extract <inputParquet> <outDir> [text|json|structured] [engine]
  *   Cli snapshot <inputParquet> <tableRoot> <snapshotId>
  *   Cli info
  *   Cli languages
  */
object Cli {
  private def session(): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val s = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", s"local[$cpus]"))
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  def main(args: Array[String]): Unit = args.toList match {
    case "extract" :: input :: out :: rest =>
      val format = rest.headOption.getOrElse("structured")
      val engine = rest.lift(1).getOrElse("core")
      val cfg = ExtractConfig.default.copy(engine = engine)
      cfg.validate()
      val spark = session()
      try {
        val t0 = System.nanoTime()
        val in = spark.read.parquet(input)
        format match {
          case "structured" =>
            val result = Extract.extractContract(in, cfg)
            val (good, bad) = Sinks.splitQuarantine(result)
            Sinks.writeSpansBucketed(good, s"$out/spans")
            bad.write.mode("overwrite").json(s"$out/quarantine")
          case "text" | "json" =>
            import spark.implicits._
            val metrics = new ExtractMetrics(spark)
            val results = metrics.observeResults(
              Extract.extract(in.selectExpr("cast(doc_id as string) doc_id", "spans").as[graft.model.RawDoc], cfg))
              .filter(!_.quarantined)
            if (format == "text") Sinks.writeText(results.toDF(), s"$out/text")
            else Sinks.writeJson(results.toDF(), s"$out/json")
            val wall = (System.nanoTime() - t0) / 1e9
            System.err.println(s"[cli] metrics=${metrics.snapshot} throughput=${metrics.throughput(wall)}")
          case other =>
            throw new IllegalArgumentException(s"unknown format: $other (text|json|structured)")
        }
        System.err.println(f"[cli] extract done in ${(System.nanoTime() - t0) / 1e9}%.1f s -> $out")
      } finally spark.stop()

    case "snapshot" :: input :: root :: id :: Nil =>
      val spark = session()
      try {
        val result = Extract.extractContract(spark.read.parquet(input))
        val (good, _) = Sinks.splitQuarantine(result)
        val m = TableIO.writeSnapshot(good, root, id, inputs = Seq(input))
        println(s"committed snapshot ${m.snapshotId}: ${m.rowCount} rows, ${m.files.length} files")
      } finally spark.stop()

    case "info" :: Nil =>
      // reference: cli.py:84-104
      println("graft extraction engine (Spark-native)")
      println(s"engines: core, fitz, plumber")
      println(s"formats: text, json, structured")
      println(s"config defaults: ${ExtractConfig.default}")

    case "languages" :: Nil =>
      // reference: cli.py:107-122 / ocr_processor.py:57-72
      graft.kernel.Extractor.SupportedOcrLanguages.foreach(println)

    case _ =>
      System.err.println("usage: Cli extract <inputParquet> <outDir> [text|json|structured] [core|fitz|plumber]")
      System.err.println("       Cli snapshot <inputParquet> <tableRoot> <snapshotId>")
      System.err.println("       Cli info | languages")
      sys.exit(1)
  }
}
