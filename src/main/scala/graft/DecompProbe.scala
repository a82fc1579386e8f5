package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Decomposes the skew-prune A/B wall into its components so the shipped
  * Bench config is chosen on evidence: full-corpus decode, small-leg
  * extraction, giant-leg FIND (the scan the n_spans stats column prunes),
  * and the shared giant page-split pipeline.
  *
  * Usage: runMain graft.DecompProbe [nDocs] [reps]
  */
object DecompProbe {
  def main(args: Array[String]): Unit = {
    val nDocs = args.headOption.map(_.toInt).getOrElse(40000)
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.memory", sys.env.getOrElse("SPARK_DRIVER_MEM", "8g"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val root = java.nio.file.Files.createTempDirectory("decomp_probe").toString
    val pruneDir = s"$root/prune.parquet"
    spark.createDataset(graft.fixtures.Fixtures.corpusIdsRareGiants(nDocs))
      .repartition(128)
      .map(graft.fixtures.Fixtures.gen _)
      .write.mode("overwrite").parquet(pruneDir)
    val managedDir = s"$root/managed.parquet"
    val pruneIn = spark.read.parquet(pruneDir)
    graft.io.TableIO.writeContractInput(pruneIn, managedDir, blockBytes = 1L << 20)
    val thr = 128 * graft.kernel.Parse.SpansPerPage

    spark.conf.set("spark.sql.parquet.columnarReaderBatchSize",
      graft.io.TableIO.autoBatchSize(pruneIn).toString)
    spark.conf.set("spark.sql.files.maxPartitionBytes",
      graft.io.TableIO.autoSplitBytes(pruneDir, cpus.toInt).toString)

    def t(label: String)(body: => Unit): Unit = {
      body // warmup
      val samples = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
      }
      println(s"""{"decomp":"$label","min":${samples.min},"all":[${samples.mkString(",")}]}""")
    }

    val managedIn = spark.read.parquet(managedDir)
    val nSpans = coalesce(size(col("spans")), lit(0))

    t("raw_full_decode") { pruneIn.select(sum(size(col("spans")))).collect() }
    t("managed_full_decode") { managedIn.select(sum(size(col("spans")))).collect() }
    t("raw_giant_find") { pruneIn.filter(nSpans > thr).select(count(lit(1))).collect() }
    t("managed_giant_find") { managedIn.filter(col("n_spans") > thr).select(count(lit(1))).collect() }
    t("raw_small_extract") {
      graft.pipeline.Extract.extractSpansDF(pruneIn.filter(nSpans <= thr))
        .filter(!col("quarantined")).select(count(lit(1)), sum(col("num_pages"))).collect()
    }
    t("managed_small_extract") {
      graft.pipeline.Extract.extractSpansDF(
        managedIn.filter(col("n_spans") <= thr).select(col("doc_id"), col("spans")))
        .filter(!col("quarantined")).select(count(lit(1)), sum(col("num_pages"))).collect()
    }
    t("raw_giant_pipeline") {
      graft.pipeline.Extract.extractContract(
        pruneIn.filter(nSpans > thr), skewSpanThreshold = thr)
        .filter(!col("quarantined")).select(count(lit(1)), sum(col("num_pages"))).collect()
    }
    // giant-leg sub-stages: where do the seconds go?
    val giants = pruneIn.filter(nSpans > thr)
      .select(col("doc_id").cast("string").as("doc_id"), col("spans"))
      .as[graft.model.RawDoc]
    t("giant_narrow_direct") { // whole-doc kernel, no split machinery
      graft.pipeline.Extract.extractSpansDF(pruneIn.filter(nSpans > thr))
        .select(count(lit(1)), sum(col("num_pages"))).collect()
    }
    val par = spark.sparkContext.defaultParallelism
    t("giant_explode_only") {
      giants.repartition(par, col("doc_id")).flatMap { d =>
        val spans = if (d.spans == null) Seq.empty[graft.model.Span] else d.spans.filter(_ != null)
        graft.kernel.Parse.paginate(spans).map { case (p, ss) => (d.doc_id, p, ss.length) }
      }.toDF("doc_id", "page_no", "n").select(count(lit(1))).collect()
    }
    t("giant_explode_scatter_page") {
      giants.repartition(par, col("doc_id")).flatMap { d =>
        val spans = if (d.spans == null) Seq.empty[graft.model.Span] else d.spans.filter(_ != null)
        graft.kernel.Parse.paginate(spans).map { case (p, ss) => (d.doc_id, p, ss) }
      }.toDF("doc_id", "page_no", "page_spans")
        .repartition(par, col("doc_id"), col("page_no"))
        .as[(String, Int, Seq[graft.model.Span])]
        .map { case (docId, pageNo, pageSpans) =>
          (docId, pageNo, graft.kernel.Extractor.extractPage(pageNo, pageSpans, graft.model.ExtractConfig.default).text_blocks.length)
        }.select(count(lit(1))).collect()
    }
    t("giant_pages_only") { // new declarative leg WITHOUT the per-doc regather
      graft.pipeline.Extract.pageSplitPages(
        pruneIn.filter(nSpans > thr)
          .select(col("doc_id").cast("string").as("doc_id"), col("spans"))
          .as[graft.model.RawDoc],
        graft.model.ExtractConfig.default, 0)
        .select(count(lit(1))).collect()
    }
    t("raw_e2e") {
      graft.pipeline.Extract.extractContract(pruneIn, skewSpanThreshold = thr)
        .filter(!col("quarantined")).select(count(lit(1)), sum(col("num_pages"))).collect()
    }
    t("managed_e2e") {
      graft.pipeline.Extract.extractContractFromTable(spark, managedDir, skewSpanThreshold = thr)
        .filter(!col("quarantined")).select(count(lit(1)), sum(col("num_pages"))).collect()
    }
    spark.stop()
  }
}
