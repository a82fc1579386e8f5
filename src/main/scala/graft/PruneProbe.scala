package graft

import org.apache.spark.sql.functions._

/** Decomposes the skew-split pipeline per leg on BOTH input layouts (raw vs
  * size-statted managed): small-leg wall, big-leg wall, union wall. Usage:
  * PruneProbe <cores> <rawPath> <managedPath> [thresholdPages]. */
object PruneProbe {
  def main(args: Array[String]): Unit = {
    val cores = args.headOption.getOrElse("32").toInt
    val rawPath = args.lift(1).getOrElse("target/prune_corpus.parquet")
    val mgdPath = args.lift(2).getOrElse(rawPath + "_managed")
    val thrPages = args.lift(3).getOrElse("128").toInt
    val thr = thrPages * graft.kernel.Parse.SpansPerPage
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "1m")
      .config("spark.sql.files.openCostInBytes", "1m")
      .config("spark.sql.parquet.columnarReaderBatchSize", "50")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def time(name: String)(f: => Long): Unit = {
      f // warmup
      val t0 = System.nanoTime()
      val n = f
      println(f"PROBE $name%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s  (n=$n)")
    }

    if (!java.nio.file.Files.exists(java.nio.file.Paths.get(rawPath))) {
      spark.createDataset(graft.fixtures.Fixtures.corpusIdsRareGiants(40000))
        .repartition(128).map(graft.fixtures.Fixtures.gen _)
        .write.mode("overwrite").parquet(rawPath)
    }
    if (!java.nio.file.Files.exists(java.nio.file.Paths.get(mgdPath))) {
      graft.io.TableIO.writeContractInput(spark.read.parquet(rawPath), mgdPath,
        blockBytes = 1L << 20)
    }
    val raw = spark.read.parquet(rawPath)
    val mgd = spark.read.parquet(mgdPath)
    val nRaw = coalesce(size(col("spans")), lit(0))

    time("raw small leg") {
      graft.pipeline.Extract.extractSpansRows(
        raw.filter(nRaw <= thr).select(col("doc_id").cast("string").as("doc_id"), col("spans")))
        .selectExpr("count(*)").collect()(0).getLong(0)
    }
    time("mgd small leg") {
      graft.pipeline.Extract.extractSpansRows(
        mgd.filter(col("n_spans") <= thr).select(col("doc_id").cast("string").as("doc_id"), col("spans")))
        .selectExpr("count(*)").collect()(0).getLong(0)
    }
    time("raw big leg (via contract)") {
      graft.pipeline.Extract.extractContract(raw.filter(nRaw > thr), skewSpanThreshold = thr)
        .selectExpr("count(*)").collect()(0).getLong(0)
    }
    time("mgd big leg (via contract)") {
      graft.pipeline.Extract.extractContract(mgd.filter(col("n_spans") > thr).select(col("doc_id"), col("spans")),
        skewSpanThreshold = thr)
        .selectExpr("count(*)").collect()(0).getLong(0)
    }
    time("mgd giants scan count") {
      mgd.filter(col("n_spans") > thr).selectExpr("count(*)").collect()(0).getLong(0)
    }
    time("mgd giants decode spans") {
      mgd.filter(col("n_spans") > thr).selectExpr("sum(size(spans))").collect()(0).getLong(0)
    }
    time("mgd giants as[RawDoc]") {
      mgd.filter(col("n_spans") > thr)
        .select(col("doc_id").cast("string").as("doc_id"), col("spans")).as[graft.model.RawDoc]
        .mapPartitions(it => Iterator.single(it.map(_.spans.length.toLong).sum))
        .collect().sum
    }
    time("raw giants as[RawDoc]") {
      raw.filter(nRaw > thr)
        .select(col("doc_id").cast("string").as("doc_id"), col("spans")).as[graft.model.RawDoc]
        .mapPartitions(it => Iterator.single(it.map(_.spans.length.toLong).sum))
        .collect().sum
    }
    def units(src: org.apache.spark.sql.DataFrame, pred: org.apache.spark.sql.Column) =
      src.filter(pred).select(col("doc_id").cast("string").as("doc_id"), col("spans"))
        .as[graft.model.RawDoc]
        .flatMap { d =>
          val spans = if (d.spans == null) Seq.empty[graft.model.Span] else d.spans.filter(_ != null)
          graft.kernel.Parse.paginate(spans).map { case (p, ss) => (d.doc_id, p, ss) }
        }.toDF("doc_id", "page_no", "page_spans")
    time("mgd giants explode only") {
      units(mgd, col("n_spans") > thr).selectExpr("count(*)").collect()(0).getLong(0)
    }
    time("mgd giants explode+shuffle") {
      units(mgd, col("n_spans") > thr).repartition(32, col("doc_id"), col("page_no"))
        .selectExpr("count(*)").collect()(0).getLong(0)
    }
    time("raw giants explode+shuffle") {
      units(raw, nRaw > thr).repartition(32, col("doc_id"), col("page_no"))
        .selectExpr("count(*)").collect()(0).getLong(0)
    }
    time("raw full contract") {
      graft.pipeline.Extract.extractContract(raw, skewSpanThreshold = thr)
        .selectExpr("count(*)").collect()(0).getLong(0)
    }
    time("mgd full contractFromTable") {
      graft.pipeline.Extract.extractContractFromTable(spark, mgdPath, skewSpanThreshold = thr)
        .selectExpr("count(*)").collect()(0).getLong(0)
    }
    spark.stop()
  }
}
