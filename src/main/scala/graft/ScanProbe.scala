package graft

import org.apache.spark.sql.functions._

/** Decomposes the extraction wall time: (a) parquet scan+decode only,
  * (b) scan + columnar span-field projection to the kernel's wire arrays,
  * (c) the full contract pipeline. Usage: ScanProbe <cores> <corpusPath>. */
object ScanProbe {
  def main(args: Array[String]): Unit = {
    val cores = args.headOption.getOrElse("32").toInt
    val path = args.lift(1).getOrElse("target/scaling_corpus.parquet")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.sql.files.openCostInBytes", "1m")
      .config("spark.sql.parquet.columnarReaderBatchSize",
        sys.env.getOrElse("SPARK_GRAFT_BATCH", "512"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def time(name: String)(f: => Unit): Unit = {
      f // warmup
      val t0 = System.nanoTime()
      f
      println(f"PROBE $name%-22s ${(System.nanoTime() - t0) / 1e9}%6.1f s")
    }

    val docs = spark.read.parquet(path)
    time("scan+count") {
      docs.selectExpr("count(*)", "sum(size(spans))").collect()
    }
    time("scan+project-arrays") {
      docs.select(col("doc_id").cast("string").as("doc_id"),
        col("spans.kind").as("kinds"), col("spans.text").as("texts"),
        col("spans.media_ref").as("refs"), col("spans.offset").as("offsets"))
        .as[graft.pipeline.Extract.RawDocArr]
        .mapPartitions(it => Iterator.single(it.map(d => if (d.kinds == null) 0 else d.kinds.length).sum))
        .collect()
    }
    time("kernel-only") {
      // input deser + kernel, NO output encoding: emits one Int per partition
      docs.select(col("doc_id").cast("string").as("doc_id"),
        col("spans.kind").as("kinds"), col("spans.text").as("texts"),
        col("spans.media_ref").as("refs"), col("spans.offset").as("offsets"))
        .as[graft.pipeline.Extract.RawDocArr]
        .mapPartitions { it =>
          val cfg = graft.model.ExtractConfig.default
          Iterator.single(it.map(d => graft.pipeline.Extract.runKernelArrProbe(d, cfg)).sum)
        }
        .collect()
    }
    time("kernel+arr-encode") {
      // input deser + kernel + output ARRAY encoding, no struct reassembly
      docs.select(col("doc_id").cast("string").as("doc_id"),
        col("spans.kind").as("kinds"), col("spans.text").as("texts"),
        col("spans.media_ref").as("refs"), col("spans.offset").as("offsets"))
        .as[graft.pipeline.Extract.RawDocArr]
        .mapPartitions { it =>
          val cfg = graft.model.ExtractConfig.default
          it.map(graft.pipeline.Extract.runKernelArrShared(_, cfg))
        }
        .selectExpr("count(*)", "sum(size(kinds))").collect()
    }
    time("contract declarative") {
      graft.pipeline.Extract.extractSpansDFDeclarative(docs)
        .selectExpr("count(*)", "sum(coalesce(size(spans),0))").collect()
    }
    time("contract fast rows") {
      graft.pipeline.Extract.extractSpansRows(docs)
        .selectExpr("count(*)", "sum(coalesce(size(spans),0))").collect()
    }
    time("full contract") {
      graft.pipeline.Extract.extractContract(docs)
        .selectExpr("count(*)", "sum(coalesce(size(spans),0))").collect()
    }
    val stattedPath = path.stripSuffix("/") + "_statted"
    if (java.nio.file.Files.exists(java.nio.file.Paths.get(stattedPath))) {
      val st = spark.read.parquet(stattedPath)
      time("statted scan+count") {
        st.selectExpr("count(*)", "sum(size(spans))").collect()
      }
      time("statted fast rows (no filter)") {
        graft.pipeline.Extract.extractSpansRows(st.select(col("doc_id"), col("spans")))
          .selectExpr("count(*)", "sum(coalesce(size(spans),0))").collect()
      }
      time("statted fast rows (n_spans filter)") {
        graft.pipeline.Extract.extractSpansRows(
          st.filter(col("n_spans") <= 12288).select(col("doc_id"), col("spans")))
          .selectExpr("count(*)", "sum(coalesce(size(spans),0))").collect()
      }
      time("statted full fromTable") {
        graft.pipeline.Extract.extractContractFromTable(spark, stattedPath)
          .selectExpr("count(*)", "sum(coalesce(size(spans),0))").collect()
      }
    }
    spark.stop()
  }
}
