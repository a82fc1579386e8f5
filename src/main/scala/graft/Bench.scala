package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver-contract benchmark: one JSON line with per-query seconds over
  * SPARK_GRAFT_SF_DIR at local[SPARK_GRAFT_CPUS].
  *
  * Measurement notes:
  *   - results are materialized through the noop sink: a bare count() lets
  *     Catalyst prune computed projections and would time the scan only
  *   - first query pays session/codegen warmup; a warmup query runs first
  *     and is excluded
  *   - extraction throughput (docs/sec, pages/sec) over the deterministic
  *     fixture corpus is reported alongside (BASELINE.md metric)
  */
object Bench {
  def force(df: DataFrame): Unit = df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      // span-array rows: columnar batch memory scales with rowSize x
      // batchSize and giant docs dominate bytes — 64-row batches keep the
      // per-task batch ~20 MB (measured -30%+ extraction wall vs 512)
      .config("spark.sql.parquet.columnarReaderBatchSize",
        sys.env.getOrElse("SPARK_GRAFT_BATCH", "64"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.memory", sys.env.getOrElse("SPARK_DRIVER_MEM", "8g"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // warmup: session + codegen + parquet footer caches (excluded from timings)
    force(spark.read.parquet(s"$sfDir/lineitem.parquet").groupBy("l_returnflag").count())

    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try force(fn(spark, sfDir))
      catch { case e: Throwable => System.err.println(s"[bench] $name failed: ${e.getMessage}") }
      name -> (System.nanoTime() - t0) / 1e9
    }

    // extraction throughput on the span corpus derived from documents.parquet
    val t0 = System.nanoTime()
    val stats = graft.pipeline.Extract
      .extractContract(SparkEntry.rawDocs(spark, sfDir).toDF())
      .filter(!org.apache.spark.sql.functions.col("quarantined"))
      .selectExpr("count(*) AS docs", "sum(num_pages) AS pages", "sum(coalesce(size(spans),0)) AS spans")
      .collect()(0)
    val extractSec = (System.nanoTime() - t0) / 1e9
    val docs = stats.getLong(0); val pages = stats.getLong(1); val spans = stats.getLong(2)

    // sustained extraction throughput: the per-sf corpus above is small
    // enough that scheduling/codegen overhead dominates (a 3 s job says
    // nothing about pages/sec); this leg materializes a 40k-doc fixture
    // corpus (archetype mix incl. 1-in-20 giants) to parquet UNTIMED, then
    // times the contract pipeline over it — the BASELINE.md metric shape.
    val sustainedDir = java.nio.file.Files.createTempDirectory("bench_sustained").toString + "/corpus.parquet"
    locally {
      import spark.implicits._
      spark.createDataset(graft.fixtures.Fixtures.corpusIds(40000))
        .repartition(128)
        .map(graft.fixtures.Fixtures.gen _)
        .write.mode("overwrite").parquet(sustainedDir)
    }
    val sustainedIn = spark.read.parquet(sustainedDir)
    // JIT warmup (same plan, small slice), then the timed full pass
    graft.pipeline.Extract.extractContract(sustainedIn.limit(1500)).selectExpr("count(*)").collect()
    val s0 = System.nanoTime()
    val sStats = graft.pipeline.Extract.extractContract(sustainedIn)
      .filter(!org.apache.spark.sql.functions.col("quarantined"))
      .selectExpr("count(*) AS docs", "sum(num_pages) AS pages", "sum(coalesce(size(spans),0)) AS spans")
      .collect()(0)
    val sSec = (System.nanoTime() - s0) / 1e9
    val sDocs = sStats.getLong(0); val sPages = sStats.getLong(1); val sSpans = sStats.getLong(2)

    // clean up the temp corpus — it leaked ~per-run disk otherwise (ADVICE r02)
    locally {
      import java.nio.file.{Files, Path, Paths}
      import java.util.Comparator
      val root = Paths.get(sustainedDir).getParent
      if (root != null && Files.exists(root)) {
        Files.walk(root).sorted(Comparator.reverseOrder[Path]())
          .forEach(p => Files.deleteIfExists(p))
      }
    }

    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val total = results.map(_._2).sum + extractSec
    println(
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir",""" +
      s""""extract":{"sec":$extractSec,"docs":$docs,"pages":$pages,"spans":$spans,""" +
      s""""docs_per_sec":${docs / extractSec},"pages_per_sec":${pages / extractSec}},""" +
      s""""extract_sustained":{"sec":$sSec,"docs":$sDocs,"pages":$sPages,"spans":$sSpans,""" +
      s""""docs_per_sec":${sDocs / sSec},"pages_per_sec":${sPages / sSec}},""" +
      s""""cpus":$cpus}""")
    spark.stop()
  }
}
