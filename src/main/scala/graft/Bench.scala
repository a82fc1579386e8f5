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

    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val total = results.map(_._2).sum + extractSec
    println(
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir",""" +
      s""""extract":{"sec":$extractSec,"docs":$docs,"pages":$pages,"spans":$spans,""" +
      s""""docs_per_sec":${docs / extractSec},"pages_per_sec":${pages / extractSec}},""" +
      s""""cpus":$cpus}""")
    spark.stop()
  }
}
