package graft

import org.apache.spark.sql.SparkSession

/** Diagnostic main for the managed-input skew-prune A/B (VERDICT r04 #1):
  * the committed BENCH_r04 showed the managed (size-statted) table 2x
  * SLOWER than raw on the rare-giants corpus it targets, where the
  * builder's earlier windows showed a 1.25-1.34x WIN — i.e. the result was
  * noise- or config-dominated. This probe isolates the variables:
  * interleaved repeated timings (same JVM window) of the raw two-scan shape
  * vs the managed table written at several parquet row-group sizes,
  * reporting every sample + table bytes, so the shipped Bench config can be
  * chosen on measurement.
  *
  * Usage: runMain graft.ManagedProbe [nDocs] [reps] [blockMBs csv]
  */
object ManagedProbe {
  def main(args: Array[String]): Unit = {
    val nDocs = args.headOption.map(_.toInt).getOrElse(40000)
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val blockMBs = args.lift(2).map(_.split(",").map(_.toDouble).toSeq).getOrElse(Seq(1.0, 4.0, 8.0, 16.0))
    val threshPages = args.lift(3).map(_.toInt).getOrElse(128)
    val giantEvery = args.lift(4).map(_.toInt).getOrElse(1000)
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

    val root = java.nio.file.Files.createTempDirectory("managed_probe").toString
    val pruneDir = s"$root/prune.parquet"
    spark.createDataset(graft.fixtures.Fixtures.corpusIdsRareGiants(nDocs, giantEvery))
      .repartition(128)
      .map(graft.fixtures.Fixtures.gen _)
      .write.mode("overwrite").parquet(pruneDir)
    val pruneIn = spark.read.parquet(pruneDir)
    val pruneThreshold = threshPages * graft.kernel.Parse.SpansPerPage

    def dirBytes(p: String): Long = {
      val s = java.nio.file.Files.walk(java.nio.file.Paths.get(p))
      try s.filter(f => java.nio.file.Files.isRegularFile(f))
        .mapToLong(f => java.nio.file.Files.size(f)).sum
      finally s.close()
    }

    // managed variants, written once each
    val variants = blockMBs.map { mb =>
      val dir = s"$root/managed_${mb}mb.parquet"
      graft.io.TableIO.writeContractInput(pruneIn, dir, blockBytes = (mb * 1024 * 1024).toLong)
      (mb, dir)
    }
    println(s"""{"probe":"sizes","raw":${dirBytes(pruneDir)},${variants.map { case (mb, d) => s""""m$mb":${dirBytes(d)}""" }.mkString(",")}}""")

    def timedCount(df: org.apache.spark.sql.DataFrame): Double = {
      val t = System.nanoTime()
      df.filter(!org.apache.spark.sql.functions.col("quarantined"))
        .selectExpr("count(*) AS n", "sum(num_pages)").collect()
      (System.nanoTime() - t) / 1e9
    }

    def rawLeg(): Double = {
      spark.conf.set("spark.sql.parquet.columnarReaderBatchSize",
        graft.io.TableIO.autoBatchSize(pruneIn).toString)
      spark.conf.set("spark.sql.files.maxPartitionBytes",
        graft.io.TableIO.autoSplitBytes(pruneDir, cpus.toInt).toString)
      timedCount(graft.pipeline.Extract.extractContract(pruneIn, skewSpanThreshold = pruneThreshold))
    }
    def managedLeg(dir: String): Double = {
      spark.conf.set("spark.sql.parquet.columnarReaderBatchSize",
        graft.io.TableIO.autoBatchSize(spark.read.parquet(dir)).toString)
      spark.conf.set("spark.sql.files.maxPartitionBytes",
        graft.io.TableIO.autoSplitBytes(dir, cpus.toInt).toString)
      timedCount(graft.pipeline.Extract.extractContractFromTable(spark, dir,
        skewSpanThreshold = pruneThreshold))
    }

    // warmup both plan shapes
    rawLeg(); managedLeg(variants.head._2)

    val rawSamples = scala.collection.mutable.ArrayBuffer[Double]()
    val managedSamples = variants.map(_._1 -> scala.collection.mutable.ArrayBuffer[Double]()).toMap
    (1 to reps).foreach { rep =>
      rawSamples += rawLeg()
      variants.foreach { case (mb, dir) => managedSamples(mb) += managedLeg(dir) }
      println(s"""{"probe":"rep","rep":$rep,"raw":${rawSamples.last},${variants.map { case (mb, _) => s""""m$mb":${managedSamples(mb).last}""" }.mkString(",")}}""")
    }
    def mn(xs: Seq[Double]) = xs.min
    println(s"""{"probe":"min","raw":${mn(rawSamples.toSeq)},${variants.map { case (mb, _) => s""""m$mb":${mn(managedSamples(mb).toSeq)}""" }.mkString(",")},"speedup_vs_raw":{${variants.map { case (mb, _) => s""""m$mb":${mn(rawSamples.toSeq) / mn(managedSamples(mb).toSeq)}""" }.mkString(",")}}}""")
    spark.stop()
  }
}
