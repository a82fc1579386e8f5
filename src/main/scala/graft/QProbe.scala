package graft

/** Single-query isolation probe: times one SparkEntry query N times in a
  * fresh session (attribution tool for per-query bench swings).
  * Usage: QProbe <queryName> [sfDir] [reps] [warmName]. */
object QProbe {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("q24_fingerprint")
    val sf = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(2).map(_.toInt).getOrElse(3)
    val warm = args.lift(3)
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.parquet.columnarReaderBatchSize", "64")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Bench.force(spark.read.parquet(s"$sf/lineitem.parquet").groupBy("l_returnflag").count())
    warm.foreach { w =>
      val t0 = System.nanoTime()
      Bench.force(SparkEntry.queries(w)(spark, sf))
      println(f"QPROBE warm  $w ${(System.nanoTime() - t0) / 1e9}%6.3f s")
    }
    for (i <- 1 to reps) {
      val t0 = System.nanoTime()
      Bench.force(SparkEntry.queries(name)(spark, sf))
      println(f"QPROBE rep$i $name ${(System.nanoTime() - t0) / 1e9}%6.3f s")
    }
    spark.stop()
  }
}
