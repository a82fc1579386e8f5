package graft

/** Scratch diagnostics: run one query with a listener printing per-job and
  * per-stage wall + task counts (attribution for action/stage overhead).
  * Usage: JobProbe <queryName> [sfDir] [reps]. */
object JobProbe {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("q50_dedup_clusters")
    val sf = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(2).map(_.toInt).getOrElse(2)
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.parquet.columnarReaderBatchSize", "64")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    @volatile var log = List.empty[String]
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      private val t0 = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
      private val s0 = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        t0.put(j.jobId, System.nanoTime())
      override def onJobEnd(j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        val dt = (System.nanoTime() - t0.getOrDefault(j.jobId, System.nanoTime())) / 1e9
        log ::= f"  job ${j.jobId}%3d ${dt}%7.3f s"
      }
      override def onStageSubmitted(s: org.apache.spark.scheduler.SparkListenerStageSubmitted): Unit =
        s0.put(s.stageInfo.stageId, System.nanoTime())
      override def onStageCompleted(s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val dt = (System.nanoTime() - s0.getOrDefault(s.stageInfo.stageId, System.nanoTime())) / 1e9
        log ::= f"    stage ${s.stageInfo.stageId}%3d ${dt}%7.3f s tasks=${s.stageInfo.numTasks}%3d  ${s.stageInfo.name.take(90)}"
      }
    })
    Bench.force(spark.read.parquet(s"$sf/lineitem.parquet").groupBy("l_returnflag").count())
    for (i <- 1 to reps) {
      log = Nil
      val t = System.nanoTime()
      Bench.force(SparkEntry.queries(name)(spark, sf))
      val wall = (System.nanoTime() - t) / 1e9
      Thread.sleep(300)
      println(f"== rep$i $name wall=$wall%6.3f s")
      log.reverse.foreach(println)
    }
    spark.stop()
  }
}
