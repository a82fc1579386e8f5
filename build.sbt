ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "pdfextractorspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  // pin the heap: without -Xms the heap grows from ~2g DURING the timed
  // region and the page-zeroing is billed to the run (measured: 27-40 s
  // wall at local[32] unpinned vs 15-19 s pinned+pretouched). AlwaysPreTouch
  // alone only helps pages committed at startup.
  s"-Xms${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  // pre-touch at JVM start: on this virtualized host a lazy first-touch
  // page fault costs ~10-25 us; 16 GB of them inside the timed region is
  // tens of seconds (measured; see NOTES.md)
  "-XX:+AlwaysPreTouch",
  // throughput collector: the extraction kernel is a batch allocator; G1's
  // pause targeting cost ~2x wall at 32 threads (measured in ScaleProbe).
  // On a real cluster: spark.executor.extraJavaOptions=-XX:+UseParallelGC.
  "-XX:+UseParallelGC",
  // pin GC threads to the box's cores: JDK dynamic GC-thread ergonomics key
  // on the APPLICATION thread count, so a local[N<cores] run silently gets
  // a fraction of the GC capacity a real cluster owns per executor —
  // measured -27% wall at local[8] (see BENCH/BASELINE.md r4)
  s"-XX:ParallelGCThreads=${java.lang.Runtime.getRuntime.availableProcessors}",
) ++ sys.env.get("SPARK_GRAFT_JVM_OPTS").toSeq.flatMap(_.split(" ").filter(_.nonEmpty))
