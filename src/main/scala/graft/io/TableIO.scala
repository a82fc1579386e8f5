package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths, StandardCopyOption}
import java.nio.charset.StandardCharsets

/** Snapshot-table I/O: Iceberg-semantics emulation over partitioned Parquet
  * plus JSON manifests (no Iceberg runtime jar ships in this environment —
  * SURVEY.md §7; the API is format-agnostic so a real Iceberg catalog is a
  * config swap).
  *
  * Layout under `root/`:
  *   data/snapshot=<id>/part-*.parquet      immutable snapshot data
  *   _manifests/<id>.json                   committed manifest (atomic rename)
  *   _manifests/CURRENT                     name of the live snapshot
  *
  * Guarantees:
  *   - writers stage into data/snapshot=<id> then commit by writing the
  *     manifest and atomically swapping CURRENT — readers never observe a
  *     half-written snapshot
  *   - idempotent re-run: an existing committed snapshot id is a no-op
  *     (resume-safe per the north_rule's "resumable from checkpoint")
  *   - lineage: the manifest records input paths, row count, app id and
  *     per-partition metrics
  */
object TableIO {

  final case class Manifest(
      snapshotId: String,
      rowCount: Long,
      files: Seq[String],
      inputs: Seq[String],
      appId: String,
      committedAtMs: Long,
      metrics: Map[String, Long])

  private def manifestDir(root: String) = Paths.get(root, "_manifests")
  private def dataDir(root: String, id: String) = Paths.get(root, "data", s"snapshot=$id")

  def isCommitted(root: String, snapshotId: String): Boolean =
    Files.exists(manifestDir(root).resolve(s"$snapshotId.json"))

  def currentSnapshot(root: String): Option[String] = {
    val cur = manifestDir(root).resolve("CURRENT")
    if (Files.exists(cur)) Some(new String(Files.readAllBytes(cur), StandardCharsets.UTF_8).trim)
    else None
  }

  private def jsonEscape(s: String): String =
    s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }

  private def renderManifest(m: Manifest): String = {
    def arr(xs: Seq[String]) = xs.map(x => "\"" + jsonEscape(x) + "\"").mkString("[", ",", "]")
    val met = m.metrics.map { case (k, v) => "\"" + jsonEscape(k) + "\":" + v }.mkString("{", ",", "}")
    s"""{"snapshot_id":"${jsonEscape(m.snapshotId)}","row_count":${m.rowCount},""" +
      s""""files":${arr(m.files)},"inputs":${arr(m.inputs)},"app_id":"${jsonEscape(m.appId)}",""" +
      s""""committed_at_ms":${m.committedAtMs},"metrics":$met}"""
  }

  /** Write `df` as snapshot `snapshotId`, committing atomically. Returns the
    * manifest; a committed id short-circuits (idempotent resume). */
  def writeSnapshot(
      df: DataFrame,
      root: String,
      snapshotId: String,
      inputs: Seq[String] = Nil,
      extraMetrics: Map[String, Long] = Map.empty): Manifest = {
    if (isCommitted(root, snapshotId)) return readManifest(root, snapshotId)

    val target = dataDir(root, snapshotId)
    // stale uncommitted data from a crashed attempt is safe to overwrite
    df.write.mode("overwrite").parquet(target.toString)

    val spark = df.sparkSession
    val rows = spark.read.parquet(target.toString).count()
    val files = Files.list(target).toArray.map(_.toString).filter(_.endsWith(".parquet")).sorted.toSeq
    val manifest = Manifest(snapshotId, rows, files, inputs,
      spark.sparkContext.applicationId, System.currentTimeMillis(), extraMetrics)

    Files.createDirectories(manifestDir(root))
    val tmp = manifestDir(root).resolve(s".$snapshotId.json.tmp")
    Files.write(tmp, renderManifest(manifest).getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, manifestDir(root).resolve(s"$snapshotId.json"), StandardCopyOption.ATOMIC_MOVE)

    val curTmp = manifestDir(root).resolve(".CURRENT.tmp")
    Files.write(curTmp, snapshotId.getBytes(StandardCharsets.UTF_8))
    Files.move(curTmp, manifestDir(root).resolve("CURRENT"), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    manifest
  }

  // ---------------------------------------------------------------------
  // Partition-level resume: the snapshot is written as doc_bucket
  // partitions, each committed with its own marker; a re-run writes ONLY
  // the missing buckets (dynamic partition overwrite), so any partition
  // resumes idempotently after a mid-job failure (north_rule).
  // ---------------------------------------------------------------------

  private def bucketMarkerDir(root: String, id: String) = manifestDir(root).resolve(s"buckets-$id")

  def committedBuckets(root: String, snapshotId: String): Set[Int] = {
    val dir = bucketMarkerDir(root, snapshotId)
    if (!Files.exists(dir)) Set.empty
    else Files.list(dir).toArray.map(_.toString)
      .flatMap(p => "bucket-(\\d+)\\.done$".r.findFirstMatchIn(p).map(_.group(1).toInt)).toSet
  }

  /** Write `df` (must carry doc_id) as snapshot partitions bucketed by
    * xxhash64(doc_id) % buckets; re-runs skip committed buckets and rewrite
    * only missing ones. Commit the snapshot manifest once all buckets are in. */
  def writeSnapshotResumable(
      df: DataFrame,
      root: String,
      snapshotId: String,
      buckets: Int = 64,
      inputs: Seq[String] = Nil): Manifest = {
    if (isCommitted(root, snapshotId)) return readManifest(root, snapshotId)
    val spark = df.sparkSession
    val done = committedBuckets(root, snapshotId)
    val missing = (0 until buckets).filterNot(done)
    val target = dataDir(root, snapshotId)
    if (missing.nonEmpty) {
      val withBucket = df
        .withColumn("doc_bucket", pmod(xxhash64(col("doc_id")), lit(buckets)).cast("int"))
        .filter(col("doc_bucket").isin(missing: _*))
        .repartition(col("doc_bucket"))
      val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
      spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
      try withBucket.write.mode("overwrite").partitionBy("doc_bucket").parquet(target.toString)
      finally prev match {
        case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
        case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
      }
      Files.createDirectories(bucketMarkerDir(root, snapshotId))
      missing.foreach { b =>
        Files.write(bucketMarkerDir(root, snapshotId).resolve(s"bucket-$b.done"), Array.empty[Byte])
      }
    }
    // all buckets present -> commit the snapshot manifest atomically
    val rows = spark.read.parquet(target.toString).count()
    val files = Files.walk(target).toArray.map(_.toString).filter(_.endsWith(".parquet")).sorted.toSeq
    val manifest = Manifest(snapshotId, rows, files, inputs,
      spark.sparkContext.applicationId, System.currentTimeMillis(),
      Map("buckets" -> buckets.toLong, "resumed_buckets" -> (buckets - missing.length).toLong))
    Files.createDirectories(manifestDir(root))
    val tmp = manifestDir(root).resolve(s".$snapshotId.json.tmp")
    Files.write(tmp, renderManifest(manifest).getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, manifestDir(root).resolve(s"$snapshotId.json"), StandardCopyOption.ATOMIC_MOVE)
    val curTmp = manifestDir(root).resolve(".CURRENT.tmp")
    Files.write(curTmp, snapshotId.getBytes(StandardCharsets.UTF_8))
    Files.move(curTmp, manifestDir(root).resolve("CURRENT"), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    manifest
  }

  def readManifest(root: String, snapshotId: String): Manifest = {
    val txt = new String(Files.readAllBytes(manifestDir(root).resolve(s"$snapshotId.json")), StandardCharsets.UTF_8)
    // minimal field extraction (manifests are machine-written, flat JSON)
    def strField(k: String) = ("\"" + k + "\":\"([^\"]*)\"").r.findFirstMatchIn(txt).map(_.group(1)).getOrElse("")
    def longField(k: String) = ("\"" + k + "\":(\\d+)").r.findFirstMatchIn(txt).map(_.group(1).toLong).getOrElse(0L)
    def arrField(k: String) = ("\"" + k + "\":\\[([^\\]]*)\\]").r.findFirstMatchIn(txt).map(_.group(1)).getOrElse("")
      .split(",").filter(_.nonEmpty).map(_.stripPrefix("\"").stripSuffix("\"")).toSeq
    Manifest(strField("snapshot_id"), longField("row_count"), arrField("files"),
      arrField("inputs"), strField("app_id"), longField("committed_at_ms"), Map.empty)
  }

  /** Read the current committed snapshot (or a named one). */
  /** Bucketed table write: pre-hash-partition + sort by the join key so
    * doc-keyed joins between co-bucketed tables plan WITHOUT a shuffle
    * (SortMergeJoin over bucket-aligned scans — the 100 TB pattern for
    * repeated joins on doc_id, e.g. spans x metadata x quality scores;
    * the Exchange that a plain parquet join needs on BOTH corpus-sized
    * sides disappears). Uses the session catalog's managed-table bucketing
    * (swap for Iceberg bucket partition transforms on a real catalog). */
  /** Write the contract input table WITH a `n_spans` stats column, range-
    * clustered by document size so giant docs land in their own files/row
    * groups. At 100 TB this is what makes the skew split's "second scan"
    * free: `extractContractFromTable`'s big-leg predicate
    * (`n_spans > threshold`) is an ordinary pushable column filter, so
    * parquet row-group min/max stats skip every non-giant row group instead
    * of decoding the whole corpus twice (the raw (doc_id, spans) input has
    * nothing pushable — size(spans) cannot reach the scan).
    *
    * Bucket count trades pruning granularity against read parallelism: a
    * parquet file's row group is the effective read unit, so too few
    * buckets serializes the scan (measured 3x wall at 8 buckets/160k docs).
    * `blockBytes` (parquet row-group size) is the same lever at sub-file
    * granularity: size-clustering compresses so well that a SMALL corpus at
    * the 8 MB default yields too few row groups for one task wave — pass
    * ~totalBytes/512 for benchmark-sized corpora (readers cannot split
    * inside a row group, so row groups bound scan parallelism). */
  def writeContractInput(df: DataFrame, path: String, sizeBuckets: Int = 128,
      blockBytes: Long = 8L * 1024 * 1024): Unit =
    df.select(col("doc_id"), col("spans"),
        coalesce(size(col("spans")), lit(0)).as("n_spans"))
      // doc_id tiebreak: n_spans is low-cardinality (doc sizes cluster), and
      // range partitioning cannot split equal keys — without the tiebreak
      // the most common size lands whole in one partition (measured 3-4x
      // wall from the resulting file skew)
      .repartitionByRange(sizeBuckets, col("n_spans"), col("doc_id"))
      .sortWithinPartitions("n_spans", "doc_id")
      // small row groups: range buckets hold equal ROW counts, but giant
      // docs dominate BYTES — with the 128 MB default a handful of
      // giant-heavy files become one row group each, and the row group is
      // the read unit (measured: 7 tasks carrying 94% of the corpus bytes).
      // 8 MB groups restore scan parallelism AND give finer stats pruning.
      .write.mode("overwrite").option("parquet.block.size", blockBytes)
      // fine-grained flush checks: the writer samples row-group size on a
      // ROW-COUNT stride estimated from earlier rows (bounded by the page
      // row-check knobs, which also throttle the block check in
      // InternalParquetRecordWriter) — after a run of small docs it strides
      // right past blockBytes when the giants arrive (measured: a 3.7 MB
      // giants-only group at blockBytes=1 MB). Size-clustered writes hit
      // this by construction.
      .option("parquet.page.size.row.check.min", "2")
      .option("parquet.page.size.row.check.max", "2")
      .parquet(path)

  /** Byte-budgeted columnar batch size (VERDICT r03 #3: one config must meet
    * BOTH the peak-throughput and the N→4N efficiency gate): choose
    * `spark.sql.parquet.columnarReaderBatchSize` so one decoded batch of the
    * LARGEST rows in this corpus stays within `targetBatchBytes`, instead of
    * hardcoding a row count. Span-array rows make batch MEMORY scale with
    * rowBytes × batchSize, and the skewed giants dominate rowBytes — so the
    * budget keys on the max row, not the average (a batch that lands in a
    * giant-heavy region must still fit).
    *
    * Row size is estimated from the table's own data: max spans/doc (the
    * `n_spans` stats column when present, else `size(spans)`) × bytes/span
    * from a bounded sample. Two tiny setup scans, untimed; a warehouse
    * deployment reads the same two numbers from table stats. Clamped to
    * [16, 4096] (the vectorized-reader sane range). */
  def autoBatchSize(input: DataFrame, targetBatchBytes: Long = 24L << 20): Int = {
    val nCol =
      if (input.columns.contains("n_spans")) col("n_spans")
      else coalesce(size(col("spans")), lit(0))
    val mxRow = input.select(max(nCol).cast("long").as("mx")).collect()(0)
    val maxSpans = if (mxRow.isNullAt(0)) 1L else math.max(mxRow.getLong(0), 1L)
    val sampleRow = input.select(explode(col("spans")).as("s")).limit(20000)
      .select(avg(coalesce(octet_length(col("s.text")), lit(0)) +
        coalesce(octet_length(col("s.media_ref")), lit(0)) + lit(24)).as("b"))
      .collect()(0)
    val bytesPerSpan = if (sampleRow.isNullAt(0)) 64.0 else math.max(sampleRow.getDouble(0), 16.0)
    val rowBytes = math.max(maxSpans * bytesPerSpan, 1.0)
    math.max(16L, math.min(4096L, (targetBatchBytes / rowBytes).toLong)).toInt
  }

  /** Choose `spark.sql.files.maxPartitionBytes` for a corpus directory so
    * the narrow extraction scan makes ~`waves` task waves per core — enough
    * tasks to amortize stragglers and co-tenant jitter, few enough that
    * per-task overhead stays negligible. At warehouse scale the file count
    * provides this naturally; a small benchmark corpus read with the 128 MB
    * default collapses to a single straggler-bound wave (measured 2-3×
    * wall). Clamped to [1 MB, 128 MB]. */
  def autoSplitBytes(path: String, cores: Int, waves: Int = 4): Long = {
    // local filesystem paths only: for a non-local URI (hdfs://, s3a://...)
    // java.nio cannot stat the tree — returning the 1 MB clamp on a "0-byte"
    // corpus would be pathological, so keep Spark's 128 MB default instead
    // (a real deployment reads the size from the table's file index/stats)
    // scheme must be >= 2 chars: a single letter before ':' is a Windows
    // drive (C:\data), which is a local path, not a remote URI (ADVICE r05)
    val scheme = "^([a-zA-Z][a-zA-Z0-9+.-]+):".r.findFirstMatchIn(path).map(_.group(1))
    if (scheme.exists(_ != "file")) return 128L << 20
    val p = java.nio.file.Paths.get(path.stripPrefix("file:"))
    val total =
      if (java.nio.file.Files.exists(p)) {
        val s = java.nio.file.Files.walk(p)
        try s.filter(f => java.nio.file.Files.isRegularFile(f))
          .mapToLong(f => java.nio.file.Files.size(f)).sum
        finally s.close()
      } else 0L
    math.max(1L << 20, math.min(128L << 20, total / math.max(1, cores * waves)))
  }

  def writeBucketed(df: DataFrame, tableName: String, bucketCol: String, buckets: Int): Unit =
    df.write
      .mode(org.apache.spark.sql.SaveMode.Overwrite)
      .format("parquet")
      .bucketBy(buckets, bucketCol)
      .sortBy(bucketCol)
      .saveAsTable(tableName)

  def readSnapshot(spark: SparkSession, root: String, snapshotId: Option[String] = None): DataFrame = {
    val id = snapshotId.orElse(currentSnapshot(root))
      .getOrElse(throw new IllegalStateException(s"no committed snapshot under $root"))
    spark.read.parquet(dataDir(root, id).toString)
  }
}

/** Row-level sinks mirroring the reference's save surface
  * (reference: models.py:179-203 save_text/save_json; cli.py:125-150
  * text|json|structured formats). */
object Sinks {

  /** result.save_text analog: one text file tree of doc texts. */
  def writeText(df: DataFrame, path: String): Unit =
    df.select(col("text")).write.mode("overwrite").text(path)

  /** result.save_json analog (to_dict -> json.dumps; indentation is sink
    * formatting, not semantics — models.py:191-198). */
  def writeJson(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  /** The contract span table as parquet partitioned by a doc_id bucket —
    * the partitioning a 10^12-row table needs for parallel rewrite/resume.
    * Repartitions BY the bucket column first: without it every task writes
    * into every partition directory (tasks x buckets small files — measured
    * as the dominant cost of the CLI job). */
  def writeSpansBucketed(df: DataFrame, path: String, buckets: Int = 256): Unit =
    df.withColumn("doc_bucket", pmod(xxhash64(col("doc_id")), lit(buckets)))
      .repartition(col("doc_bucket"))
      .write.mode("overwrite")
      .partitionBy("doc_bucket")
      .parquet(path)

  /** Quarantine side-output: bad rows routed to their own sink, never thrown
    * on executors (SURVEY.md §2.1 validation filter). Returns (good, bad). */
  def splitQuarantine(df: DataFrame): (DataFrame, DataFrame) =
    (df.filter(!col("quarantined")).drop("quarantined", "error"),
     df.filter(col("quarantined")))
}
