package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.model.ExtractConfig

/** Structured Streaming composition of the extraction pipeline.
  *
  * The reference is batch-only (SURVEY.md §2.13) — this is the optional
  * extension the kernel's statelessness makes free: the same narrow
  * `mapPartitions` plan runs under `readStream`/`writeStream` with
  * exactly-once file-sink semantics via the checkpoint. Late data needs no
  * special handling for extraction itself (row-local); the windowed metrics
  * stream below shows the watermarked-aggregation shape.
  */
object StreamingExtract {

  val InputSchema: StructType = StructType(Seq(
    StructField("doc_id", StringType),
    StructField("spans", ArrayType(StructType(Seq(
      StructField("kind", StringType),
      StructField("text", StringType),
      StructField("media_ref", StringType),
      StructField("offset", IntegerType)))))))

  /** Streaming DataFrame in, streaming DataFrame out — the identical
    * extraction plan as batch (extractSpansDF is shuffle-free, so it is
    * trivially streamable). */
  def extractStream(input: DataFrame, cfg: ExtractConfig = ExtractConfig.default): DataFrame =
    graft.pipeline.Extract.extractSpansDF(input, cfg)

  /** File-source to file-sink pipeline with checkpointed exactly-once
    * semantics: new parquet files under `inPath` are extracted incrementally. */
  def runFileStream(
      spark: SparkSession,
      inPath: String,
      outPath: String,
      checkpoint: String,
      cfg: ExtractConfig = ExtractConfig.default): StreamingQuery = {
    val in = spark.readStream.schema(InputSchema).parquet(inPath)
    extractStream(in, cfg)
      .writeStream
      .format("parquet")
      .option("path", outPath)
      .option("checkpointLocation", checkpoint)
      .start()
  }

  /** Streaming exact-dedup with custom state
    * (`KeyValueGroupedDataset.flatMapGroupsWithState`): keyed by the FULL
    * 128-bit md5 content fingerprint (a 32-bit key collides past ~2^16
    * distinct docs and silently drops distinct content — ADVICE r02), emits
    * only the FIRST occurrence of each fingerprint across the stream;
    * duplicates arriving in any later (or the same) micro-batch are dropped.
    *
    * State per key is the kept doc_id — bounded by distinct-content
    * cardinality, the same state size a batch dedup's shuffle would
    * materialize. For an always-on service that bound still grows forever,
    * so `stateTtl` (processing-time timeout, refreshed on every sighting)
    * expires fingerprints not seen for the TTL: an expired fingerprint
    * re-admits its next occurrence. TTL semantics are the standard
    * trade-off for windowed dedup at 100 TB (exact within the TTL horizon);
    * pass None for the exact-forever demo shape. */
  def dedupStream(
      docs: DataFrame,
      stateTtl: Option[java.time.Duration] = None): org.apache.spark.sql.Dataset[(String, String)] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = docs.sparkSession
    import spark.implicits._
    val timeoutConf =
      if (stateTtl.isDefined) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    val ttlMs = stateTtl.map(_.toMillis)
    docs
      .select(col("doc_id").cast("string").as("doc_id"), col("text"))
      .as[(String, String)]
      .map { case (id, text) => (graft.ops.TextOps.fingerprintKernel(text), id) }
      .groupByKey(_._1)
      .flatMapGroupsWithState[String, (String, String)](
        OutputMode.Append(), timeoutConf) {
        case (fp: String, rows: Iterator[(String, String)], state: GroupState[String]) =>
          if (state.hasTimedOut) { // TTL elapsed with no sighting: forget the key
            state.remove()
            Iterator.empty
          } else if (state.exists) { // already emitted: drop dups, refresh TTL
            ttlMs.foreach(state.setTimeoutDuration)
            Iterator.empty
          } else {
            val first = rows.map(_._2).min // deterministic representative within the batch
            state.update(first)
            ttlMs.foreach(state.setTimeoutDuration)
            Iterator.single((fp, first))
          }
      }
  }

  /** Always-on SERVICE shape of [[dedupStream]]: state TTL is ON by default
    * (24 h) so fingerprint state is bounded for a long-running composition —
    * exact dedup within the TTL horizon, state bounded by distinct content
    * seen per day (VERDICT r03 #5). `dedupStream` itself keeps `None` as its
    * default for the exact-forever batch-demo shape; this wrapper is the
    * entry point a deployment should wire. */
  val DefaultDedupTtl: java.time.Duration = java.time.Duration.ofHours(24)

  def dedupStreamService(
      docs: DataFrame,
      stateTtl: java.time.Duration = DefaultDedupTtl): org.apache.spark.sql.Dataset[(String, String)] =
    dedupStream(docs, Some(stateTtl))

  /** Watermarked windowed throughput metrics over an evented span stream:
    * (event_time, doc_id, n_spans) -> per-minute doc/span counts with
    * 2-minute lateness tolerance. The stateful-aggregation shape for
    * monitoring an always-on extraction service. */
  def windowedThroughput(events: DataFrame): DataFrame =
    events
      .withWatermark("event_time", "2 minutes")
      .groupBy(window(col("event_time"), "1 minute"))
      .agg(
        count(lit(1)).as("docs"),
        sum("n_spans").as("spans"))
      .select(col("window.start").as("minute"), col("docs"), col("spans"))
}
