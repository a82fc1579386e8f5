package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Input-source variants for the contract span table (SURVEY.md §2.1):
  * Parquet/table scan is the primary path; JSON-lines and raw-binary-file
  * ingestion (spark.read.format("binaryFile") feeding the parse kernel) are
  * the alternate formats a heterogeneous 100 TB lake actually contains. */
object Sources {

  private val SpanSchema = graft.streaming.StreamingExtract.InputSchema

  /** Primary: parquet span table. */
  def fromParquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** JSON-lines span table ({"doc_id": ..., "spans": [...]} per line). */
  def fromJsonLines(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(SpanSchema).json(path)

  /** Raw binary document files: one file = one serialized document (JSON
    * bytes here — the stand-in for raw PDF bytes, which would feed a parse
    * kernel at exactly this point). binaryFile gives (path, content BINARY);
    * the decode step is a Catalyst from_json over the bytes. */
  def fromBinaryFiles(spark: SparkSession, dir: String): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.doc.json")
      .load(dir)
      .select(from_json(col("content").cast("string"),
        org.apache.spark.sql.types.StructType(SpanSchema.fields)).as("doc"))
      .select(col("doc.doc_id").as("doc_id"), col("doc.spans").as("spans"))
      .filter(col("doc_id").isNotNull)

  /** Convenience: source dispatch + extraction in one call. */
  def extractFrom(spark: SparkSession, path: String, format: String = "parquet",
      cfg: graft.model.ExtractConfig = graft.model.ExtractConfig.default): DataFrame = {
    val input = format match {
      case "parquet" => fromParquet(spark, path)
      case "json" => fromJsonLines(spark, path)
      case "binary" => fromBinaryFiles(spark, path)
      case other => throw new IllegalArgumentException(s"unknown source format: $other")
    }
    graft.pipeline.Extract.extractContract(input, cfg)
  }
}
