package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column operators: image/audio/video as opaque BINARY columns
  * with typed metadata, plus decode / feature-extract / resize / frame-sample
  * kernels over `mapPartitions`.
  *
  * The media codecs themselves are STUBBED (this container ships no
  * image/audio libraries): `decodeStub` produces a deterministic fake raster
  * from the bytes. Everything Spark-side — schema, batch shape, partition
  * strategy, UDF signatures, pushdown behavior — is real and tested; swap
  * `decodeStub` for an actual codec on a real cluster.
  */
object Multimodal {

  /** Typed media row: the at-scale layout for media alongside documents —
    * binary payload + enough metadata to prune without touching bytes. */
  final case class MediaRow(
      media_ref: String,
      doc_id: String,
      kind: String, // image | audio | video
      content: Array[Byte],
      width: Int,
      height: Int,
      duration_ms: Long)

  final case class MediaFeatures(
      media_ref: String,
      doc_id: String,
      kind: String,
      n_bytes: Int,
      sha1: String,
      // decoded-raster features (stub-deterministic)
      mean_luma: Double,
      edge_score: Double,
      phash64: Long)

  /** Deterministic fake media corpus keyed by the extraction output's
    * media_refs — (ref, bytes) with bytes a seeded pseudo-raster. */
  def syntheticMedia(spark: SparkSession, refs: Dataset[(String, String)]): Dataset[MediaRow] = {
    import spark.implicits._
    refs.map { case (ref, docId) =>
      val seed = ref.hashCode.toLong & 0xffffffffL
      val w = 16 + (seed % 48).toInt
      val h = 16 + ((seed >> 8) % 48).toInt
      val bytes = new Array[Byte](w * h)
      var s = seed
      var i = 0
      while (i < bytes.length) {
        s = s * 6364136223846793005L + 1442695040888963407L
        bytes(i) = (s >>> 56).toByte
        i += 1
      }
      MediaRow(ref, docId, "image", bytes, w, h, 0L)
    }
  }

  /** STUB decode: bytes -> grayscale raster. A real implementation would
    * call an image codec here; the deterministic fake keeps the pipeline
    * testable end-to-end. Marked clearly per the build contract. */
  def decodeStub(content: Array[Byte], width: Int, height: Int): Array[Array[Int]] = {
    val raster = Array.ofDim[Int](height, width)
    var i = 0
    while (i < width * height && i < content.length) {
      raster(i / width)(i % width) = content(i) & 0xff
      i += 1
    }
    raster
  }

  /** STUB resize: nearest-neighbor downsample of the decoded raster —
    * real-shape plumbing for the preprocessing stage. */
  def resizeStub(raster: Array[Array[Int]], outW: Int, outH: Int): Array[Array[Int]] = {
    val h = raster.length
    val w = if (h == 0) 0 else raster(0).length
    Array.tabulate(outH, outW) { (y, x) =>
      if (h == 0 || w == 0) 0 else raster(y * h / outH)(x * w / outW)
    }
  }

  /** STUB frame-sample: pick every k-th "frame" of a byte stream (video
    * stand-in): returns frame offsets — the partition/batch shape is what
    * matters at scale. */
  def frameSampleStub(nBytes: Int, frameBytes: Int, everyK: Int): Seq[Int] =
    (0 until nBytes / math.max(1, frameBytes) by math.max(1, everyK)).map(_ * frameBytes)

  private def sha1Hex(bytes: Array[Byte]): String = {
    val d = java.security.MessageDigest.getInstance("SHA-1").digest(bytes)
    d.map(b => f"$b%02x").mkString
  }

  /** Feature extraction kernel: decode -> resize 8x8 -> mean/edge/pHash.
    * One `mapPartitions` pass; the per-row work is the real shape of a media
    * featurizer even though the decode is a stub. */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { m =>
      val content = if (m.content == null) Array.empty[Byte] else m.content
      val raster = decodeStub(content, math.max(1, m.width), math.max(1, m.height))
      val small = resizeStub(raster, 8, 8)
      val flat = small.flatten
      val mean = if (flat.isEmpty) 0.0 else flat.sum.toDouble / flat.length
      var edges = 0.0
      var y = 0
      while (y < 8) {
        var x = 1
        while (x < 8) { edges += math.abs(small(y)(x) - small(y)(x - 1)); x += 1 }
        y += 1
      }
      var phash = 0L
      var i = 0
      while (i < 64) {
        if (flat(i) > mean) phash |= (1L << i)
        i += 1
      }
      MediaFeatures(m.media_ref, m.doc_id, m.kind, content.length, sha1Hex(content),
        mean, edges / 56.0, phash)
    })
  }

  /** End-to-end: extraction output spans -> media refs -> synthetic payloads
    * -> features. Demonstrates the join shape: media features come back to
    * the doc table via an equi-join on media_ref. */
  def mediaFeaturesForCorpus(spark: SparkSession, spansTable: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    val refs = spansTable
      .select(col("doc_id"), explode(col("spans")).as("s"))
      .filter(col("s.kind") === "image" && length(col("s.media_ref")) > 0)
      .select(col("s.media_ref").as("ref"), col("doc_id").cast("string"))
      .distinct()
      .as[(String, String)]
    extractFeatures(syntheticMedia(spark, refs))
  }
}
