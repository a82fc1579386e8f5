package graft.pipeline

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.model._
import graft.kernel.{Extractor, Parse}

/** The Dataset-level extraction pipeline.
  *
  * Shape (SURVEY.md §4.2): the whole per-document pipeline is one narrow
  * `mapPartitions` — no shuffle for the common case. Parallelism = input
  * partitioning; the reference's per-page thread pool (core.py:184-205)
  * disappears.
  *
  * Skew (north_rule: "salted repartitioning for skewed multi-hundred-page
  * documents"): docs whose span count exceeds `skewSpanThreshold` are
  * exploded into per-page work units, shuffled wide by (doc_id, page), page
  * kernels run in parallel, then re-grouped by doc_id with explicit page
  * ordering for the cheap doc-level finalize. At 100 TB this bounds executor
  * memory by the largest PAGE, not the largest DOC, and spreads a
  * thousand-page document over the cluster instead of pinning one task.
  */
object Extract {

  /** Narrow path: one doc per kernel call. */
  def extract(ds: Dataset[RawDoc], cfg: ExtractConfig = ExtractConfig.default): Dataset[DocResult] = {
    implicit val enc = org.apache.spark.sql.Encoders.product[DocResult]
    ds.mapPartitions(_.map(doc => Extractor.extractDoc(doc, cfg)))
  }

  /** Skew-aware path. `skewSpanThreshold` in raw spans (default 64 pages'
    * worth). Small docs take the narrow path; giant docs are page-split. */
  def extractSkewAware(
      ds: Dataset[RawDoc],
      cfg: ExtractConfig = ExtractConfig.default,
      skewSpanThreshold: Int = 64 * Parse.SpansPerPage,
      pageParallelism: Int = 0): Dataset[DocResult] = {
    val spark = ds.sparkSession
    import spark.implicits._
    implicit val docEnc = org.apache.spark.sql.Encoders.product[DocResult]

    val sized = ds.map(d => (d, if (d.spans == null) 0 else d.spans.length))
      .toDF("doc", "n_spans")
    val small = sized.filter(col("n_spans") <= skewSpanThreshold)
      .select("doc.*").as[RawDoc]
    val big = sized.filter(col("n_spans") > skewSpanThreshold)
      .select("doc.*").as[RawDoc]

    val smallOut = extract(small, cfg)

    // page-split: (doc_id, page_no, page_spans) work units, spread wide
    val units = big.flatMap { d =>
      val spans = if (d.spans == null) Seq.empty[Span] else d.spans.filter(_ != null)
      Parse.paginate(spans).map { case (p, ss) => (d.doc_id, p, ss) }
    }.toDF("doc_id", "page_no", "page_spans")
    val parallelism = if (pageParallelism > 0) pageParallelism
      else spark.sparkContext.defaultParallelism
    val spread = units.repartition(parallelism, col("doc_id"), col("page_no"))

    val pageResults = spread.as[(String, Int, Seq[Span])]
      .map { case (docId, pageNo, pageSpans) =>
        (docId, pageNo, Extractor.extractPage(pageNo, pageSpans, cfg))
      }
      .toDF("doc_id", "page_no", "page")

    implicit val prEnc = org.apache.spark.sql.Encoders.product[(String, Int, PageResult)]
    val bigOut = pageResults.as[(String, Int, PageResult)]
      .groupByKey(_._1)
      .mapGroups { (docId, it) =>
        val pages = it.toVector.sortBy(_._2).map(_._3)
        Extractor.finalizeDoc(docId, pages, cfg)
      }

    smallOut.unionByName(bigOut)
  }

  /** Driver-facing output: the span projection table
    * (doc_id, spans ARRAY<STRUCT<kind,text,media_ref,offset>>). */
  def toSpansTable(results: Dataset[DocResult]): Dataset[(String, Seq[Span])] = {
    val spark = results.sparkSession
    import spark.implicits._
    results.filter(!_.quarantined).map(r => (r.doc_id, r.spans))
  }
}
