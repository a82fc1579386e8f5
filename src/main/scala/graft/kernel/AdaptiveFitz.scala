package graft.kernel

import graft.model.Span

/** The PyMuPDF-style line-block engine
  * (reference: smartextractor/adaptive_pdfitz.py:11-291): line blocks ->
  * layout type detection (2-means / histogram peaks / clear-gap / width) ->
  * single-column y-sort or two-column split. First page only (the per-page
  * loop is commented out at adaptive_pdfitz.py:21-27).
  */
object AdaptiveFitz {
  final case class Block(text: String, x0: Double, y0: Double, x1: Double, y1: Double) {
    def width: Double = x1 - x0
    def center: Double = (x0 + x1) / 2
  }

  def lineBlocks(spans: Seq[Span]): Vector[Block] =
    spans.sortBy(_.offset)
      .filter(s => s.kind != "image")
      .map(Parse.deriveLine)
      .filter(_.text.trim.nonEmpty)
      .map(l => Block(l.text.trim, l.x0, l.top, l.x1, l.bottom))
      .toVector

  /** reference: adaptive_pdfitz.py:16-30 — page 0 only. */
  def extractText(spans: Seq[Span]): String = {
    val page0 = spans.filter(s => Parse.pageOf(s.offset) == 0)
    if (page0.isEmpty) return ""
    val pageText = extractPageText(page0)
    if (pageText.nonEmpty) pageText else ""
  }

  def extractPageText(spans: Seq[Span]): String = {
    val blocks = lineBlocks(spans)
    if (blocks.isEmpty) return ""
    val layout = detectLayoutType(blocks, Parse.PageWidth)
    if (layout == "single_column") extractSingleColumn(blocks)
    else extractMultiColumn(blocks, Parse.PageWidth)
  }

  /** reference: adaptive_pdfitz.py:109-145 */
  def detectLayoutType(blocks: Seq[Block], pageWidth: Double): String = {
    if (blocks.length < 2) return "single_column"
    val xCenters = blocks.map(_.center)
    val columnCenters = detectColumnsKMeans(xCenters, pageWidth)
    if (columnCenters.length >= 2) {
      val centerDistance = math.abs(columnCenters(1) - columnCenters(0))
      val leftDistance = math.abs(pageWidth / 2 - columnCenters(0))
      val rightDistance = math.abs(pageWidth / 2 - columnCenters(1))
      val ratioDistance =
        if (math.max(leftDistance, rightDistance) == 0) 0.0
        else math.min(leftDistance, rightDistance) / math.max(leftDistance, rightDistance)
      if (centerDistance > pageWidth * 0.3 && ratioDistance > 0.3) return "multi_column"
      else if (hasClearColumnGap(blocks, pageWidth)) return "multi_column"
    }
    val avgWidth = blocks.map(_.width).sum / blocks.length
    if (avgWidth < pageWidth * 0.6 && columnCenters.length < 2) return "multi_column"
    "single_column"
  }

  /** 2-means column centers, else histogram-peak fallback
    * (reference: adaptive_pdfitz.py:147-199). Returns sorted centers or empty. */
  def detectColumnsKMeans(xCenters: Seq[Double], pageWidth: Double): Vector[Double] = {
    if (xCenters.length < 2) return Vector.empty
    val (labels, centers) = Cluster.kmeans1D(xCenters.toIndexedSeq, 2)
    if (labels.distinct.length == 2) {
      val centerDistance = math.abs(centers(1) - centers(0))
      if (centerDistance > pageWidth * 0.2) return centers.sorted.toVector
    }
    // histogram fallback: 50 bins over the data range, peaks > 0.1*max
    val (hist, bins) = Cluster.histogramAuto(xCenters, 50)
    val maxH = if (hist.isEmpty) 0 else hist.max
    val peaks = (1 until hist.length - 1).collect {
      case i if hist(i) > hist(i - 1) && hist(i) > hist(i + 1) && hist(i) > maxH * 0.1 =>
        (bins(i) + bins(i + 1)) / 2
    }.toVector
    if (peaks.length >= 2) {
      val sortedPeaks = peaks.sorted
      if (sortedPeaks.last - sortedPeaks.head > pageWidth * 0.2)
        return Vector(sortedPeaks.head, sortedPeaks.last)
      else if (sortedPeaks.length >= 2) return sortedPeaks.take(2)
    }
    Vector.empty
  }

  /** reference: adaptive_pdfitz.py:201-216 */
  def hasClearColumnGap(blocks: Seq[Block], pageWidth: Double): Boolean = {
    val centerStart = pageWidth * 0.3
    val centerEnd = pageWidth * 0.7
    if (blocks.exists(b => b.x0 < centerStart && b.x1 > centerEnd)) return false
    val centerBlocks = blocks.count(b => b.x0 >= centerStart && b.x1 <= centerEnd)
    centerBlocks < blocks.length * 0.2
  }

  /** reference: adaptive_pdfitz.py:218-222 */
  def extractSingleColumn(blocks: Seq[Block]): String =
    blocks.sortBy(_.y0).map(_.text).mkString("\n")

  /** reference: adaptive_pdfitz.py:224-285 — split point from centers, else
    * max central x-gap > 5% width, else width/2; left column then right, each
    * y-sorted. */
  def extractMultiColumn(blocks: Seq[Block], pageWidth: Double): String = {
    val xCenters = blocks.map(_.center)
    val columnCenters = detectColumnsKMeans(xCenters, pageWidth)
    var splitPoint = pageWidth / 2
    if (columnCenters.length >= 2) {
      splitPoint = (columnCenters(0) + columnCenters(1)) / 2
    } else {
      val xCoords = (blocks.map(_.x0) ++ blocks.map(_.x1)).sorted
      var maxGap = 0.0
      var potential = pageWidth / 2
      var i = 0
      while (i < xCoords.length - 1) {
        val gap = xCoords(i + 1) - xCoords(i)
        if (gap > maxGap && xCoords(i) > pageWidth * 0.3 && xCoords(i) < pageWidth * 0.7) {
          maxGap = gap
          potential = (xCoords(i) + xCoords(i + 1)) / 2
        }
        i += 1
      }
      if (maxGap > pageWidth * 0.05) splitPoint = potential
    }
    val (left, right) = blocks.partition(_.center < splitPoint)
    (left.sortBy(_.y0).map(_.text) ++ right.sortBy(_.y0).map(_.text)).mkString("\n")
  }
}
