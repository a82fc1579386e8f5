package graft.kernel

import graft.model.Span

/** The pdfplumber word engine
  * (reference: smartextractor/adaptive_pdfplumber.py:14-155): multi-column
  * probe on a chosen page -> word extraction -> silhouette-scored k selection
  * over 1-D k-means of word x-centers -> separation sanity check -> per-column
  * crop + reading-order join. First page only for the actual extraction
  * (loop commented at adaptive_pdfplumber.py:26-29).
  */
object AdaptivePlumber {
  val MinWordsLimit = 20 // adaptive_pdfplumber.py:16
  val SilhouetteThreshold = 0.5 // adaptive_pdfplumber.py:17
  val ColumnThreshold = 0.3 // adaptive_pdfplumber.py:18

  final case class Word(text: String, x0: Double, x1: Double, top: Double) {
    def center: Double = (x0 + x1) / 2
  }

  /** Word extraction from the derived char stream (the stand-in for
    * page.extract_words(x_tolerance=3), adaptive_pdfplumber.py:61): words are
    * maximal char runs not separated by a space char or an x-gap > 3. */
  def extractWords(spans: Seq[Span]): Vector[Word] = {
    val out = Vector.newBuilder[Word]
    spans.sortBy(_.offset).filter(_.kind != "image").foreach { span =>
      val run = Parse.deriveCharRun(span)
      val n = run.length
      var start = -1
      def flush(endExcl: Int): Unit = {
        if (start >= 0 && endExcl > start) {
          out += Word(run.text(start, endExcl), run.x0(start), run.x1(endExcl - 1), run.top)
        }
        start = -1
      }
      var i = 0
      while (i < n) {
        if (run.chars(i) == ' ') flush(i)
        else if (start < 0) start = i
        else if (run.grid(i) - run.grid(i - 1) > 1) { flush(i); start = i } // x-gap > 3pt breaks the word
        i += 1
      }
      flush(n)
    }
    out.result()
  }

  /** Probe-page selection + text-strategy table probe
    * (reference: adaptive_pdfplumber.py:33-46): n<=1 -> page 0; n<=4 ->
    * ceil(n/2); else page 3. Truthy extract_table(vertical_strategy='text')
    * means two-column. */
  def isMultiColumnLayout(spansByPage: IndexedSeq[Seq[Span]]): Boolean = {
    val numPages = spansByPage.length
    if (numPages == 0) return false
    var targetNum = 3
    if (numPages <= 1) targetNum = 0
    else if (numPages <= 4) targetNum = math.ceil(numPages / 2.0).toInt
    if (targetNum >= numPages) return false
    val lines = spansByPage(targetNum).sortBy(_.offset).filter(_.kind != "image").map(Parse.deriveLine)
    Parse.extractTableTextStrategy(lines).exists(t => t.data.nonEmpty)
  }

  /** reference: adaptive_pdfplumber.py:20-30 — probe over the PHYSICAL page
    * list (len(pdf.pages)), then always extract physical page 0 (which may be
    * span-less and extract to ""). Sparse pagination would mis-index both:
    * the probe page is chosen by physical page number and page 0 is
    * pdf.pages[0] even when empty. */
  def extractText(spans: Seq[Span]): String = {
    if (spans.isEmpty) return ""
    val numPages = spans.iterator.map(s => Parse.pageOf(s.offset)).max + 1
    if (numPages <= 0) return ""
    val byPage = Array.fill(numPages)(Vector.newBuilder[Span])
    spans.foreach { s =>
      val p = Parse.pageOf(s.offset)
      if (p >= 0 && p < numPages) byPage(p) += s
    }
    val physical: IndexedSeq[Seq[Span]] = byPage.map(b => b.result().sortBy(_.offset): Seq[Span]).toIndexedSeq
    val doubleColumn = isMultiColumnLayout(physical)
    val maxColumns = if (doubleColumn) 2 else 1
    extractFromMultiColumnAuto(physical(0), maxColumns)
  }

  /** Default single-column extraction: words sorted by (top, x0), joined by
    * spaces within lines and newlines across lines — the stand-in for
    * page.extract_text(x_tolerance=3, y_tolerance=3). */
  def defaultExtractText(spans: Seq[Span]): String = {
    val words = extractWords(spans)
    if (words.isEmpty) return ""
    words.sortBy(w => (w.top, w.x0))
      .foldLeft((Vector.empty[String], Double.NaN)) { case ((acc, lastTop), w) =>
        if (lastTop.isNaN) (acc :+ w.text, w.top)
        else if (math.abs(w.top - lastTop) <= 3.0) (acc.init :+ (acc.last + " " + w.text), lastTop)
        else (acc :+ w.text, w.top)
      }._1.mkString("\n")
  }

  /** reference: adaptive_pdfplumber.py:49-155 */
  def extractFromMultiColumnAuto(spans: Seq[Span], maxColumns: Int = 2): String = {
    val words = extractWords(spans)
    if (words.isEmpty || maxColumns < 2) return defaultExtractText(spans)
    if (words.length < MinWordsLimit) return defaultExtractText(spans)

    val xCenters = words.map(_.center).toIndexedSeq
    val actualMaxColumns = math.min(maxColumns, xCenters.length - 1)

    var scores = Map.empty[Int, Double]
    if (actualMaxColumns >= 2) {
      (2 to actualMaxColumns).foreach { k =>
        val (labels, _) = Cluster.kmeans1D(xCenters, k)
        if (labels.distinct.length > 1) scores += k -> Cluster.silhouette1D(xCenters, labels.toIndexedSeq)
        else scores += k -> -1.0
      }
    }
    var bestK = 1
    if (scores.nonEmpty) {
      // python max(scores, key=scores.get): first max in insertion order =
      // ascending k here
      bestK = (2 to actualMaxColumns).maxBy(k => scores(k))
      if (scores(bestK) < SilhouetteThreshold) bestK = 1
    }

    if (bestK == 1) {
      val sorted = words.sortBy(w => (w.top, w.x0))
      return sorted.map(_.text).mkString(" ")
    }

    val (_, centersArr) = Cluster.kmeans1D(xCenters, bestK)
    val columnCenters = centersArr.sorted
    val minSeparation = Parse.PageWidth * ColumnThreshold
    var wellSeparated = columnCenters.length > 1
    var i = 0
    while (i < columnCenters.length - 1 && wellSeparated) {
      if (columnCenters(i + 1) - columnCenters(i) < minSeparation) wellSeparated = false
      i += 1
    }
    if (!wellSeparated) {
      val sorted = words.sortBy(w => (w.top, w.x0))
      return sorted.map(_.text).mkString(" ")
    }

    val splitPoints = 0.0 +:
      (0 until columnCenters.length - 1).map(i => (columnCenters(i) + columnCenters(i + 1)) / 2) :+
      Parse.PageWidth
    val columnsText = (0 until bestK).flatMap { c =>
      val colWords = words.filter(w => w.center >= splitPoints(c) && w.center < splitPoints(c + 1))
      if (colWords.isEmpty) None
      else {
        val text = colWords.sortBy(w => (w.top, w.x0))
          .foldLeft((Vector.empty[String], Double.NaN)) { case ((acc, lastTop), w) =>
            if (lastTop.isNaN) (acc :+ w.text, w.top)
            else if (math.abs(w.top - lastTop) <= 3.0) (acc.init :+ (acc.last + " " + w.text), lastTop)
            else (acc :+ w.text, w.top)
          }._1.mkString("\n")
        if (text.nonEmpty) Some(text) else None
      }
    }
    columnsText.mkString("\n\n")
  }
}
