package graft.kernel

import graft.model._

/** Parse stage: raw interleaved spans -> per-page text objects / images /
  * tables. This is the Spark-native analog of the reference's PDFProcessor
  * (reference: smartextractor/processors/pdf_processor.py:48-423); the input
  * is the driver-contract span stream instead of a PDF byte stream, with
  * deterministic geometry derived from (offset, content) — see GEOMETRY
  * comments and FIXTURES.md §2.
  */
object Parse {

  /** One derived character: the kernel's analog of a pdfplumber char dict
    * (reference: pdf_processor.py:161, chars carry text/x0/x1/top/bottom/
    * fontname/size). */
  final case class Char(
      text: String,
      x0: Double,
      x1: Double,
      top: Double,
      bottom: Double,
      fontname: String,
      size: Double
  )

  /** Raw line with geometry (fitz-style line block, adaptive_pdfitz.py:64-74),
    * kept for table detection and the adaptive engines. */
  final case class Line(
      text: String,
      pageLine: Int,
      x0: Double,
      top: Double,
      x1: Double,
      bottom: Double,
      fontname: String,
      size: Double
  )

  final case class ImageDict(bbox: Seq[Double], width: Double, height: Double, imageType: String, mediaRef: String = "")
  final case class TableDict(data: Seq[Seq[String]], rows: Int, cols: Int)

  final case class PageData(
      pageNumber: Int,
      width: Double,
      height: Double,
      textObjects: Seq[TextBlock], // parser-level blocks (pre-layout)
      images: Seq[ImageDict],
      tables: Seq[TableDict]
  )

  // ---------------------------------------------------------------------
  // GEOMETRY: deterministic layout model (FIXTURES.md §2).
  // The driver input schema carries no bbox, so geometry is derived from
  // (offset, text content) with a fixed page template:
  //   * page size 800x600 (tests/test_layout_processor.py:24-27 geometry)
  //   * SpansPerPage = 24 raw spans per page; lineIdx = offset % 24
  //   * line i: top = 2 + 25*i, bottom = top + 18 (header band: i = 0;
  //     footer band: i = 23 — matches the 5% bands of
  //     layout_processor.py:56-58)
  //   * page 0 line 1 is the title slot: font 18 bold (title threshold >14,
  //     layout_processor.py:46)
  //   * x-advance: fixed char width 8pt from left margin 50; runs of >= 2
  //     consecutive spaces are zero-char gaps (x advances, no char emitted) —
  //     the stand-in for pdfplumber's missing whitespace glyphs; single
  //     spaces are real space chars so word spacing survives in block text.
  // ---------------------------------------------------------------------
  val PageWidth = 800.0
  val PageHeight = 600.0
  val SpansPerPage = 24
  val CharWidth = 8.0
  val LeftMargin = 50.0
  val LineAdvance = 25.0
  val LineHeight = 18.0
  val TitleLineHeight = 22.0

  /** Primitive-backed 4-element bbox: ArraySeq.ofDouble stores an unboxed
    * Array[Double] (a Vector[Double] boxes all four — measured GC/bandwidth
    * on the 40M-block path). Seq equality with Vector-built boxes holds. */
  @inline def box4(x0: Double, top: Double, x1: Double, bottom: Double): Seq[Double] =
    scala.collection.immutable.ArraySeq.unsafeWrapArray(Array(x0, top, x1, bottom))

  def pageOf(offset: Int): Int = offset / SpansPerPage
  def lineIdxOf(offset: Int): Int = offset % SpansPerPage

  def isTitleSlot(offset: Int): Boolean = pageOf(offset) == 0 && lineIdxOf(offset) == 1

  def fontOf(offset: Int): (String, Double) =
    if (isTitleSlot(offset)) ("Helvetica-Bold", 18.0) else ("Helvetica", 12.0)

  def lineGeom(offset: Int): (Double, Double) = { // (top, bottom)
    val i = lineIdxOf(offset)
    val top = 2.0 + LineAdvance * i
    val h = if (isTitleSlot(offset)) TitleLineHeight else LineHeight
    (top, top + h)
  }

  /** Derive the char stream of one text span. Runs of >=2 spaces become
    * x-gaps (no chars); single spaces are space chars. */
  def deriveChars(span: Span): IndexedSeq[Char] = {
    val text = if (span.text == null) "" else span.text
    val (fontname, size) = fontOf(span.offset)
    val (top, bottom) = lineGeom(span.offset)
    val out = Vector.newBuilder[Char]
    var pos = 0 // char-grid position (spaces advance it too)
    var i = 0
    val n = text.length
    while (i < n) {
      val c = text.charAt(i)
      if (c == ' ') {
        // measure the space run
        var j = i
        while (j < n && text.charAt(j) == ' ') j += 1
        val runLen = j - i
        if (runLen >= 2) { pos += runLen } // gap: advance x, emit nothing
        else {
          val x0 = LeftMargin + pos * CharWidth
          out += Char(" ", x0, x0 + CharWidth, top, bottom, fontname, size)
          pos += 1
        }
        i = j
      } else {
        val x0 = LeftMargin + pos * CharWidth
        out += Char(c.toString, x0, x0 + CharWidth, top, bottom, fontname, size)
        pos += 1
        i += 1
      }
    }
    out.result()
  }

  /** Line-level geometry for a text span (bbox across its chars; empty spans
    * get a degenerate bbox at the line origin). */
  def deriveLine(span: Span): Line = {
    val run = deriveCharRun(span)
    val text = if (span.text == null) "" else span.text
    if (run.length == 0)
      Line(text, lineIdxOf(span.offset), LeftMargin, run.top, LeftMargin, run.bottom, run.fontname, run.size)
    else
      Line(text, lineIdxOf(span.offset), run.x0(0), run.top, run.x1(run.length - 1), run.bottom, run.fontname, run.size)
  }

  /** Image geometry: images occupy their line slot, x 100..500.
    * (Analog of pdfplumber page.images bboxes, pdf_processor.py:289-306.) */
  def deriveImage(span: Span): ImageDict = {
    val (top, _) = lineGeom(span.offset)
    val bottom = top + LineHeight
    ImageDict(box4(100.0, top, 500.0, bottom), 400.0, LineHeight, "image", if (span.media_ref == null) "" else span.media_ref)
  }

  // ---------------------------------------------------------------------
  // Allocation-free hot path: one line's chars as two primitive arrays.
  // Per-char geometry is fully determined by (grid position, line offset),
  // so the Char-object stream (kept below for tests/cross-validation) is
  // redundant at runtime — at 100 TB the per-char object churn was the
  // measured GC bottleneck.
  // ---------------------------------------------------------------------

  /** One raw line as primitive arrays: chars (gaps excluded) + their grid
    * positions (monotonic); only the first `length` slots are live (the
    * arrays are allocated at raw-text size and NOT trimmed — the copyOf pair
    * per span was measured memory-bandwidth on the 32-thread path). Same
    * font/size/top for the whole line by construction of the template. */
  final class CharRun(
      val chars: Array[scala.Char],
      val grid: Array[Int],
      val length: Int,
      val top: Double,
      val bottom: Double,
      val fontname: String,
      val size: Double) {
    def x0(i: Int): Double = LeftMargin + grid(i) * CharWidth
    def x1(i: Int): Double = x0(i) + CharWidth
    def text(a: Int, b: Int): String = new String(chars, a, b - a)
  }

  /** Array-based twin of [[deriveChars]]: single spaces are chars, runs of
    * >= 2 spaces advance the grid without emitting. */
  def deriveCharRun(span: Span): CharRun = {
    val text = if (span.text == null) "" else span.text
    val (fontname, size) = fontOf(span.offset)
    val (top, bottom) = lineGeom(span.offset)
    val n = text.length
    val chars = new Array[scala.Char](n)
    val grid = new Array[Int](n)
    var out = 0
    var pos = 0
    var i = 0
    while (i < n) {
      val c = text.charAt(i)
      if (c == ' ') {
        var j = i
        while (j < n && text.charAt(j) == ' ') j += 1
        val runLen = j - i
        if (runLen >= 2) pos += runLen
        else { chars(out) = ' '; grid(out) = pos; out += 1; pos += 1 }
        i = j
      } else {
        chars(out) = c; grid(out) = pos; out += 1; pos += 1; i += 1
      }
    }
    new CharRun(chars, grid, out, top, bottom, fontname, size)
  }

  /** Array-based twin of [[splitLineByColumns]] over one CharRun: returns
    * split ranges [a, b). Chars are x-monotonic by construction, so the
    * reference's pre-sort (pdf_processor.py:335) is the identity here. */
  def splitRangesByColumns(run: CharRun, pageWidth: Double, minGapRatio: Double = 0.15): Array[(Int, Int)] = {
    val n = run.length
    if (n == 0) return Array.empty
    if (n <= 3) return Array((0, n))
    val minGapGrid = pageWidth * minGapRatio / CharWidth // gap_pt = (dGrid - 1) * CharWidth
    def gapAt(i: Int): Double = (run.grid(i) - run.grid(i - 1) - 1) * CharWidth
    var nLarge = 0
    var firstIdx = -1
    var i = 1
    while (i < n) {
      if (gapAt(i) > pageWidth * minGapRatio) { nLarge += 1; if (firstIdx < 0) firstIdx = i - 1 }
      i += 1
    }
    val _ = minGapGrid
    if (nLarge == 0) return Array((0, n))
    if (nLarge == 1) {
      val gapIdx = firstIdx
      val gapSize = gapAt(gapIdx + 1)
      if (gapSize < pageWidth * 0.20) return Array((0, n))
      val leftLen = gapIdx + 1
      val rightLen = n - leftLen
      if (leftLen < 2 || rightLen < 2) return Array((0, n))
      val leftText = run.text(0, leftLen).trim
      val rightText = run.text(leftLen, n).trim
      if (leftText.length < 3 || rightText.length < 3) return Array((0, n))
      val combined = (leftText + " " + rightText).toLowerCase
      if (Connectors.exists(combined.contains) && combined.length < 100) return Array((0, n))
    }
    val out = Array.newBuilder[(Int, Int)]
    var start = 0
    i = 1
    while (i < n) {
      if (gapAt(i) > pageWidth * minGapRatio) { out += ((start, i)); start = i }
      i += 1
    }
    out += ((start, n))
    out.result()
  }

  private def blockOf(run: CharRun, a: Int, b: Int): TextBlock = {
    val fn = run.fontname.toLowerCase
    TextBlock(
      text = run.text(a, b),
      bbox = box4(run.x0(a), run.top, run.x1(b - 1), run.bottom),
      font_size = Some(run.size),
      font_family = Some(run.fontname),
      is_bold = fn.contains("bold"),
      is_italic = fn.contains("italic") || fn.contains("oblique"))
  }

  /** Array-based twin of [[extractTextObjects]] over a page's text spans.
    * One span = one (fontname, size, top) char group: the geometry template
    * gives every offset a distinct top, so the reference's run-change
    * grouping (pdf_processor.py:234-257) never merges across spans — see
    * ParseEquivalenceSpec for the cross-validation against the generic path. */
  def extractTextObjectsFast(textSpans: scala.collection.Seq[Span], pageWidth: Double): IndexedSeq[TextBlock] = {
    // text(a,b).trim.nonEmpty without the String+trim allocs: String.trim
    // strips chars <= ' ', so non-empty-after-trim == any char > ' '
    def hasVisible(run: CharRun, a: Int, b: Int): Boolean = {
      var i = a
      while (i < b) { if (run.chars(i) > ' ') return true; i += 1 }
      false
    }
    // array-backed page blocks (r4): the page's block list is mapped/copied
    // by every downstream stage (classify, columns, clean) — a flat array
    // makes those O(n) array walks instead of Vector tree rebuilds
    val out = new scala.collection.mutable.ArrayBuffer[TextBlock](textSpans.length + 8)
    textSpans.foreach { span =>
      val run = deriveCharRun(span)
      if (run.length > 0) {
        splitRangesByColumns(run, pageWidth).foreach { case (a, b) =>
          if (hasVisible(run, a, b)) {
            val blockWidth = run.x1(b - 1) - run.x0(a)
            if (blockWidth > pageWidth * 0.60 && (b - a) > 10) {
              // over-wide block: exact 2-means on x0 (sorted -> best split)
              val xs = new Array[Double](b - a)
              var i = a
              while (i < b) { xs(i - a) = run.x0(i); i += 1 }
              val (s, _, _) = Cluster.bestSplit2Sorted(xs)
              if (s >= 3) out += blockOf(run, a, a + s) // left sub-block (>= 3 chars)
              if (b - a - s >= 3) out += blockOf(run, a + s, b)
            } else {
              out += blockOf(run, a, b)
            }
          }
        }
      }
    }
    scala.collection.immutable.ArraySeq.unsafeWrapArray(out.toArray)
  }

  /** Group chars by running (fontname, size, top) key change — consecutive-run
    * segmentation, not a global groupBy (reference: pdf_processor.py:234-257). */
  def groupCharsByFont(chars: Seq[Char]): Vector[Vector[Char]] = {
    val groups = Vector.newBuilder[Vector[Char]]
    var current = Vector.empty[Char]
    var currentKey: (String, Double, Double) = null
    chars.foreach { ch =>
      val key = (ch.fontname, ch.size, ch.top)
      if (currentKey != key && current.nonEmpty) {
        groups += current
        current = Vector.empty
      }
      currentKey = key
      current :+= ch
    }
    if (current.nonEmpty) groups += current
    groups.result()
  }

  val Connectors: Seq[String] =
    Seq("and", "or", "but", "however", "therefore", "thus", "hence")

  /** Split one line's chars into column groups on large x-gaps, with the
    * reference's single-gap guards (gap >= 20% width, >= 2 chars and >= 3
    * text chars per side, connector-word veto for short sentences).
    * (reference: pdf_processor.py:329-412, min_gap_ratio = 0.15) */
  def splitLineByColumns(charsIn: Seq[Char], pageWidth: Double, minGapRatio: Double = 0.15): Vector[Vector[Char]] = {
    if (charsIn.isEmpty) return Vector.empty
    val chars = charsIn.sortBy(_.x0).toVector
    if (chars.length <= 3) return Vector(chars)

    val gaps = (1 until chars.length).map(i => chars(i).x0 - chars(i - 1).x1)
    val minGap = pageWidth * minGapRatio
    val largeGaps = gaps.zipWithIndex.collect { case (g, idx) if g > minGap => (idx, g) }
    if (largeGaps.isEmpty) return Vector(chars)

    if (largeGaps.length == 1) {
      val (gapIdx, gapSize) = largeGaps.head
      if (gapSize < pageWidth * 0.20) return Vector(chars)
      val left = chars.take(gapIdx + 1)
      val right = chars.drop(gapIdx + 1)
      if (left.length < 2 || right.length < 2) return Vector(chars)
      val leftText = left.map(_.text).mkString.trim
      val rightText = right.map(_.text).mkString.trim
      if (leftText.length < 3 || rightText.length < 3) return Vector(chars)
      val combined = (leftText + " " + rightText).toLowerCase
      // reference uses substring containment ('or' matches inside 'for') —
      // replicated deliberately (pdf_processor.py:391)
      if (Connectors.exists(combined.contains) && combined.length < 100) return Vector(chars)
    }

    val splitIndices = 0 +: gaps.zipWithIndex.collect { case (g, idx) if g > minGap => idx + 1 } :+ chars.length
    splitIndices.sliding(2).map { case Seq(a, b) => chars.slice(a, b) }.filter(_.nonEmpty).toVector
  }

  /** Bbox union over a char group (reference: pdf_processor.py:259-269). */
  def calculateBBox(chars: Seq[Char]): Seq[Double] = {
    if (chars.isEmpty) box4(0d, 0d, 0d, 0d)
    else box4(chars.map(_.x0).min, chars.map(_.top).min, chars.map(_.x1).max, chars.map(_.bottom).max)
  }

  final case class FontInfo(size: Option[Double], fontname: Option[String], isBold: Boolean, isItalic: Boolean)

  /** Font info from the first char of a group (reference: pdf_processor.py:271-287). */
  def extractFontInfo(ch: Char): FontInfo = {
    val fn = Option(ch.fontname).getOrElse("").toLowerCase
    FontInfo(Some(ch.size), Option(ch.fontname), fn.contains("bold"), fn.contains("italic") || fn.contains("oblique"))
  }

  /** Full text-object extraction for one page's chars: line grouping ->
    * per-line column split -> blank filter -> bbox/font projection ->
    * over-wide block 2-means split (reference: pdf_processor.py:156-232). */
  def extractTextObjects(pageChars: Seq[Char], pageWidth: Double): Vector[TextBlock] = {
    val out = Vector.newBuilder[TextBlock]
    val charGroups = groupCharsByFont(pageChars)
    charGroups.foreach { group =>
      if (group.nonEmpty) {
        val columnGroups = splitLineByColumns(group, pageWidth)
        columnGroups.foreach { colGroup =>
          val text = colGroup.map(_.text).mkString
          if (text.trim.nonEmpty) {
            val bbox = calculateBBox(colGroup)
            val fontInfo = extractFontInfo(colGroup.head)
            val blockWidth = bbox(2) - bbox(0)
            var emittedSplit = false
            if (blockWidth > pageWidth * 0.60 && colGroup.length > 10) {
              // over-wide block: deterministic 1-D 2-means on char x0
              // (reference uses KMeans(2, random_state=0), pdf_processor.py:186-220)
              val xs = colGroup.map(_.x0)
              val (labels, _) = Cluster.kmeans1D(xs, 2)
              val c0 = colGroup.zip(labels).collect { case (c, 0) => c }
              val c1 = colGroup.zip(labels).collect { case (c, 1) => c }
              def mean(cs: Seq[Char]): Double = if (cs.isEmpty) 0.0 else cs.map(_.x0).sum / cs.length
              val (leftChars, rightChars) = if (mean(c0) > mean(c1)) (c1, c0) else (c0, c1)
              emittedSplit = true
              Seq(leftChars, rightChars).foreach { sub =>
                if (sub.length >= 3) {
                  val subBBox = calculateBBox(sub)
                  val subFont = extractFontInfo(sub.head)
                  out += TextBlock(
                    text = sub.map(_.text).mkString,
                    bbox = subBBox,
                    font_size = subFont.size,
                    font_family = subFont.fontname,
                    is_bold = subFont.isBold,
                    is_italic = subFont.isItalic)
                }
              }
            }
            if (!emittedSplit) {
              out += TextBlock(
                text = text,
                bbox = bbox,
                font_size = fontInfo.size,
                font_family = fontInfo.fontname,
                is_bold = fontInfo.isBold,
                is_italic = fontInfo.isItalic)
            }
          }
        }
      }
    }
    out.result()
  }

  // ---------------------------------------------------------------------
  // Table detection (from-scratch analog of pdfplumber's extract_tables,
  // consumed at pdf_processor.py:308-327). Two strategies:
  //   * "lines" (default): ruling-line grids — consecutive lines whose text
  //     is pipe-delimited ('|' as the drawn vertical ruling); >= 2 rows and
  //     >= 2 columns.
  //   * "text": whitespace-alignment grids — >= 2 consecutive lines with the
  //     same >= 2 cell-start positions (within 1 char) when split on runs of
  //     >= 2 spaces. Used by the layout probe
  //     (adaptive_pdfplumber.py:41, vertical_strategy='text').
  // ---------------------------------------------------------------------

  private val PipeSplit = java.util.regex.Pattern.compile("\\|")

  private def pipeCells(text: String): Option[Vector[String]] = {
    val t = if (text == null) "" else text
    val trimmed = t.trim
    if (trimmed.length >= 2 && trimmed.startsWith("|") && trimmed.endsWith("|") && trimmed.count(_ == '|') >= 3) {
      val inner = trimmed.substring(1, trimmed.length - 1)
      Some(PipeSplit.split(inner, -1).map(_.trim).toVector)
    } else None
  }

  private def isRuleLine(text: String): Boolean = {
    val t = if (text == null) "" else text.trim
    t.nonEmpty && t.forall(c => c == '-' || c == '+' || c == '=' || c == '|')
  }

  /** Ruling-line table extraction over a page's raw text lines (in stream
    * order). Separator-only lines (---+---) delimit nothing but are absorbed. */
  def extractTablesLines(lineTexts: scala.collection.Seq[String]): Vector[TableDict] = {
    val out = Vector.newBuilder[TableDict]
    var rows = Vector.empty[Vector[String]]
    def flush(): Unit = {
      if (rows.length >= 2 && rows.head.length >= 2) {
        out += TableDict(rows, rows.length, rows.head.length)
      }
      rows = Vector.empty
    }
    lineTexts.foreach { t =>
      if (isRuleLine(t)) () // ruling separators (---+---, |---|) are absorbed
      else pipeCells(t) match {
        case Some(cells) => rows :+= cells
        case None => flush()
      }
    }
    flush()
    out.result()
  }

  /** Whitespace-grid (text-alignment) table detection: the "text" vertical
    * strategy. Returns the first detected grid (pdfplumber's extract_table
    * returns one), or None. */
  private val CellRun = "[^ ](?:[^ ]| (?! ))*".r // runs of non-space (single spaces allowed inside)

  def extractTableTextStrategy(lines: Seq[Line], tolChars: Int = 1): Option[TableDict] = {
    def cellStarts(text: String): Vector[(Int, String)] = {
      val t = if (text == null) "" else text
      CellRun.findAllMatchIn(t).map(m => (m.start, m.matched.trim)).toVector
    }
    val parsed = lines.map(l => cellStarts(l.text))
    var i = 0
    while (i < parsed.length) {
      val cur = parsed(i)
      if (cur.length >= 2) {
        var j = i + 1
        var ok = true
        while (j < parsed.length && ok) {
          val nxt = parsed(j)
          ok = nxt.length == cur.length &&
            nxt.map(_._1).zip(cur.map(_._1)).forall { case (a, b) => math.abs(a - b) <= tolChars }
          if (ok) j += 1
        }
        if (j - i >= 2) {
          val rows = (i until j).map(r => parsed(r).map(_._2)).toVector
          return Some(TableDict(rows, rows.length, rows.head.length))
        }
      }
      i += 1
    }
    None
  }

  // ---------------------------------------------------------------------
  // Page assembly
  // ---------------------------------------------------------------------

  private def ensureSortedByOffset(spans: Seq[Span]): Seq[Span] = {
    var i = 1
    var sortedAlready = true
    while (sortedAlready && i < spans.length) {
      if (spans(i - 1).offset > spans(i).offset) sortedAlready = false
      i += 1
    }
    if (sortedAlready) spans else spans.sortBy(_.offset)
  }

  /** Parse one page's spans (any order; all on the same page). */
  def parsePage(pageNumber: Int, spans: Seq[Span], cfg: ExtractConfig): PageData = {
    val sorted = ensureSortedByOffset(spans)
    // one pass (r4): the former two filters + a map built three intermediate
    // collections per page; text spans, their line texts, and decoded images
    // all fall out of a single walk
    val textSpans = new scala.collection.mutable.ArrayBuffer[Span](sorted.length)
    val lineTexts = new scala.collection.mutable.ArrayBuffer[String](sorted.length)
    val images = new scala.collection.mutable.ArrayBuffer[ImageDict](4)
    sorted.foreach { s =>
      if (s.kind == "image") images += deriveImage(s)
      else { textSpans += s; lineTexts += (if (s.text == null) "" else s.text) }
    }
    val textObjects = extractTextObjectsFast(textSpans, PageWidth)
    val tables = extractTablesLines(lineTexts)
    PageData(pageNumber, PageWidth, PageHeight, textObjects,
      scala.collection.immutable.ArraySeq.unsafeWrapArray(images.toArray), tables)
  }

  /** Split a doc's spans into offset-ordered pages. Single pass over the
    * offset-sorted stream (pageOf is monotone in offset, so page runs are
    * contiguous) — the former per-doc groupBy allocated a HashMap on the
    * hottest kernel path. */
  def paginate(spans: Seq[Span]): IndexedSeq[(Int, IndexedSeq[Span])] = {
    if (spans.isEmpty) return Vector.empty
    val sorted = ensureSortedByOffset(spans)
    // array-backed page slices (r4): pages are contiguous runs of the
    // offset-sorted stream, so each page is a flat array slice — no
    // per-span Vector builder churn on the hottest kernel entry
    val arr = sorted.toArray
    def slice(a: Int, b: Int): IndexedSeq[Span] =
      scala.collection.immutable.ArraySeq.unsafeWrapArray(java.util.Arrays.copyOfRange(arr, a, b))
    val out = new scala.collection.mutable.ArrayBuffer[(Int, IndexedSeq[Span])](8)
    var start = 0
    var curPage = pageOf(arr(0).offset)
    var i = 1
    while (i < arr.length) {
      val p = pageOf(arr(i).offset)
      if (p != curPage) {
        out += ((curPage, slice(start, i)))
        start = i
        curPage = p
      }
      i += 1
    }
    out += ((curPage, slice(start, arr.length)))
    scala.collection.immutable.ArraySeq.unsafeWrapArray(out.toArray)
  }
}
