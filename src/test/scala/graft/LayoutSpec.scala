package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.model._
import graft.kernel.Layout

/** 1:1 port of the reference's layout unit tests
  * (reference: tests/test_layout_processor.py:19-248). */
class LayoutSpec extends AnyFunSuite {

  private def block(text: String, bbox: Seq[Double], fontSize: Option[Double] = None): TextBlock =
    TextBlock(text = text, bbox = bbox, font_size = fontSize)

  test("detect headers (titles) — test_layout_processor.py:19-39") {
    val page = PageResult(1, Seq(
      block("Big Title", Seq(0, 0, 200, 50), Some(18)),
      block("Body Content", Seq(0, 60, 400, 80), Some(12)),
      block("Subtitle", Seq(0, 100, 150, 120), Some(16))
    ), width = 800, height = 600)
    val r = Layout.detectTitles(page)
    assert(r.text_blocks(0).block_type == "title")
    assert(r.text_blocks(1).block_type == "text")
    assert(r.text_blocks(2).block_type == "title") // 16pt is a title too
  }

  test("detect headers/footers — test_layout_processor.py:41-58") {
    val page = PageResult(1, Seq(
      block("Header", Seq(0, 0, 100, 30)),
      block("Body", Seq(0, 100, 400, 200)),
      block("Footer", Seq(0, 570, 100, 600))
    ), width = 800, height = 600)
    val r = Layout.detectHeadersFooters(page)
    assert(r.text_blocks(0).block_type == "header")
    assert(r.text_blocks(1).block_type == "text")
    assert(r.text_blocks(2).block_type == "footer")
  }

  test("single column layout unchanged — test_layout_processor.py:60-79") {
    val page = PageResult(1, Seq(
      block("Paragraph 1", Seq(50, 50, 750, 80)),
      block("Paragraph 2", Seq(50, 100, 750, 130)),
      block("Paragraph 3", Seq(50, 150, 750, 180))
    ), width = 800, height = 600)
    val r = Layout.detectColumns(page)
    assert(r.text_blocks.length == 3)
    assert(r.text_blocks.map(_.text) == Seq("Paragraph 1", "Paragraph 2", "Paragraph 3"))
    assert(!r.column_processed)
  }

  test("two column layout row-by-row reading order — test_layout_processor.py:81-111") {
    val page = PageResult(1, Seq(
      block("Left Column 1", Seq(50, 50, 350, 80)),
      block("Left Column 2", Seq(50, 100, 350, 130)),
      block("Right Column 1", Seq(450, 50, 750, 80)),
      block("Right Column 2", Seq(450, 100, 750, 130))
    ), width = 800, height = 600)
    val r = Layout.detectColumns(page)
    assert(r.text_blocks.length == 4)
    assert(r.text_blocks.map(_.text) ==
      Seq("Left Column 1", "Right Column 1", "Left Column 2", "Right Column 2"))
    assert(r.column_processed)
  }

  test("three column layout left-to-right — test_layout_processor.py:113-137") {
    val page = PageResult(1, Seq(
      block("Left", Seq(50, 50, 250, 80)),
      block("Center", Seq(350, 50, 550, 80)),
      block("Right", Seq(650, 50, 850, 80))
    ), width = 900, height = 600)
    val r = Layout.detectColumns(page)
    assert(r.text_blocks.length == 3)
    assert(r.text_blocks.map(_.text) == Seq("Left", "Center", "Right"))
  }

  test("group blocks by rows — test_layout_processor.py:139-157") {
    val blocks = Seq(
      block("Row1-Left", Seq(50, 100, 200, 130)),
      block("Row1-Right", Seq(250, 100, 400, 130)),
      block("Row2-Left", Seq(50, 150, 200, 180)),
      block("Row2-Right", Seq(250, 150, 400, 180))
    )
    val groups = Layout.groupBlocksByRows(blocks)
    assert(groups.length == 2)
    assert(groups(0).length == 2)
    assert(groups(1).length == 2)
    val firstRow = groups(0).map(_.text)
    assert(firstRow.contains("Row1-Left"))
    assert(firstRow.contains("Row1-Right"))
  }

  test("heuristic column detection — test_layout_processor.py:159-186") {
    val narrow = PageResult(1, Seq(
      block("Narrow Text", Seq(50, 50, 200, 80)),
      block("Narrow Text", Seq(250, 50, 400, 80))
    ), width = 800, height = 600)
    assert(Layout.heuristicColumnDetection(narrow) >= 2)

    val wide = PageResult(1, Seq(
      block("Wide Text", Seq(50, 50, 750, 80))
    ), width = 800, height = 600)
    assert(Layout.heuristicColumnDetection(wide) == 1)
  }

  test("density based column detection — test_layout_processor.py:188-205") {
    val page = PageResult(1, Seq(
      block("Left Text 1", Seq(50, 50, 350, 80)),
      block("Left Text 2", Seq(50, 100, 350, 130)),
      block("Right Text 1", Seq(450, 50, 750, 80)),
      block("Right Text 2", Seq(450, 100, 750, 130))
    ), width = 800, height = 600)
    assert(Layout.densityBasedColumnDetection(page) >= 2)
  }

  test("improved column detection in range — test_layout_processor.py:207-221") {
    val page = PageResult(1, Seq(
      block("Left", Seq(50, 50, 350, 80)),
      block("Right", Seq(450, 50, 750, 80))
    ), width = 800, height = 600)
    val k = Layout.improveColumnDetection(page)
    assert(k >= 1 && k <= 4)
  }

  test("empty page — test_layout_processor.py:223-233") {
    val page = PageResult(1, Nil, width = 800, height = 600)
    val r = Layout.detectColumns(page)
    assert(r.text_blocks.isEmpty)
  }

  test("blocks without bbox kept — test_layout_processor.py:235-248") {
    val page = PageResult(1, Seq(
      TextBlock(text = "No position info", bbox = Nil),
      block("Has position info", Seq(50, 50, 200, 80))
    ), width = 800, height = 600)
    val r = Layout.detectColumns(page)
    assert(r.text_blocks.length == 2)
  }

  test("six-block two-column demo — examples/column_layout_demo.py:20-41") {
    val page = PageResult(1, Seq(
      block("Left column first paragraph", Seq(50, 50, 350, 80)),
      block("Left column second paragraph", Seq(50, 100, 350, 130)),
      block("Left column third paragraph", Seq(50, 150, 350, 180)),
      block("Right column first paragraph", Seq(450, 50, 750, 80)),
      block("Right column second paragraph", Seq(450, 100, 750, 130)),
      block("Right column third paragraph", Seq(450, 150, 750, 180))
    ), width = 800, height = 600)
    val r = Layout.detectColumns(page)
    assert(r.text_blocks.map(_.text) == Seq(
      "Left column first paragraph", "Right column first paragraph",
      "Left column second paragraph", "Right column second paragraph",
      "Left column third paragraph", "Right column third paragraph"))
  }

  test("header content patterns anchor like re.match") {
    val b = block("Chapter 12 overview text", Seq(350, 5, 450, 25))
    assert(Layout.isLikelyHeader(b, 800)) // ^(Chapter|Section|Part)\s+\d+ is a prefix match
    val notAnchored = block("see Chapter 12", Seq(0, 5, 60, 25))
    // doesn't match any pattern, isn't centered, no small font
    assert(!Layout.isLikelyHeader(notAnchored, 800))
  }

  test("column assignment edge: center at right page edge goes to column 0") {
    // reference loop default (layout_processor.py:324-328)
    val page = PageResult(1, Seq(block("edge", Seq(790, 50, 810, 80))), width = 800, height = 600)
    val cols = Layout.assignBlocksToColumns(page, 2)
    assert(cols(0).length == 1 && cols(1).isEmpty)
  }

  test("detectColumns swallows malformed-bbox failures, keeping original order (layout_processor.py:220-222)") {
    import graft.model.{PageResult, TextBlock}
    // two clear columns so the vote picks k=2, plus one malformed 2-element
    // bbox block: the center-x read (bbox(2)) throws, and the whole detection
    // must fall back to the original page like the reference's except block
    val blocks = (0 until 6).flatMap { i =>
      Seq(
        TextBlock(text = s"left $i", bbox = Seq(60.0, 50.0 + 40 * i, 180.0, 68.0 + 40 * i)),
        TextBlock(text = s"right $i", bbox = Seq(460.0, 50.0 + 40 * i, 580.0, 68.0 + 40 * i)))
    } :+ TextBlock(text = "malformed", bbox = Seq(300.0, 100.0))
    val page = PageResult(1, blocks, width = 800.0, height = 600.0)
    val out = Layout.detectColumns(page)
    assert(out == page, "malformed bbox must not reorder or drop the page")
    assert(!out.column_processed)
  }
}
