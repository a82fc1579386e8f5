package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.model._

/** 1:1 port of the reference's config/model unit tests
  * (reference: tests/test_smartextractor.py:17-63, 130-207). */
class ModelSpec extends AnyFunSuite {

  test("config default values — test_smartextractor.py:133-142") {
    val c = ExtractConfig.default
    assert(c.enableOcr)
    assert(c.enableLayoutDetection)
    assert(c.enableTableExtraction)
    assert(c.language == "zh-CN")
    assert(c.confidenceThreshold == 0.8)
    assert(c.maxWorkers == 4)
  }

  test("config custom values — test_smartextractor.py:144-158") {
    val c = ExtractConfig(enableOcr = false, enableLayoutDetection = false,
      language = "en", confidenceThreshold = 0.9, maxWorkers = 8)
    c.validate()
    assert(!c.enableOcr && !c.enableLayoutDetection)
    assert(c.language == "en" && c.confidenceThreshold == 0.9 && c.maxWorkers == 8)
  }

  test("invalid config raises — test_smartextractor.py:36-42") {
    intercept[IllegalArgumentException](ExtractConfig(confidenceThreshold = 1.5).validate())
    intercept[IllegalArgumentException](ExtractConfig(ocrEngine = "bogus").validate())
    intercept[IllegalArgumentException](ExtractConfig(outputFormat = "xml").validate())
    intercept[IllegalArgumentException](ExtractConfig(chunkSize = 0).validate())
    intercept[IllegalArgumentException](ExtractConfig(timeoutSec = 0).validate())
  }

  test("TextBlock — test_smartextractor.py:164-179") {
    val b = TextBlock(text = "Test text", bbox = Seq(0, 0, 100, 50),
      font_size = Some(12.0), is_bold = true)
    assert(b.text == "Test text")
    assert(b.bbox == Seq(0, 0, 100, 50))
    assert(b.font_size.contains(12.0))
    assert(b.is_bold && !b.is_italic)
    assert(b.block_type == "text" && b.confidence == 1.0)
  }

  test("TableResult — test_smartextractor.py:181-207") {
    val cells = Seq(
      TableCell("Header1", 0, 0, Seq(0, 0, 50, 20)),
      TableCell("Header2", 0, 1, Seq(50, 0, 100, 20)),
      TableCell("Data1", 1, 0, Seq(0, 20, 50, 40)),
      TableCell("Data2", 1, 1, Seq(50, 20, 100, 40)))
    val t = TableResult(cells = cells, rows = 2, cols = 2, bbox = Seq(0, 0, 100, 40))
    assert(t.rows == 2 && t.cols == 2 && t.cells.length == 4)
    // to_dict analog: the grid projection
    assert(t.toGrid == Seq(Seq("Header1", "Header2"), Seq("Data1", "Data2")))
  }

  test("PageResult.text joins blocks with newlines — models.py:120-123") {
    val p = PageResult(1, Seq(
      TextBlock(text = "a", bbox = Nil), TextBlock(text = "b", bbox = Nil)))
    assert(p.text == "a\nb")
  }
}
