package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.fixtures.Fixtures
import graft.kernel.Extractor
import graft.model.ExtractConfig

/** Every reference config gate (core.py:46-58 processor pruning;
  * layout_processor.py:25-34; text_processor.py:24-38) exercised:
  * disabling a stage must remove exactly that stage's effect. */
class ConfigMatrixSpec extends AnyFunSuite {
  private val doc2col = Fixtures.gen(Fixtures.docId("two_column_text", 2))
  private val docTab = Fixtures.gen(Fixtures.docId("tabular_report", 2))
  private val base = ExtractConfig.default

  test("detectColumns=false: original block order preserved, no column_processed") {
    val r = Extractor.extractDoc(doc2col, base.copy(detectColumns = false))
    assert(!r.pages.exists(_.column_processed))
    // no reordering: text spans follow raw per-line split order
    assert(r.spans.nonEmpty)
  }

  test("detectHeaders=false: no title/header/footer classification at all") {
    val r = Extractor.extractDoc(doc2col, base.copy(detectHeaders = false, removeHeadersFooters = false))
    assert(r.pages.flatMap(_.text_blocks).forall(_.block_type == "text"))
  }

  test("enableLayoutDetection=false: layout stage skipped entirely") {
    val r = Extractor.extractDoc(doc2col, base.copy(enableLayoutDetection = false))
    assert(!r.pages.exists(_.column_processed))
    assert(r.pages.flatMap(_.text_blocks).forall(_.block_type == "text"))
  }

  test("enableTableExtraction=false: no tables, table text still in blocks") {
    val r = Extractor.extractDoc(docTab, base.copy(enableTableExtraction = false))
    assert(r.tables.isEmpty)
    assert(!r.spans.exists(_.kind == "table"))
    assert(r.spans.exists(s => s.kind == "text" && s.text.contains("| Item |")))
  }

  test("enableImageProcessing=false: no image spans") {
    val doc = Fixtures.gen(Fixtures.docId("image_heavy_scan", 2))
    val r = Extractor.extractDoc(doc, base.copy(enableImageProcessing = false))
    assert(r.images.isEmpty && !r.spans.exists(_.kind == "image"))
  }

  test("enableTextCleaning=false: whole post-process skipped (reference gates post_process on text_processor presence, core.py:54,101-102)") {
    val doc = Fixtures.gen(Fixtures.docId("single_column_contract", 2))
    val r = Extractor.extractDoc(doc, base.copy(enableTextCleaning = false))
    // header/footer blocks survive because removal lives in post-process
    assert(r.pages.flatMap(_.text_blocks).exists(b => b.block_type == "header" || b.block_type == "footer"))
  }

  test("removeHeadersFooters=false: classified bands stay in spans") {
    val doc = Fixtures.gen(Fixtures.docId("single_column_contract", 2))
    val r = Extractor.extractDoc(doc, base.copy(removeHeadersFooters = false))
    assert(r.pages.flatMap(_.text_blocks).exists(b => b.block_type == "header" || b.block_type == "footer"))
  }

  test("dead knobs accepted but inert (config.py:42-43; detect_footers)") {
    val a = Extractor.extractDoc(doc2col, base)
    val b = Extractor.extractDoc(doc2col, base.copy(chunkSize = 99, timeoutSec = 7, detectFooters = false, maxWorkers = 16))
    assert(TestTiming.strip(a) == TestTiming.strip(b))
  }
}
