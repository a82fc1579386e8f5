package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.kernel.TextClean

/** Equivalence of the rebuilt-from-blocks cleaning against the direct
  * clean-the-merged-string formulation (the reference's literal order of
  * operations, text_processor.py:46-69). */
class TextCleanSpec extends AnyFunSuite {
  test("clean(join(blocks)) == join(clean(blocks)) across the corpus") {
    for (a <- graft.fixtures.Fixtures.Archetypes; i <- 0 until 15) {
      val doc = graft.fixtures.Fixtures.gen(graft.fixtures.Fixtures.docId(a, i))
      val pages = graft.kernel.Parse.paginate(doc.spans).map { case (p, ss) =>
        graft.kernel.Extractor.extractPage(p, ss, graft.model.ExtractConfig.default)
      }
      val merged = graft.kernel.Extractor.mergeResults(doc.doc_id, pages)
      if (!merged.pages.exists(_.column_processed)) {
        val direct = TextClean.cleanLinePreserving(merged.text)
        val viaBlocks = TextClean.cleanText(merged).text
        assert(direct == viaBlocks, s"cleaning mismatch for ${doc.doc_id}")
      }
    }
  }

  test("Python splitlines semantics: trailing terminator trimmed; \\v/\\f/\\x1c-\\x1e/\\x85/U+2028/U+2029 break lines") {
    import TextClean.cleanLinePreserving
    assert(cleanLinePreserving("abc\n") == "abc")
    assert(cleanLinePreserving("abc\n\n") == "abc\n")
    assert(cleanLinePreserving("abc\r\n") == "abc")
    assert(cleanLinePreserving("a\u000Bb") == "a\nb")
    assert(cleanLinePreserving("a\fb") == "a\nb")
    assert(cleanLinePreserving("a\u001Cb\u001Dc\u001Ed") == "a\nb\nc\nd")
    assert(cleanLinePreserving("a\u0085b") == "a\nb")
    assert(cleanLinePreserving("a\u2028b\u2029c") == "a\nb\nc")
    assert(cleanLinePreserving("a\n\rb") == "a\n\nb") // \n then \r = two breaks
    assert(cleanLinePreserving("a\r\nb") == "a\nb") // \r\n = one break
    assert(cleanLinePreserving("\nabc") == "\nabc")
    assert(cleanLinePreserving("\n") == "")
    assert(cleanLinePreserving("\n\n") == "\n")
    assert(cleanLinePreserving("  ") == "")
    assert(cleanLinePreserving("a\u00A0b") == "a b") // NBSP is Python str.split whitespace
  }

  test("blocks with embedded/trailing terminators: cleanText falls back to merged-string cleaning") {
    import graft.model._
    val page = PageResult(1, Seq(
      TextBlock(text = "line1\n", bbox = Nil), // trailing terminator: per-block clean drops it
      TextBlock(text = "x  y", bbox = Nil)))
    val merged = graft.kernel.Extractor.mergeResults("d", Seq(page))
    val out = TextClean.cleanText(merged)
    // reference single-column path: result.text cleaned from the MERGED
    // string; blocks cleaned independently (text_processor.py:62-68)
    assert(out.text == TextClean.cleanLinePreserving(merged.text))
    assert(out.text == "line1\n\n\nx y")
    assert(out.pages.head.text_blocks.head.text == "line1")
  }

  test("whitespace-only and cleaned-to-empty blocks keep their separators") {
    import graft.model._
    val page = PageResult(1, Seq(
      TextBlock(text = "a   b", bbox = Nil),
      TextBlock(text = " \t ", bbox = Nil), // raw-nonEmpty, cleans to ""
      TextBlock(text = "c", bbox = Nil)))
    val merged = graft.kernel.Extractor.mergeResults("d", Seq(page))
    val direct = TextClean.cleanLinePreserving(merged.text)
    val viaBlocks = TextClean.cleanText(merged).text
    assert(direct == viaBlocks)
    assert(viaBlocks == "a b\n\n\n\nc")
  }
}
