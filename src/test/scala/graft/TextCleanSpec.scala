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
