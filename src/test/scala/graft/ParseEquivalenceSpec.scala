package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.kernel.Parse
import graft.fixtures.Fixtures

/** Cross-validation: the allocation-free array path must produce exactly the
  * blocks of the generic per-char reference path on the full corpus space. */
class ParseEquivalenceSpec extends AnyFunSuite {
  test("extractTextObjectsFast == generic char-object path over all archetypes") {
    for (a <- Fixtures.Archetypes; i <- 0 until 25) {
      val doc = Fixtures.gen(Fixtures.docId(a, i))
      Parse.paginate(doc.spans).foreach { case (_, spans) =>
        val textSpans = spans.filter(s => s.kind == null || s.kind != "image")
        val fast = Parse.extractTextObjectsFast(textSpans, Parse.PageWidth)
        val generic = Parse.extractTextObjects(textSpans.flatMap(Parse.deriveChars), Parse.PageWidth)
        assert(fast == generic, s"mismatch for $a-$i")
      }
    }
  }

  test("deriveCharRun == deriveChars geometry") {
    for (a <- Fixtures.Archetypes; i <- 0 until 10) {
      Fixtures.gen(Fixtures.docId(a, i)).spans.filter(_.kind != "image").foreach { s =>
        val run = Parse.deriveCharRun(s)
        val chars = Parse.deriveChars(s)
        assert(run.length == chars.length)
        chars.indices.foreach { j =>
          assert(run.chars(j).toString == chars(j).text)
          assert(run.x0(j) == chars(j).x0)
          assert(run.x1(j) == chars(j).x1)
        }
      }
    }
  }
}
