package graft

import org.scalatest.funsuite.AnyFunSuite

/** Totality + determinism under adversarial inputs: the kernel must
  * quarantine or degrade, never throw, whatever the driver feeds it. */
class FuzzSpec extends AnyFunSuite {
  test("fuzz: random span streams never crash and extract deterministically") {
    val rnd = new scala.util.Random(20260816L)
    val alphabets = Array(
      "abc def  ghi\t|",
      "一二三 四五六",
      "  | -- | == |  ",
      " \r\n\\\"",
      "Page 1 Chapter 2 Header Footer Confidential ©2026")
    (0 until 300).foreach { i =>
      val nSpans = rnd.nextInt(40)
      val spans = (0 until nSpans).map { j =>
        val kind = rnd.nextInt(5) match {
          case 0 => "image"
          case 1 => null
          case 2 => "weird"
          case _ => "text"
        }
        val text = rnd.nextInt(6) match {
          case 0 => null
          case 1 => ""
          case 2 => " " * rnd.nextInt(90)
          case _ =>
            val a = alphabets(rnd.nextInt(alphabets.length))
            (0 until rnd.nextInt(4)).map(_ => a.substring(rnd.nextInt(a.length))).mkString(" ")
        }
        val offset = rnd.nextInt(3) match {
          case 0 => rnd.nextInt(2000) - 1000 // negative + sparse
          case _ => j
        }
        graft.model.Span(kind, text, if (rnd.nextBoolean()) null else s"m$j", offset)
      }
      val doc = graft.model.RawDoc(s"fuzz-$i", spans)
      val r1 = graft.kernel.Extractor.extractDoc(doc)
      val r2 = graft.kernel.Extractor.extractDoc(doc)
      assert(TestTiming.strip(r1) == TestTiming.strip(r2), s"nondeterministic on fuzz-$i")
      assert(r1.spans.map(_.offset) == r1.spans.indices, s"offset gap on fuzz-$i")
    }
  }

  test("fuzz: adaptive engines are total over the same streams") {
    val rnd = new scala.util.Random(99L)
    (0 until 100).foreach { i =>
      val spans = (0 until rnd.nextInt(30)).map { j =>
        graft.model.Span(if (rnd.nextBoolean()) "text" else "image",
          if (rnd.nextBoolean()) ("w" * rnd.nextInt(60)) + "  x" else null,
          null, rnd.nextInt(100))
      }
      Seq("fitz", "plumber").foreach { e =>
        val r = graft.kernel.Extractor.extractDoc(
          graft.model.RawDoc(s"af-$i", spans),
          graft.model.ExtractConfig.default.copy(engine = e))
        assert(!r.quarantined || r.error.nonEmpty)
      }
    }
  }
}
