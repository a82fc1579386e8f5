package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.model.ExtractConfig

/** Guards the committed reference-replay expected table
  * (src/main/resources/graft/expected_docs.csv — the DuckDB oracle for
  * q01/q02/q03/q32) against drift: if the fixture generator, geometry
  * template, or kernel changes behavior, this fails in `sbt test` instead of
  * surfacing later in the driver's correctness gate. On failure: re-run the
  * parity sweep first (the kernel may be wrong), then regenerate the CSV
  * per the NOTES.md recipe if the change is intentional. */
class ExpectedCsvSpec extends AnyFunSuite {

  private lazy val expected: Map[String, (Int, Int, Int, Int, Int)] = {
    val in = getClass.getResourceAsStream("/graft/expected_docs.csv")
    assert(in != null, "expected_docs.csv resource missing")
    val lines = scala.io.Source.fromInputStream(in, "UTF-8").getLines().toVector
    in.close()
    assert(lines.head == "src_id,doc_id,n_spans,n_pages,text_len,fitz_len,plumber_len")
    lines.tail.map { l =>
      val f = l.split(",", -1)
      f(1) -> ((f(2).toInt, f(3).toInt, f(4).toInt, f(5).toInt, f(6).toInt))
    }.toMap
  }

  test("committed expected table matches the live engine (sampled doc ids)") {
    assert(expected.size == 5000)
    // deterministic sample across the id range (covers every archetype)
    val sampleIds = (0 until 5000 by 37).map(_.toString)
    sampleIds.foreach { src =>
      val doc = SparkEntry.rawDocFor(src)
      val e = expected.getOrElse(doc.doc_id, fail(s"doc ${doc.doc_id} missing from expected CSV"))
      val core = graft.kernel.Extractor.extractDoc(doc)
      assert(!core.quarantined, s"${doc.doc_id} quarantined")
      assert((core.spans.length, core.num_pages, core.text.length) == ((e._1, e._2, e._3)),
        s"core drift on ${doc.doc_id}")
      val fitz = graft.kernel.AdaptiveFitz.extractText(doc.spans)
      assert(fitz.length == e._4, s"fitz drift on ${doc.doc_id}: ${fitz.length} != ${e._4}")
      val plumber = graft.kernel.AdaptivePlumber.extractText(doc.spans)
      assert(plumber.length == e._5, s"plumber drift on ${doc.doc_id}: ${plumber.length} != ${e._5}")
    }
  }
}
