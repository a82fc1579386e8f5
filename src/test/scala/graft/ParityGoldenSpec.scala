package graft

import org.scalatest.funsuite.AnyFunSuite

/** In-CI parity gate (VERDICT r04 next-round #8): replays the full
  * reference-parity doc population (10/archetype + 150 adversarial fuzz
  * docs — the same enumeration tools/reference_parity.py diffs against the
  * actual reference implementation) and compares each doc's kernel-output
  * signature against the committed golden, which was frozen at a
  * 0-diff-vs-reference state. A kernel semantic change now fails
  * `sbt test` immediately instead of waiting for the external python
  * replay. Regeneration recipe: see [[ParityGoldenDump]] scaladoc. */
class ParityGoldenSpec extends AnyFunSuite {

  test("kernel outputs match the committed 0-diff parity signatures (211 docs)") {
    val in = getClass.getResourceAsStream("/graft/parity_golden.csv")
    assert(in != null, "parity_golden.csv resource missing — run graft.ParityGoldenDump")
    val lines = scala.io.Source.fromInputStream(in, "UTF-8").getLines().toVector
    in.close()
    assert(lines.head == "doc_id,md5")
    val golden = lines.tail.map { l =>
      val c = l.split(",", 2); c(0) -> c(1)
    }.toMap
    val docs = ParityDump.parityDocs(ParityGoldenDump.PerArchetype, ParityGoldenDump.NFuzz)
    assert(docs.length == golden.size,
      s"parity population drifted: ${docs.length} docs vs ${golden.size} signatures — regenerate per ParityGoldenDump")
    val drifted = docs.flatMap { d =>
      val sig = ParityDump.signature(d)
      golden.get(d.doc_id) match {
        case Some(g) if g == sig => None
        case Some(_) => Some(d.doc_id)
        case None => Some(s"${d.doc_id} (missing)")
      }
    }
    assert(drifted.isEmpty,
      s"kernel outputs drifted from the committed 0-diff parity state on ${drifted.length} docs " +
      s"(first: ${drifted.take(5).mkString(", ")}). If intentional, re-verify with the python " +
      "replay at 0 diffs, then regenerate via graft.ParityGoldenDump (see its scaladoc).")
  }
}
