package graft.kernel

import graft.model._

/** Text post-processing (reference: smartextractor/processors/text_processor.py:13-105)
  * with the reference's exact single-vs-multi-column asymmetries:
  *   - cleaning: multi-column docs clean BLOCK texts only, result.text is
  *     untouched; single-column docs clean both (text_processor.py:46-69)
  *   - header/footer removal: blocks only, NEVER result.text
  *     (text_processor.py:77-99)
  *   - hyphen merge and encoding fix are identity stubs
  *     (text_processor.py:71-75,101-105)
  */
object TextClean {

  /** Python `' '.join(line.strip().split())` per line, newline-preserving.
    * str.split() splits on any whitespace run and drops empties. */
  def cleanLinePreserving(text: String): String = {
    if (text == null) return null
    // Python splitlines on \n \r \r\n (and unicode seps — restrict to the
    // common three; our pipeline only ever produces \n)
    val lines = text.split("\r\n|\n|\r", -1)
    lines.map(l => l.trim.split("\\s+").filter(_.nonEmpty).mkString(" ")).mkString("\n")
  }

  def cleanText(result: DocResult): DocResult = {
    val hasMultiColumn = result.pages.exists(_.column_processed)
    if (hasMultiColumn) {
      result.copy(pages = result.pages.map(p =>
        p.copy(text_blocks = p.text_blocks.map(b =>
          if (b.text != null && b.text.nonEmpty) b.copy(text = cleanLinePreserving(b.text)) else b))))
    } else {
      result.copy(
        text = cleanLinePreserving(result.text),
        pages = result.pages.map(p =>
          p.copy(text_blocks = p.text_blocks.map(b =>
            if (b.text != null && b.text.nonEmpty) b.copy(text = cleanLinePreserving(b.text)) else b))))
    }
  }

  /** Identity stub (reference: text_processor.py:71-75). */
  def mergeHyphenatedWords(result: DocResult): DocResult = result

  /** Drop header/footer blocks from pages; result.text is never regenerated
    * (reference: text_processor.py:77-99 — the regeneration loop ends in
    * `pass`). */
  def removeHeadersFooters(result: DocResult): DocResult =
    result.copy(pages = result.pages.map(p =>
      p.copy(text_blocks = p.text_blocks.filterNot(b =>
        b.block_type == "header" || b.block_type == "footer"))))

  /** Identity stub (reference: text_processor.py:101-105). */
  def fixEncoding(result: DocResult): DocResult = result

  /** Full post-process (reference: text_processor.py:19-44). */
  def postProcess(result: DocResult, cfg: ExtractConfig): DocResult = {
    var r = result
    if (cfg.enableTextCleaning) r = cleanText(r)
    if (cfg.mergeHyphenatedWords) r = mergeHyphenatedWords(r)
    if (cfg.removeHeadersFooters) r = removeHeadersFooters(r)
    if (cfg.fixEncoding) r = fixEncoding(r)
    r
  }
}
