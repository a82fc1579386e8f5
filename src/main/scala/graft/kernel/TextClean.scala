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
    * str.split() splits on any whitespace run and drops empties.
    *
    * Hand-rolled single pass (no regex): String.split with a multi-char
    * pattern compiles a Pattern per call — measured as a top-3 hot frame on
    * the giant-doc path. Whitespace = Java \s = [ \t\n\x0B\f\r], matching
    * Python str.split() for ASCII inputs. \r\n, \n and \r all end lines. */
  def cleanLinePreserving(text: String): String = {
    if (text == null) return null
    val n = text.length
    val sb = new java.lang.StringBuilder(n)
    var i = 0
    var lineHasContent = false // emitted a word on the current line
    var pendingSpace = false // whitespace seen since last word on this line
    def endLine(): Unit = { sb.append('\n'); lineHasContent = false; pendingSpace = false }
    while (i < n) {
      val c = text.charAt(i)
      if (c == '\r') {
        if (i + 1 < n && text.charAt(i + 1) == '\n') i += 1
        endLine()
      } else if (c == '\n') endLine()
      else if (c == ' ' || c == '\t' || c == '\u000B' || c == '\f') pendingSpace = true
      else {
        if (lineHasContent && pendingSpace) sb.append(' ')
        sb.append(c)
        lineHasContent = true
        pendingSpace = false
      }
      i += 1
    }
    sb.toString
  }

  def cleanText(result: DocResult): DocResult = {
    val hasMultiColumn = result.pages.exists(_.column_processed)
    if (hasMultiColumn) {
      result.copy(pages = result.pages.map(p =>
        p.copy(text_blocks = p.text_blocks.map(b =>
          if (b.text != null && b.text.nonEmpty) b.copy(text = cleanLinePreserving(b.text)) else b))))
    } else {
      val cleanedPages = result.pages.map(p =>
        p.copy(text_blocks = p.text_blocks.map(b =>
          if (b.text != null && b.text.nonEmpty) b.copy(text = cleanLinePreserving(b.text)) else b)))
      // cleaned(join(blocks, "\n\n")) == join(cleaned blocks, "\n\n"):
      // cleaning is per-line and the join boundaries are newlines, so the
      // merged text is rebuilt from the already-cleaned blocks instead of
      // re-scanning the (potentially multi-MB) merged string. Single-column
      // docs only — multi-column result.text is deliberately left raw above
      // (text_processor.py:49-60). Equivalence asserted in TextCleanSpec.
      // inclusion is decided on the RAW text (the reference merged before
      // cleaning): a block that cleans to "" still contributes its element
      val rebuilt = result.pages.zip(cleanedPages).flatMap { case (raw, cleaned) =>
        raw.text_blocks.zip(cleaned.text_blocks).collect {
          case (r, c) if r.text != null && r.text.nonEmpty => if (c.text == null) "" else c.text
        }
      }.mkString("\n\n")
      result.copy(text = rebuilt, pages = cleanedPages)
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
