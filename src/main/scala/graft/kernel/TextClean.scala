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

  /** Python str.splitlines() boundary set (text_processor.py:60 iterates
    * splitlines): \n, \r, \r\n, \v, \f, \x1c, \x1d, \x1e, \x85, U+2028,
    * U+2029. Java's \s notion differs — match Python's exactly. */
  private def isLineTerminator(c: scala.Char): Boolean = (c: @annotation.switch) match {
    case '\n' | '\r' | '\u000B' | '\f' | '\u001C' | '\u001D' | '\u001E' | '\u0085' | '\u2028' | '\u2029' => true
    case _ => false
  }

  /** Python str.split() whitespace = str.isspace(): Java isWhitespace plus
    * the non-breaking spaces Java excludes (U+00A0, U+2007, U+202F). */
  private def isPySpace(c: scala.Char): Boolean =
    Character.isWhitespace(c) || c == '\u00A0' || c == '\u2007' || c == '\u202F'

  /** Python `'\n'.join(' '.join(line.strip().split()) for line in
    * text.splitlines())` — per line: trim + collapse whitespace runs;
    * splitlines semantics preserved exactly: \v/\f/\x1c-\x1e/\x85/U+2028/
    * U+2029 are line breaks too, and a terminator that ENDS the string
    * closes the last line instead of opening an empty one
    * ('abc\n' cleans to 'abc', 'abc\n\n' to 'abc\n').
    *
    * Hand-rolled single pass (no regex): String.split with a multi-char
    * pattern compiles a Pattern per call — measured as a top-3 hot frame on
    * the giant-doc path. */
  def cleanLinePreserving(text: String): String = cleanCore(text)._1

  /** True iff cleanCore(text) would return the input unchanged (no
    * terminators, no exotic whitespace, no runs of spaces, no leading or
    * trailing space). Allocation-free pre-scan: most kernel-derived block
    * texts are already clean, and skipping the StringBuilder copy for them
    * removes an O(bytes) duplicate of nearly every block. */
  private def isAlreadyClean(text: String): Boolean = {
    val n = text.length
    if (n == 0) return true
    if (text.charAt(0) == ' ' || text.charAt(n - 1) == ' ') return false
    var prevSpace = false
    var i = 0
    while (i < n) {
      val c = text.charAt(i)
      if (c == ' ') {
        if (prevSpace) return false
        prevSpace = true
      } else if (c > ' ' && c < '\u0085') {
        prevSpace = false
      } else if (isLineTerminator(c) || isPySpace(c)) {
        return false
      } else {
        prevSpace = false
      }
      i += 1
    }
    true
  }

  /** [[cleanLinePreserving]] plus "did the input contain any line
    * terminator" — detected for free inside the single pass (callers need it
    * to decide whether per-block cleaning composes, see [[cleanText]]). */
  private[kernel] def cleanCore(text: String): (String, Boolean) = {
    if (text == null) return (null, false)
    if (isAlreadyClean(text)) return (text, false)
    val n = text.length
    val sb = new java.lang.StringBuilder(n)
    var i = 0
    var lineHasContent = false // emitted a word on the current line
    var pendingSpace = false // whitespace seen since last word on this line
    var pendingNewlines = 0 // terminators seen; flushed lazily so a trailing run is trimmed
    var sawTerminator = false
    while (i < n) {
      val c = text.charAt(i)
      // fast path: printable non-space below U+0085 is always content
      // (every terminator/whitespace char is <= ' ' or >= U+0085)
      if (c > ' ' && c < '\u0085') {
        if (pendingNewlines > 0) {
          sawTerminator = true
          while (pendingNewlines > 0) { sb.append('\n'); pendingNewlines -= 1 }
        }
        if (lineHasContent && pendingSpace) sb.append(' ')
        sb.append(c)
        lineHasContent = true
        pendingSpace = false
      } else if (isLineTerminator(c)) {
        if (c == '\r' && i + 1 < n && text.charAt(i + 1) == '\n') i += 1
        pendingNewlines += 1
        lineHasContent = false
        pendingSpace = false
      } else if (isPySpace(c)) pendingSpace = true
      else {
        if (pendingNewlines > 0) {
          sawTerminator = true
          while (pendingNewlines > 0) { sb.append('\n'); pendingNewlines -= 1 }
        }
        if (lineHasContent && pendingSpace) sb.append(' ')
        sb.append(c)
        lineHasContent = true
        pendingSpace = false
      }
      i += 1
    }
    if (pendingNewlines > 0) sawTerminator = true
    // k trailing terminators produce k-1 newlines (the final one closes the
    // last line instead of opening an empty one — Python splitlines)
    while (pendingNewlines > 1) { sb.append('\n'); pendingNewlines -= 1 }
    (sb.toString, sawTerminator)
  }

  /** Copy-on-write block map (r4): returns `page` ITSELF when f changes no
    * block — the common case is an already-clean page, and rebuilding its
    * block collection (plus the PageResult copy) per doc-level pass was
    * measured allocation churn on the giant-doc path. */
  private[kernel] def mapBlocksCow(page: PageResult)(f: TextBlock => TextBlock): PageResult = {
    val blocks: IndexedSeq[TextBlock] = page.text_blocks match {
      case is: IndexedSeq[TextBlock] => is
      case s => s.toIndexedSeq
    }
    val n = blocks.length
    var out: Array[TextBlock] = null
    var i = 0
    while (i < n) {
      val b = blocks(i)
      val nb = f(b)
      if (nb ne b) {
        if (out == null) {
          out = new Array[TextBlock](n)
          var j = 0
          while (j < i) { out(j) = blocks(j); j += 1 }
        }
        out(i) = nb
      } else if (out != null) out(i) = b
      i += 1
    }
    if (out == null) page
    else page.copy(text_blocks = scala.collection.immutable.ArraySeq.unsafeWrapArray(out))
  }

  /** Copy-on-write page map: returns `pages` itself when f changes no page. */
  private[kernel] def mapPagesCow(pages: Seq[PageResult])(f: PageResult => PageResult): Seq[PageResult] = {
    val ps: IndexedSeq[PageResult] = pages match {
      case is: IndexedSeq[PageResult] => is
      case s => s.toIndexedSeq
    }
    val n = ps.length
    var out: Array[PageResult] = null
    var i = 0
    while (i < n) {
      val p = ps(i)
      val np = f(p)
      if (np ne p) {
        if (out == null) {
          out = new Array[PageResult](n)
          var j = 0
          while (j < i) { out(j) = ps(j); j += 1 }
        }
        out(i) = np
      } else if (out != null) out(i) = p
      i += 1
    }
    if (out == null) pages
    else scala.collection.immutable.ArraySeq.unsafeWrapArray(out)
  }

  def cleanText(result: DocResult): DocResult = {
    val hasMultiColumn = result.pages.exists(_.column_processed)
    if (hasMultiColumn) {
      result.copy(pages = mapPagesCow(result.pages)(p =>
        mapBlocksCow(p) { b =>
          if (b.text != null && b.text.nonEmpty) {
            val c = cleanLinePreserving(b.text)
            if (c eq b.text) b else b.copy(text = c)
          } else b
        }))
    } else {
      var anyTerminator = false // detected inside the cleaning pass, no extra scan
      var anyChanged = false // all blocks already clean -> merged text is too
      val cleanedPages = mapPagesCow(result.pages)(p =>
        mapBlocksCow(p)(b =>
          if (b.text != null && b.text.nonEmpty) {
            val (cleaned, saw) = cleanCore(b.text)
            if (saw) anyTerminator = true
            if (cleaned eq b.text) b else { anyChanged = true; b.copy(text = cleaned) }
          } else b))
      // cleaned(join(blocks, "\n\n")) == join(cleaned blocks, "\n\n"):
      // cleaning is per-line and the join boundaries are newlines, so the
      // merged text is rebuilt from the already-cleaned blocks instead of
      // re-scanning the (potentially multi-MB) merged string. Single-column
      // docs only — multi-column result.text is deliberately left raw above
      // (text_processor.py:49-60). Equivalence asserted in TextCleanSpec.
      // The composition breaks when a block text itself contains a line
      // terminator (splitlines trims a TRAILING terminator per string, so a
      // block-final '\n' is dropped per-block but internal in the merged
      // string) — kernel-derived blocks are single lines, but the public API
      // admits embedded newlines, so that rare case falls back to cleaning
      // the merged string directly, exactly like the reference.
      // inclusion is decided on the RAW text (the reference merged before
      // cleaning): a block that cleans to "" still contributes its element
      val newText =
        if (anyTerminator) cleanLinePreserving(result.text)
        // every block came back `eq` (already clean): the rebuilt join would
        // reproduce result.text byte-for-byte (cleanText's contract input is
        // mergeResults output, whose text IS the "\n\n" join of the blocks) —
        // skip the O(docBytes) mkString, the giant-doc hot allocation
        else if (!anyChanged) result.text
        else result.pages.zip(cleanedPages).flatMap { case (raw, cleaned) =>
          raw.text_blocks.zip(cleaned.text_blocks).collect {
            case (r, c) if r.text != null && r.text.nonEmpty => if (c.text == null) "" else c.text
          }
        }.mkString("\n\n")
      result.copy(text = newText, pages = cleanedPages)
    }
  }

  /** Identity stub (reference: text_processor.py:71-75). */
  def mergeHyphenatedWords(result: DocResult): DocResult = result

  /** Drop header/footer blocks from pages; result.text is never regenerated
    * (reference: text_processor.py:77-99 — the regeneration loop ends in
    * `pass`). */
  def removeHeadersFooters(result: DocResult): DocResult =
    result.copy(pages = mapPagesCow(result.pages) { p =>
      val hasBand = p.text_blocks.exists(b =>
        b.block_type == "header" || b.block_type == "footer")
      if (!hasBand) p // copy-on-write: most pages carry no bands
      else p.copy(text_blocks = p.text_blocks.filterNot(b =>
        b.block_type == "header" || b.block_type == "footer"))
    })

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
