package graft

import graft.model.DocResult

/** Measurement fields (processing_time, extraction_date — models.py:158-159)
  * are wall-clock and excluded from determinism/equality assertions, exactly
  * as the reference excludes them from fixture to_dict comparisons. */
object TestTiming {
  def strip(r: DocResult): DocResult =
    r.copy(processing_time = 0.0, extraction_date = 0L)
}
