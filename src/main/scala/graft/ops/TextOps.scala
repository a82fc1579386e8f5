package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level text-analysis operators for large-scale training-data
  * pipelines (language ID, quality scoring, token counting, fingerprinting,
  * cleaning). Pure Catalyst expressions — codegen-friendly, no UDFs — each
  * with a DuckDB-equivalent SQL form in [[Queries]].
  *
  * Algorithm provenance (public literature): MinHash resemblance sketches —
  * Broder, "On the resemblance and containment of documents" (SEQUENCES
  * 1997); banded LSH — Indyk & Motwani (STOC 1998) / Leskovec-Rajaraman-
  * Ullman MMDS ch.3; SimHash — Charikar, "Similarity estimation techniques
  * from rounding algorithms" (STOC 2002), applied to near-dup web corpora by
  * Manku et al. (WWW 2007); random-hyperplane ANN bucketing follows the same
  * Charikar construction.
  */
object TextOps {

  /** Whitespace token count. */
  def tokenCount(text: Column): Column =
    when(length(trim(text)) === 0, lit(0))
      .otherwise(size(split(trim(text), "\\s+")))

  /** CHEAP subword token ESTIMATE (ceil(chars-per-word / 4) summed) — the
    * zero-vocabulary estimator for sizing scans. The REAL subword tokenizer
    * is [[Tokenize]] (greedy longest-match over a committed vocabulary),
    * exposed as the native `Functions.subword_count` / q46. */
  def subwordCount(text: Column): Column =
    aggregate(
      split(trim(text), "\\s+"),
      lit(0L),
      (acc, w) => acc + ceil(length(w) / lit(4.0)).cast("long"))

  /** Newline-preserving whitespace normalization — the engine's cleaning
    * operator as a Catalyst expression (kernel twin:
    * TextClean.cleanLinePreserving; reference text_processor.py:60-68).
    *
    * r6 form: two whole-string regex passes instead of
    * split/transform/array_join — the per-line lambda paid a regex
    * invocation plus an array element per line and materialized the line
    * array twice (split + join). Equivalence to `trim(l)` +
    * `regexp_replace(l, "\\s+", " ")` per line:
    *   - Spark's `trim` strips SPACES only; `(?dm)^ +| +$` strips exactly
    *     those at `\n`-line boundaries (UNIX_LINES `d` keeps `\r`/U+2028
    *     from acting as terminators, matching `split(text, "\n")`);
    *   - `[\s&&[^\n]]+` -> " " collapses the remaining whitespace runs,
    *     which can never span a `\n`, exactly like the per-line "\\s+". */
  def cleanLines(text: Column): Column =
    regexp_replace(regexp_replace(text, "(?dm)^ +| +$", ""), "[\\s&&[^\\n]]+", " ")

  private val EnStopwords = Seq("the", "and", "of", "to", "a", "in", "is", "for")

  /** Stopword hits: count of tokens that are English stopwords. */
  def stopwordHits(text: Column): Column = {
    val words = split(lower(trim(text)), "\\s+")
    size(filter(words, w => EnStopwords.foldLeft(lit(false))((acc, s) => acc || (w === s))))
  }

  /** n-gram-heuristic language ID: CJK-ratio then stopword evidence.
    * Mirrors the reference's (dead) CJK ratio test
    * (layout_processor.py:428-448) as a live operator. */
  def langId(text: Column): Column = {
    val total = length(text)
    val cjk = total - length(regexp_replace(text, "[\\u4e00-\\u9fff]", ""))
    when(total > 0 && cjk / total.cast("double") > 0.3, lit("zh"))
      .when(stopwordHits(text) > 0, lit("en"))
      .otherwise(lit("unknown"))
  }

  /** Quality score in [0,1]: length band + punctuation ratio + stopword
    * ratio + mean word length band. Deterministic, SQL-expressible. */
  def qualityScore(text: Column): Column = {
    val t = trim(text)
    val chars = length(t).cast("double")
    val words = tokenCount(t).cast("double")
    val punct = (length(t) - length(regexp_replace(t, "[\\.,;:!\\?]", ""))).cast("double")
    val lengthOk = when(chars >= 100 && chars <= 20000, 1.0).otherwise(0.0)
    val punctRatio = when(chars > 0, punct / chars).otherwise(0.0)
    val punctOk = when(punctRatio <= 0.1, 1.0).otherwise(0.0)
    val stopRatio = when(words > 0, stopwordHits(t).cast("double") / words).otherwise(0.0)
    val stopOk = least(stopRatio * 5, lit(1.0))
    val meanWord = when(words > 0, chars / words).otherwise(0.0)
    val wordOk = when(meanWord >= 3 && meanWord <= 12, 1.0).otherwise(0.0)
    round((lengthOk + punctOk + wordOk + stopOk) / 4, 4)
  }

  /** Rolling/document fingerprint: md5 of the whitespace-normalized,
    * lowercased text — the exact-dedup key. */
  def fingerprint(text: Column): Column =
    md5(regexp_replace(lower(trim(text)), "\\s+", " "))

  /** Stable 32-bit token hash as a non-negative BIGINT, identical in Spark
    * and DuckDB: first 8 hex chars of md5. The shared primitive under
    * minhash/simhash so oracles can reproduce signatures bit-for-bit. */
  def hash32(c: Column): Column =
    conv(substring(md5(c), 1, 8), 16, 10).cast("long")

  /** k minhash values over a PRE-COMPUTED distinct-token array column:
    * sig_i = min over tokens of hash32(token || '#' || i). Callers project
    * [[distinctTokens]] into its own column first so the split/dedup runs
    * once per row, not once per hash function. */
  def minhashSigFromWords(words: Column, k: Int): Column =
    array((0 until k).map { i =>
      array_min(transform(words, w => hash32(concat(w, lit("#" + i)))))
    }: _*)

  def distinctTokens(text: Column): Column =
    array_distinct(split(lower(trim(text)), "\\s+"))

  def minhashSig(text: Column, k: Int): Column =
    minhashSigFromWords(distinctTokens(text), k)

  /** 32-bit simhash over whitespace tokens: bit b set iff the sum of
    * (+1/-1 by bit b of hash32(token)) over tokens is positive.
    * Single md5 per token: hashes the token array once, then folds 32 bit
    * positions over the hash array. */
  def simhash32(text: Column): Column =
    simhash32FromHashes(transform(split(lower(trim(text)), "\\s+"), hash32 _))

  /** Kernel (plain-Scala) twin of [[simhash32]] for typed maps: identical
    * values (same md5-derived 32-bit token hashes), ~50x cheaper than the
    * nested 32-bit x tokens HOF expression (measured at sf0.1). */
  def simhash32Kernel(text: String): Long = {
    if (text == null) return simhashOfTokens(Array(""))
    simhashOfTokens(text.trim.toLowerCase.split("\\s+", -1))
  }

  private def simhashOfTokens(tokens: Array[String]): Long = {
    val votes = new Array[Int](32)
    tokens.foreach { w =>
      val h = hash32Kernel(w)
      var b = 0
      while (b < 32) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
    }
    var out = 0L
    var b = 0
    while (b < 32) { if (votes(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  /** Per-thread reusable MD5 instance (r6): `MessageDigest.getInstance`
    * does a provider lookup + object allocation per call, and the minhash
    * kernels call it k times PER SHINGLE — the single hottest allocation in
    * q27/q28/q50. `digest()` resets the instance, so reuse is safe. */
  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  private val HexChars = "0123456789abcdef".toCharArray

  private def toHex(d: Array[Byte]): String = {
    val out = new Array[Char](d.length * 2)
    var i = 0
    while (i < d.length) {
      out(2 * i) = HexChars((d(i) >> 4) & 0xf)
      out(2 * i + 1) = HexChars(d(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  /** JVM twin of [[fingerprint]]: full 128-bit md5 hex of the whitespace-
    * normalized, lowercased text. Use THIS (not [[hash32Kernel]]) as a dedup
    * key: a 32-bit key collides past ~2^16 distinct documents (birthday
    * bound) and silently drops distinct content (ADVICE r02). */
  def fingerprintKernel(text: String): String = {
    val norm = if (text == null) "" else text.trim.toLowerCase.replaceAll("\\s+", " ")
    toHex(md5Local.get().digest(norm.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
  }

  /** JVM twin of [[hash32]]: first 8 hex chars of md5 as a long — identical
    * to Spark's md5 (both hash UTF-8 bytes). */
  def hash32Kernel(s: String): Long = {
    val d = md5Local.get().digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    // first 4 bytes = first 8 hex chars
    ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) | ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
  }

  /** hash32 of (token UTF-8 bytes) ++ ("#i" ASCII bytes) — identical digest
    * stream to `hash32Kernel(token + "#" + i)` (UTF-8 of a concatenation is
    * the concatenation of the UTF-8 encodings), without re-encoding the
    * token once per hash function: the minhash kernels encode each
    * token/shingle ONCE and reuse the bytes across all k digests. */
  private val HashSuffixes: Array[Array[Byte]] =
    Array.tabulate(16)(i => ("#" + i).getBytes(java.nio.charset.StandardCharsets.UTF_8))

  private def hash32Suffixed(tokenBytes: Array[Byte], i: Int): Long = {
    val md = md5Local.get()
    md.update(tokenBytes)
    md.update(if (i < HashSuffixes.length) HashSuffixes(i)
      else ("#" + i).getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val d = md.digest()
    ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) | ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
  }

  /** Simhash from a pre-computed hash array column (hash each token once —
    * callers project the hashes first for the hot path). */
  def simhash32FromHashes(hashes: Column): Column =
    aggregate(
      sequence(lit(0), lit(31)),
      lit(0L),
      (acc, b) => {
        // bit b of h via exact double arithmetic (h < 2^32 << 2^53)
        val vote = aggregate(hashes, lit(0L),
          (a, h) => a + when(floor(h / pow(lit(2.0), b)).cast("long") % 2 === 1, 1L).otherwise(-1L))
        acc + when(vote > 0, pow(lit(2.0), b).cast("long")).otherwise(0L)
      })

  /** Word-shingle n-grams (space-joined) for Jaccard similarity. */
  def wordShingles(text: Column, n: Int): Column = {
    val words = split(lower(trim(text)), "\\s+")
    val cnt = size(words)
    when(cnt < n, array_distinct(array(array_join(words, " "))))
      .otherwise(array_distinct(transform(
        sequence(lit(0), cnt - n),
        i => array_join(slice(words, i + 1, lit(n)), " "))))
  }

  /** Kernel twin of [[wordShingles]]: O(words) sliding windows (the HOF
    * slice-per-index expression is O(words^2) per doc — measured hot at
    * sf0.1). Same values: distinct space-joined n-grams. */
  def wordShinglesKernel(text: String, n: Int): Array[String] = {
    val t = if (text == null) "" else text
    val words = t.trim.toLowerCase.split("\\s+", -1)
    if (words.length < n) Array(words.mkString(" "))
    else {
      val seen = new java.util.LinkedHashSet[String]()
      var i = 0
      while (i + n <= words.length) {
        val sb = new java.lang.StringBuilder
        var j = 0
        while (j < n) { if (j > 0) sb.append(' '); sb.append(words(i + j)); j += 1 }
        seen.add(sb.toString)
        i += 1
      }
      val out = new Array[String](seen.size)
      seen.toArray(out)
      out
    }
  }

  /** Gopher-style repetition ratios (Rae et al. 2021, public quality
    * filters): duplicate-word fraction and duplicate-2-gram fraction.
    * element_at-based gram construction is O(n) (slice-based would be
    * O(n^2)). Returns struct(dup_word_frac, dup_2gram_frac). */
  def repetitionRatios(text: Column): Column = {
    val words = split(lower(trim(text)), "\\s+")
    val n = size(words)
    val dupWord = when(n > 0,
      round(lit(1.0) - size(array_distinct(words)).cast("double") / n, 4)).otherwise(0.0)
    val grams = transform(sequence(lit(0), greatest(n - 2, lit(0))),
      i => concat(element_at(words, i + 1), lit(" "), element_at(words, i + 2)))
    val dup2 = when(n >= 2,
      round(lit(1.0) - size(array_distinct(grams)).cast("double") / (n - 1), 4)).otherwise(0.0)
    struct(dupWord.as("dup_word_frac"), dup2.as("dup_2gram_frac"))
  }

  // ---------------------------------------------------------------------
  // Kernel (plain-Scala) twins of the hot Column operators — identical
  // values (same tokenization, same md5 stream, Spark's own BigDecimal
  // HALF_UP rounding), measured several times cheaper than the HOF
  // expression forms at sf0.1. Pattern precedent: simhash32Kernel.
  // ---------------------------------------------------------------------

  /** Spark round(x, scale): scala BigDecimal HALF_UP — the exact code path
    * Catalyst's Round takes for DoubleType. */
  private def roundK(x: Double, scale: Int): Double =
    BigDecimal(x).setScale(scale, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def splitWordsKernel(text: String): Array[String] =
    (if (text == null) "" else text).trim.toLowerCase.split("\\s+", -1)

  /** Kernel twin of [[repetitionRatios]]: (dup_word_frac, dup_2gram_frac). */
  def repetitionRatiosKernel(text: String): (Double, Double) = {
    val words = splitWordsKernel(text)
    val n = words.length
    val dupW = if (n > 0) {
      val set = new java.util.HashSet[String](n * 2)
      var i = 0
      while (i < n) { set.add(words(i)); i += 1 }
      roundK(1.0 - set.size.toDouble / n, 4)
    } else 0.0
    val dup2 = if (n >= 2) {
      val set = new java.util.HashSet[String](n * 2)
      var i = 0
      while (i + 1 < n) { set.add(words(i) + " " + words(i + 1)); i += 1 }
      roundK(1.0 - set.size.toDouble / (n - 1), 4)
    } else 0.0
    (dupW, dup2)
  }

  /** Kernel twin of [[minhashSig]]: sig_i = min over distinct tokens of
    * hash32(token + "#i") — the identical md5 stream, one digest per
    * (distinct token, i) instead of a nested HOF expression. */
  def minhashSigKernel(text: String, k: Int): Array[Long] = {
    val words = splitWordsKernel(text)
    val distinct = new java.util.LinkedHashSet[String]()
    words.foreach(distinct.add)
    val sig = Array.fill(k)(Long.MaxValue)
    val it = distinct.iterator()
    while (it.hasNext) {
      val wb = it.next().getBytes(java.nio.charset.StandardCharsets.UTF_8)
      var i = 0
      while (i < k) {
        val h = hash32Suffixed(wb, i)
        if (h < sig(i)) sig(i) = h
        i += 1
      }
    }
    sig
  }

  /** Full md5 hex (JVM twin of Spark's md5() over a UTF-8 string). */
  def md5Hex(s: String): String =
    toHex(md5Local.get().digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8)))

  /** Kernel twin of [[langId]] + [[stopwordHits]] in one pass:
    * (lang_guess, stop_hits). CJK range is BMP, so char-level counting
    * equals the Column form's UTF-16 length arithmetic. */
  def langIdKernel(text: String): (String, Int) = {
    val t = if (text == null) "" else text
    var cjk = 0
    var i = 0
    while (i < t.length) {
      val c = t.charAt(i)
      if (c >= '一' && c <= '鿿') cjk += 1
      i += 1
    }
    var stopHits = 0
    val words = splitWordsKernel(t)
    var j = 0
    while (j < words.length) {
      if (EnStopwordSet.contains(words(j))) stopHits += 1
      j += 1
    }
    val lang =
      if (t.length > 0 && cjk / t.length.toDouble > 0.3) "zh"
      else if (stopHits > 0) "en"
      else "unknown"
    (lang, stopHits)
  }

  private val EnStopwordSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    EnStopwords.foreach(s.add)
    s
  }

  /** k minhash values over the distinct word n-SHINGLES of `text` (same
    * md5-derived hash32 stream as [[minhashSigKernel]], but the set being
    * sketched is shingles, not unigrams). Unigram-set minhash degenerates
    * when the vocabulary is small relative to doc length — every doc
    * converges to the full vocabulary set and everything collides (measured:
    * one 580-doc mega-cluster on the synthetic corpus); shingles keep the
    * set space large. This is the Broder-resemblance construction as
    * actually deployed (shingled documents). */
  def minhashShingleSigKernel(text: String, n: Int, k: Int): Array[Long] = {
    val sh = wordShinglesKernel(text, n)
    val sig = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < sh.length) {
      val sb = sh(i).getBytes(java.nio.charset.StandardCharsets.UTF_8)
      var j = 0
      while (j < k) {
        val h = hash32Suffixed(sb, j)
        if (h < sig(j)) sig(j) = h
        j += 1
      }
      i += 1
    }
    sig
  }

  /** Spark-round twin exposed for other kernel callers. */
  def round6Kernel(x: Double): Double = roundK(x, 6)

  /** Kernel twin of [[qualityScore]] (precedent: q22/q39 kernel twins —
    * VERDICT r03 #1 flagged the Column form's bench swinging 0.43→1.89 s
    * across windows; the Column form pays two full-text regexp_replaces
    * plus a split+filter HOF per row, the kernel is one char scan + one
    * split). Values identical: code-point char count (Spark `length`
    * semantics), same punctuation class, same stopword set, same HALF_UP
    * round. */
  def qualityScoreKernel(text: String): Double = {
    val t = (if (text == null) "" else text).trim
    val chars = t.codePointCount(0, t.length).toDouble
    var punct = 0
    var i = 0
    while (i < t.length) {
      val c = t.charAt(i)
      if (c == '.' || c == ',' || c == ';' || c == ':' || c == '!' || c == '?') punct += 1
      i += 1
    }
    var words = 0
    var stopHits = 0
    if (t.nonEmpty) {
      val ws = t.toLowerCase.split("\\s+", -1)
      words = ws.length
      var j = 0
      while (j < ws.length) { if (EnStopwordSet.contains(ws(j))) stopHits += 1; j += 1 }
    }
    val lengthOk = if (chars >= 100 && chars <= 20000) 1.0 else 0.0
    val punctRatio = if (chars > 0) punct / chars else 0.0
    val punctOk = if (punctRatio <= 0.1) 1.0 else 0.0
    val stopRatio = if (words > 0) stopHits.toDouble / words else 0.0
    val stopOk = math.min(stopRatio * 5, 1.0)
    val meanWord = if (words > 0) chars / words else 0.0
    val wordOk = if (meanWord >= 3 && meanWord <= 12) 1.0 else 0.0
    roundK((lengthOk + punctOk + wordOk + stopOk) / 4, 4)
  }

  /** Jaccard similarity of two string arrays (set semantics). */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    val union = size(array_union(a, b)).cast("double")
    when(union === 0, 0.0).otherwise(inter / union)
  }

  /** Benchmark decontamination over TWO independent tables — the production
    * shape (GPT-3 appx C / Gopher appx: flag training docs sharing n-grams
    * with an eval suite). `corpus` is (doc_id, text); `benchmark` is any
    * relation with a `text` column — its OWN table/scan, typically tiny
    * (eval suites are thousands of docs). Scale shape: the benchmark gram
    * set is distinct'd, collected (it is the broadcast side by definition —
    * eval suites are thousands of docs vs a 10^12-doc corpus) and broadcast
    * as a hash set; the corpus pass counts matches INSIDE the same
    * mapPartitions that shingles, emitting exactly one row per document —
    * zero shuffle, no per-gram row materialization (the former
    * shingle-explode -> broadcast-left-join form paid one typed-encoder row
    * + UTF8String alloc per gram and re-aggregated per doc: measured 5x the
    * wall of this shape at sf0.1, VERDICT r04 #2).
    * Returns (doc_id, n_grams, n_matched, contam_frac, contaminated). */
  def decontaminate(corpus: org.apache.spark.sql.DataFrame,
      benchmark: org.apache.spark.sql.DataFrame, n: Int = 8): org.apache.spark.sql.DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val benchGrams: Array[String] = benchmark.select(col("text")).as[String]
      .mapPartitions(_.flatMap(t => wordShinglesKernel(t, n).iterator))
      .distinct().collect()
    val bc = spark.sparkContext.broadcast {
      val s = new java.util.HashSet[String](benchGrams.length * 2)
      benchGrams.foreach(s.add); s
    }
    corpus
      .select(col("doc_id").cast("long").as("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions { it =>
        val set = bc.value
        it.map { case (id, t) =>
          val grams = wordShinglesKernel(t, n)
          var matched = 0L
          var i = 0
          while (i < grams.length) { if (set.contains(grams(i))) matched += 1; i += 1 }
          (id, grams.length, matched)
        }
      }
      .toDF("doc_id", "n_grams", "n_matched")
      .select(
        col("doc_id"),
        col("n_grams"),
        col("n_matched"),
        round(col("n_matched") / col("n_grams").cast("double"), 4).as("contam_frac"),
        (col("n_matched") > 0).as("contaminated"))
  }

  /** Bloom-prefiltered decontamination — the shape for when the EVAL gram
    * set is too big to broadcast exactly. [[decontaminate]] ships the full
    * gram hash-set (fine for eval suites of thousands of docs); web-scale
    * hygiene sweeps check a corpus against BILLIONS of grams (every eval
    * suite + every held-out shard), where an exact string set is tens of
    * GB but a 1%-fpp Bloom filter is ~1.2 bytes/gram.
    *
    * Three stages, all exact in the OUTPUT (bit-identical to
    * [[decontaminate]] — Bloom false positives are removed by an exact
    * confirm join, so approximation buys performance, never changes
    * results):
    *   1. benchmark grams -> distributed Bloom build
    *      (`DataFrameStatFunctions.bloomFilter` — executor-side partial
    *      sketches, driver merge) + one broadcast of the compact bits;
    *   2. one corpus pass: shingle in-kernel, count grams, keep only the
    *      Bloom-POSITIVE grams per doc (true matches + the fpp sliver);
    *      the slim per-doc frame (id, n_grams, candidates) is
    *      localCheckpoint'ed so the confirm stage re-reads it, never the
    *      corpus (q44 precedent);
    *   3. exact confirm: explode ONLY the candidates (at 1% fpp, ~1% of a
    *      clean corpus's grams) into an equi-join against the benchmark
    *      gram table — the shuffle the exact-broadcast path avoids is
    *      affordable here precisely because the Bloom already discarded
    *      ~99% of it; a map-side hash-set probe is impossible by premise.
    *
    * Same output contract as [[decontaminate]]:
    * (doc_id, n_grams, n_matched, contam_frac, contaminated). */
  def decontaminateBloom(corpus: org.apache.spark.sql.DataFrame,
      benchmark: org.apache.spark.sql.DataFrame, n: Int = 8,
      fpp: Double = 0.01): org.apache.spark.sql.DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val benchGrams = benchmark.select(col("text")).as[String]
      .mapPartitions(_.flatMap(t => wordShinglesKernel(t, n).iterator))
      .distinct()
      .toDF("gram")
      .localCheckpoint(eager = false) // reused: bloom build + confirm join
    // single action materializes the lazy checkpoint AND yields the count
    // the Bloom sizing needs (q50's one-action-per-step discipline, r6)
    val expected = math.max(benchGrams.count(), 1L)
    val bloom = benchGrams.stat.bloomFilter("gram", expected, fpp)
    val bcBloom = spark.sparkContext.broadcast(bloom)
    val perDoc = corpus
      .select(col("doc_id").cast("long").as("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions { it =>
        val b = bcBloom.value
        it.map { case (id, t) =>
          val grams = wordShinglesKernel(t, n)
          val cand = scala.collection.mutable.ArrayBuffer.empty[String]
          var i = 0
          while (i < grams.length) {
            if (b.mightContainString(grams(i))) cand += grams(i)
            i += 1
          }
          (id, grams.length, cand.toSeq)
        }
      }
      .toDF("doc_id", "n_grams", "candidates")
      // one corpus pass total: the confirm stage re-reads this slim frame.
      // EAGER deliberately (r6): the two consumers (matched agg, final left
      // join) are sibling AQE stages materialized CONCURRENTLY — a lazy
      // checkpoint made both race to compute it and the corpus pass ran
      // twice in parallel (measured regression). One dedicated job, once.
      .localCheckpoint()
    val matched = perDoc
      .select(col("doc_id"), explode(col("candidates")).as("gram"))
      .join(benchGrams, Seq("gram")) // exact confirm: kills Bloom false positives
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_matched"))
    perDoc
      .drop("candidates")
      .join(matched, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        col("n_grams"),
        coalesce(col("n_matched"), lit(0L)).as("n_matched"),
        round(coalesce(col("n_matched"), lit(0L)) / col("n_grams").cast("double"), 4).as("contam_frac"),
        (coalesce(col("n_matched"), lit(0L)) > 0).as("contaminated"))
  }
}
