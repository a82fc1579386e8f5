package graft.kernel

/** Deterministic 1-D clustering primitives.
  *
  * The reference uses seeded sklearn KMeans (pdf_processor.py:190-196,
  * layout_processor.py:484-488, adaptive_pdfitz.py:159-172,
  * adaptive_pdfplumber.py:83-92,115-119) and sklearn silhouette_score
  * (adaptive_pdfplumber.py:10,90). Bit-parity with seeded Lloyd iterations is
  * impossible and unnecessary (SURVEY.md §7.3): in 1-D the globally optimal
  * k-means partition is computable exactly by dynamic programming over the
  * sorted values, which is deterministic and order-free — the right primitive
  * for a distributed engine.
  */
object Cluster {

  /** Exact optimal 1-D k-means over `xs` (any order). Returns cluster labels
    * aligned with the input order, where clusters are numbered 0..k-1 in
    * ascending coordinate order, plus the cluster means (ascending).
    *
    * DP (SMAWK-free O(n^2 k) with prefix sums — per-document n is tiny).
    */
  def kmeans1D(xs: IndexedSeq[Double], k: Int): (Array[Int], Array[Double]) = {
    val n = xs.length
    require(k >= 1, "k >= 1")
    if (n == 0) return (Array.empty, Array.empty)
    val order = xs.indices.sortBy(xs)
    val sorted = order.map(xs).toArray
    val kk = math.min(k, n)

    // prefix sums for O(1) SSE of a sorted range [i, j)
    val ps = new Array[Double](n + 1)
    val ps2 = new Array[Double](n + 1)
    var i = 0
    while (i < n) { ps(i + 1) = ps(i) + sorted(i); ps2(i + 1) = ps2(i) + sorted(i) * sorted(i); i += 1 }
    def sse(a: Int, b: Int): Double = { // [a, b)
      val m = b - a
      if (m <= 1) 0.0
      else {
        val s = ps(b) - ps(a)
        math.max(0.0, (ps2(b) - ps2(a)) - s * s / m)
      }
    }

    // recover boundaries
    val bounds = new Array[Int](kk + 1)
    bounds(kk) = n
    if (kk == 2) {
      // k=2 fast path: the DP reduces to one split scan. Uses the IDENTICAL
      // sse() prefix-sum arithmetic and the identical strict-improvement
      // tie rule (first minimal split wins), so the chosen partition is
      // bit-for-bit the DP's — this is the per-page hot call (detector 2
      // runs it on every page with >10 blocks), O(n) instead of O(n^2 k).
      var bestA = 1
      var bestCost = Double.MaxValue / 4
      var a = 1
      while (a <= n - 1) {
        val cost = sse(0, a) + sse(a, n)
        if (cost < bestCost - 1e-12) { bestCost = cost; bestA = a }
        a += 1
      }
      bounds(1) = bestA
    } else if (kk > 1) {
      // dp(c)(j) = min cost of splitting first j points into c clusters
      val INF = Double.MaxValue / 4
      val dp = Array.fill(kk + 1, n + 1)(INF)
      val cut = Array.fill(kk + 1, n + 1)(0)
      dp(0)(0) = 0.0
      var c = 1
      while (c <= kk) {
        var j = c
        while (j <= n) {
          var a = c - 1
          while (a <= j - 1) {
            val cost = dp(c - 1)(a) + sse(a, j)
            if (cost < dp(c)(j) - 1e-12) { dp(c)(j) = cost; cut(c)(j) = a }
            a += 1
          }
          j += 1
        }
        c += 1
      }
      var cc = kk
      var j = n
      while (cc >= 1) { val a = cut(cc)(j); bounds(cc - 1) = a; j = a; cc -= 1 }
    }

    val labelsSorted = new Array[Int](n)
    val means = new Array[Double](kk)
    var ci = 0
    while (ci < kk) {
      val a = bounds(ci); val b = bounds(ci + 1)
      var t = a
      while (t < b) { labelsSorted(t) = ci; t += 1 }
      means(ci) = if (b > a) (ps(b) - ps(a)) / (b - a) else 0.0
      ci += 1
    }
    val labels = new Array[Int](n)
    i = 0
    while (i < n) { labels(order(i)) = labelsSorted(i); i += 1 }
    (labels, means)
  }

  /** Mean silhouette coefficient for a 1-D clustering (euclidean), identical
    * semantics to sklearn.metrics.silhouette_score
    * (reference: adaptive_pdfplumber.py:90). */
  def silhouette1D(xs: IndexedSeq[Double], labels: IndexedSeq[Int]): Double = {
    val n = xs.length
    val ks = labels.distinct.sorted
    if (n < 2 || ks.length < 2) return 0.0
    val byCluster = ks.map(k => xs.indices.filter(labels(_) == k).map(xs)).toArray
    val sizes = byCluster.map(_.length)
    var total = 0.0
    var i = 0
    while (i < n) {
      val li = ks.indexOf(labels(i))
      val own = byCluster(li)
      if (sizes(li) <= 1) {
        // sklearn defines s(i) = 0 for singleton clusters
      } else {
        val a = own.iterator.map(v => math.abs(v - xs(i))).sum / (sizes(li) - 1)
        var b = Double.MaxValue
        var c = 0
        while (c < ks.length) {
          if (c != li && sizes(c) > 0) {
            val d = byCluster(c).iterator.map(v => math.abs(v - xs(i))).sum / sizes(c)
            if (d < b) b = d
          }
          c += 1
        }
        val m = math.max(a, b)
        if (m > 0) total += (b - a) / m
      }
      i += 1
    }
    total / n
  }

  /** Exact 2-means over ALREADY-SORTED values: returns the split index s
    * (clusters [0,s) and [s,n)) minimizing SSE, plus the two means. O(n).
    * Same partition as kmeans1D(xs, 2) when xs is ascending — the
    * allocation-free hot-path variant for per-line splits. */
  def bestSplit2Sorted(xs: Array[Double]): (Int, Double, Double) = {
    val n = xs.length
    require(n >= 2, "need >= 2 points")
    var sum = 0.0; var sum2 = 0.0
    var i = 0
    while (i < n) { sum += xs(i); sum2 += xs(i) * xs(i); i += 1 }
    var bestS = 1
    var bestCost = Double.MaxValue
    var ls = 0.0; var ls2 = 0.0
    var s = 1
    while (s < n) {
      ls += xs(s - 1); ls2 += xs(s - 1) * xs(s - 1)
      val rs = sum - ls; val rs2 = sum2 - ls2
      val m = n - s
      val cost = (ls2 - ls * ls / s) + (rs2 - rs * rs / m)
      if (cost < bestCost - 1e-12) { bestCost = cost; bestS = s }
      s += 1
    }
    var lsum = 0.0
    i = 0
    while (i < bestS) { lsum += xs(i); i += 1 }
    (bestS, lsum / bestS, (sum - lsum) / (n - bestS))
  }

  /** np.histogram(xs, bins, range=(lo, hi)) semantics: uniform bins over
    * [lo, hi], right-closed last bin, values outside range dropped.
    * (reference: layout_processor.py:256, adaptive_pdfitz.py:180) */
  def histogram(xs: Seq[Double], bins: Int, lo: Double, hi: Double): (Array[Int], Array[Double]) =
    histogramArr(xs.toArray, bins, lo, hi)

  /** Primitive-array twin of [[histogram]] (identical arithmetic; the Seq
    * form boxes every value — measured hot in the per-page detector). */
  def histogramArr(xs: Array[Double], bins: Int, lo: Double, hi: Double): (Array[Int], Array[Double]) = {
    val counts = new Array[Int](bins)
    val edges = Array.tabulate(bins + 1)(i => lo + (hi - lo) * i / bins)
    val w = (hi - lo) / bins
    var i = 0
    while (i < xs.length) {
      val x = xs(i)
      if (x >= lo && x <= hi && w > 0) {
        val b = if (x == hi) bins - 1 else math.floor((x - lo) / w).toInt
        if (b >= 0 && b < bins) counts(b) += 1
      }
      i += 1
    }
    (counts, edges)
  }

  /** Means of the exact optimal 2-means over an UNSORTED primitive array —
    * the means-only hot-path twin of `kmeans1D(xs, 2)._2` (detector 2 calls
    * it per page and reads only the means). Sorts a copy (primitive sort —
    * equal doubles are indistinguishable, so stability cannot change the
    * result) and runs the IDENTICAL prefix-sum sse scan with the identical
    * strict-improvement tie rule as [[kmeans1D]]'s k=2 path, so the split
    * and the returned means are bit-for-bit the same. */
  def kmeans1D2Means(xs: Array[Double]): (Double, Double) = {
    val n = xs.length
    require(n >= 2, "need >= 2 points")
    val sorted = java.util.Arrays.copyOf(xs, n)
    java.util.Arrays.sort(sorted)
    val ps = new Array[Double](n + 1)
    val ps2 = new Array[Double](n + 1)
    var i = 0
    while (i < n) { ps(i + 1) = ps(i) + sorted(i); ps2(i + 1) = ps2(i) + sorted(i) * sorted(i); i += 1 }
    def sse(a: Int, b: Int): Double = {
      val m = b - a
      if (m <= 1) 0.0
      else {
        val s = ps(b) - ps(a)
        math.max(0.0, (ps2(b) - ps2(a)) - s * s / m)
      }
    }
    var bestA = 1
    var bestCost = Double.MaxValue / 4
    var a = 1
    while (a <= n - 1) {
      val cost = sse(0, a) + sse(a, n)
      if (cost < bestCost - 1e-12) { bestCost = cost; bestA = a }
      a += 1
    }
    ((ps(bestA)) / bestA, (ps(n) - ps(bestA)) / (n - bestA))
  }

  /** np.histogram with data-driven range (lo=min, hi=max), used by the fitz
    * histogram fallback (adaptive_pdfitz.py:180: np.histogram(x, bins=50)). */
  def histogramAuto(xs: Seq[Double], bins: Int): (Array[Int], Array[Double]) = {
    if (xs.isEmpty) (new Array[Int](bins), Array.tabulate(bins + 1)(_.toDouble))
    else histogram(xs, bins, xs.min, xs.max)
  }

  /** Greedy tolerance clustering of sorted y-coordinates: first-seen anchor
    * wins; a y joins the FIRST existing anchor within `tol`, else becomes a
    * new anchor. Order-dependent fold — NOT a frame window.
    * (reference: layout_processor.py:393-405) */
  def uniqueRows(ys: Seq[Double], tol: Double): Vector[Double] = {
    var anchors = Vector.empty[Double]
    ys.sorted.foreach { y =>
      if (!anchors.exists(a => math.abs(y - a) <= tol)) anchors :+= y
    }
    anchors.sorted
  }

  /** Python Counter(xs).most_common(1) tiebreak: max count, first insertion
    * order wins ties (reference: layout_processor.py:462-465). */
  def majorityVote(xs: Seq[Int]): Int = {
    require(xs.nonEmpty)
    val firstIdx = scala.collection.mutable.LinkedHashMap.empty[Int, Int]
    xs.zipWithIndex.foreach { case (v, i) => if (!firstIdx.contains(v)) firstIdx(v) = i }
    val counts = xs.groupBy(identity).view.mapValues(_.size).toMap
    firstIdx.keys.maxBy(v => (counts(v), -firstIdx(v)))
  }
}
