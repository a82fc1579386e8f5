package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.kernel.{AdaptiveFitz, AdaptivePlumber, Cluster, Parse}
import graft.fixtures.Fixtures

/** Settles the Lloyd-mode parity tail (SURVEY.md §7.3, VERDICT r01 #7).
  *
  * The engine replaces sklearn's seeded Lloyd KMeans with the exact optimal
  * 1-D DP partition. The residual risk is inputs where Lloyd's local optimum
  * differs from the global one. This spec characterizes that risk:
  *
  *  1. On every real k-means call-site input produced by the fixture corpus
  *     (plumber word centers, fitz block centers, layout-detector block
  *     centers), multi-restart Lloyd from k-means++ agrees with the DP
  *     partition for every seed — the corpus satisfies the separation
  *     condition, so the substitution is behavior-preserving there.
  *  2. On any input at all (including adversarially ambiguous ones), the DP
  *     cost is never above Lloyd's: a divergence can only happen where
  *     Lloyd is suboptimal or tied — i.e. at genuinely ambiguous split
  *     boundaries, never because DP picked a worse partition.
  *  3. A sufficient separation condition is asserted: when the DP-optimal
  *     2-partition's boundary gap strictly dominates every intra-cluster
  *     gap, Lloyd agrees from every seed.
  */
class LloydParitySpec extends AnyFunSuite {

  /** Lloyd's with k-means++ init and n_init restarts over a deterministic
    * RNG — the test-side stand-in for sklearn KMeans. */
  private def lloyd1D(xs: IndexedSeq[Double], k: Int, seed: Long, nInit: Int = 10): Array[Int] = {
    require(xs.nonEmpty && k >= 1)
    val rnd = new scala.util.Random(seed)
    var best: (Double, Array[Int]) = null
    for (_ <- 0 until nInit) {
      val centers = scala.collection.mutable.ArrayBuffer(xs(rnd.nextInt(xs.length)))
      while (centers.length < math.min(k, xs.length)) {
        val d2 = xs.map(x => centers.iterator.map(c => (x - c) * (x - c)).min)
        val total = d2.sum
        if (total == 0) centers += xs(rnd.nextInt(xs.length))
        else {
          var r = rnd.nextDouble() * total
          var i = 0
          while (i < xs.length - 1 && r > d2(i)) { r -= d2(i); i += 1 }
          centers += xs(i)
        }
      }
      var cs = centers.toArray
      var labels = new Array[Int](xs.length)
      var it = 0
      var converged = false
      while (it < 100 && !converged) {
        labels = xs.map(x => cs.indices.minBy(c => math.abs(x - cs(c)))).toArray
        val next = cs.indices.map { c =>
          val members = xs.indices.filter(labels(_) == c)
          if (members.nonEmpty) members.map(xs).sum / members.size else cs(c)
        }.toArray
        converged = next.zip(cs).forall { case (a, b) => math.abs(a - b) < 1e-9 }
        cs = next
        it += 1
      }
      val inertia = xs.indices.map { i => val d = xs(i) - cs(labels(i)); d * d }.sum
      if (best == null || inertia < best._1) best = (inertia, labels)
    }
    best._2
  }

  /** Canonical partition: groups of indices ordered by their min coordinate —
    * label numbering doesn't matter, membership does. */
  private def canon(labels: Array[Int], xs: IndexedSeq[Double]): Seq[Seq[Int]] =
    labels.indices.groupBy(labels(_)).values.toSeq
      .map(_.toSeq.sorted)
      .sortBy(g => xs(g.head))

  private def sseOf(xs: IndexedSeq[Double], labels: Array[Int]): Double =
    labels.indices.groupBy(labels(_)).values.map { g =>
      val mean = g.map(xs).sum / g.size
      g.map(i => (xs(i) - mean) * (xs(i) - mean)).sum
    }.sum

  /** The real k-means call-site inputs the fixture corpus produces, each
    * with its engine's DECISION function: the partition feeds a thresholded
    * decision (silhouette gate, separation check, accept/reject + split
    * point), and that decision — not the raw labels — is what shapes output. */
  private def corpusInputs: Seq[(String, IndexedSeq[Double], Array[Int] => String)] = {
    val W = Parse.PageWidth
    def centersOf(xs: IndexedSeq[Double], labels: Array[Int]): Seq[Double] =
      canon(labels, xs).map(g => g.map(xs).sum / g.size).sorted

    val docs = for {
      a <- Fixtures.Archetypes.filterNot(_ == "empty_and_broken")
      i <- 0 until (if (a == "skewed_giant") 1 else 8)
    } yield Fixtures.gen(Fixtures.docId(a, i))

    docs.flatMap { doc =>
      val page0 = doc.spans.filter(s => Parse.pageOf(s.offset) == 0)

      val plumber = {
        val xs = AdaptivePlumber.extractWords(page0).map(_.center).toIndexedSeq
        if (xs.length < AdaptivePlumber.MinWordsLimit) Nil
        else {
          // adaptive_pdfplumber.py:73-155: silhouette gate -> separation
          // check -> midpoint split assignment
          val decide = (labels: Array[Int]) => {
            val sil = Cluster.silhouette1D(xs, labels.toIndexedSeq)
            if (labels.distinct.length < 2 || sil < AdaptivePlumber.SilhouetteThreshold) "single"
            else {
              val cs = centersOf(xs, labels)
              val sep = cs.sliding(2).forall { case Seq(a, b) => b - a >= W * AdaptivePlumber.ColumnThreshold; case _ => true }
              if (!sep) "single"
              else { val split = (cs(0) + cs(1)) / 2; "cols:" + xs.map(x => if (x < split) '0' else '1').mkString }
            }
          }
          Seq((s"${doc.doc_id}/plumber", xs, decide))
        }
      }

      val fitz = {
        val blocks = AdaptiveFitz.lineBlocks(page0)
        val xs = blocks.map(_.center).toIndexedSeq
        if (xs.length < 2) Nil
        else {
          // adaptive_pdfitz.py:109-199: accept 2-means centers > 0.2W apart,
          // else the (label-independent) histogram fallback; accepted centers
          // gate the multi-column decision and the midpoint split
          val clearGap = AdaptiveFitz.hasClearColumnGap(blocks, W) // data-only
          val decide = (labels: Array[Int]) => {
            val cs = centersOf(xs, labels)
            val accepted = labels.distinct.length == 2 && (cs(1) - cs(0) > W * 0.2)
            if (!accepted) "hist-fallback"
            else {
              val dist = cs(1) - cs(0)
              val l = math.abs(W / 2 - cs(0)); val r = math.abs(W / 2 - cs(1))
              val ratio = if (math.max(l, r) == 0) 0.0 else math.min(l, r) / math.max(l, r)
              val multi = (dist > W * 0.3 && ratio > 0.3) || clearGap
              if (!multi) "single"
              else { val split = (cs(0) + cs(1)) / 2; "cols:" + xs.map(x => if (x < split) '0' else '1').mkString }
            }
          }
          Seq((s"${doc.doc_id}/fitz", xs, decide))
        }
      }

      val layout = Parse.paginate(doc.spans).flatMap { case (p, ss) =>
        val blocks = Parse.parsePage(p, ss, graft.model.ExtractConfig.default).textObjects
        val xs = blocks.filter(_.hasBBox).map(b => (b.bbox(0) + b.bbox(2)) / 2).toIndexedSeq
        if (xs.length <= 10) Nil
        else {
          // layout_processor.py:467-493: 2 columns iff centers > 0.3W apart
          val decide = (labels: Array[Int]) => {
            val cs = centersOf(xs, labels)
            if (cs.length == 2 && math.abs(cs(1) - cs(0)) > W * 0.3) "two" else "width-fallback"
          }
          Seq((s"${doc.doc_id}/layout-p$p", xs, decide))
        }
      }

      plumber ++ fitz ++ layout
    }
  }

  test("fixture corpus k-means inputs: Lloyd partition divergence never changes the engine decision") {
    val inputs = corpusInputs
    assert(inputs.length > 50, s"expected a rich input set, got ${inputs.length}")
    var diverged = 0
    inputs.foreach { case (name, xs, decide) =>
      val (dpLabels, _) = Cluster.kmeans1D(xs, 2)
      for (seed <- 1L to 5L) {
        val ll = lloyd1D(xs, 2, seed)
        if (canon(dpLabels, xs) != canon(ll, xs)) {
          diverged += 1
          assert(decide(dpLabels) == decide(ll),
            s"$name: Lloyd(seed=$seed) divergence CHANGED the decision on n=${xs.length}")
        }
      }
    }
    info(s"${inputs.length} call-site inputs x 5 seeds; $diverged ambiguous divergences, 0 decision changes")
  }

  test("DP is never worse than Lloyd: divergence implies Lloyd suboptimal or tied") {
    val rnd = new scala.util.Random(20260816L)
    var diverged = 0
    for (trial <- 0 until 200) {
      // adversarially ambiguous: near-uniform points, no clear split
      val n = 5 + rnd.nextInt(40)
      val xs = IndexedSeq.fill(n)(rnd.nextDouble() * 800.0)
      val k = 2 + rnd.nextInt(2)
      val (dpLabels, _) = Cluster.kmeans1D(xs, math.min(k, n))
      val ll = lloyd1D(xs, math.min(k, n), trial)
      val dpSse = sseOf(xs, dpLabels)
      val llSse = sseOf(xs, ll)
      assert(dpSse <= llSse + 1e-9, s"DP worse than Lloyd on trial $trial: $dpSse > $llSse")
      if (canon(dpLabels, xs) != canon(ll, xs)) diverged += 1
    }
    info(s"$diverged/200 ambiguous inputs diverged; DP cost <= Lloyd cost on all of them")
  }

  test("separation condition: boundary gap dominating intra gaps forces agreement") {
    val rnd = new scala.util.Random(777L)
    for (trial <- 0 until 100) {
      // two clusters with spread < gap: max intra adjacent gap < boundary gap
      val spread = 1.0 + rnd.nextDouble() * 30
      val gap = spread * (1.5 + rnd.nextDouble() * 3)
      val c1 = 100.0 + rnd.nextDouble() * 50
      val c2 = c1 + spread + gap
      val xs = (IndexedSeq.fill(3 + rnd.nextInt(20))(c1 + rnd.nextDouble() * spread) ++
        IndexedSeq.fill(3 + rnd.nextInt(20))(c2 + rnd.nextDouble() * spread))
      val sorted = xs.sorted
      val boundaryGap = {
        val gaps = sorted.sliding(2).map { case Seq(a, b) => b - a }.toVector
        gaps.max
      }
      val intraMax = {
        val (dpLabels, _) = Cluster.kmeans1D(xs, 2)
        val groups = canon(dpLabels, xs).map(_.map(xs).sorted)
        groups.flatMap(g => g.sliding(2).collect { case Seq(a, b) => b - a }).foldLeft(0.0)(math.max)
      }
      assert(boundaryGap > intraMax, s"trial $trial: construction failed")
      val (dpLabels, _) = Cluster.kmeans1D(xs, 2)
      for (seed <- 1L to 3L)
        assert(canon(dpLabels, xs) == canon(lloyd1D(xs, 2, seed), xs),
          s"trial $trial: well-separated input diverged")
    }
  }
}
