package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.{Ann, TextOps}

/** IVF ANN ([[graft.ops.Ann]]) and Bloom-prefiltered decontamination
  * ([[TextOps.decontaminateBloom]]) — the two round-5 additions to the
  * similarity/hygiene suite. */
class AnnSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  // Four well-separated 2-D cluster anchors; vec i sits near anchor i%4.
  private def clusteredVecs(n: Int): Array[(Long, Array[Double])] = {
    val anchors = Array(Array(0.0, 0.0), Array(10.0, 0.0), Array(0.0, 10.0), Array(10.0, 10.0))
    Array.tabulate(n) { i =>
      val a = anchors(i % 4)
      // deterministic nonzero in-cluster jitter, small vs the 10.0 spacing
      (i.toLong, Array(a(0) + (i % 7 + 1) * 0.01, a(1) + (i % 5 + 1) * 0.01))
    }
  }

  test("trainIvfCentroids: deterministic, recovers separated clusters, k > n clamps") {
    val vecs = clusteredVecs(40)
    val c1 = Ann.trainIvfCentroids(vecs, k = 4, iters = 2)
    val c2 = Ann.trainIvfCentroids(vecs.reverse, k = 4, iters = 2) // input order must not matter
    assert(c1.map(_.toSeq).toSeq == c2.map(_.toSeq).toSeq, "training must be input-order independent")
    // with 4 separated clusters and k=4, every anchor owns exactly one centroid
    val owners = Array(Array(0.0, 0.0), Array(10.0, 0.0), Array(0.0, 10.0), Array(10.0, 10.0))
      .map(a => Ann.assignList(a, c1))
    assert(owners.distinct.length == 4, s"each separated cluster needs its own centroid: ${owners.toSeq}")
    // k > sample size clamps to |sample| centroids (init = the sample itself)
    val small = vecs.take(3)
    assert(Ann.trainIvfCentroids(small, k = 8, iters = 2).length == 3)
  }

  test("trainIvfCentroids: empty cluster keeps its previous centroid") {
    // two coincident points far from a third init centroid: centroid 2
    // (init = the isolated duplicate of centroid 0's point) attracts
    // nothing after the first assignment (ties break low) and must survive
    // the refit unchanged instead of dividing by zero
    val vecs = Array(
      (0L, Array(0.0, 0.0)),
      (1L, Array(100.0, 100.0)),
      (2L, Array(0.0, 0.0))) // duplicate of vec 0 -> assigned to centroid 0 by tiebreak
    val cents = Ann.trainIvfCentroids(vecs, k = 3, iters = 3)
    assert(cents.length == 3)
    assert(cents(2).toSeq == Seq(0.0, 0.0), "starved centroid must keep its previous value")
  }

  test("probeLists: nearest lists, id tiebreak, ascending output") {
    val cents = Array(Array(0.0), Array(4.0), Array(8.0), Array(2.0))
    // query at 2.0: exact hit on cid 3 (d=0), then cids 0 and 1 tie at d=4 -> lower id wins
    assert(Ann.probeLists(Array(2.0), cents, 2).toSeq == Seq(0, 3))
    assert(Ann.probeLists(Array(2.0), cents, 3).toSeq == Seq(0, 1, 3))
  }

  test("ivfSearch: probes restrict candidates; exact top-k within probed lists") {
    import spark.implicits._
    val vecs = clusteredVecs(40)
    val cents = Ann.trainIvfCentroids(vecs, k = 4, iters = 2)
    val emb = spark.createDataset(vecs.toSeq.map { case (id, v) => (id, v.toSeq) })
    val queries = vecs.filter(_._1 < 2) // one per anchor 0 and 1
    val out = Ann.ivfSearch(emb, queries, cents, nprobe = 1, topk = 3)
      .as[(Long, Long, Double, Int)].collect()
    val byQ = out.groupBy(_._1)
    assert(byQ.keySet == Set(0L, 1L))
    for ((q, rows) <- byQ) {
      assert(rows.length == 3 && rows.map(_._4).sorted.toSeq == Seq(1, 2, 3))
      // with nprobe=1 every neighbor comes from the query's own anchor cluster
      assert(rows.forall(r => r._2 % 4 == q % 4),
        s"nprobe=1 must confine candidates to the query's list: ${rows.toSeq}")
      assert(rows.forall(r => r._2 != q), "query must not match itself")
      // ranks follow cosine desc with neighbor-id tiebreak
      val sorted = rows.sortBy(_._4)
      assert(sorted.sliding(2).forall { case Array(a, b) =>
        a._3 > b._3 || (a._3 == b._3 && a._2 < b._2) }, s"rank order broken: ${sorted.toSeq}")
    }
  }

  test("ivfSearch plan: one corpus scan, candidates shuffle only for the ranking") {
    import spark.implicits._
    val vecs = clusteredVecs(40)
    val cents = Ann.trainIvfCentroids(vecs, k = 4, iters = 2)
    val emb = spark.createDataset(vecs.toSeq.map { case (id, v) => (id, v.toSeq) })
    val df = Ann.ivfSearch(emb, vecs.filter(_._1 < 2), cents, nprobe = 1, topk = 3)
    val plan = df.queryExecution.executedPlan.toString
    // the corpus streams ONCE through the map-side assign+probe kernel; the
    // only Exchange ranks the candidate slice (top-k per query)
    assert(plan.sliding("Exchange".length).count(_ == "Exchange") == 1,
      s"expected exactly one Exchange (candidate ranking), got:\n$plan")
    assert(!plan.contains("Join"), s"IVF search must not join the corpus:\n$plan")
    // Spark pushes the row_number limit below the shuffle (WindowGroupLimit
    // Partial): at most topk candidate rows per query leave each map task
    assert(plan.contains("WindowGroupLimit"),
      s"expected partial top-k pushdown below the ranking shuffle:\n$plan")
  }

  test("IVF at-rest layout: list_id partitioning prunes probed lists at the reader") {
    import spark.implicits._
    val vecs = clusteredVecs(40)
    val cents = Ann.trainIvfCentroids(vecs, k = 4, iters = 2)
    val emb = spark.createDataset(vecs.toSeq.map { case (id, v) => (id, v.toSeq) })
    val dir = java.nio.file.Files.createTempDirectory("ivf_rest").toString + "/lists.parquet"
    Ann.writeIvfIndex(emb, cents, dir)
    val probes = Ann.probeLists(vecs(1)._2, cents, 1).toSeq
    val probed = spark.read.parquet(dir).filter(col("list_id").isin(probes: _*))
    val scan = probed.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters: [") && scan.contains("list_id"),
      s"probe filter must prune partitions at the reader:\n$scan")
    // pruning is real: only the probed list's rows are read
    val got = probed.select("vec_id").as[Long].collect().toSet
    val expect = vecs.filter(v => probes.contains(Ann.assignList(v._2, cents))).map(_._1).toSet
    assert(got == expect, s"probed read must return exactly the probed list: $got vs $expect")
    // the indexed search (partition-pruned scan) returns exactly what the
    // streaming search computes over the full corpus
    val queries = vecs.filter(_._1 < 3)
    val indexed = Ann.searchIvfIndex(spark, dir, queries, cents, nprobe = 2, topk = 3)
      .as[(Long, Long, Double, Int)].collect().sortBy(r => (r._1, r._4))
    val streamed = Ann.ivfSearch(emb, queries, cents, nprobe = 2, topk = 3)
      .as[(Long, Long, Double, Int)].collect().sortBy(r => (r._1, r._4))
    assert(indexed.toSeq == streamed.toSeq,
      s"indexed vs streamed IVF search diverged:\n${indexed.toSeq}\n${streamed.toSeq}")
  }

  test("bruteSearch == ivfSearch probing ALL lists (exactness anchor)") {
    import spark.implicits._
    val vecs = clusteredVecs(40)
    val cents = Ann.trainIvfCentroids(vecs, k = 4, iters = 2)
    val emb = spark.createDataset(vecs.toSeq.map { case (id, v) => (id, v.toSeq) })
    val queries = vecs.filter(_._1 < 3)
    val brute = Ann.bruteSearch(emb, queries, topk = 5)
      .as[(Long, Long, Double, Int)].collect().sortBy(r => (r._1, r._4))
    val allProbes = Ann.ivfSearch(emb, queries, cents, nprobe = 4, topk = 5)
      .as[(Long, Long, Double, Int)].collect().sortBy(r => (r._1, r._4))
    assert(brute.toSeq == allProbes.toSeq,
      "probing every list must degrade IVF to exact brute force")
  }

  test("decontaminateBloom == decontaminate bit-identically, even at fpp=0.5") {
    import spark.implicits._
    val corpus = spark.createDataset(
      (0 until 60).map(id => (id.toLong, s"doc $id shared prefix words " +
        (0 until 20).map(w => s"w${(id * 7 + w) % 13}").mkString(" ")))
    ).toDF("doc_id", "text")
    val bench = corpus.filter(col("doc_id") < 4).select("text")
    val exact = TextOps.decontaminate(corpus, bench, n = 8)
      .collect().map(_.toSeq).sortBy(_.head.asInstanceOf[Long])
    // fpp=0.5 floods the prefilter with false positives — the exact confirm
    // join must erase them all (approximation may never change results)
    for (fpp <- Seq(0.5, 0.01)) {
      val bloom = TextOps.decontaminateBloom(corpus, bench, n = 8, fpp = fpp)
        .collect().map(_.toSeq).sortBy(_.head.asInstanceOf[Long])
      assert(bloom.toSeq == exact.toSeq, s"bloom(fpp=$fpp) diverged from exact decontaminate")
    }
  }
}
