package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** IVF (inverted-file) approximate-nearest-neighbor search — the classic
  * scale path for embedding similarity (Sivic & Zisserman video-google
  * posting lists; FAISS IVF): train a small coarse quantizer on a BOUNDED
  * sample, assign every corpus vector to its nearest centroid ("list"),
  * and answer queries by scanning only the `nprobe` lists whose centroids
  * are nearest the query — touching `nprobe/k` of the corpus instead of
  * all of it.
  *
  * This complements q31's hyperplane-LSH buckets (data-INDEPENDENT
  * hashing): IVF adapts its partitions to the data distribution, which is
  * what production vector stores ship.
  *
  * Scale shape:
  *   - training reads a bounded sample (driver Lloyd over `sampleLimit`
  *     vectors — the standard IVF recipe trains on ~k*40 samples no matter
  *     the corpus size), centroids broadcast;
  *   - list assignment is map-side (one kernel argmin per row, no
  *     shuffle); at rest the corpus would be PARTITIONED BY list_id so a
  *     probe prunes partitions at the reader;
  *   - search streams the corpus once, filters to probed lists map-side
  *     against the broadcast query set, and shuffles only candidate
  *     scores for the per-query top-k (bounded: queries x probed-fraction).
  *
  * Determinism (oracle-replayable in DuckDB): centroid init = the k
  * lowest-vec_id sample vectors; Lloyd runs a FIXED iteration count;
  * per-step distances and refit means are rounded to 6 dp on both sides so
  * argmin decisions cannot hinge on summation-order ulps; all argmin ties
  * break toward the lower centroid id. Empty clusters keep their previous
  * centroid.
  */
object Ann {

  /** Driver-side deterministic Lloyd over the (bounded) training sample.
    * `sample` is (vec_id, vector); init = the `k` lowest-vec_id vectors in
    * the sample; `iters` fixed refinement steps. Returns `min(k, |sample|)`
    * centroids, every dim rounded to 6 dp per step. */
  def trainIvfCentroids(sample: Array[(Long, Array[Double])], k: Int, iters: Int): Array[Array[Double]] = {
    require(sample.nonEmpty, "IVF training sample is empty")
    require(k >= 1, s"IVF needs at least one centroid, got k=$k")
    require(iters >= 0, s"negative Lloyd iteration count: $iters")
    val sorted = sample.sortBy(_._1)
    val dim = sorted(0)._2.length
    require(sorted.forall(_._2.length == dim),
      s"non-uniform embedding dimensions in IVF training sample (expected $dim)")
    var cents: Array[Array[Double]] = sorted.take(k).map(_._2.clone())
    var it = 0
    while (it < iters) {
      val kk = cents.length
      val sums = Array.fill(kk)(new Array[Double](dim))
      val counts = new Array[Long](kk)
      // refit in ascending vec_id order (sample is sorted): the oracle's
      // avg() is order-free, but both sides round each mean to 6 dp, so
      // summation-order ulps cannot survive into the next assignment step
      var r = 0
      while (r < sorted.length) {
        val v = sorted(r)._2
        val c = assignList(v, cents)
        counts(c) += 1
        var i = 0
        while (i < dim) { sums(c)(i) += v(i); i += 1 }
        r += 1
      }
      cents = Array.tabulate(kk) { c =>
        if (counts(c) == 0L) cents(c) // empty cluster: keep previous centroid
        else Array.tabulate(dim)(i => TextOps.round6Kernel(sums(c)(i) / counts(c)))
      }
      it += 1
    }
    cents
  }

  /** Squared L2 distance, dims summed ascending (matches the oracle's
    * left-to-right `list_sum`). */
  def l2sqKernel(v: Array[Double], c: Array[Double]): Double = {
    var s = 0.0
    var i = 0
    while (i < v.length) { val d = v(i) - c(i); s += d * d; i += 1 }
    s
  }

  /** Nearest-centroid argmin over 6-dp-rounded squared L2; ties break
    * toward the lower centroid id (strict `<` keeps the first minimum). */
  def assignList(v: Array[Double], cents: Array[Array[Double]]): Int = {
    var best = 0
    var bestD = Double.MaxValue
    var c = 0
    while (c < cents.length) {
      val d = TextOps.round6Kernel(l2sqKernel(v, cents(c)))
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  /** The `nprobe` centroid ids nearest to `v` (6-dp-rounded L2, ties to
    * the lower id), ascending-id order within the probe set. */
  def probeLists(v: Array[Double], cents: Array[Array[Double]], nprobe: Int): Array[Int] = {
    cents.indices
      .map(c => (TextOps.round6Kernel(l2sqKernel(v, cents(c))), c))
      .sortBy(identity) // (dist asc, cid asc)
      .take(nprobe)
      .map(_._2)
      .sorted
      .toArray
  }

  /** Cosine similarity rounded to 6 dp (dims summed ascending — the q30
    * convention the DuckDB oracle replays). */
  def cosineKernel(a: Array[Double], b: Array[Double]): Double = {
    // mismatched dims must fail loudly, not silently score a truncated dot
    // (ADVICE r05) — matches trainIvfCentroids' uniform-dims requirement
    require(a.length == b.length,
      s"cosineKernel dimension mismatch: ${a.length} vs ${b.length}")
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < a.length && i < b.length) { dot += a(i) * b(i); i += 1 }
    i = 0
    while (i < a.length) { na += a(i) * a(i); i += 1 }
    i = 0
    while (i < b.length) { nb += b(i) * b(i); i += 1 }
    if (na == 0.0 || nb == 0.0) 0.0 // zero vector: similarity undefined -> 0
    else TextOps.round6Kernel(dot / (math.sqrt(na) * math.sqrt(nb)))
  }

  /** Map-side IVF list assignment: (vec_id, vector) -> (vec_id, list_id,
    * v). Centroids ship as one broadcast; no shuffle. At rest this frame
    * would be written `partitionBy("list_id")` so probes prune at the
    * reader. */
  def ivfAssign(emb: Dataset[(Long, Seq[Double])], cents: Array[Array[Double]]): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(cents)
    emb.mapPartitions { it =>
      val cs = bc.value
      it.map { case (id, v) => (id, assignList(v.toArray, cs), v) }
    }.toDF("vec_id", "list_id", "v")
  }

  /** Exact brute-force baseline: kernel cosine of every (bounded,
    * broadcast) query against EVERY corpus vector, top-`topk` per query.
    * One full corpus scan per search batch — the cost IVF's probe pruning
    * avoids; also the recall oracle for the approximate paths. Same output
    * contract as [[ivfSearch]]. */
  def bruteSearch(emb: Dataset[(Long, Seq[Double])], queries: Array[(Long, Array[Double])],
      topk: Int): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val bcQ = spark.sparkContext.broadcast(queries.sortBy(_._1))
    val scored = emb.mapPartitions { it =>
      val qs = bcQ.value
      it.flatMap { case (nid, vSeq) =>
        val v = vSeq.toArray
        qs.iterator.flatMap { case (qid, qv) =>
          if (nid != qid) Iterator.single((qid, nid, cosineKernel(qv, v)))
          else Iterator.empty
        }
      }
    }.toDF("q_id", "neighbor_id", "cosine")
    val w = Window.partitionBy("q_id").orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= topk)
  }

  /** Write the IVF index at rest: the assigned corpus partitioned by
    * `list_id`, so any probe prunes whole partitions at the parquet reader
    * (PartitionFilters — asserted in AnnSpec). Train once, write once,
    * serve many searches. */
  def writeIvfIndex(emb: Dataset[(Long, Seq[Double])], cents: Array[Array[Double]],
      dir: String, filesPerList: Int = 1): Unit =
    ivfAssign(emb, cents)
      // cluster rows by list BEFORE the partitioned write: without this,
      // every input task writes a sliver into every list directory
      // (tasks x k tiny files) and file-open overhead eats the pruning win
      // at read time (measured: 2k-file index made probed reads SLOWER
      // than brute force). filesPerList sizes write/read parallelism per
      // list — 1 for bench-scale, cores/k or bytes-budgeted at cluster
      // scale.
      .repartition(cents.length * math.max(1, filesPerList),
        col("list_id"), pmod(hash(col("vec_id")), lit(math.max(1, filesPerList))))
      .write.partitionBy("list_id").mode("overwrite").parquet(dir)

  /** Search an at-rest IVF index ([[writeIvfIndex]]): reads ONLY the union
    * of the queries' probed partitions — at k lists and nprobe probes the
    * scan touches ~|probed|/k of the corpus bytes, the IVF payoff the
    * streaming [[ivfSearch]] can't give (it must at least read every row to
    * assign it). Same output contract: (q_id, neighbor_id, cosine, rank). */
  def searchIvfIndex(spark: org.apache.spark.sql.SparkSession, dir: String,
      queries: Array[(Long, Array[Double])], cents: Array[Array[Double]],
      nprobe: Int, topk: Int): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val probes: Array[(Long, Array[Double], Array[Int])] =
      queries.sortBy(_._1).map { case (id, v) => (id, v, probeLists(v, cents, nprobe)) }
    val probedUnion = probes.flatMap(_._3).distinct.sorted
    val bcQ = spark.sparkContext.broadcast(probes)
    val scored = spark.read.parquet(dir)
      // partition-pruned scan: only probed lists are read at all
      .filter(col("list_id").isin(probedUnion.map(Integer.valueOf).toSeq: _*))
      .select(col("vec_id").cast("long"), col("list_id").cast("int"), col("v").cast("array<double>"))
      .as[(Long, Int, Seq[Double])]
      .mapPartitions { it =>
        val qs = bcQ.value
        it.flatMap { case (nid, list, vSeq) =>
          val v = vSeq.toArray
          qs.iterator.flatMap { case (qid, qv, qProbes) =>
            if (nid != qid && java.util.Arrays.binarySearch(qProbes, list) >= 0)
              Iterator.single((qid, nid, cosineKernel(qv, v)))
            else Iterator.empty
          }
        }
      }.toDF("q_id", "neighbor_id", "cosine")
    val w = Window.partitionBy("q_id").orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= topk)
  }

  /** IVF search: every query probes its `nprobe` nearest lists and takes
    * exact-cosine top-`topk` within them. `queries` must be BOUNDED (it is
    * collected and broadcast with its probe sets); the corpus streams once
    * — candidate filtering is map-side, only candidate scores shuffle for
    * the per-query ranking. Returns (q_id, neighbor_id, cosine, rank). */
  def ivfSearch(emb: Dataset[(Long, Seq[Double])], queries: Array[(Long, Array[Double])],
      cents: Array[Array[Double]], nprobe: Int, topk: Int): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val probes: Array[(Long, Array[Double], Array[Int])] =
      queries.sortBy(_._1).map { case (id, v) => (id, v, probeLists(v, cents, nprobe)) }
    val bcQ = spark.sparkContext.broadcast(probes)
    val bcC = spark.sparkContext.broadcast(cents)
    val scored = emb.mapPartitions { it =>
      val qs = bcQ.value
      val cs = bcC.value
      it.flatMap { case (nid, vSeq) =>
        val v = vSeq.toArray
        val list = assignList(v, cs)
        qs.iterator.flatMap { case (qid, qv, qProbes) =>
          if (nid != qid && java.util.Arrays.binarySearch(qProbes, list) >= 0)
            Iterator.single((qid, nid, cosineKernel(qv, v)))
          else Iterator.empty
        }
      }
    }.toDF("q_id", "neighbor_id", "cosine")
    val w = Window.partitionBy("q_id").orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= topk)
  }
}
