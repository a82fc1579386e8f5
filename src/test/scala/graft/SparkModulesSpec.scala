package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object SparkTestSession {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}

class PipelineSparkSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def corpusDF(n: Int) = {
    import spark.implicits._
    spark.createDataset(graft.fixtures.Fixtures.corpus(n).toSeq).toDF()
  }

  test("extractContract == typed extract on the fixture corpus (fast-path equivalence)") {
    import spark.implicits._
    val input = corpusDF(60)
    val fast = graft.pipeline.Extract.extractContract(input)
      .selectExpr("doc_id", "coalesce(to_json(spans), '') AS j", "num_pages", "quarantined")
      .as[(String, String, Int, Boolean)].collect().sortBy(_._1)
    val typed = graft.pipeline.Extract.extract(input.as[graft.model.RawDoc])
      .map(r => (r.doc_id, r.spans, r.num_pages, r.quarantined))
      .toDF("doc_id", "spans", "num_pages", "quarantined")
      .selectExpr("doc_id", "coalesce(to_json(spans), '') AS j", "num_pages", "quarantined")
      .as[(String, String, Int, Boolean)].collect().sortBy(_._1)
    // empty span arrays serialize as [] on the typed side and [] on the fast
    // side; both must agree row by row
    assert(fast.length == typed.length)
    fast.zip(typed).foreach { case (f, t) => assert(f == t, s"mismatch for ${f._1}") }
  }

  test("extractSpansDF plan is shuffle-free (narrow pipeline)") {
    val input = corpusDF(10)
    val plan = graft.pipeline.Extract.extractSpansDF(input).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
  }

  test("page-split leg equals narrow leg across every archetype") {
    import spark.implicits._
    val docs = graft.fixtures.Fixtures.Archetypes.flatMap(a =>
      (0 until 4).map(i => graft.fixtures.Fixtures.gen(graft.fixtures.Fixtures.docId(a, i))))
    val ds = spark.createDataset(docs.toSeq)
    val narrow = graft.pipeline.Extract.extractSpans(ds).collect().sortBy(_.doc_id)
    // threshold 0: EVERY non-empty doc takes the page-split path
    val split = graft.pipeline.Extract.extractSpansSkewAware(ds, skewSpanThreshold = 0)
      .collect().sortBy(_.doc_id)
    assert(narrow.length == split.length)
    narrow.zip(split).foreach { case (a, b) =>
      assert(a.doc_id == b.doc_id && a.spans == b.spans && a.num_pages == b.num_pages,
        s"page-split divergence on ${a.doc_id}")
    }
  }

  test("page-split equals narrow on adversarial streams (unsorted, duplicate/negative offsets, nulls)") {
    import spark.implicits._
    // targets the r5 declarative explode's parity obligations: page =
    // offset/SpansPerPage with Java int-division (negatives truncate toward
    // zero), span order within a page = STABLE offset-sort (sort key must
    // include the original position), null span elements dropped
    val rnd = new scala.util.Random(4242)
    val docs = (0 until 30).map { i =>
      val n = 1 + rnd.nextInt(120)
      val spans: Vector[graft.model.Span] = rnd.shuffle((0 until n).map { j =>
        val off = rnd.nextInt(200) - 3 // negatives, duplicates, unsorted
        if (rnd.nextInt(12) == 0) null
        else if (rnd.nextInt(10) == 0) graft.model.Span("image", "", s"m://$i/$j", off)
        else graft.model.Span("text",
          if (rnd.nextInt(12) == 0) null
          else ("w" + rnd.nextInt(9) + " ") * (1 + rnd.nextInt(6)), "", off)
      }.toVector)
      graft.model.RawDoc(f"fuzz-$i%03d", spans)
    }
    // all-null span arrays: size(spans) > 0 so they REACH the page-split
    // leg, but they explode to zero real units — the sentinel mechanism must
    // keep them represented (the pre-r5 leg silently dropped them)
    val allNull = Seq(
      graft.model.RawDoc("fuzz-nulls-a", Vector(null, null, null)),
      graft.model.RawDoc("fuzz-nulls-b", Vector(null)))
    val ds = spark.createDataset(docs.toSeq ++ allNull)
    val narrow = graft.pipeline.Extract.extractSpans(ds).collect().sortBy(_.doc_id)
    val split = graft.pipeline.Extract.extractSpansSkewAware(ds, skewSpanThreshold = 0)
      .collect().sortBy(_.doc_id)
    assert(narrow.length == split.length)
    narrow.zip(split).foreach { case (a, b) =>
      assert(a.doc_id == b.doc_id && a.spans == b.spans && a.num_pages == b.num_pages &&
        a.quarantined == b.quarantined,
        s"adversarial page-split divergence on ${a.doc_id}")
    }
  }

  test("skew-aware entry points honor cfg.engine (ADVICE r01: big docs must not silently run core)") {
    import spark.implicits._
    val docs = Seq("two_column_text", "single_column_contract", "tabular_report")
      .flatMap(a => (0 until 3).map(i => graft.fixtures.Fixtures.gen(graft.fixtures.Fixtures.docId(a, i))))
    val ds = spark.createDataset(docs)
    for (engine <- Seq("fitz", "plumber")) {
      val cfg = graft.model.ExtractConfig.default.copy(engine = engine)
      val narrow = graft.pipeline.Extract.extractSpans(ds, cfg).collect()
        .sortBy(_.doc_id).map(s => (s.doc_id, s.spans, s.num_pages))
      // threshold 0 used to page-split everything into the CORE pipeline;
      // now non-core engines take the narrow path unconditionally
      val skew = graft.pipeline.Extract.extractSpansSkewAware(ds, cfg, skewSpanThreshold = 0)
        .collect().sortBy(_.doc_id).map(s => (s.doc_id, s.spans, s.num_pages))
      assert(narrow.toSeq == skew.toSeq, s"engine=$engine diverged through the skew path")
      val contract = graft.pipeline.Extract.extractContract(ds.toDF(), cfg, skewSpanThreshold = 0)
        .selectExpr("doc_id", "coalesce(to_json(spans), '') AS j").as[(String, String)]
        .collect().sortBy(_._1)
      val narrowJ = graft.pipeline.Extract.extractSpansDF(ds.toDF(), cfg)
        .selectExpr("doc_id", "coalesce(to_json(spans), '') AS j").as[(String, String)]
        .collect().sortBy(_._1)
      assert(contract.toSeq == narrowJ.toSeq, s"engine=$engine contract diverged")
    }
  }

  test("cleanLines two-regex form == per-line trim+collapse (r6 rewrite equivalence)") {
    import spark.implicits._
    // the pre-r6 expression, kept here as the semantic reference: per
    // \n-line, Spark trim (spaces only) then \s+ -> " " collapse
    def reference(c: org.apache.spark.sql.Column) =
      array_join(transform(split(c, "\n", -1), l => regexp_replace(trim(l), "\\s+", " ")), "\n")
    val adversarial = Seq(
      "", " ", "  a  b  ", "a\nb", "a\n\nb", "\na", "a\n", "a\n   \nb",
      "a \t\n\tb", "\t a", " \ta ", "  \t a", "a \t", "xy", "x\fy",
      "x\ry", "x\r\ny", "xy", "x y", "a  b\tc d\n \f e",
      "\n\n", " \n \n ", "multi  word   line\nsecond\t\tline\n\tthird ")
    val df = adversarial.toDF("t")
      .select(col("t"), graft.ops.TextOps.cleanLines(col("t")).as("got"), reference(col("t")).as("want"))
    val rows = df.as[(String, String, String)].collect()
    rows.foreach { case (t, got, want) =>
      assert(got == want, s"cleanLines diverged on ${t.map(ch => f"\\u${ch.toInt}%04x").mkString}")
    }
  }

  test("metrics accumulators count docs/pages/spans/quarantine") {
    import spark.implicits._
    val m = new graft.metrics.ExtractMetrics(spark)
    val ds = graft.pipeline.Extract.extractSpans(
      spark.createDataset(graft.fixtures.Fixtures.corpus(40).toSeq))
    m.observeSpanDocs(ds).write.format("noop").mode("overwrite").save()
    val snap = m.snapshot
    assert(snap("docs") == 40)
    assert(snap("pages") > 0 && snap("spans") > 0)
  }
}

class TableIOSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("snapshot write is atomic, idempotent, and readable via CURRENT") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_tableio").toString
    val df = (1 to 100).map(i => (s"d$i", i)).toDF("doc_id", "n")
    val m1 = graft.io.TableIO.writeSnapshot(df, root, "snap-001", inputs = Seq("unit-test"))
    assert(m1.rowCount == 100)
    assert(graft.io.TableIO.currentSnapshot(root).contains("snap-001"))
    // idempotent resume: same id short-circuits even with different data
    val m2 = graft.io.TableIO.writeSnapshot(df.limit(1), root, "snap-001")
    assert(m2.rowCount == 100)
    // second snapshot moves CURRENT
    graft.io.TableIO.writeSnapshot(df.limit(10), root, "snap-002")
    assert(graft.io.TableIO.currentSnapshot(root).contains("snap-002"))
    assert(graft.io.TableIO.readSnapshot(spark, root).count() == 10)
    assert(graft.io.TableIO.readSnapshot(spark, root, Some("snap-001")).count() == 100)
  }

  test("quarantine split routes bad rows to the side output") {
    val input = spark.createDataFrame(Seq(
      ("a", false, ""), ("b", true, "boom"), ("c", false, "")))
      .toDF("doc_id", "quarantined", "error")
    val (good, bad) = graft.io.Sinks.splitQuarantine(input)
    assert(good.count() == 2 && bad.count() == 1)
    assert(!good.columns.contains("quarantined"))
  }
}

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("media pipeline: refs -> synthetic payloads -> deterministic features") {
    import spark.implicits._
    val input = spark.createDataset(Seq(
      graft.fixtures.Fixtures.gen(graft.fixtures.Fixtures.docId("image_heavy_scan", 1)),
      graft.fixtures.Fixtures.gen(graft.fixtures.Fixtures.docId("image_heavy_scan", 2)))).toDF()
    val spansTable = graft.pipeline.Extract.extractContract(input)
    val feats = graft.ops.Multimodal.mediaFeaturesForCorpus(spark, spansTable).collect()
    assert(feats.nonEmpty)
    assert(feats.forall(_.n_bytes > 0))
    assert(feats.forall(f => f.sha1.length == 40))
    val decoders = feats.map(_.decoder).toSet
    assert(decoders.subsetOf(Set("pnm", "imageio")),
      s"every synthetic payload (PGM/PNG/JPEG mix) must take a REAL decode path, got $decoders")
    assert(feats.map(_.media_ref).distinct.length == feats.length)
    // determinism
    val again = graft.ops.Multimodal.mediaFeaturesForCorpus(spark, spansTable).collect()
    assert(feats.sortBy(_.media_ref).toSeq == again.sortBy(_.media_ref).toSeq)
  }

  test("real PNM decoder: P5/P6 parse, comments, luma, malformed fallback") {
    import graft.ops.Multimodal
    // P5 grayscale 2x2 with a header comment
    val p5 = "P5\n# c\n2 2\n255\n".getBytes("US-ASCII") ++ Array[Byte](10, 20, 30, 40)
    val r5 = Multimodal.decodePnm(p5)
    assert(r5.contains(Array(Array(10, 20), Array(30, 40)).toSeq.map(_.toSeq))
      || r5.get.map(_.toSeq).toSeq == Seq(Seq(10, 20), Seq(30, 40)))
    // P6 RGB 1x1 pure red -> BT.601 luma 76
    val p6 = "P6\n1 1\n255\n".getBytes("US-ASCII") ++ Array[Byte](255.toByte, 0, 0)
    assert(Multimodal.decodePnm(p6).get.head.head == 76)
    // malformed: truncated raster / wrong magic -> None (falls back to stub)
    assert(Multimodal.decodePnm("P5\n4 4\n255\n".getBytes("US-ASCII") ++ Array[Byte](1, 2)).isEmpty)
    assert(Multimodal.decodePnm("JFIF....".getBytes("US-ASCII")).isEmpty)
    assert(Multimodal.decode("JFIF....".getBytes("US-ASCII"), 4, 2)._2 == "stub")
    // resize + frame sampling (real nearest-neighbor / offsets)
    val raster = Multimodal.decodeStub(Array.tabulate(256)(_.toByte), 16, 16)
    val small = Multimodal.resizeNearest(raster, 8, 8)
    assert(small.length == 8 && small(0).length == 8)
    assert(Multimodal.frameSample(1000, 100, 2) == Seq(0, 200, 400, 600, 800))
  }

  test("javax.imageio decode: real PNG and JPEG bytes, lossless PNG round-trip") {
    import graft.ops.Multimodal
    val w = 12; val h = 9
    val gray = Array.tabulate(w * h)(i => ((i * 37) % 256).toByte)
    def encode(fmt: String): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      img.getRaster.setDataElements(0, 0, w, h, gray)
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, fmt, out)
      out.toByteArray
    }
    val png = encode("png"); val jpg = encode("jpg")
    assert(png.take(4).sameElements(Array[Byte](0x89.toByte, 'P', 'N', 'G')), "genuine PNG magic")
    assert((jpg(0) & 0xff) == 0xff && (jpg(1) & 0xff) == 0xd8, "genuine JPEG magic")
    // dispatch picks the real decoder for both
    val (pngRaster, pngDec) = Multimodal.decode(png, w, h)
    val (jpgRaster, jpgDec) = Multimodal.decode(jpg, w, h)
    assert(pngDec == "imageio" && jpgDec == "imageio")
    assert(pngRaster.length == h && pngRaster(0).length == w)
    assert(jpgRaster.length == h && jpgRaster(0).length == w)
    // PNG is lossless: decoded luma must equal the source grayscale exactly
    for (y <- 0 until h; x <- 0 until w)
      assert(pngRaster(y)(x) == (gray(y * w + x) & 0xff), s"PNG luma mismatch at ($x,$y)")
    // JPEG is lossy but close: mean abs error under 8 luma levels
    val err = (for (y <- 0 until h; x <- 0 until w)
      yield math.abs(jpgRaster(y)(x) - (gray(y * w + x) & 0xff))).sum.toDouble / (w * h)
    assert(err < 8.0, s"JPEG decode mean abs error $err too high")
  }

  test("javax.sound WAV decode: lossless PCM round-trip + audio features e2e") {
    import spark.implicits._
    import graft.ops.Multimodal
    // PCM round trip is lossless: decoded samples == encoded samples
    val samples = Array.tabulate(1000)(i => ((i * 331) % 65536 - 32768).toShort)
    val wav = Multimodal.encodeWavPcm16(samples, 8000)
    assert(wav.take(4).sameElements("RIFF".getBytes("US-ASCII")), "genuine RIFF magic")
    val Some((decoded, rate)) = Multimodal.decodeWavPcm(wav)
    assert(rate == 8000)
    assert(decoded.sameElements(samples), "WAV PCM round trip must be lossless")
    // malformed bytes fall through to the stub path
    assert(Multimodal.decodeWavPcm("not a wav at all........................................".getBytes).isEmpty)
    // e2e: synthetic audio corpus -> features, all through the REAL decoder
    val refs = spark.createDataset(Seq(("aud-1", "d1"), ("aud-2", "d2")))
    val feats = Multimodal.extractAudioFeatures(Multimodal.syntheticAudio(spark, refs)).collect()
    assert(feats.length == 2)
    assert(feats.forall(_.decoder == "wav"), s"got ${feats.map(_.decoder).toSeq}")
    assert(feats.forall(f => f.sample_rate == 8000 && f.n_samples > 0 && f.rms > 0.0))
    assert(feats.forall(f => f.duration_ms == f.n_samples * 1000L / 8000L))
    // determinism
    val again = Multimodal.extractAudioFeatures(Multimodal.syntheticAudio(spark, refs)).collect()
    assert(feats.sortBy(_.media_ref).toSeq == again.sortBy(_.media_ref).toSeq)
  }
}

class StreamingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("file-stream extraction: incremental parquet in, contract spans out") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_stream")
    val in = s"$dir/in"; val out = s"$dir/out"; val cp = s"$dir/cp"
    spark.createDataset(graft.fixtures.Fixtures.corpus(20).toSeq).toDF()
      .write.mode("overwrite").parquet(in)

    val q = spark.readStream
      .schema(graft.streaming.StreamingExtract.InputSchema)
      .parquet(in)
    val stream = graft.streaming.StreamingExtract.extractStream(q)
      .writeStream
      .format("parquet")
      .option("path", out)
      .option("checkpointLocation", cp)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    stream.awaitTermination(120000)
    val result = spark.read.parquet(out)
    assert(result.count() == 20)
    assert(result.columns.toSet == Set("doc_id", "spans", "num_pages", "quarantined", "error", "error_code"))
  }

  test("stateful streaming dedup: first occurrence wins across micro-batches (flatMapGroupsWithState)") {
    import spark.implicits._
    import org.apache.spark.sql.types._
    val dir = java.nio.file.Files.createTempDirectory("graft_sdedup")
    val in = s"$dir/in"; val out = s"$dir/out"; val cp = s"$dir/cp"
    val schema = StructType(Seq(StructField("doc_id", StringType), StructField("text", StringType)))
    def runBatch(): Unit = {
      val q = graft.streaming.StreamingExtract.dedupStream(
        spark.readStream.schema(schema).parquet(in))
        .toDF("fp", "keep_doc_id")
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", cp)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination(120000)
    }
    // batch 1: a and c normalize to the same fingerprint ("hello world")
    Seq(("a", "hello world"), ("b", "other text"), ("c", "Hello   WORLD"))
      .toDF("doc_id", "text").write.mode("overwrite").parquet(in)
    runBatch()
    // batch 2: d duplicates batch-1 content (state must drop it), e is new
    Seq(("d", "hello world"), ("e", "fresh content"))
      .toDF("doc_id", "text").write.mode("append").parquet(in)
    runBatch()
    val rows = spark.read.parquet(out).as[(String, String)].collect().sortBy(_._1)
    assert(rows.map(_._1).distinct.length == rows.length, "duplicate fingerprint emitted")
    assert(rows.length == 3, s"expected 3 unique contents, got ${rows.toSeq}")
    assert(rows.exists(_._2 == "a"), "within-batch representative should be min doc_id 'a'")
    assert(!rows.exists(_._2 == "d"), "cross-batch duplicate leaked through state")
    // state key must be the full 128-bit md5 hex, not a 32-bit truncation
    assert(rows.forall(_._1.matches("[0-9a-f]{32}")),
      s"dedup key must be 128-bit md5 hex (collision-safe at scale), got ${rows.map(_._1).toSeq}")
  }

  /** Runs the TTL expiry/re-admission scenario in a fresh dir: batch 1
    * admits 'hello world', the TTL lapses (sleepMs), an unrelated batch 2
    * fires the expiry, batch 3 re-admits the same content. Returns Left
    * with a diagnostic when the observed rows differ — wall-clock-dependent,
    * so callers retry at widening margins instead of flaking on a loaded
    * box (ADVICE r04). */
  private def ttlExpiryScenario(sleepMs: Long, tag: String)(
      stream: org.apache.spark.sql.DataFrame => org.apache.spark.sql.Dataset[(String, String)])
      : Either[String, Array[(String, String)]] = {
    import spark.implicits._
    import org.apache.spark.sql.types._
    val dir = java.nio.file.Files.createTempDirectory(s"graft_sdedup_$tag")
    val in = s"$dir/in"; val out = s"$dir/out"; val cp = s"$dir/cp"
    val schema = StructType(Seq(StructField("doc_id", StringType), StructField("text", StringType)))
    def runBatch(): Unit = {
      val q = stream(spark.readStream.schema(schema).parquet(in))
        .toDF("fp", "keep_doc_id")
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", cp)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination(120000)
    }
    Seq(("a", "hello world")).toDF("doc_id", "text").write.mode("overwrite").parquet(in)
    runBatch()
    Thread.sleep(sleepMs) // let the TTL lapse
    // batch 2 carries unrelated data; its trigger fires the timeout that removes 'hello world' state
    Seq(("b", "other text")).toDF("doc_id", "text").write.mode("append").parquet(in)
    runBatch()
    // batch 3: the same content arrives after expiry -> re-admitted
    Seq(("c", "hello world")).toDF("doc_id", "text").write.mode("append").parquet(in)
    runBatch()
    val rows = spark.read.parquet(out).as[(String, String)].collect().sortBy(_._2)
    if (rows.map(_._2).toSeq == Seq("a", "b", "c")) Right(rows)
    else Left(s"expected a (first), b (other), c (re-admitted after TTL); got ${rows.toSeq}")
  }

  /** Retry the scenario at widening TTL-lapse margins; the first margin is
    * the fast path, the later ones absorb co-tenant scheduling delay. */
  private def ttlExpiryWithRetry(tag: String)(
      stream: org.apache.spark.sql.DataFrame => org.apache.spark.sql.Dataset[(String, String)])
      : Array[(String, String)] = {
    val margins = Seq(600L, 2500L, 8000L)
    var last: Either[String, Array[(String, String)]] = Left("not run")
    val it = margins.iterator
    while (last.isLeft && it.hasNext) last = ttlExpiryScenario(it.next(), tag)(stream)
    last.fold(diag => fail(s"TTL re-admission failed at all margins $margins: $diag"), identity)
  }

  test("streaming dedup TTL: expired fingerprint re-admits its next occurrence") {
    val ttl = java.time.Duration.ofMillis(200)
    val rows = ttlExpiryWithRetry("ttl")(df =>
      graft.streaming.StreamingExtract.dedupStream(df, stateTtl = Some(ttl)))
    val helloFp = graft.ops.TextOps.fingerprintKernel("hello world")
    assert(rows.count(_._1 == helloFp) == 2, "the expired fingerprint must appear twice")
  }

  test("connected components: transitive clusters from star edges, deterministic roots") {
    import spark.implicits._
    // two components: {1,2,3,7} via chain 3-1, 2-1, 7-3 (transitively joins
    // through 3) and {10,11}; node 20 isolated (absent from edges)
    val edges = Seq((3L, 1L), (2L, 1L), (7L, 3L), (11L, 10L)).toDF("src", "dst")
    val cc = graft.ops.Dedup.connectedComponents(edges)
      .as[(Long, Long)].collect().toMap
    assert(cc == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 7L -> 1L, 10L -> 10L, 11L -> 10L), s"got $cc")
    // cluster summary shape
    val clusters = graft.ops.Dedup.dedupClusters(
      Seq((0L, "alpha beta gamma delta epsilon zeta eta theta"),
          (5L, "alpha beta gamma delta epsilon zeta eta theta"),
          (9L, "totally different words with no overlap at all here")).toDF("doc_id", "text"))
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(clusters.toSeq == Seq((0L, 2L, 5L)), s"identical docs must cluster: ${clusters.toSeq}")
  }

  test("decontaminate: two independent tables, zero-shuffle corpus pass") {
    import spark.implicits._
    val corpus = Seq(
      (0L, "a b c d e f g h i j"),
      (1L, "z y x w v u t s r q"),
      (2L, "a b c d e f g h xx")).toDF("doc_id", "text")
    val bench = Seq("a b c d e f g h i j k l").toDF("text")
    val df = graft.ops.TextOps.decontaminate(corpus, bench, n = 8)
    // r5 shape (VERDICT r04 #2): bench grams are a driver-collected broadcast
    // hash set probed inside the shingling mapPartitions — the corpus pass
    // must be one narrow stage: no shuffle, no join, no per-gram explode
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") && !plan.contains("Join"),
      s"decontaminate corpus pass must be shuffle- and join-free, got:\n$plan")
    val r = df.collect()
      .map(x => (x.getLong(0), x.getInt(1), x.getLong(2), x.getBoolean(4))).sortBy(_._1)
    assert(r(0) == ((0L, 3, 3L, true)), s"doc 0: ${r(0)}") // all three 8-grams in the suite
    assert(r(1) == ((1L, 3, 0L, false)), s"doc 1: ${r(1)}")
    assert(r(2) == ((2L, 2, 1L, true)), s"doc 2: ${r(2)}") // prefix gram only
  }

  test("streaming dedup SERVICE default: finite TTL on by default, expiry re-admits") {
    // the service entry point must default to a FINITE ttl (bounded state
    // for always-on deployments — VERDICT r03 #5); the exact-forever shape
    // stays opt-in via dedupStream(ttl = None)
    assert(!graft.streaming.StreamingExtract.DefaultDedupTtl.isZero &&
      !graft.streaming.StreamingExtract.DefaultDedupTtl.isNegative)
    assert(graft.streaming.StreamingExtract.DefaultDedupTtl.toHours == 24)
    ttlExpiryWithRetry("svc")(df =>
      graft.streaming.StreamingExtract.dedupStreamService(
        df, stateTtl = java.time.Duration.ofMillis(200)))
  }

  test("windowed throughput aggregation shape") {
    import spark.implicits._
    val events = Seq(
      (java.sql.Timestamp.valueOf("2026-01-01 00:00:10"), "d1", 5),
      (java.sql.Timestamp.valueOf("2026-01-01 00:00:50"), "d2", 7),
      (java.sql.Timestamp.valueOf("2026-01-01 00:01:10"), "d3", 3)
    ).toDF("event_time", "doc_id", "n_spans")
    val agg = graft.streaming.StreamingExtract.windowedThroughput(events)
      .orderBy("minute").collect()
    assert(agg.length == 2)
    assert(agg(0).getLong(1) == 2 && agg(0).getLong(2) == 12)
  }
}

class ContractRoundTripSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("contract output schema is stable through a parquet round trip") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_rt").toString
    val input = spark.createDataset(graft.fixtures.Fixtures.corpus(30).toSeq).toDF()
    val out = graft.pipeline.Extract.extractContract(input)
    out.write.mode("overwrite").parquet(dir)
    val back = spark.read.parquet(dir)
    assert(back.schema.map(f => (f.name, f.dataType.simpleString)) ==
      out.schema.map(f => (f.name, f.dataType.simpleString)))
    // values survive: re-derive and compare as sorted json
    val a = out.selectExpr("doc_id", "to_json(spans) j").as[(String, String)].collect().sortBy(_._1).toSeq
    val b = back.selectExpr("doc_id", "to_json(spans) j").as[(String, String)].collect().sortBy(_._1).toSeq
    assert(a == b)
    // and the round-tripped table feeds the pipeline again (idempotent shape):
    // output spans ARE a valid input span table
    val twice = graft.pipeline.Extract.extractContract(
      back.select("doc_id", "spans").filter(org.apache.spark.sql.functions.size($"spans") > 0))
    assert(twice.count() > 0)
  }
}

class ResumableSnapshotSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("bucket-level resume: committed buckets are skipped, missing ones rewritten") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_resume").toString
    val df = (0 until 2000).map(i => (s"doc-$i", i)).toDF("doc_id", "n")
    val buckets = 16

    // simulate a crashed first attempt: pre-commit markers for buckets 0..5
    // with their data written, nothing else
    val pre = df.withColumn("doc_bucket",
        pmod(xxhash64(col("doc_id")), lit(buckets)).cast("int"))
      .filter(col("doc_bucket") < 6)
    pre.repartition(col("doc_bucket")).write.mode("overwrite")
      .partitionBy("doc_bucket").parquet(s"$root/data/snapshot=s1")
    val markers = java.nio.file.Paths.get(root, "_manifests", "buckets-s1")
    java.nio.file.Files.createDirectories(markers)
    (0 until 6).foreach(b => java.nio.file.Files.write(markers.resolve(s"bucket-$b.done"), Array.empty[Byte]))
    val mtimes0 = (0 until 6).map { b =>
      val d = java.nio.file.Paths.get(s"$root/data/snapshot=s1/doc_bucket=$b")
      b -> java.nio.file.Files.list(d).toArray.map(_.toString).sorted.toSeq
    }.toMap

    // resume: must complete the remaining buckets without touching 0..5
    val m = graft.io.TableIO.writeSnapshotResumable(df, root, "s1", buckets)
    assert(m.rowCount == 2000)
    assert(m.metrics("resumed_buckets") == 6L)
    (0 until 6).foreach { b =>
      val d = java.nio.file.Paths.get(s"$root/data/snapshot=s1/doc_bucket=$b")
      val now = java.nio.file.Files.list(d).toArray.map(_.toString).sorted.toSeq
      assert(now == mtimes0(b), s"bucket $b was rewritten")
    }
    // full table readable and complete
    assert(graft.io.TableIO.readSnapshot(spark, root).count() == 2000)
    // idempotent: second call is a committed-snapshot no-op
    val m2 = graft.io.TableIO.writeSnapshotResumable(df.limit(1), root, "s1", buckets)
    assert(m2.rowCount == 2000)
  }
}

class SourcesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("json-lines and binaryFile sources produce the same extraction as parquet") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_sources")
    val docs = graft.fixtures.Fixtures.corpus(12).toSeq
    val df = spark.createDataset(docs).toDF()
    df.write.mode("overwrite").parquet(s"$dir/p")
    df.write.mode("overwrite").json(s"$dir/j")
    // binary files: one serialized doc per file
    val binDir = java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$dir/b"))
    df.selectExpr("doc_id", "to_json(struct(doc_id, spans)) AS j").as[(String, String)]
      .collect().foreach { case (id, json) =>
        java.nio.file.Files.writeString(binDir.resolve(s"$id.doc.json"), json)
      }
    def spansOf(src: org.apache.spark.sql.DataFrame): Seq[(String, String)] =
      src.selectExpr("doc_id", "coalesce(to_json(spans),'') AS j")
        .as[(String, String)].collect().sortBy(_._1).toSeq
    val viaParquet = spansOf(graft.io.Sources.extractFrom(spark, s"$dir/p", "parquet"))
    val viaJson = spansOf(graft.io.Sources.extractFrom(spark, s"$dir/j", "json"))
    val viaBinary = spansOf(graft.io.Sources.extractFrom(spark, s"$dir/b", "binary"))
    assert(viaParquet.nonEmpty)
    assert(viaJson == viaParquet)
    assert(viaBinary == viaParquet)
  }
}
