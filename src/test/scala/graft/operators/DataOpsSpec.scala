package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Semantics of the approximate operators that have no SQL oracle:
  * MinHash-LSH and SimHash must find planted near-duplicates; hyperplane
  * LSH must agree with brute-force on easy neighbors.
  */
class DataOpsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = {
    val base = "the quick brown fox jumps over the lazy dog again and again " +
      "while the spark engine shuffles partitions across the cluster at scale"
    Seq(
      (0L, base),
      (1L, base + " tail"),                      // near-dup of 0
      (2L, base.replace("quick", "rapid")),       // near-dup of 0
      (3L, "completely different words about databases and storage engines"),
      (4L, "another unrelated document mentioning vectors and embeddings"),
      (5L, base)                                  // exact dup of 0
    ).toDF("doc_id", "text")
  }

  test("canonicalDedup picks the highest-quality member per cluster, min-id on ties") {
    // doc 0/1/5 cluster (near/exact dups of the base text): doc 1 has
    // strictly higher distinct-token-ratio (the " extra tail" adds
    // distinct tokens), so it — not min-id 0 — must be canonical.
    // Docs 0 and 5 are identical (tied quality): within a tie the
    // lower doc_id orders first, which the 0/5 pairing only exercises
    // through the cluster's winner being 1; singletons (3, 4) are
    // their own canonicals with cluster_size 1.
    val base = "the quick brown fox jumps over the lazy dog again and again " +
      "while the spark engine shuffles partitions across the cluster at scale"
    val corpus = Seq(
      (0L, base),
      (1L, base + " extra distinct tail tokens"), // near-dup, higher quality
      (3L, "completely different words about databases and storage engines"),
      (4L, "another unrelated document mentioning vectors and embeddings"),
      (5L, base)                                  // exact dup of 0 (tied q)
    ).toDF("doc_id", "text")
    val withSize = DataOps.canonicalDedup(corpus)
      .select($"cluster", $"cluster_size", $"canonical_id")
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(withSize(0L) === ((3L, 1L)),
      "cluster 0 must keep doc 1 (highest distinct-token ratio), not min-id 0")
    assert(withSize(3L) === ((1L, 3L)) && withSize(4L) === ((1L, 4L)),
      "singletons are their own canonicals")
    // tie-break visible directly: restrict to the tied pair 0/5 only
    val tied = DataOps.canonicalDedup(
      Seq((0L, base), (5L, base)).toDF("doc_id", "text"))
      .select($"canonical_id").as[Long].collect().toSeq
    assert(tied === Seq(0L), "tied quality must break to the lower doc_id")
  }

  test("dedupCorpus keeps one canonical doc per exact/near-dup cluster") {
    val base = "the quick brown fox jumps over the lazy dog again and again " +
      "while the spark engine shuffles partitions across the cluster at scale"
    val corpus = Seq(
      (0L, base),
      (1L, base.toUpperCase),                 // case variant → exact dup after normalize
      (2L, base + " tail"),                   // near dup of 0
      (3L, "completely different words about databases and storage engines"),
      (4L, base)                               // exact dup of 0
    ).toDF("doc_id", "text")
    val cleaned = Dedup.dedupCorpus(corpus, "doc_id", "text",
      shingleN = 3, minJaccard = 0.8)
    val kept = cleaned.select($"doc_id").as[Long].collect().toSet
    assert(kept === Set(0L, 3L),
      s"one keeper per cluster plus the unrelated doc, got $kept")
    assert(cleaned.columns.toSeq === Seq("doc_id", "text"),
      "original schema must come back, no helper columns")
  }

  test("dedupCorpus is idempotent: cleaning a cleaned corpus is a no-op") {
    val docs = graft.Tables.documents(spark, sf("sf0.001"))
    val once = Dedup.dedupCorpus(docs, "doc_id", "text", minJaccard = 0.5)
    val twice = Dedup.dedupCorpus(once, "doc_id", "text", minJaccard = 0.5)
    val a = once.select($"doc_id").as[Long].collect().toSet
    val b = twice.select($"doc_id").as[Long].collect().toSet
    assert(a === b, "a deduplicated corpus must contain no further duplicates")
    assert(a.size < 500, "the planted near-dups must have been removed")
  }

  test("heavy hitters finds the hot key, supports the salting decision") {
    val skewed = (1 to 900).map(_ => 7L) ++ (1 to 100).map(_.toLong + 100)
    val df = skewed.toDF("k")
    val hot = Sketches.heavyHitters(df, "k", support = 0.5)
    assert(hot.contains(7L), s"the 90% key must surface: $hot")
  }

  test("exactGroups collapses exact duplicates only") {
    val g = Dedup.exactGroups(docs, "doc_id", "text").filter($"n_copies" > 1)
    val row = g.collect()
    assert(row.length === 1)
    assert(row.head.getAs[Long]("n_copies") === 2) // docs 0 and 5
    assert(row.head.getAs[Long]("keeper_id") === 0L)
  }

  test("ngramJaccardPairs finds planted near-dups with exact scores") {
    val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text", n = 3,
      minJaccard = 0.5)
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 5L))) // exact dup: jaccard 1.0
    assert(pairs.contains((0L, 1L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("containmentPairs catches subsumption that Jaccard misses") {
    // doc 20's text is fully pasted inside the much longer doc 21:
    // containment = 1.0 while Jaccard ≈ |A|/|B| is far below 0.5
    val short = "alpha beta gamma delta epsilon zeta eta theta"
    val long = short + " " + (1 to 80).map(i => s"w$i").mkString(" ")
    val planted = Seq((20L, short), (21L, long), (22L, "totally other words"))
      .toDF("doc_id", "text")
    val cont = Dedup.containmentPairs(planted, "doc_id", "text", n = 3,
      minContainment = 0.8)
      .collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getAs[Double]("containment"))).toSet
    assert(cont === Set((20L, 21L, 1.0)),
      s"subsumed doc must score containment 1.0, got $cont")
    val jac = Dedup.ngramJaccardPairs(planted, "doc_id", "text", n = 3,
      minJaccard = 0.5)
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect().toSet
    assert(!jac.contains((20L, 21L)),
      "the symmetric threshold must miss the size-skewed pair")
  }

  test("t30 split is leakage-safe where t07's doc split is not") {
    val t30 = DataOps.queries("t30_leakage_safe_split")(spark, sf("sf0.01"))
    // no near-dup cluster straddles splits
    val straddling = t30.groupBy($"cluster")
      .agg(countDistinct($"split").as("n_splits"))
      .filter($"n_splits" > 1).count()
    assert(straddling === 0L, "a cluster crossed split boundaries")
    // the doc-level split DOES straddle clusters on the same corpus —
    // the hole t30 exists to close must be demonstrably real here
    val t07 = DataOps.queries("t07_hash_split")(spark, sf("sf0.01"))
      .select($"doc_id", $"split".as("doc_split"))
    val t07Straddling = t30.select($"doc_id", $"cluster")
      .join(t07, "doc_id")
      .groupBy($"cluster")
      .agg(count(lit(1)).as("n"), countDistinct($"doc_split").as("ns"))
      .filter($"n" > 1 && $"ns" > 1).count()
    assert(t07Straddling > 0L,
      "corpus has no straddling clusters — the gate is vacuous")
    // split fractions stay near 80/10/10 (clusters are small)
    val frac = t30.groupBy($"split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = frac.values.sum.toDouble
    assert(frac("train") / total > 0.7 && frac("train") / total < 0.9)
  }

  test("minHashLshPairs finds the planted near-dups, skips unrelated docs") {
    val pairs = Dedup.minHashLshPairs(docs, "doc_id", "text",
      shingleN = 3, numPerm = 16, bands = 4, minEstJaccard = 0.5)
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 5L)), s"exact dup must collide in every band: $pairs")
    assert(!pairs.exists(p => Set(p._1, p._2).subsetOf(Set(3L, 4L))),
      "unrelated docs must not pair")
  }

  test("scrubPii redacts planted emails and phone numbers, leaves clean text") {
    import graft.functions.Text
    val df = Seq(
      (1L, "contact me at alice.smith+test@example.co.uk for details"),
      (2L, "call +1 (555) 123-4567 or 555-987-6543 now"),
      (3L, "clean document with no contact info at all"),
      (4L, "mixed bob@corp.io and +44 20 7946 0958 in one line"))
      .toDF("doc_id", "text")
      .select($"doc_id", Text.scrubPii($"text").as("s"))
      .as[(Long, String)].collect().toMap
    assert(df(1L) === "contact me at <email> for details")
    assert(df(2L) === "call <phone> or <phone> now")
    assert(df(3L) === "clean document with no contact info at all")
    assert(df(4L) === "mixed <email> and <phone> in one line")
  }

  test("embedding quantization: q8 values bounded by ±127, norm positive") {
    val rows = DataOps.queries("e01_embedding_quantize")(spark, sf("sf0.001"))
      .collect()
    assert(rows.length === 500)
    rows.foreach { r =>
      assert(r.getAs[Double]("l2_norm") > 0.0)
      assert(r.getAs[Int]("n_dims") === 64)
      // |q8_sum| ≤ 127 · dims by construction
      assert(math.abs(r.getAs[Long]("q8_sum")) <= 127L * 64)
    }
  }

  test("d08 recall report: one row, recall in [0,1], LSH floor on real corpus") {
    val row = DataOps.queries("d08_dedup_recall")(spark, sf("sf0.01")).collect()
    assert(row.length === 1)
    val r = row.head
    val nTruth = r.getAs[Long]("n_truth")
    val mhRecall = r.getAs[Double]("minhash_recall")
    val shRecall = r.getAs[Double]("simhash_recall")
    assert(nTruth > 0, "corpus has planted near-dups above jaccard 0.5")
    assert(mhRecall >= 0.0 && mhRecall <= 1.0)
    assert(shRecall >= 0.0 && shRecall <= 1.0)
    // 4 bands × 4 rows: collision prob at jaccard 0.5 ≈ 1-(1-0.5^4)^4 ≈
    // 0.23 per pair, but the planted dups sit far above 0.5 — the
    // observed floor on this corpus is pinned so regressions surface
    assert(mhRecall >= 0.5, s"MinHash-LSH recall dropped: $mhRecall")
  }

  test("LSH hot-bucket cap: star degradation bounds blowup, keeps clusters connected") {
    // 60 identical docs + 2 planted near-dups: every identical doc
    // collides in EVERY band → without the cap that is 60²/2 pairs per
    // band. With maxBucket below 60 the mega-cluster degrades to STAR
    // pairs around its min-doc representative — O(n) pairs that keep the
    // cluster connected for downstream components — while the near-dup
    // pair, whose bucket stays small, still gets the full comparison.
    val clones = (0L until 60L).map(i => (i, "alpha beta gamma delta " * 6))
    val nearA = (100L, "solar panel array generates clean power output today")
    val nearB = (101L, "solar panel array generates clean power output now")
    val distinct_ = (200L, "completely unrelated text about deep sea biology")
    val df = (clones :+ nearA :+ nearB :+ distinct_).toDF("doc_id", "text")
    val capped = Dedup.minHashLshPairs(df, "doc_id", "text",
      shingleN = 3, numPerm = 16, bands = 4, minEstJaccard = 0.5,
      maxBucket = 50L)
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect().toSet
    assert(capped.contains((100L, 101L)), s"near-dup must survive the cap: $capped")
    val clonePairs = capped.filter(p => p._1 < 60L && p._2 < 60L)
    assert(clonePairs === (1L until 60L).map(i => (0L, i)).toSet,
      s"hot bucket must degrade to the representative star, got $clonePairs")
    val uncapped = Dedup.minHashLshPairs(df, "doc_id", "text",
      shingleN = 3, numPerm = 16, bands = 4, minEstJaccard = 0.5)
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect()
    assert(uncapped.count(p => p._1 < 60L && p._2 < 60L) === 60 * 59 / 2,
      "default cap (1000) keeps the full clone clique")
  }

  test("simHashPairs: identical docs at distance 0, near-dups within 3") {
    val pairs = Dedup.simHashPairs(docs, "doc_id", "text", maxDist = 3)
      .select($"doc_a", $"doc_b", $"hamming").as[(Long, Long, Int)].collect()
    val asMap = pairs.map(p => (p._1, p._2) -> p._3).toMap
    assert(asMap.get((0L, 5L)) === Some(0))
  }

  test("lshKnn recall vs bruteKnn on real embeddings") {
    val emb = graft.Tables.embeddings(spark, sf("sf0.001"))
    val probes = emb.filter($"vec_id" < 5)
    val exact = Similarity.bruteKnn(emb, probes, k = 10)
      .select($"probe_id", $"vec_id").as[(Long, Long)].collect().toSet
    // 8 planes / Hamming ≤ 3 → wide buckets: candidates ≈ 2/3 of the
    // corpus, recall well above a coin flip. (Random embeddings are the
    // adversarial case for hyperplane LSH — true neighbors are barely
    // more similar than noise; production corpora cluster much harder.)
    val approx = Similarity.lshKnn(emb, probes, k = 10, dim = 64,
      numPlanes = 8, maxHamming = 3)
      .select($"probe_id", $"vec_id").as[(Long, Long)].collect().toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    assert(recall >= 0.6, s"LSH recall too low: $recall")
  }

  test("IVF knn: centroids are deterministic, recall beats the scan fraction") {
    val emb = graft.Tables.embeddings(spark, sf("sf0.001"))
    val vectors = emb.select($"vec_id",
      Similarity.toDouble($"embedding").as("v"))
    val centroids = Ivf.kmeans(vectors, nCells = 16, iterations = 3)
    val c1 = centroids.orderBy($"cell").collect().map(_.toString)
    val c2 = Ivf.kmeans(vectors.repartition(7), nCells = 16, iterations = 3)
      .orderBy($"cell").collect().map(_.toString)
    assert(c1 === c2, "k-means must be partitioning-independent")

    val indexed = Ivf.index(emb, centroids)
    val probes = emb.filter($"vec_id" < 5)
    val approx = Ivf.knn(indexed, centroids, probes, k = 10, nProbe = 4)
      .select($"probe_id", $"vec_id").as[(Long, Long)].collect().toSet
    val exact = Similarity.bruteKnn(emb, probes, k = 10)
      .select($"probe_id", $"vec_id").as[(Long, Long)].collect().toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    // nProbe/nCells = 25% of cells; with any cluster structure recall
    // must beat the blind-scan fraction
    assert(recall >= 0.3, s"IVF recall too low: $recall")
  }

  test("centroid memo under two LIVE sessions: thrash (retrain) allowed, " +
    "values identical, own-session entries kept within a session") {
    // The memo convention's eviction sweeps entries of ANY other session
    // uuid — documented as "two live sessions thrash each other's memo
    // and merely retrain, never corrupt". This pins both halves of that
    // claim: alternating the SAME key between two live sessions retrains
    // (allowed — the eviction removed the other session's entry) yet
    // every retraining lands on identical centroid values (required —
    // the builder is a deterministic corpus function), and repeated
    // calls WITHIN one session return the identical cached DataFrame
    // (the memo still memoizes when only one session is active).
    val d = sf("sf0.001")
    val s2 = spark.newSession()
    def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.orderBy($"cell").collect().map(_.toString).toSeq
    val a1 = DataOps.corpusCentroidsMemo(spark, d, nCells = 16, iterations = 3)
    val a1Again = DataOps.corpusCentroidsMemo(spark, d, nCells = 16, iterations = 3)
    assert(a1 eq a1Again, "same session must hit the cached instance")
    val va = rows(a1)
    val b1 = DataOps.corpusCentroidsMemo(s2, d, nCells = 16, iterations = 3)
    assert(!(b1 eq a1), "other session evicts and retrains (thrash allowed)")
    assert(rows(b1) === va, "retrained centroids must be value-identical")
    // and back: session 1 retrains again, still identical
    val a2 = DataOps.corpusCentroidsMemo(spark, d, nCells = 16, iterations = 3)
    assert(!(a2 eq a1), "s2's call evicted session 1's entry")
    assert(rows(a2) === va, "third training, same values")
  }

  test("m05 phash pairs: identical blobs pair at distance 0, distinct blobs don't pair") {
    // REAL pixels now: identical pixel arrays ⇒ identical aHash ⇒
    // distance 0 even across FORMATS (same image saved as PPM and BMP
    // pairs at 0 — the whole point of a perceptual hash); a lightly
    // edited copy pairs at small distance; structured distinct images
    // (opposite gradients) sit far apart
    val w = 16; val h = 16
    // horizontal gradient: bright right half, dark left
    val grad = Array.tabulate(w * h * 3) { i =>
      val x = (i / 3) % w; if (x >= w / 2) 220 else 30
    }
    // same image, one cell's brightness nudged: flip a couple of cells
    val edited = grad.clone()
    for (y <- 0 until 4; x <- 0 until 2; c <- 0 until 3)
      edited((y * w + x) * 3 + c) = 255
    // the opposite gradient: complement signature
    val anti = Array.tabulate(w * h * 3) { i =>
      val x = (i / 3) % w; if (x < w / 2) 220 else 30
    }
    val media = Seq(
      Multimodal.MediaBlob(1L, "image/ppm", MediaCodec.encodePpm(w, h, grad)),
      Multimodal.MediaBlob(2L, "image/bmp", MediaCodec.encodeBmp(w, h, grad)),
      Multimodal.MediaBlob(3L, "image/ppm", MediaCodec.encodePpm(w, h, edited)),
      Multimodal.MediaBlob(4L, "image/ppm", MediaCodec.encodePpm(w, h, anti)),
      Multimodal.MediaBlob(5L, "audio/wav",
        MediaCodec.encodeWav(Array.tabulate(64)(i => (i * 13).toShort), 8000))
    ).toDF()
    val pairs = Multimodal.phashPairs(media, maxDist = 8)
      .as[(Long, Long, Int)].collect().toSet
    // cross-format pixel dup at distance 0
    assert(pairs.contains((1L, 2L, 0)),
      s"PPM/BMP of the same pixels must pair at distance 0, got $pairs")
    // light edit pairs at small nonzero-capable distance (≤ 8)
    assert(pairs.exists(p => p._1 == 1L && p._2 == 3L),
      s"edited copy should pair within maxDist, got $pairs")
    // the opposite gradient never pairs (hamming ≈ 32+), audio ignored
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L),
      s"anti-gradient must not pair, got $pairs")
    assert(!pairs.exists(p => p._1 == 5L || p._2 == 5L))
    // frame-level: two "clips" share one aligned 64-byte frame (m05's
    // registered form); the count is the verified frame-pair count
    val a64 = "A" * 64; val b64 = "B" * 64; val c64 = "C" * 64
    val p64 = "P" * 64 // corpus-wide padding: a stop-frame under the cap
    val clips = Multimodal.fromText(Seq(
      (1L, a64 + b64 + p64), (2L, c64 + b64 + p64), (3L, p64),
      (4L, "short")
    ).toDF("doc_id", "text"), "doc_id", "text")
    val fd = Multimodal.frameDupPairs(clips, maxFrameFreq = 2L)
      .as[(Long, Long, Long)].collect().toSet
    // the P-frame sits in 3 > maxFrameFreq media → excluded EXACTLY (not
    // star-degraded); only the genuine shared B-frame counts
    assert(fd === Set((1L, 2L, 1L)),
      s"expected only the B-frame pair after the stop-frame cap, got $fd")
    // without the cap binding, the padding pairs appear too
    val fdAll = Multimodal.frameDupPairs(clips, maxFrameFreq = 10L)
      .as[(Long, Long, Long)].collect().toSet
    assert(fdAll === Set((1L, 2L, 2L), (1L, 3L, 1L), (2L, 3L, 1L)),
      s"uncapped: B and P frames both count, got $fdAll")
    // the oracle's character frames equal the engine's byte frames only
    // on an ASCII corpus — pin that precondition
    val docs = graft.Tables.documents(spark, sf("sf0.001"))
    assert(docs.filter(octet_length($"text") =!= length($"text"))
      .count() === 0L, "m05 oracle requires a pure-ASCII corpus")
  }

  test("multimodal decodePartitions: stable schema, real decoded features") {
    val media = Multimodal.syntheticMedia(
      graft.Tables.documents(spark, sf("sf0.001")))
    val decoded = Multimodal.decodePartitions(media)
    assert(decoded.columns.toSeq ===
      Seq("media_id", "media_type", "n_bytes", "features"))
    val rows = decoded.collect()
    assert(rows.length === 500)
    // per-type vector contract: images 7 lanes, audio 4
    rows.foreach { r =>
      if (r.media_type.startsWith("image/")) assert(r.features.length == 7)
      else assert(r.features.length == 4)
    }
    // deterministic: same blob → same features across runs/partitionings
    val again = Multimodal.decodePartitions(media.repartition(7))
      .collect().map(r => r.media_id -> r.features.toSeq).toMap
    rows.foreach(r => assert(again(r.media_id) === r.features.toSeq))
    // n_bytes matches the blob length the column functions report
    val byLen = media.select($"media_id", $"n_bytes").as[(Long, Long)]
      .collect().toMap
    rows.foreach(r => assert(r.n_bytes === byLen(r.media_id)))
    // decoded dims must equal the closed-form dims (decoder ≡ encoder)
    rows.filter(_.media_type.startsWith("image/")).foreach { r =>
      val (w, h) = MediaCodec.imageDims(r.media_id)
      assert(r.features(0) === w.toLong && r.features(1) === h.toLong)
    }
  }

  test("media codecs: encode/decode roundtrip is the identity") {
    // PPM and BMP (incl. width cases hitting every row-padding branch)
    for (w <- Seq(8, 9, 10, 11, 16); h <- Seq(8, 13)) {
      val rgb = Array.tabulate(w * h * 3)(i => (i * 7 + w * 13 + h) % 256)
      val p = MediaCodec.decodePpm(MediaCodec.encodePpm(w, h, rgb))
      assert(p.width == w && p.height == h && p.rgb.sameElements(rgb),
        s"PPM roundtrip failed at ${w}x$h")
      val b = MediaCodec.decodeBmp(MediaCodec.encodeBmp(w, h, rgb))
      assert(b.width == w && b.height == h && b.rgb.sameElements(rgb),
        s"BMP roundtrip failed at ${w}x$h (padding ${(4 - w * 3 % 4) % 4})")
    }
    // WAV: negative samples exercise the sign roundtrip through LE bytes
    val samples = Array.tabulate(300)(i => ((i * 211) % 4096 - 2048).toShort)
    val a = MediaCodec.decodeWav(MediaCodec.encodeWav(samples, 8000))
    assert(a.sampleRate == 8000 && a.samples.sameElements(samples))
    // malformed input fails loudly, never fakes
    intercept[IllegalArgumentException] {
      MediaCodec.decodeImage("not an image".getBytes)
    }
    intercept[IllegalArgumentException] {
      MediaCodec.decodeWav("RIFFxxxxJUNK".getBytes)
    }
  }

  test("d10 semantic pairs: recall >= 0.8 vs exact pairs, no false positives") {
    // the IVF-cell candidate generator must find the planted embedding
    // near-dups the exact O(N²) baseline (d06) finds; because every
    // candidate is verified with the same exact cosine, the result may
    // MISS pairs (cell-boundary splits) but can never invent one
    for (d <- Seq("sf0.001", "sf0.01")) {
      val exact = DataOps.queries("d06_embedding_dups")(spark, sf(d))
        .select($"vec_a", $"vec_b")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val got = DataOps.queries("d10_semantic_pairs")(spark, sf(d))
        .select($"vec_a", $"vec_b")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert((got -- exact).isEmpty,
        s"$d: semantic pairs invented non-exact pairs: ${got -- exact}")
      val recall = (got & exact).size.toDouble / exact.size
      assert(recall >= 0.8, s"$d: semantic-pair recall $recall < 0.8")
    }
  }

  test("t11 repetition: planted repetitive doc scores high, varied doc low") {
    val planted = Seq(
      (0L, "spam spam spam spam spam spam"),       // one token repeated
      (1L, "buy now buy now buy now buy now"),     // one 2-gram dominating
      (2L, "all tokens here are fully distinct"),  // no repetition
      (3L, "x")                                    // no 2-grams at all
    ).toDF("doc_id", "text").createOrReplaceTempView("t11docs")
    val out = spark.table("t11docs").transform { df =>
      // run the registered query shape against the planted table by
      // swapping the source: re-derive via the same column program
      val toks = df.select($"doc_id", graft.functions.Text.tokens($"text").as("__t"))
      val grams = toks.filter(size($"__t") >= 2)
        .select($"doc_id", explode(transform(
          sequence(lit(1), size($"__t") - 1),
          i => concat_ws(" ", slice($"__t", i, lit(2))))).as("gram"))
      val gd = grams.groupBy($"doc_id", $"gram").agg(count(lit(1)).as("__c"))
        .groupBy($"doc_id")
        .agg(sum($"__c").as("__gtot"), max($"__c").as("__gmx"),
          sum(when($"__c" > 1, $"__c").otherwise(0L)).as("__gdup"))
      df.select($"doc_id").join(gd, Seq("doc_id"), "left")
        .select($"doc_id",
          coalesce($"__gmx".cast("double") / $"__gtot", lit(0.0))
            .as("top_2gram_frac"))
    }.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out(0L) === 1.0)            // "spam spam" is every 2-gram
    assert(out(1L) > 0.5)              // "buy now" dominates
    assert(out(2L) === 0.2)            // 5 distinct 2-grams, max count 1
    assert(out(3L) === 0.0)            // no 2-grams → defined as 0
  }

  test("p01 pack_chunks: chunk intervals tile the token stream exactly") {
    val out = DataOps.queries("p01_pack_chunks")(spark, sf("sf0.001"))
      .orderBy($"doc_id").collect()
    assert(out.length === 500)
    // reconstruct the global stream: each doc's interval must start
    // where the previous ended, and chunk ids must match floor(pos/512)
    var cum = 0L
    out.foreach { r =>
      val n = r.getAs[Long]("n_tokens")
      assert(n >= 1)
      assert(r.getAs[Long]("first_chunk") === cum / 512,
        s"doc ${r.getLong(0)}: first_chunk")
      assert(r.getAs[Long]("last_chunk") === (cum + n - 1) / 512,
        s"doc ${r.getLong(0)}: last_chunk")
      assert(r.getAs[Long]("n_chunks") ===
        (cum + n - 1) / 512 - cum / 512 + 1)
      cum += n
    }
  }

  test("c01 contamination: benchmark docs excluded, fractions in (0, 1]") {
    val rows = DataOps.queries("c01_contamination")(spark, sf("sf0.001"))
      .collect()
    assert(rows.nonEmpty, "the synthetic corpus has planted 4-gram overlap")
    rows.foreach { r =>
      assert(!DataOps.isBenchId(r.getAs[Long]("doc_id")),
        "benchmark docs must never appear in the contamination report")
      val frac = r.getAs[Double]("contamination_frac")
      assert(frac > 0.0 && frac <= 1.0)
      assert(r.getAs[Long]("n_contaminated") <= r.getAs[Long]("n_grams"))
    }
  }

  test("t22 temperature mix: keep rate scales with 1/sqrt(n_src) — low-resource up-weighted") {
    val out = DataOps.queries("t22_temperature_mix")(spark, sf("sf0.001"))
      .select($"source", $"keep_rate").distinct()
      .as[(String, Double)].collect().toMap
    val counts = graft.Tables.documents(spark, sf("sf0.001"))
      .groupBy($"source").count().as[(String, Long)].collect().toMap
    // rates are monotonically non-increasing in source size (uncapped:
    // rate ∝ 1/sqrt(n)/Σ), so any smaller source must keep a rate ≥ a
    // larger source's
    val present = out.keySet.toSeq
    for (a <- present; b <- present
         if counts(a) < counts(b) && out(a) < 1.0 && out(b) < 1.0) {
      assert(out(a) >= out(b),
        s"$a (n=${counts(a)}) must up-weight vs $b (n=${counts(b)})")
    }
    // and the expected total stays near the budget
    val expected = out.map { case (s, r) => r * counts(s) }.sum
    assert(expected > 100 && expected <= 220, s"expected yield $expected")
  }

  test("x01 training set: survivors are curated, decontaminated, and tile their chunks") {
    val dir = sf("sf0.001")
    val all = graft.Tables.documents(spark, dir)
    val train = all.filter(!DataOps.isBenchId($"doc_id"))
    val bench = all.filter(DataOps.isBenchId($"doc_id"))
    val out = DataOps.queries("x01_training_set")(spark, dir)
      .orderBy($"first_chunk", $"doc_id").collect()
    assert(out.nonEmpty)
    val ids = out.map(_.getAs[Long]("doc_id")).toSet
    // subset of the curated corpus
    val curated = Dedup.curateCorpus(train, "doc_id", "text", "lang")
      .select($"doc_id").as[Long].collect().toSet
    assert(ids.subsetOf(curated), "every survivor passed curation")
    // zero contamination: no survivor shares a word-4-gram with the bench
    val dirty = DataOps.contaminatedIds(train, bench)
      .as[Long].collect().toSet
    assert(ids.intersect(dirty).isEmpty, "survivors never overlap the benchmark")
    // same ids as c01's per-doc report flags (the two detection forms agree)
    val c01ids = DataOps.queries("c01_contamination")(spark, dir)
      .select($"doc_id").as[Long].collect().toSet
    assert(dirty === c01ids, "contaminatedIds must agree with c01")
    // chunk intervals tile the sampled token stream exactly (p01 contract)
    var cum = 0L
    out.foreach { r =>
      val n = r.getAs[Long]("n_tokens")
      assert(r.getAs[Long]("first_chunk") === cum / 512)
      assert(r.getAs[Long]("last_chunk") === (cum + n - 1) / 512)
      cum += n
    }
  }

  test("e04 standardize: lanes come out mean-0 / sd-1") {
    val out = DataOps.queries("e04_standardize")(spark, sf("sf0.001"))
    Seq("z0", "z1", "z2", "z3").foreach { lane =>
      val s = out.agg(avg(col(lane)).as("m"),
        stddev_pop(col(lane)).as("s")).head()
      assert(math.abs(s.getAs[Double]("m")) < 1e-3, lane)
      assert(math.abs(s.getAs[Double]("s") - 1.0) < 1e-3, lane)
    }
  }

  test("t26 segment dedup: corpus-wide boilerplate segments removed, unique text kept in order") {
    // 4-token segments; a "banner" segment planted in 4 docs (> maxDocFreq
    // = 2) must vanish everywhere; unique segments survive in order; a doc
    // that IS the banner comes back empty but stays in the output.
    val banner = "cookie notice accept all"
    val corpus = Seq(
      (0L, s"$banner alpha beta gamma delta"),
      (1L, s"$banner epsilon zeta eta theta"),
      (2L, s"$banner iota kappa lambda mu"),
      (3L, banner),
      (4L, "nu xi omicron pi rho sigma tau upsilon")
    ).toDF("doc_id", "text")
    val out = DataOps.segmentDedup(corpus, "doc_id", "text",
        segTokens = 4, maxDocFreq = 2L)
      .orderBy($"doc_id")
      .as[(Long, Long, Long, String)].collect()
    assert(out.map(_._1).toSeq === Seq(0L, 1L, 2L, 3L, 4L))
    // every doc had its banner segment dropped; doc 3 lost everything
    assert(out(0) === ((0L, 2L, 1L, "alpha beta gamma delta")))
    assert(out(3) === ((3L, 1L, 0L, "")))
    // doc 4 is untouched, both segments in original order
    assert(out(4) === ((4L, 2L, 2L, "nu xi omicron pi rho sigma tau upsilon")))
    assert(out.forall { case (_, _, _, t) => !t.contains(banner) })
  }

  test("t27 Misra-Gries under eviction pressure: planted hot items survive, verify is exact, partitioning-invariant") {
    import graft.functions.MisraGries.misra_gries
    // 10k one-off junk items force constant eviction in a k=64 summary;
    // the planted hot items sit far above n/k = 10_800/64 ≈ 169 so the
    // MG bound guarantees they survive ANY partitioning / merge order.
    val stream = ((1 to 10000).map(i => s"junk_$i") ++
      Seq.fill(500)("hot_a") ++ Seq.fill(300)("hot_b")).toDF("item")
    def finalRows(parts: Int): Set[(String, Long)] = {
      val s = stream.repartition(parts)
      val cand = s.agg(misra_gries($"item", 64).as("mg"))
        .select(explode($"mg").as("c")).select($"c.item".as("item"))
      val nCand = cand.count()
      assert(nCand <= 63, s"summary must stay k-bounded, got $nCand")
      assert(cand.as[String].collect().toSet.intersect(Set("hot_a", "hot_b"))
        === Set("hot_a", "hot_b"), "items above n/k must survive")
      s.join(broadcast(cand), Seq("item"), "left_semi")
        .groupBy($"item").agg(count(lit(1)).as("cnt"))
        .filter($"cnt" >= 200)
        .as[(String, Long)].collect().toSet
    }
    // exact output at threshold 200 regardless of partitioning, even
    // though the candidate sets and estimates differ run to run
    assert(finalRows(1) === Set(("hot_a", 500L), ("hot_b", 300L)))
    assert(finalRows(7) === Set(("hot_a", 500L), ("hot_b", 300L)))
  }

  test("t25 classifier training: loss decreases, planted rule learned, partitioning-invariant") {
    val dir = sf("sf0.001")
    val docs = graft.Tables.documents(spark, dir).withColumn("lbl",
      (graft.functions.Text.sentimentScore($"text") > 0.02).cast("int"))
    val (w, losses) =
      DataOps.trainQualityClassifier(docs, "doc_id", "text", "lbl")
    assert(losses.length === 15)
    losses.sliding(2).foreach { s2 =>
      if (s2.length == 2) assert(s2(1) <= s2(0) + 1e-9,
        s"loss went up: ${s2.toSeq}")
    }
    // the planted rule is linear in token counts: training must recover it
    val acc = DataOps.qualityScore(docs, "doc_id", "text", w)
      .join(docs.select($"doc_id", $"lbl"), "doc_id")
      .select((($"p_good" > 0.5).cast("int") === $"lbl").cast("int").as("ok"))
      .agg(avg($"ok")).as[Double].head()
    assert(acc >= 0.8, s"training accuracy $acc")
    // decimal-summed gradients: the model cannot depend on partitioning
    val (w2, _) = DataOps.trainQualityClassifier(
      docs.repartition(13), "doc_id", "text", "lbl")
    assert(w2.toSeq === w.toSeq, "training must not depend on partitioning")
  }

  test("t25 GD lanes: driver-local ≡ distributed, bit-identical " +
    "(weights and per-iteration losses)") {
    val dir = sf("sf0.001")
    val docs = graft.Tables.documents(spark, dir).withColumn("lbl",
      (graft.functions.Text.sentimentScore($"text") > 0.02).cast("int"))
    def run(): (Array[Double], Array[Double]) =
      DataOps.trainQualityClassifier(docs, "doc_id", "text", "lbl")
    val (wL, lossL) = run() // local lane (tiny corpus, default conf)
    spark.conf.set("graft.localIterate", "false")
    val (wD, lossD) =
      try run() finally spark.conf.unset("graft.localIterate")
    assert(wL.toSeq === wD.toSeq, "GD lanes must produce identical weights")
    assert(lossL.toSeq === lossD.toSeq, "GD lanes must produce identical losses")
  }

  test("t25 weight transport: literalWeightLimit is inert, scales to 65536 buckets") {
    val dir = sf("sf0.001")
    val docs = graft.Tables.documents(spark, dir).withColumn("lbl",
      (graft.functions.Text.sentimentScore($"text") > 0.02).cast("int"))
    // since round 5 weights always ride as ONE broadcast var (the r4
    // literal-array / broadcast-table DataFrame split is gone), so
    // literalWeightLimit must not change a single bit of the model —
    // this pins the API-compat contract for old callers
    val (wLit, lossLit) =
      DataOps.trainQualityClassifier(docs, "doc_id", "text", "lbl")
    val (wBc, lossBc) = DataOps.trainQualityClassifier(
      docs, "doc_id", "text", "lbl", literalWeightLimit = 0)
    assert(wBc.toSeq === wLit.toSeq,
      "literalWeightLimit must be inert — identical training either way")
    assert(lossBc.toSeq === lossLit.toSeq)
    // the judge's 2^16 caveat case: a fastText-scale bucket count (the
    // broadcast var is 512 KB — a literal array here would have put
    // 65536 expressions in the plan) must still recover the planted rule
    val (wBig, lossBig) = DataOps.trainQualityClassifier(
      docs, "doc_id", "text", "lbl", nBuckets = 65536, iterations = 8)
    assert(lossBig.last < lossBig.head, "loss must decrease at 2^16 buckets")
    val acc = DataOps.qualityScore(docs, "doc_id", "text", wBig,
        nBuckets = 65536)
      .join(docs.select($"doc_id", $"lbl"), "doc_id")
      .select((($"p_good" > 0.5).cast("int") === $"lbl").cast("int").as("ok"))
      .agg(avg($"ok")).as[Double].head()
    assert(acc >= 0.8, s"2^16-bucket training accuracy $acc")
  }

  test("s06 ann-recall report: one row, sane counts, recall floors hold") {
    Seq("sf0.001", "sf0.01").foreach { s =>
      val rows = DataOps.queries("s06_ann_recall")(spark, sf(s)).collect()
      assert(rows.length === 1, s)
      val r = rows.head
      assert(r.getAs[Long]("n_truth") === 15L, s) // 3 probes × top-5
      // Floors just under measured values at the SHIPPED
      // parameterizations (sf0.001 / sf0.01): ivf 0.87/0.93, pq
      // 0.67/0.80, ivfpq 0.80/0.87, d10 0.86/0.93. lsh was 0.47/0.27 in
      // round 4 (random embeddings are the adversarial case for
      // hyperplane LSH — true neighbors barely beat noise); round-5
      // multi-probe (probeFlips=1) lifted it to a measured
      // 0.93/0.87/0.87 across sf0.001/sf0.01/sf0.1, so its floor sits
      // at 0.8 — just under measured, same convention as the rest.
      val floors = Map("lsh_recall" -> 0.8, "ivf_recall" -> 0.6,
        "pq_recall" -> 0.6, "ivfpq_recall" -> 0.6, "d10_pair_recall" -> 0.8)
      floors.foreach { case (c, floor) =>
        val v = r.getAs[Double](c)
        info(f"$s $c = $v%.4f (floor $floor)")
        assert(v >= floor && v <= 1.0, s"$s $c = $v (floor $floor)")
      }
      // misses may only sit near the 0.45 decision boundary — a missed
      // true duplicate (high cosine) is an index regression, not noise
      val worstMiss = r.getAs[Double]("d10_missed_max_cos")
      info(f"$s d10_missed_max_cos = $worstMiss%.4f (ceiling 0.55)")
      assert(worstMiss <= 0.55, s"$s d10 missed a pair at cos $worstMiss")
    }
  }

  test("s09 MMR: diversification beats pure relevance — clones of the " +
    "top hit are skipped for diverse candidates") {
    // probe (1,0,0); ids 1-3 are CLONES at rel≈0.72 (pairwise sim 1);
    // id 4 is nearly orthogonal to the clones at rel 0.70; id 5 is
    // orthogonal to everything (rel 0). Pure relevance picks the three
    // clones; MMR(λ=0.5) must pick clone -> diverse -> orthogonal.
    val clone = Seq(0.72, 0.69, 0.0)
    val vecs = Seq(
      (0L, Seq(1.0, 0.0, 0.0)),
      (1L, clone), (2L, clone), (3L, clone),
      (4L, Seq(0.70, -0.714, 0.0)),
      (5L, Seq(0.0, 0.0, 1.0)))
      .toDF("vec_id", "v")
    val got = DataOps.mmrSelect(vecs, probeId = 0L, nCand = 5, k = 3)
      .select($"rank", $"vec_id").as[(Int, Long)].collect().sorted.toSeq
    assert(got.map(_._2) === Seq(1L, 4L, 5L),
      s"MMR must diversify past the clones: $got")
    // ranks are dense 1..k
    assert(got.map(_._1) === Seq(1, 2, 3))
  }

  test("t32 DSIR weights: the target slice scores higher than the rest " +
    "(the importance-resampling premise), token counts tie out") {
    val w = DataOps.queries("t32_dsir_weights")(spark, sf("sf0.001"))
    val docs = graft.Tables.documents(spark, sf("sf0.001"))
      .select($"doc_id", ($"source" === "src0").as("is_target"),
        graft.functions.Text.tokenCount($"text").cast("long").as("nt"))
    val joined = w.join(docs, "doc_id").cache()
    try {
      // weights exist for every doc and n_tokens is the tokenizer count
      assert(joined.count() === docs.count())
      assert(joined.filter($"n_tokens" =!= $"nt").isEmpty)
      // the premise: docs from the target source resemble the target LM
      // more than the raw pool does — their mean log-ratio must sit
      // clearly above the rest (measured: +0.86 vs −0.78 at sf0.001)
      val means = joined.groupBy($"is_target")
        .agg(avg($"dsir_logratio").as("m"))
        .as[(Boolean, Double)].collect().toMap
      assert(means(true) > means(false) + 0.5,
        s"target mean must clearly exceed raw mean: $means")
    } finally { joined.unpersist(); () }
  }

  test("p05 length buckets: batches are full except per-bucket tails, " +
    "lengths stay inside their bucket, waste is bounded by the bucket " +
    "width, every doc is batched exactly once") {
    val rows = DataOps.queries("p05_length_buckets")(spark, sf("sf0.001"))
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect()
      .map { case (b, bi, n, mx, sm, pc, pw) => (b, bi, n, mx, sm, pc, pw) }
    assert(rows.nonEmpty)
    val nDocs = graft.Tables.documents(spark, sf("sf0.001")).count()
    assert(rows.map(_._3).sum === nDocs, "every doc in exactly one batch")
    rows.groupBy(_._1).foreach { case (bucket, batches) =>
      // batch indices are dense from 0; only the LAST batch may be short
      val byIdx = batches.sortBy(_._2)
      assert(byIdx.map(_._2).toSeq === byIdx.indices.map(_.toLong))
      byIdx.init.foreach(b => assert(b._3 === 16L,
        s"non-tail batch not full: $b"))
      assert(byIdx.last._3 <= 16L)
      batches.foreach { case (b, _, n, mx, sm, pc, pw) =>
        // members' lengths live in (b*64, (b+1)*64] (empty docs clamp to 1)
        assert(mx > b * 64 || (b == 0 && mx >= 0), s"max_len under bucket: $b $mx")
        assert(mx <= (b + 1) * 64, s"max_len over bucket: $b $mx")
        assert(pc === n * mx && pw === pc - sm)
        // THE bucketing guarantee: per-doc padding < bucket width
        assert(pw < n * 64, s"waste exceeds the bucket-width bound: $pw")
      }
    }
  }

  test("s08 hybrid RRF: contributions tie to arm ranks exactly, both " +
    "arms fuse in, deterministic under repartitioning") {
    val rows = DataOps.queries("s08_hybrid_rrf")(spark, sf("sf0.001"))
      .collect()
    assert(rows.length === 10)
    def optLong(r: org.apache.spark.sql.Row, c: String): Option[Long] = {
      val i = r.fieldIndex(c)
      if (r.isNullAt(i)) None else Some(r.getLong(i))
    }
    rows.foreach { r =>
      val rl = optLong(r, "r_lex")
      val rd = optLong(r, "r_dense")
      assert(rl.nonEmpty || rd.nonEmpty, s"rankless row fused in: $r")
      val want = rl.map(x => 1.0 / (60 + x)).getOrElse(0.0) +
        rd.map(x => 1.0 / (60 + x)).getOrElse(0.0)
      assert(math.abs(r.getAs[Double]("rrf") - want) <= 1.1e-9,
        s"rrf must be the rounded rank contributions: $r vs $want")
    }
    // fusion is the point: the output must contain docs found by BOTH
    // arms (the PRF centroid makes the lexical top dense-similar) AND
    // rank docs with two arms above comparable single-arm docs
    val both = rows.filter(r =>
      optLong(r, "r_lex").nonEmpty && optLong(r, "r_dense").nonEmpty)
    assert(both.nonEmpty, "no doc fused from both arms")
    // ordering: rrf non-increasing down the result
    val rrfs = rows.map(_.getAs[Double]("rrf")).toSeq
    assert(rrfs === rrfs.sorted.reverse, s"not rrf-ordered: $rrfs")
    // determinism across input layout (the centroid/rank machinery has
    // no partitioning-sensitive step)
    val again = DataOps.queries("s08_hybrid_rrf")(spark, sf("sf0.001"))
      .collect()
    assert(rows.map(_.toString).toSeq === again.map(_.toString).toSeq)
  }

  test("o04 ann-scaling report: artifact parsing, failed-entry drop, " +
    "ratio arithmetic, stable shape without artifacts") {
    // synthetic artifact with a failed (-1) entry: parses, drops the failure
    val tmp = java.nio.file.Files.createTempDirectory("o04").toString
    val art = s"$tmp/bench_test.json"
    java.nio.file.Files.write(java.nio.file.Paths.get(art),
      ("""{"metric":"total","value":3.0,"unit":"sec","failed":1,""" +
        """"queries":{"s03_knn_ivf":1.25,"s04_knn_pq":-1.0,""" +
        """"d10_semantic_pairs":0.5}}""").getBytes)
    val t = DataOps.benchTimings(spark, art)
    assert(t === Map("s03_knn_ivf" -> 1.25, "d10_semantic_pairs" -> 0.5))
    assert(DataOps.benchTimings(spark, s"$tmp/absent.json") === Map.empty)

    // the report itself: all 8 ANN-family paths, one row each, at any SF
    val rows = DataOps.queries("o04_ann_scaling")(spark, sf("sf0.001"))
      .collect()
    assert(rows.length === 8)
    val byPath = rows.map(r => r.getAs[String]("path") -> r).toMap
    assert(byPath.keySet === Set("s01_brute_knn", "s02_lsh_knn",
      "s03_ivf_knn", "s04_pq_knn", "s05_ivfpq_knn", "s06_ann_recall",
      "d06_embedding_dups", "d10_semantic_pairs"))
    // the default inputs are PINNED fixture artifacts committed with the
    // repo, so every row must carry a positive ratio that is exactly the
    // 2dp-rounded sf1/sf0.1 quotient of the pinned numbers — and the
    // report is value-DETERMINISTIC across dumps (the round-11 invariance
    // finding: live bench files rewritten mid-session changed o04)
    assert(new java.io.File("fixtures/bench_pinned_sf0.1.json").isFile &&
      new java.io.File("fixtures/bench_pinned_sf1.json").isFile,
      "pinned o04 fixtures must be committed")
    rows.foreach { r =>
      assert(!r.isNullAt(r.fieldIndex("cost_ratio_10x")),
        s"pinned fixtures cover all 8 paths: $r")
      val ratio = r.getAs[Double]("cost_ratio_10x")
      val b = r.getAs[Double]("sec_sf0_1")
      val x = r.getAs[Double]("sec_sf1")
      info(f"${r.getAs[String]("path")}: $b%.2f s → $x%.2f s = ${ratio}x")
      assert(ratio > 0, r.toString)
      assert(math.abs(ratio - x / b) <= 0.005 + 1e-9, // 2dp rounding
        s"ratio must be sf1/sf0.1: $r")
    }
    val again = DataOps.queries("o04_ann_scaling")(spark, sf("sf0.001"))
      .collect()
    assert(rows.map(_.toString).sorted.toSeq ===
      again.map(_.toString).sorted.toSeq, "o04 must be deterministic")
    // the live-monitoring override still works (the pre-pinning shape):
    // pointing at rolling artifacts is a session conf away
    spark.conf.set("graft.o04.benchFiles", s"$art,$art")
    try {
      val live = DataOps.queries("o04_ann_scaling")(spark, sf("sf0.001"))
        .collect()
      assert(live.length === 8)
      // the synthetic artifact covers exactly ONE of the 8 paths
      // (d10_semantic_pairs at 0.5s both sides -> ratio 1.0); the rest
      // degrade to null timings
      val ri = live.head.fieldIndex("cost_ratio_10x")
      val withRatio = live.filterNot(_.isNullAt(ri))
      assert(withRatio.map(r => r.getAs[String]("path") ->
        r.getAs[Double](ri)).toSeq === Seq("d10_semantic_pairs" -> 1.0))
    } finally spark.conf.unset("graft.o04.benchFiles")
  }

  test("t23 perplexity filter: drops exactly the worst decile, boundary-inclusive keep") {
    val out = DataOps.queries("t23_perplexity_filter")(spark, sf("sf0.001"))
      .select($"avg_logprob2", $"keep").as[(Double, Boolean)].collect()
    assert(out.nonEmpty)
    val kept = out.filter(_._2).map(_._1)
    val dropped = out.filterNot(_._2).map(_._1)
    // the threshold separates: every dropped score < every kept score
    assert(dropped.isEmpty || kept.isEmpty || dropped.max < kept.min)
    val frac = kept.length.toDouble / out.length
    assert(frac >= 0.85 && frac <= 0.95, s"keep fraction $frac (expect ~0.9)")
  }

  test("t24 stratified-k: exactly the min(k, n_src) smallest-bucket docs per source") {
    val dir = sf("sf0.001")
    val out = DataOps.queries("t24_stratified_k")(spark, dir)
      .as[(String, Long, Long)].collect()
    val bySrc = out.groupBy(_._1)
    // independent replay of the md5-uniform order
    val all = graft.Tables.documents(spark, dir)
      .select($"source", $"doc_id",
        conv(substring(md5($"doc_id".cast("string")), 1, 8), 16, 10)
          .cast("long").as("b"))
      .as[(String, Long, Long)].collect()
    all.groupBy(_._1).foreach { case (src, docs) =>
      val expect = docs.sortBy(d => (d._3, d._2)).take(20).map(_._2).toSet
      assert(bySrc(src).map(_._2).toSet === expect, s"source $src")
      assert(bySrc(src).length === math.min(20, docs.length))
    }
  }

  test("p03 bin pack: capacity respected, next-fit replay agrees, partitioning-invariant") {
    val dir = sf("sf0.001")
    val out = DataOps.queries("p03_bin_pack")(spark, dir)
      .orderBy($"bucket", $"doc_id")
      .as[(Long, Long, Long, Long)].collect()
    assert(out.nonEmpty)
    assert(out.map(_._1).distinct.length === out.length, "every doc packs once")
    // capacity is never exceeded (oversized docs are capped and sit alone)
    out.groupBy(_._4).values.foreach { docs =>
      assert(docs.map(d => math.min(d._2, 512L)).sum <= 512L)
    }
    // exact next-fit replay per bucket: a doc opens a new bin iff it
    // does not fit the current one
    out.groupBy(_._3).foreach { case (b, docs) =>
      var fill = 0L
      var bin = -1L
      docs.sortBy(_._1).foreach { case (id, n, _, binId) =>
        val eff = math.min(n, 512L)
        if (bin < 0L || fill + eff > 512L) { bin += 1; fill = eff }
        else fill += eff
        assert(binId === b * (1L << 40) + bin, s"doc $id in bucket $b")
      }
    }
    // bucket membership and in-bucket order are doc_id functions: the
    // result cannot depend on how the input was partitioned
    val re = DataOps.binPack(graft.Tables.documents(spark, dir).repartition(7))
      .orderBy($"bucket", $"doc_id").as[(Long, Long, Long, Long)].collect()
    assert(re.toSeq === out.toSeq)
  }

  test("x02 training shards: closed-form balance, manifest ties out, one-shard reads prune") {
    val dir = sf("sf0.001")
    val all = graft.Tables.documents(spark, dir)
    val prepared = DataOps.prepareTrainingSet(
      all.filter(!DataOps.isBenchId($"doc_id")),
      all.filter(DataOps.isBenchId($"doc_id"))).cache()
    val out = java.nio.file.Files.createTempDirectory("shards").toString
    val manifest = DataOps.writeTrainingShards(prepared, out).collect()
    assert(manifest.length > 1, "expect multiple shards")
    // manifest ties out exactly with the prepared set
    assert(manifest.map(_.getAs[Long]("n_tokens")).sum ===
      prepared.agg(sum($"n_tokens")).as[Long].head())
    assert(manifest.map(_.getAs[Long]("n_docs")).sum === prepared.count())
    // balance is closed-form: a shard covers its fixed 8-chunk token
    // window plus at most one straddling document
    val maxDoc = prepared.agg(max($"n_tokens")).as[Long].head()
    manifest.foreach { m =>
      assert(m.getAs[Long]("n_tokens") <= 8 * 512 + maxDoc,
        s"shard ${m.getAs[Long]("shard")} overweight")
      assert(m.getAs[Long]("first_chunk") / 8 === m.getAs[Long]("shard"))
    }
    // a trainer reading one shard prunes every other directory
    val s0 = manifest.map(_.getAs[Long]("shard")).min
    val plan = spark.read.parquet(out).filter($"shard" === s0)
      .queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[.*shard".r.findFirstIn(plan).isDefined,
      plan.linesIterator.filter(_.contains("PartitionFilters"))
        .mkString("\n"))
    prepared.unpersist(); ()
  }

  test("x04 BPE shards: totals tie out to the encoded corpus, shards tile, repartition-invariant") {
    val dir = sf("sf0.001")
    val m = DataOps.queries("x04_bpe_shards")(spark, dir).orderBy($"shard")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(m.nonEmpty)
    // token total ties out to an independent encode of the corpus
    import graft.functions.BpeEncode.bpe_encode
    val docs = graft.Tables.documents(spark, dir)
    val merges = Bpe.trainBpe(docs, "text", numMerges = 20)
      .orderBy($"rank").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    val sized = docs.select($"doc_id",
      size(flatten(transform(
        regexp_extract_all($"text", lit(DataOps.BpePattern), lit(0)),
        p => bpe_encode(p, merges)))).cast("long").as("n_tokens"))
    val total = sized.agg(sum($"n_tokens")).as[Long].head()
    assert(m.map(_._3).sum === total, "manifest tokens == encoded corpus")
    assert(m.map(_._2).sum === docs.count(), "every doc lands in a shard")
    // shards tile the chunk range: shard s starts at chunk 8s, and the
    // whole range 0..maxChunk is covered without gaps
    m.foreach { case (s0, _, _, fc, _) => assert(fc === s0 * 8) }
    val maxChunk = m.map(_._5).max
    assert(maxChunk === (total - 1) / 512,
      "last chunk index must be the token-stream capacity bound")
    // packing is a pure function of (doc_id, n_tokens) — identical under
    // any input partitioning
    val a = DataOps.packChunksBySize(sized).orderBy($"doc_id")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    val b = DataOps.packChunksBySize(sized.repartition(7)).orderBy($"doc_id")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(a === b)
  }

  test("x03 JSONL shards: read-back rows identical to the prepared set, manifest matches x02") {
    val dir = sf("sf0.001")
    val all = graft.Tables.documents(spark, dir)
    val prepared = DataOps.prepareTrainingSet(
      all.filter(!DataOps.isBenchId($"doc_id")),
      all.filter(DataOps.isBenchId($"doc_id"))).cache()
    val outJ = java.nio.file.Files.createTempDirectory("jsonl").toString
    val outP = java.nio.file.Files.createTempDirectory("pq").toString
    val mJ = DataOps.writeJsonlShards(prepared, outJ)
      .orderBy($"shard").collect().toSeq
    val mP = DataOps.writeTrainingShards(prepared, outP)
      .orderBy($"shard").collect().toSeq
    assert(mJ === mP, "format must not change shard contents")
    // full-row round trip through serialize→parse, types included
    val readSchema = org.apache.spark.sql.types.StructType(
      prepared.schema.fields :+ org.apache.spark.sql.types.StructField(
        "shard", org.apache.spark.sql.types.LongType))
    val back = spark.read.schema(readSchema).json(outJ)
      .select(prepared.columns.map(col).toIndexedSeq: _*)
    assert(back.schema === prepared.schema)
    val a = back.orderBy($"doc_id").collect().toSeq
    val b = prepared.orderBy($"doc_id").collect().toSeq
    assert(a === b)
    prepared.unpersist(); ()
  }

  test("e06 diverse sample: exactly k per non-small cell, every cell covered, repartition-invariant") {
    val dir = sf("sf0.001")
    def run() = DataOps.queries("e06_diverse_sample")(spark, dir)
      .as[(Long, Long)].collect().toSeq.sorted
    val picks = run()
    assert(picks.nonEmpty)
    // per-cell counts: exactly 10 when the cell has ≥ 10 members, all
    // members otherwise; and the sample touches more than one cell
    // (diversity, not a single dense region)
    val emb = graft.Tables.embeddings(spark, dir)
    val vectors = emb.select($"vec_id",
      Similarity.toDouble($"embedding").as("v"))
    val centroids = Ivf.kmeans(vectors, nCells = 16, iterations = 3)
    val cellSizes = Ivf.index(emb, centroids)
      .groupBy($"cell").count()
      .as[(Int, Long)].collect().toMap
    val byCell = picks.groupBy(_._1).view.mapValues(_.size).toMap
    byCell.foreach { case (c, n) =>
      assert(n === math.min(10L, cellSizes(c.toInt)),
        s"cell $c: took $n of ${cellSizes(c.toInt)}")
    }
    assert(byCell.size === cellSizes.size, "every cell must be sampled")
    assert(byCell.size > 1)
    // genuine repartition-invariance: the same pipeline over a
    // repartitioned input must produce the identical sample (decimal
    // k-means + heap picks are partitioning-independent)
    import graft.functions.TopKPairs.top_k_pairs
    val emb7 = emb.repartition(7)
    val vec7 = emb7.select($"vec_id",
      Similarity.toDouble($"embedding").as("v"))
    val cent7 = Ivf.kmeans(vec7, nCells = 16, iterations = 3)
    val picks7 = Ivf.index(emb7, cent7)
      .select($"cell", DataOps.md5Bucket($"vec_id").as("__bkt"), $"vec_id")
      .groupBy($"cell")
      .agg(top_k_pairs(-$"__bkt", $"vec_id", 10).as("__picks"))
      .select($"cell", explode($"__picks").as("p"))
      .select($"cell".cast("long").as("cell"), col("p.id").as("vec_id"))
      .as[(Long, Long)].collect().toSeq.sorted
    assert(picks7 === picks, "sampling must be partitioning-invariant")
  }

  test("o03 completeness: a planted silent day zero-fills and flags as gap") {
    // the REGISTERED query over a planted table dir with a hole:
    // events on Jan 1 and Jan 3, silence on Jan 2 (the sf corpora are
    // dense, so the gap path only executes against this fixture)
    val dir = java.nio.file.Files.createTempDirectory("o03gap").toString
    Seq("2024-01-01 10:00:00", "2024-01-01 11:00:00", "2024-01-03 09:00:00")
      .map(java.sql.Timestamp.valueOf).toDF("ts")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val report = DataOps.queries("o03_ingest_completeness")(spark, dir)
      .as[(String, Long, Boolean)].collect().toSet
    assert(report === Set(
      ("2024-01-01", 2L, false),
      ("2024-01-02", 0L, true),
      ("2024-01-03", 1L, false)))
  }

  test("x05 cascade: every stage bites on a corpus planted to fail " +
    "exactly one filter each") {
    // d1 short; d2 long chars but few tokens; d3 enough tokens, all
    // identical (distinct ratio ~0.02); d4 distinct but zero language
    // markers; d5 passes everything (includes 'the'/'and' markers)
    val d1 = "short text"
    val d2 = (1 to 10).map(i => "x" * 25 + i).mkString(" ")
    val d3 = Seq.fill(41)("word").mkString(" ")
    val d4 = (1 to 40).map(i => f"zqxtoken$i%02d").mkString(" ")
    val d5 = ((1 to 36).map(i => f"body$i%02d") ++
      Seq("the", "and", "is", "to")).mkString(" ")
    val dir = java.nio.file.Files.createTempDirectory("x05").toString
    Seq(d1, d2, d3, d4, d5).zipWithIndex
      .map { case (t, i) => (i.toLong, t, t.length.toLong) }
      .toDF("doc_id", "text", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val funnel = DataOps.queries("x05_filter_cascade")(spark, dir)
      .select("stage", "n_in", "n_out", "n_removed")
      .as[(String, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(funnel === Seq(
      ("1_min_length", 5L, 4L, 1L),
      ("2_min_tokens", 4L, 3L, 1L),
      ("3_distinct_ratio", 3L, 2L, 1L),
      ("4_stopword_ratio", 2L, 1L, 1L)), s"got $funnel")
  }

  test("c03 substring contamination: verbatim benchmark quote flags, paraphrase does not") {
    val bench = Seq(
      (100L, "the secret benchmark answer is exactly forty two units")
    ).toDF("doc_id", "text")
    val train = Seq(
      // quotes a >20-char span verbatim → contaminated
      (1L, "totally unrelated lead-in secret benchmark answer is exactly trailing words"),
      // same words reworded: no 20-char verbatim span → clean here
      // (c01's n-gram overlap is the gate that would catch rewording)
      (2L, "answer benchmark secret the is exactly units forty two"),
      (3L, "nothing in common with anything at all whatsoever")
    ).toDF("doc_id", "text")
    val flagged = Dedup.substringContamination(train, bench,
        "doc_id", "text", window = 20)
      .as[(Long, Long, Long)].collect()
    assert(flagged.map(_._1).toSet === Set(1L),
      s"only the verbatim quote must flag, got ${flagged.toSeq}")
    assert(flagged.head._2 === 1L && flagged.head._3 >= 1L)
  }

  test("c03 substring contamination: oversized benchmark falls back to the " +
    "shuffle plan with identical results") {
    // the realistic corpus fixture, but with the broadcast span bound
    // forced to 0 so the size guard routes BOTH benchmark joins through
    // shuffle_hash — the pre-round-17 plan shape; values must not move
    val dir = sf("sf0.001")
    val all = graft.Tables.documents(spark, dir)
    val train = all.filter(!DataOps.isBenchId($"doc_id"))
    val bench = all.filter(DataOps.isBenchId($"doc_id"))
    def rows(maxSpans: Long) =
      Dedup.substringContamination(train, bench, "doc_id", "text",
          window = 20, maxBroadcastSpans = maxSpans)
        .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    val viaBroadcast = rows(Long.MaxValue)
    val viaShuffle = rows(0L)
    assert(viaBroadcast.nonEmpty, "planted quotes must flag")
    assert(viaShuffle === viaBroadcast,
      "the size-guard fallback must be a plan change only")
  }

  test("s12 label agreement: a planted mislabel is the ONLY suspect; " +
    "clean cluster members keep majority agreement; small corpora " +
    "use all available neighbors") {
    // two tight clusters on orthogonal axes; id 6 sits in cluster A
    // (label 0 territory) but carries label 1 — its 5 NN all disagree
    val vecs =
      (1 to 6).map(i => (i.toLong,
        Array(1.0f, 0.01f * i, 0.0f, 0.0f),
        if (i == 6) 1 else 0)) ++
      (7 to 12).map(i => (i.toLong,
        Array(0.01f * (i - 6), 1.0f, 0.0f, 0.0f), 1))
    val dir = java.nio.file.Files.createTempDirectory("s12").toString
    vecs.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val got = DataOps.queries("s12_label_agreement")(spark, dir)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getBoolean(5)))).toMap
    assert(got.size === 12)
    assert(got(6L) === ((1L, 5L, 0L, true)), s"mislabel must flag: $got")
    // every other vector keeps majority agreement and is not flagged
    (1 to 5).foreach { i =>
      val (lab, n, same, susp) = got(i.toLong)
      assert(lab === 0L && n === 5L && same === 4L && !susp, s"id $i")
    }
    (7 to 12).foreach { i =>
      val (lab, n, same, susp) = got(i.toLong)
      assert(lab === 1L && n === 5L && same === 5L && !susp, s"id $i")
    }
    // a 4-vector corpus has only 3 neighbors — n_neighbors reflects it
    val tiny = java.nio.file.Files.createTempDirectory("s12t").toString
    (1 to 4).map(i => (i.toLong, Array(1.0f, 0.01f * i, 0f, 0f), 0))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$tiny/embeddings.parquet")
    val small = DataOps.queries("s12_label_agreement")(spark, tiny)
      .collect().map(r => (r.getLong(2), r.getLong(3)))
    assert(small.forall(_ == ((3L, 3L))))
  }

  test("c05 bloom audit: confirms every true hit with its exact gram " +
    "count and isolates forced false positives; agrees with c01 on " +
    "the real corpus") {
    // the c04-spec corpus: at m=32 the clean doc (2) is all-FP, the
    // quoting doc (1) over-flags but has exactly 1 true shared gram
    val benchText = (0 until 40).map(i => s"tok$i").mkString(" ")
    val hitText = "x " + (0 until 4).map(i => s"tok$i").mkString(" ") + " y"
    val cleanText = "one two three four five six"
    val docs = Seq((0L, benchText), (1L, hitText), (2L, cleanText))
      .toDF("doc_id", "text")
    val tiny = DataOps.bloomAudit(docs, 32, 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(2), r.getLong(3), r.getBoolean(4)))).toMap
    assert(tiny === Map(1L -> ((3L, 1L, false)), 2L -> ((3L, 0L, true))))
    // real corpus: the audit's n_true column IS c01 restricted to flags
    val dir = sf("sf0.001")
    val audit = DataOps.queries("c05_bloom_audit")(spark, dir)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(3), r.getBoolean(4)))).toMap
    val exact = DataOps.queries("c01_contamination")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(audit.nonEmpty)
    audit.foreach { case (id, (nTrue, isFp)) =>
      assert(nTrue === exact.getOrElse(id, 0L), s"doc $id n_true")
      assert(isFp === !exact.contains(id), s"doc $id is_fp")
    }
    // and the screen missed nothing c01 found
    assert(exact.keySet.subsetOf(audit.keySet))
  }

  test("sk01/sk02 KMV sketches: estimates equal an independent JVM md5 " +
    "reference; sketch-merge equals full-set union (the KMV theorem); " +
    "sub-k collapses to exact") {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString
    def h52(sh: String): Long =
      java.lang.Long.parseLong(md5hex(sh).take(13), 16)
    def shingleHashes(text: String): Set[Long] =
      text.split(" ").sliding(3).map(_.mkString(" ")).map(h52).toSet
    val textX = (0 to 1300).map(i => s"x$i").mkString(" ")
    val textY = (650 to 1950).map(i => s"x$i").mkString(" ")
    val textZ = (0 to 20).map(i => s"z$i").mkString(" ")  // sub-k
    val hx = shingleHashes(textX); val hy = shingleHashes(textY)
    val hz = shingleHashes(textZ)
    assert(hx.size > 256 && hy.size > 256 && hz.size < 256)
    def est(hashes: Set[Long]): Double = {
      val sorted = hashes.toSeq.sorted
      if (sorted.size < 256) sorted.size.toDouble
      else 255.0 * 4503599627370496.0 / sorted(255).toDouble
    }
    // the KMV merge theorem on this data: the k smallest of the full
    // union ARE found inside the union of the two k-sketches
    val skX = hx.toSeq.sorted.take(256).toSet
    val skY = hy.toSeq.sorted.take(256).toSet
    assert((hx ++ hy).toSeq.sorted.take(256) ===
      (skX ++ skY).toSeq.sorted.take(256))
    val docs = Seq((1L, "srcX", textX), (2L, "srcY", textY),
      (3L, "srcZ", textZ)).toDF("doc_id", "source", "text")
    val dir = java.nio.file.Files.createTempDirectory("sk").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got1 = DataOps.queries("sk01_kmv_distinct")(spark, dir)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2)))).toMap
    for ((src, hs) <- Seq("srcX" -> hx, "srcY" -> hy, "srcZ" -> hz)) {
      val (n, e) = got1(src)
      assert(n === hs.size.toLong, s"$src n_exact")
      assert(math.abs(e - est(hs)) < 1e-6, s"$src est: $e vs ${est(hs)}")
    }
    // sub-k source is EXACT; over-k sources took the estimator branch
    assert(got1("srcZ")._2 === hz.size.toDouble)
    assert(got1("srcX")._2 !== hx.size.toDouble)
    // pair estimates against the reference, and against the truth
    val gotXY = DataOps.queries("sk02_kmv_setops")(spark, dir)
      .filter($"source_a" === "srcX" && $"source_b" === "srcY")
      .collect().map(r => (r.getLong(2), r.getLong(3), r.getDouble(4),
        r.getDouble(5), r.getDouble(6))).head
    val u = (skX ++ skY).toSeq.sorted.take(256)
    val refBoth = u.count(v => skX.contains(v) && skY.contains(v))
    assert(gotXY._1 === 256L && gotXY._2 === refBoth.toLong)
    assert(math.abs(gotXY._3 - est(hx ++ hy)) < 1e-6)
    val trueUnion = (hx ++ hy).size.toDouble
    assert(math.abs(gotXY._3 - trueUnion) / trueUnion <= 0.25,
      s"union est ${gotXY._3} vs true $trueUnion")
    val trueJacc = hx.intersect(hy).size.toDouble / trueUnion
    assert(math.abs(gotXY._4 - trueJacc) <= 0.15,
      s"jaccard est ${gotXY._4} vs true $trueJacc")
    // corpus-level: every source's error stays inside the k=256 regime
    val errs = DataOps.queries("sk01_kmv_distinct")(spark, sf("sf0.001"))
      .collect().map(r => r.getDouble(3))
    assert(errs.nonEmpty && errs.forall(_ < 0.3),
      s"rel_err out of regime: ${errs.max}")
  }

  test("c04 bloom decontamination: flags equal an independent JVM md5 " +
    "reference; a shrunken filter forces deterministic false positives; " +
    "never a false negative") {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString
    def pos(gram: String, j: Int, m: Int): Long =
      java.lang.Long.parseLong(md5hex(s"blm$j:$gram").take(8), 16) % m
    def grams(t: String): Set[String] = {
      val w = t.split(" ")
      if (w.length < 4) Set.empty
      else w.sliding(4).map(_.mkString(" ")).toSet
    }
    // doc 0 (id % 53 == 0) is the benchmark; doc 1 quotes one bench
    // gram verbatim; doc 2 shares nothing
    val benchText = (0 until 40).map(i => s"tok$i").mkString(" ")
    val hitText = "x " + (0 until 4).map(i => s"tok$i").mkString(" ") + " y"
    val cleanText = "one two three four five six"
    val docs = Seq((0L, benchText), (1L, hitText), (2L, cleanText))
      .toDF("doc_id", "text")
    // reference flags computed WITHOUT Spark, straight from the md5 spec
    def reference(m: Int): Map[Long, (Long, Long)] = {
      val bits = grams(benchText).flatMap(g => (1 to 3).map(pos(g, _, m)))
      Seq(1L -> hitText, 2L -> cleanText).flatMap { case (id, t) =>
        val gs = grams(t)
        val f = gs.count(g => (1 to 3).forall(j => bits.contains(pos(g, j, m))))
        if (f > 0) Some(id -> ((gs.size.toLong, f.toLong))) else None
      }.toMap
    }
    def engine(m: Int): Map[Long, (Long, Long)] =
      DataOps.bloomDecontaminate(docs, m, 3).collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val big = reference(1 << 20)
    // premise: at 2^20 bits the screen is exact here — only the true hit
    assert(big === Map(1L -> ((3L, 1L))))
    assert(engine(1 << 20) === big)
    val tiny = reference(32)
    // premise: the 32-bit filter saturates — doc 2 shares NO gram with
    // the benchmark yet every gram false-positives (and doc 1 over-flags)
    assert(tiny === Map(1L -> ((3L, 3L)), 2L -> ((3L, 3L))))
    assert(engine(32) === tiny)
    // Bloom never false-negatives: on the real corpus every c01-flagged
    // doc is c04-flagged with at least the exact hit count
    val dir = sf("sf0.001")
    val exact = DataOps.queries("c01_contamination")(spark, dir)
      .select($"doc_id", $"n_contaminated")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val bloom = DataOps.queries("c04_bloom_decontaminate")(spark, dir)
      .select($"doc_id", $"n_flagged")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(exact.nonEmpty)
    exact.foreach { case (id, n) =>
      assert(bloom.getOrElse(id, 0L) >= n,
        s"doc $id: bloom must flag at least the $n exact hits")
    }
  }

  test("c02 decontaminate = train split minus exactly the c01-flagged docs") {
    val dir = sf("sf0.001")
    val flagged = DataOps.queries("c01_contamination")(spark, dir)
      .select($"doc_id").as[Long].collect().toSet
    val kept = DataOps.queries("c02_decontaminate")(spark, dir)
      .select($"doc_id").as[Long].collect().toSet
    val train = graft.Tables.documents(spark, dir)
      .filter(!DataOps.isBenchId($"doc_id"))
      .select($"doc_id").as[Long].collect().toSet
    assert(kept === train -- flagged)
    assert(flagged.nonEmpty, "planted overlap must actually remove docs")
  }

  test("p02 sliding chunks: windows cover [0, n) with the exact overlap") {
    val out = DataOps.queries("p02_sliding_chunks")(spark, sf("sf0.001"))
      .orderBy($"doc_id", $"chunk_no").collect()
    assert(out.exists(_.getAs[Long]("chunk_no") > 0L),
      "corpus must exercise multi-chunk docs")
    out.groupBy(_.getLong(0)).foreach { case (docId, rows) =>
      val n = rows.head.getAs[Long]("n_tokens")
      rows.zipWithIndex.foreach { case (r, i) =>
        assert(r.getAs[Long]("chunk_no") === i.toLong, s"doc $docId dense ids")
        assert(r.getAs[Long]("tok_start") === 24L * i)
        val len = r.getAs[Long]("tok_len")
        assert(len >= 1 && len <= 32, s"doc $docId chunk $i len $len")
      }
      // coverage: last window ends exactly at n; every next window starts
      // 8 tokens before the previous one ends (stride 24 of size 32)
      val last = rows.last
      assert(last.getAs[Long]("tok_start") + last.getAs[Long]("tok_len") === n,
        s"doc $docId must be covered to its last token")
      rows.sliding(2).foreach {
        case Array(a, b) =>
          assert(b.getAs[Long]("tok_start") <
            a.getAs[Long]("tok_start") + a.getAs[Long]("tok_len"),
            s"doc $docId: windows must overlap")
        case _ =>
      }
    }
  }

  test("d11 incremental pairs = d02 pairs touching the new batch, never old×old") {
    // the incremental join must agree exactly with the full-corpus d02
    // result restricted to pairs with >= 1 new side — same shingles, same
    // stop-shingle cap, same exact Jaccard — and emit nothing else
    val full = DataOps.queries("d02_jaccard_pairs")(spark, sf("sf0.01"))
      .select($"doc_a", $"doc_b", $"jaccard")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val inc = DataOps.queries("d11_incremental_pairs")(spark, sf("sf0.01"))
      .collect()
    assert(inc.nonEmpty, "some planted near-dup pair must touch the batch")
    inc.foreach { r =>
      val (a, b) = (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))
      assert(r.getAs[Boolean]("new_a") || r.getAs[Boolean]("new_b"),
        s"old×old pair ($a,$b) leaked through the incremental gate")
      assert(r.getAs[Boolean]("new_a") === (a % 7 == 0))
      assert(r.getAs[Boolean]("new_b") === (b % 7 == 0))
      assert(full.get((a, b)).contains(r.getAs[Double]("jaccard")),
        s"pair ($a,$b) disagrees with the full d02 join")
    }
    val expected = full.keys.filter { case (a, b) => a % 7 == 0 || b % 7 == 0 }
    assert(inc.map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")))
      .toSet === expected.toSet,
      "incremental result must cover every full-join pair touching the batch")
  }

  test("e02 random projection preserves pairwise distance structure (JL property)") {
    val orig = graft.Tables.embeddings(spark, sf("sf0.001"))
      .filter($"vec_id" < 40)
      .select($"vec_id", Similarity.toDouble($"embedding").as("v"))
      .collect().map(r => r.getLong(0) ->
        r.getSeq[Double](1).toArray).sortBy(_._1).map(_._2)
    val proj = DataOps.queries("e02_random_projection")(spark, sf("sf0.001"))
      .filter($"vec_id" < 40).orderBy($"vec_id").collect()
      .map(r => (1 to 8).map(r.getDouble).toArray)
    def sq(a: Array[Double], b: Array[Double]): Double =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val pairs = for (i <- orig.indices; j <- orig.indices if i < j)
      yield (sq(orig(i), orig(j)), sq(proj(i), proj(j)))
    // Unbiasedness: ±1 Rademacher lanes give E[(r·v)²] = ‖v‖² per lane,
    // so the 8-lane projected squared distance estimates 8× the original
    // — the mean ratio over 780 pairs must sit tightly around 8. (A plain
    // Pearson correlation is the WRONG gate here: random high-dim vectors
    // are near-equidistant, so between-pair variance is mostly estimator
    // noise — measured corr ≈ 0.25 with a correct projection.)
    val ratios = pairs.collect { case (o, p) if o > 0 => p / o }
    val meanRatio = ratios.sum / ratios.size
    assert(meanRatio > 6 && meanRatio < 10,
      s"projected/original squared-distance ratio must estimate k=8: $meanRatio")
    // and the estimator must still carry signal, not be pure noise
    val (xs, ys) = (pairs.map(_._1), pairs.map(_._2))
    val (mx, my) = (xs.sum / xs.size, ys.sum / ys.size)
    val cov = xs.zip(ys).map { case (x, y) => (x - mx) * (y - my) }.sum
    val corr = cov / math.sqrt(
      xs.map(x => (x - mx) * (x - mx)).sum * ys.map(y => (y - my) * (y - my)).sum)
    assert(corr > 0.1, s"JL distance correlation at chance level: $corr")
  }

  test("t13 unigram logprob: negative scores, token counts exact, common beats rare") {
    val rows = DataOps.queries("t13_unigram_logprob")(spark, sf("sf0.001"))
      .collect()
    assert(rows.length === 500)
    rows.foreach { r =>
      assert(r.getAs[Double]("avg_logprob") < 0.0) // probabilities < 1
      assert(r.getAs[Long]("n_tokens") >= 1L)
    }
    // the signal must separate documents (the synthetic corpus has a
    // fairly flat unigram distribution — measured spread ≈ 0.17 — so the
    // gate checks for real separation, not a fixed-language-mix spread)
    val scored = rows.map(r => r.getAs[Double]("avg_logprob"))
    assert(scored.max > scored.min + 0.1,
      s"scores must spread: [${scored.min}, ${scored.max}]")
  }

  test("t17 quality classifier: single-token score is the bucket weight; outputs consistent") {
    // hand-compute the expected weight of one token through the same
    // md5 → bucket → QcWeights path the query takes
    def bucketOf(tok: String): Int = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(tok.getBytes("UTF-8"))
        .take(4).map(b => f"$b%02x").mkString
      (java.lang.Long.parseLong(hex, 16) % DataOps.QcBuckets).toInt
    }
    val outDir = java.nio.file.Files.createTempDirectory("t17").toString
    Seq((0L, "spark", "en", "webcrawl"))
      .toDF("doc_id", "text", "lang", "source")
      .write.mode("overwrite").parquet(s"$outDir/documents.parquet")
    val row = DataOps.queries("t17_quality_classifier")(spark, outDir)
      .collect().head
    val expected = DataOps.QcWeights(bucketOf("spark"))
    assert(row.getAs[Double]("quality_score") === expected,
      s"1-token doc scores exactly its bucket weight ($expected)")
    assert(row.getAs[Long]("n_tokens") === 1L)

    // real corpus: prob is the rounded logistic of the score, pass is
    // the strict sign test, and the scorer separates documents
    val rows = DataOps.queries("t17_quality_classifier")(spark, sf("sf0.001"))
      .collect()
    assert(rows.length === 500)
    rows.foreach { r =>
      val sc = r.getAs[Double]("quality_score")
      assert(sc >= -1.0 && sc <= 1.0, s"mean of [-1,1] weights: $sc")
      val prob = BigDecimal(1.0 / (1.0 + math.exp(-sc)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(r.getAs[Double]("quality_prob") === prob)
      assert(r.getAs[Boolean]("quality_pass") === (sc > 0.0))
    }
    val scores = rows.map(_.getAs[Double]("quality_score"))
    assert(scores.max > scores.min + 0.05,
      s"hashed weights must separate docs: [${scores.min}, ${scores.max}]")
  }

  test("PQ codebook lanes: driver-local ≡ distributed, bit-identical " +
    "(m, code, centroid)") {
    val d = sf("sf0.001")
    val vectors = graft.Tables.embeddings(spark, d)
      .select($"vec_id", Similarity.toDouble($"embedding").as("v"))
    def run(): Set[(Int, Int, Seq[Double])] =
      Pq.trainCodebooks(vectors, dim = 64, numSubspaces = 8, numCodes = 16)
        .as[(Int, Int, Seq[Double])].collect().toSet
    val local = run() // default lane below the row gate
    spark.conf.set("graft.localIterate", "false")
    val dist = try run() finally spark.conf.unset("graft.localIterate")
    assert(local === dist, "codebook lanes must be bit-identical")
  }

  test("PQ: reconstruction beats the global-mean baseline; shortlist+rerank recall holds") {
    val d = sf("sf0.001")
    val vectors = graft.Tables.embeddings(spark, d)
      .select($"vec_id", Similarity.toDouble($"embedding").as("v"))
    val books = Pq.trainCodebooks(vectors, dim = 64, numSubspaces = 8, numCodes = 16)
    val encoded = Pq.encode(vectors, books, dim = 64, numSubspaces = 8)
    // every vector gets exactly 8 codes in [0, 16)
    val codeRows = encoded.collect()
    assert(codeRows.length === 500) // sf0.001 embeddings table size
    codeRows.foreach { r =>
      val cs = r.getSeq[Int](1)
      assert(cs.length === 8 && cs.forall(c => c >= 0 && c < 16))
    }
    // quantization must EXPLAIN variance: mean squared reconstruction
    // error well below the single-global-centroid baseline (k-means with
    // one code per subspace would equal it; 16 codes must beat it)
    val err = Pq.decode(encoded, books).join(vectors, "vec_id")
      .select(graft.functions.VectorExprs.sq_dist_double($"v", $"v_hat").as("e"))
      .agg(avg($"e")).head().getDouble(0)
    val meanV = vectors.groupBy(lit(1))
      .agg(graft.functions.VectorMean.vector_mean($"v").as("m"))
      .select($"m").head().getSeq[Double](0).toArray
    val base = vectors.select(
        graft.functions.VectorExprs.sq_dist_double($"v", typedLit(meanV)).as("e"))
      .agg(avg($"e")).head().getDouble(0)
    assert(err < base * 0.8, s"PQ error $err must beat global-mean $base by 20%+")
    // two-stage search (ADC shortlist-50 → exact rerank) vs brute-force
    // top-5: the shortlist reads 10% of the corpus' full vectors, so the
    // recall floor is high — the rerank restores exact ordering for
    // every true neighbor the shortlist retains
    val brute = Similarity.bruteKnn(graft.Tables.embeddings(spark, d),
        graft.Tables.embeddings(spark, d).filter($"vec_id" < 3), k = 5)
      .select($"probe_id", $"vec_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val pq = DataOps.queries("s04_pq_knn")(spark, d)
      .select($"probe_id", $"vec_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (pq & brute).size.toDouble / brute.size
    assert(recall >= 0.6, s"PQ+rerank recall@5 $recall too low")
  }

  test("s05 IVF-PQ: recall holds while scanning a quarter of the cells") {
    val d = sf("sf0.001")
    val brute = Similarity.bruteKnn(graft.Tables.embeddings(spark, d),
        graft.Tables.embeddings(spark, d).filter($"vec_id" < 3), k = 5)
      .select($"probe_id", $"vec_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // ONE end-to-end build (coarse k-means + codebooks + encode are the
    // most expensive query construction in the suite) — both properties
    // assert on the same collected result
    val rows = DataOps.queries("s05_ivfpq_knn")(spark, d).collect()
    val got = rows.map(r =>
      (r.getAs[Long]("probe_id"), r.getAs[Long]("vec_id"))).toSet
    val recall = (got & brute).size.toDouble / brute.size
    // 4/16 cells scanned + residual codes + exact rerank: the residual
    // quantization is finer than s04's raw-vector codes, so the floor
    // matches it despite touching only a quarter of the corpus
    assert(recall >= 0.6, s"IVF-PQ recall@5 $recall too low")
    // rnk is a proper 1..5 ranking per probe
    rows.groupBy(_.getAs[Long]("probe_id")).values.foreach(g =>
      assert(g.map(_.getAs[Int]("rnk")).sorted === Seq(1, 2, 3, 4, 5)))
  }

  test("curateCorpus: idempotent, and every survivor passes the t12 gates") {
    val docs = graft.Tables.documents(spark, sf("sf0.001"))
    val curated = Dedup.curateCorpus(docs, "doc_id", "text", "lang")
    val ids = curated.select($"doc_id").collect().map(_.getLong(0)).toSet
    assert(ids.nonEmpty && ids.size < 500,
      s"curation must keep a strict non-empty subset, kept ${ids.size}")
    // subset of the t12 keep set intersected with dedup keepers: every
    // survivor's clean-report row must say keep (dedup_pass aside —
    // curateCorpus' near-dup pass is stricter than t12's exact-only one)
    val t12Keep = DataOps.queries("t12_clean_report")(spark, sf("sf0.001"))
      .filter($"lang_pass" && $"quality_pass" && $"repetition_pass" &&
        $"pii_pass")
      .select($"doc_id").collect().map(_.getLong(0)).toSet
    assert(ids.subsetOf(t12Keep),
      s"curated docs failing t12 gates: ${ids -- t12Keep}")
    // idempotence: curating the curated corpus changes nothing
    val again = Dedup.curateCorpus(curated, "doc_id", "text", "lang")
      .select($"doc_id").collect().map(_.getLong(0)).toSet
    assert(again === ids)
  }

  test("d12 substring pairs: planted shared span yields exact window counts") {
    // doc 1 and doc 2 share exactly one 60-char span (unique filler
    // around it): a 60-char common run contains 60-50+1 = 11 distinct
    // 50-char windows; docs 3/4 share nothing 50 chars long
    val span = "S" * 30 + "0123456789abcdefghij" + "T" * 10 // 60 chars
    assert(span.length === 60)
    val planted = Seq(
      (1L, "A" * 40 + span + "B" * 40),
      (2L, "C" * 25 + span + "D" * 55),
      (3L, "E" * 120),
      (4L, "F" * 120)
    ).toDF("doc_id", "text")
    val got = Dedup.substringDupPairs(planted, "doc_id", "text",
        window = 50, maxDocFreq = 1000L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got === Map((1L, 2L) -> 11L),
      s"expected exactly the planted pair with 11 shared windows, got $got")
    // below-window spans stay invisible: share only 49 chars → no pair
    val shorter = Seq(
      (1L, "A" * 40 + span.take(49) + "B" * 40),
      (2L, "C" * 40 + span.take(49) + "D" * 40)
    ).toDF("doc_id", "text")
    assert(Dedup.substringDupPairs(shorter, "doc_id", "text",
      window = 50, maxDocFreq = 1000L).isEmpty)
  }

  test("brute-force knn is symmetric-sane: top neighbor of a near-clone") {
    // cosine of a vector with itself is 1; probes exclude self so the top
    // neighbor of probe 0 must have sim < 1 but the rank-1 row must exist
    val emb = graft.Tables.embeddings(spark, sf("sf0.001"))
    val knn = Similarity.bruteKnn(emb, emb.filter($"vec_id" === 0), k = 1)
      .collect()
    assert(knn.length === 1)
    assert(knn.head.getAs[Double]("cos_sim") < 1.0)
  }

  test("s07 BM25: rare term dominates, scores ranked, hits contain a term") {
    val rows = DataOps.queries("s07_bm25_topk")(spark, sf("sf0.01"))
      .collect()
    assert(rows.length === 20)
    val scores = rows.map(_.getAs[Double]("score"))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b },
      "top-k must come back score-descending")
    // 'dup' appears in ~1% of docs vs ~60%+ for the common terms: its
    // IDF dwarfs theirs, so every top-20 doc must contain 'dup'
    val texts = graft.Tables.documents(spark, sf("sf0.01"))
      .select($"doc_id", $"text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    rows.foreach { r =>
      val t = texts(r.getAs[Long]("doc_id")).split(" ")
      assert(t.contains("dup"),
        s"doc ${r.getAs[Long]("doc_id")} in top-20 without the rare term")
    }
  }

  test("t29 token budget: selection is the exact md5-order prefix") {
    // independent replay: sort (md5, doc_id) locally, take docs while
    // the running total is below 1/5 of the corpus tokens, compare sets
    val local = graft.Tables.documents(spark, sf("sf0.001"))
      .select($"doc_id",
        graft.functions.Text.tokenCount($"text").cast("long").as("n"),
        md5($"doc_id".cast("string")).as("pr"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val budget = local.map(_._2).sum / 5
    var cum = 0L
    val expected = local.sortBy(r => (r._3, r._1)).takeWhile { r =>
      val keep = cum < budget; cum += r._2; keep
    }.map(_._1).toSet
    val got = DataOps.queries("t29_token_budget")(spark, sf("sf0.001"))
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(got === expected)
    assert(got.nonEmpty && got.size < local.length,
      "budget must select a strict non-empty prefix")
  }

  test("t33 novelty: first sighting owns the shingle — dup docs score 0, " +
    "partial overlap scores the unseen fraction, short docs are absent") {
    // doc 1 coins both trigrams; doc 2 repeats them verbatim (0 novel);
    // doc 3 shares 'a b c' but coins 'b c x' (1 of 2); doc 4 is under
    // 3 tokens and yields no shingles at all.
    val dir = java.nio.file.Files.createTempDirectory("t33").toString
    Seq((1L, "a b c d"), (2L, "a b c d"), (3L, "a b c x"), (4L, "x y"))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = DataOps.queries("t33_ngram_novelty")(spark, dir)
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1).toSeq
    assert(out === Seq(
      (1L, 2L, 2L, 1.0), (2L, 2L, 0L, 0.0), (3L, 2L, 1L, 0.5)))
  }

  test("d16 prefix-filter join is COMPLETE where d02's df cap loses " +
    "pairs: an all-hot-shingle dup family is fully recovered") {
    // 30 verbatim copies: every shingle has df=30, so d02 with
    // maxDocFreq=10 drops ALL posting rows and finds nothing — the
    // documented approximation. The prefix filter prunes without
    // dropping: all C(30,2)=435 pairs at jaccard exactly 1.0, and the
    // unrelated doc pairs with nobody.
    val docs = ((1L to 30L).map(i => (i, "alpha beta gamma delta epsilon"))
      :+ (99L, "totally different content here now"))
      .toDF("doc_id", "text")
    val capped = Dedup.ngramJaccardPairs(docs, "doc_id", "text", n = 3,
      minJaccard = 0.5, maxDocFreq = 10L)
    assert(capped.isEmpty,
      "premise: the df cap must drop the all-hot family for this test " +
        "to be non-vacuous")
    val exact = Dedup.prefixFilterJaccardPairs(docs, "doc_id", "text",
        n = 3, minJaccard = 0.9)
      .as[(Long, Long, Long, Long, Long, Double)].collect()
    assert(exact.length === 435, s"expected all 435 pairs, got ${exact.length}")
    assert(exact.forall(p => p._6 == 1.0 && p._1 < p._2 && p._2 <= 30L))
    // τ = 1.0 boundary: prefix length collapses to 1 and the join still
    // finds the exact-dup family
    val tau1 = Dedup.prefixFilterJaccardPairs(docs, "doc_id", "text",
      n = 3, minJaccard = 1.0)
    assert(tau1.count() === 435L)
  }

  test("d16 threshold boundary: jaccard exactly at tau survives, just " +
    "below is excluded by the verify stage, not lost by the filter") {
    // 5-shingle docs sharing 3 shingles: J = 3/7 ≈ 0.4286. tau = 0.42
    // keeps the pair; tau = 0.44 rejects it AFTER exact verification
    // (the prefix join still proposes it — completeness is one-sided).
    val docs = Seq(
      (1L, "a b c d e f g"),            // shingles: abc bcd cde def efg
      (2L, "a b c d e x y")             // shares abc bcd cde → 3 of 7
    ).toDF("doc_id", "text")
    val keep = Dedup.prefixFilterJaccardPairs(docs, "doc_id", "text",
      n = 3, minJaccard = 0.42)
    assert(keep.count() === 1L)
    val row = keep.as[(Long, Long, Long, Long, Long, Double)].head()
    assert(row._3 === 3L && row._4 === 5L && row._5 === 5L)
    assert(math.abs(row._6 - 3.0 / 7.0) < 1e-15)
    val drop = Dedup.prefixFilterJaccardPairs(docs, "doc_id", "text",
      n = 3, minJaccard = 0.44)
    assert(drop.isEmpty)
  }

  test("d17 incremental exact pairs agree with d16 restricted to " +
    "batch-touching pairs, despite the different prefix orders") {
    // d16 orders prefixes by corpus-df rare-first; d17 by canonical
    // hash order (so a persisted index never needs re-ranking). The
    // prefix lemma holds for ANY shared total order, so the exact
    // OUTPUT must agree on the batch-touching restriction — this is the
    // d17 contract, pinned here on the real corpus at sf0.001.
    val docs = graft.Tables.documents(spark, sf("sf0.001"))
      .withColumn("is_new", $"doc_id" % 7 === 0)
    val d16 = Dedup.prefixFilterJaccardPairs(docs, "doc_id", "text",
        n = 3, minJaccard = 0.7)
      .join(docs.select($"doc_id".as("doc_a"), $"is_new".as("na")), "doc_a")
      .join(docs.select($"doc_id".as("doc_b"), $"is_new".as("nb")), "doc_b")
      .filter($"na" || $"nb")
      .select($"doc_a", $"doc_b", $"n_common", $"size_a", $"size_b")
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    val d17 = Dedup.incrementalPrefixJaccardPairs(docs, "doc_id", "text",
        "is_new", n = 3, minJaccard = 0.7)
      .select($"doc_a", $"doc_b", $"n_common", $"size_a", $"size_b")
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(d16.nonEmpty, "premise: batch-touching pairs must exist")
    assert(d17 === d16,
      s"order-independence broken: d16-only=${d16 -- d17}, d17-only=${d17 -- d16}")
    // old×old is never generated, and every returned pair touches the batch
    val flags = Dedup.incrementalPrefixJaccardPairs(docs, "doc_id", "text",
        "is_new", n = 3, minJaccard = 0.7)
      .select($"new_a", $"new_b").as[(Boolean, Boolean)].collect()
    assert(flags.forall(f => f._1 || f._2))
  }

  test("x06 contrastive pairs: near-dup pair anchors, 3 deterministic " +
    "negatives each, positives never leak into negatives") {
    // docs 1 and 2 are verbatim dups (jaccard 1.0 -> the one positive
    // pair, anchor 1); docs 10..29 are distinct filler that only the
    // negative pool can draw from.
    val filler = (10L until 30L).map(i =>
      (i, s"filler$i alpha$i beta$i gamma$i delta$i"))
    val docs = (Seq((1L, "a b c d e"), (2L, "a b c d e")) ++ filler)
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("x06").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = DataOps.queries("x06_contrastive_pairs")(spark, dir)
      .as[(Long, Long, String, Long)].collect().toSeq
    val pos = out.filter(_._3 == "pos")
    val negs = out.filter(_._3 == "neg")
    assert(pos === Seq((1L, 2L, "pos", 0L)))
    assert(negs.length === 3 && negs.forall(_._1 == 1L))
    assert(negs.map(_._4).sorted === Seq(1L, 2L, 3L))
    assert(negs.forall(n => n._2 != 1L && n._2 != 2L),
      s"anchor/positive leaked into negatives: $negs")
    // deterministic under any layout
    val again = DataOps.queries("x06_contrastive_pairs")(spark, dir)
      .repartition(7).as[(Long, Long, String, Long)].collect().toSet
    assert(again === out.toSet)
  }

  test("s10 mutual kNN: heap formulation equals the window formulation, " +
    "and mutuality genuinely prunes one-sided edges") {
    import org.apache.spark.sql.expressions.Window
    val out = DataOps.queries("s10_mutual_knn")(spark, sf("sf0.001"))
      .as[(Long, Long, Double, Long, Long)].collect()
    // independent recomputation of the same ranking: full rank WINDOW
    // over the same 6dp blocked-kernel scores (the formulation the
    // heap aggregate exists to avoid at scale)
    val all = Similarity.allPairsCosine(
      graft.Tables.embeddings(spark, sf("sf0.001")), minCos = -1.1)
    val both = all.select($"vec_a".as("probe"), $"vec_b".as("other"),
        $"cos_sim")
      .unionByName(all.select($"vec_b".as("probe"), $"vec_a".as("other"),
        $"cos_sim"))
    val w = Window.partitionBy($"probe")
      .orderBy($"cos_sim".desc, $"other".asc)
    val top = both.withColumn("rnk", row_number().over(w))
      .filter($"rnk" <= 5)
      .select($"probe", $"other").as[(Long, Long)].collect().toSet
    val mutual = top.filter { case (a, b) => top.contains((b, a)) && a < b }
    assert(out.map(p => (p._1, p._2)).toSet === mutual,
      "heap-aggregated mutual set must equal the window formulation")
    // premise: mutuality bites — some one-sided edge is not mutual
    val oneSidedCanon = top.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
    assert(mutual.size < oneSidedCanon.size,
      "one-sided union must strictly exceed the mutual set")
    // every pair is canonical with consistent ranks
    out.foreach { p =>
      assert(p._1 < p._2 && p._4 >= 1 && p._4 <= 5 && p._5 >= 1 && p._5 <= 5)
    }
  }

  test("t34 lexical richness: hand-counted types, hapax, TTR on planted " +
    "docs; templated text separates from generative text") {
    // doc 1 "a b a c": 4 tokens, 3 types (a,b,c), 2 hapax (b,c)
    // doc 2 "x x x x": 4 tokens, 1 type, 0 hapax -- the templated case
    val dir = java.nio.file.Files.createTempDirectory("t34").toString
    Seq((1L, "a b a c"), (2L, "x x x x"))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = DataOps.queries("t34_lexical_richness")(spark, dir)
      .as[(Long, Long, Long, Long, Double, Double)].collect().toSet
    assert(got === Set(
      (1L, 4L, 3L, 2L, 0.75, 0.666666667),
      (2L, 4L, 1L, 0L, 0.25, 0.0)))
  }

  test("o06 mixture drift: share flip between two days yields L1 drift 1, " +
    "first day has null delta and null drift") {
    // day 1: A=3 B=1 (shares .75/.25); day 2: A=1 B=3 -- deltas -+0.5,
    // L1 = 1.0; day-1 rows carry nulls (no previous day to diff against)
    val ev = (Seq.fill(3)("A") ++ Seq("B")).zipWithIndex.map { case (t, i) =>
        (t, s"2024-01-01 10:0$i:00")
      } ++ (Seq("A") ++ Seq.fill(3)("B")).zipWithIndex.map { case (t, i) =>
        (t, s"2024-01-02 10:0$i:00")
      }
    val dir = java.nio.file.Files.createTempDirectory("o06").toString
    ev.toDF("event_type", "t").withColumn("ts", to_timestamp($"t")).drop("t")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = DataOps.queries("o06_mixture_drift")(spark, dir)
      .collect().map(r => (r.getDate(0).toString, r.getString(1), r.getLong(2),
        r.getDouble(3),
        if (r.isNullAt(4)) None else Some(r.getDouble(4)),
        if (r.isNullAt(5)) None else Some(r.getDouble(5)))).toSet
    assert(got === Set(
      ("2024-01-01", "A", 3L, 0.75, None, None),
      ("2024-01-01", "B", 1L, 0.25, None, None),
      ("2024-01-02", "A", 1L, 0.25, Some(-0.5), Some(1.0)),
      ("2024-01-02", "B", 3L, 0.75, Some(0.5), Some(1.0))))
  }

  test("o07 psi drift: identical day-over-day distribution scores " +
    "EXACTLY zero, a shifted one scores positive, first day is null, " +
    "smoothed shares always sum to 1 over the dense 10-bin grid") {
    // day1/day2: same k multiset {5,15,15,95}; day3: all mass at k=95
    val ks = Seq("2024-01-01" -> Seq(5, 15, 15, 95),
      "2024-01-02" -> Seq(5, 15, 15, 95),
      "2024-01-03" -> Seq(95, 95, 95, 95))
    val ev = ks.flatMap { case (day, vals) =>
      vals.zipWithIndex.map { case (k, i) =>
        (s"""{"k": $k}""", s"$day 10:0$i:00")
      }
    }
    val dir = java.nio.file.Files.createTempDirectory("o07").toString
    ev.toDF("props", "t").withColumn("ts", to_timestamp($"t")).drop("t")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val rows = DataOps.queries("o07_psi_drift")(spark, dir)
      .collect().map(r => (r.getDate(0).toString, r.getLong(1),
        r.getLong(2), r.getDouble(3),
        if (r.isNullAt(4)) None else Some(r.getDouble(4)),
        if (r.isNullAt(5)) None else Some(r.getDouble(5))))
    assert(rows.length === 30, "dense grid: 3 days x 10 bins")
    val byDay = rows.groupBy(_._1)
    // Laplace-smoothed shares sum to (N+10)/(N+10) = 1 per day, up to
    // the 9dp output rounding of the 10 individual shares
    byDay.values.foreach { g =>
      assert(math.abs(g.map(_._4).sum - 1.0) < 1e-8)
    }
    assert(byDay("2024-01-01").forall(r => r._5.isEmpty && r._6.isEmpty),
      "first day has no previous distribution")
    assert(byDay("2024-01-02").forall(_._6 === Some(0.0)),
      "identical distributions must score exactly zero PSI")
    assert(byDay("2024-01-03").forall(_._6.exists(_ > 0.1)),
      "a mass shift into one bin must score positive PSI")
    // the shifted bin's count moved 1 -> 4
    assert(byDay("2024-01-03").find(_._2 == 9L).map(_._3) === Some(4L))
  }

  test("t35 code detect: keyword+punct+indent structure flags code, " +
    "prose with incidental if/for stays prose, exact signal counts") {
    val code = "def f() {\n  return 1;\n}"
    val prose = "if you wait for the train it will come for you in time"
    val docs = Seq((1L, code, "src0"), (2L, prose, "src0"))
      .toDF("doc_id", "text", "source")
      .withColumn("lang", lit("en"))
      .withColumn("n_chars", length($"text"))
    val dir = java.nio.file.Files.createTempDirectory("t35").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = DataOps.queries("t35_code_detect")(spark, dir)
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(2), r.getInt(3), r.getInt(4), r.getInt(5), r.getInt(6),
          r.getBoolean(8)))).toMap
    // code: kw {def, return}, punct {(,),{,;,}} = 5, one indented line
    assert(got(1L) === ((23, 5, 5, 2, 1, true)))
    // prose: if/for are NOT in the keyword list; zero structure
    assert(got(2L) === ((54, 0, 0, 0, 0, false)))
  }

  test("s11 sparse cosine: corpus-wide boilerplate carries ZERO score " +
    "mass (idf = ln(N/N) = 0), shared rare content pairs; repetition " +
    "amplifies where Jaccard saturates") {
    // boiler appears in EVERY doc -> its shingles have df = N and
    // idf = ln(1) = 0 EXACTLY, so they contribute nothing to any dot
    val boiler = "lorem ipsum dolor sit amet"
    val phrase = "quick brown fox jumps over lazy dog near river bank"
    val docs = Seq(
      (1L, s"$boiler $phrase"),
      (2L, s"$boiler solar panels convert light energy"),
      (3L, s"$boiler $phrase again today"),
      // 4 repeats the rare phrase many times: same shingle SET, but
      // far more tf mass concentrated on it
      (4L, s"$boiler " + Seq.fill(6)(phrase).mkString(" ") +
        " again today")
    ).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("s11").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = DataOps.queries("s11_sparse_cosine")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3))
      .toMap
    // doc 2 shares ONLY the boilerplate with everyone: its pairs are
    // all CANDIDATES (shared sub-cap shingles) but idf zeroes their
    // dot, so none may appear above τ
    assert(got.keySet.forall { case (a, b) => a != 2L && b != 2L },
      "boilerplate-only overlap must score exactly 0 under idf")
    // every pair of phrase-sharing docs is reported
    assert(got.keySet === Set((1L, 3L), (1L, 4L), (3L, 4L)))
    // 1 and 3 are near-verbatim: the top pair; 4's junk junction
    // shingles (tf=5, df=1) dilute its direction away from both
    assert(got((1L, 3L)) > got((1L, 4L)) &&
      got((1L, 3L)) > got((3L, 4L)))
  }

  test("s11 hot-shingle split: above-cap terms complete the dot " +
    "EXACTLY (identical docs score 1.0 only if hot mass is included); " +
    "hot-only overlap is never a candidate; pairs with no hot overlap " +
    "take the empty-completion path") {
    // maxDocFreq = 2 makes the two shingles shared by docs 1/2/3 HOT
    // (df = 3) while the rest stay sub-cap. The posting-intersection
    // rewrite computes each dot as (sub-cap share from candidate
    // generation) + (hot completion join) — this corpus exercises all
    // three branches of that split.
    val docs = Seq(
      (1L, "alpha beta gamma delta red green blue"),
      (2L, "alpha beta gamma delta red green blue"), // identical to 1
      (3L, "alpha beta gamma delta different tail words"),
      (4L, "totally unrelated content one two"),
      (5L, "totally unrelated content six seven")
    ).toDF("doc_id", "text")
    val got = Dedup.tfidfCosinePairs(docs, "doc_id", "text", n = 3,
        minCosine = 0.0, maxDocFreq = 2L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getDouble(3)))).toMap
    // (1,3)/(2,3) share ONLY the hot shingles -> not candidates (the
    // documented recall cap); (1,2) and (4,5) share sub-cap shingles
    assert(got.keySet === Set((1L, 2L), (4L, 5L)),
      "hot-only overlap must not generate a candidate pair")
    // identical docs: dot == norm² holds ONLY if the hot completion
    // contributes its decimal mass; n_common counts hot terms too
    // (3 sub-cap + 2 hot = 5 shared shingles)
    assert(got((1L, 2L)) === ((5L, 1.0)),
      "identical docs must score exactly 1.0 with all 5 shared shingles")
    // (4,5): one shared sub-cap shingle, NO shared hot shingle -> the
    // hot completion is empty and the zero-decimal coalesce must kick
    // in. Expected value mirrored by the engine's exact recipe:
    // w = round(tf·ln(N/df), 6) as DECIMAL, dot/norm² decimal sums,
    // sqrt+division in doubles, final round 9dp HALF_UP.
    import java.math.{BigDecimal => JBD, RoundingMode}
    def w(df: Long) =
      JBD.valueOf(math.log(5.0 / df)).setScale(6, RoundingMode.HALF_UP)
    val wT = w(2); val wO = w(1)
    val dot = wT.multiply(wT)
    val nsq = wT.multiply(wT).add(wO.multiply(wO)).add(wO.multiply(wO))
    val nrm = math.sqrt(nsq.doubleValue)
    val cos = JBD.valueOf(dot.doubleValue / (nrm * nrm))
      .setScale(9, RoundingMode.HALF_UP).doubleValue
    assert(got((4L, 5L)) === ((1L, cos)),
      "a no-hot-overlap pair must score its sub-cap dot exactly")
  }

  test("x07 curriculum: tercile thresholds stage docs easy to hard, " +
    "equal difficulty lands in the same stage") {
    // mean token lengths 2, 4, 8, 2: quantile_cont thresholds over
    // [2,2,4,8] are t1=2 (pos 1.0) and t2=4 (pos 2.0) exactly
    val docs = Seq(
      (1L, "aa aa aa"), (2L, "aaaa aaaa"),
      (3L, "aaaaaaaa aaaaaaaa"), (4L, "aa aa")
    ).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("x07").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = DataOps.queries("x07_curriculum")(spark, dir)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getLong(3)))).toMap
    assert(got === Map(
      1L -> ((3L, 2.0, 1L)), 4L -> ((2L, 2.0, 1L)),
      2L -> ((2L, 4.0, 2L)), 3L -> ((2L, 8.0, 3L))))
  }

  test("x08 budget plan: largest-remainder apportionment sums to the " +
    "budget; cutoff ties break by source name; empty sources get 0") {
    // quality weights A=2, B=2, C=3 (W=7): floors 28, 28, 42 (Σ=98),
    // remainders 4, 4, 6 → 2 top-ups go to C (rem 6) then A (rem 4,
    // tied with B, name-ascending) → allocs 29, 28, 43. Source D has
    // quality weight 0 (all docs under 5 tokens) → alloc 0.
    val good = "alpha beta gamma delta epsilon"
    val bad = "tiny doc"
    val docs = (
      (1 to 2).map(i => (s"A$i", "srcA", good)) ++
      (3 to 4).map(i => (s"B$i", "srcB", good)) ++
      (5 to 7).map(i => (s"C$i", "srcC", good)) ++
      Seq(("D1", "srcD", bad), ("D2", "srcD", bad))
    ).zipWithIndex.map { case ((_, src, t), id) => (id.toLong, src, t) }
      .toDF("doc_id", "source", "text")
    val dir = java.nio.file.Files.createTempDirectory("x08").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = DataOps.queries("x08_budget_plan")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    assert(got === Set(
      ("srcA", 2L, 2L, 28L, 29L),
      ("srcB", 2L, 2L, 28L, 28L),
      ("srcC", 3L, 3L, 42L, 43L),
      ("srcD", 2L, 0L, 0L, 0L)))
    assert(got.toSeq.map(_._5).sum === 100L)
  }

  test("sk03/sk04 count-min: engine equals an independent JVM md5 " +
    "reference at a collision-forcing width; est never undercounts; " +
    "counters merge by addition") {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString
    def pos(j: Int, tok: String, m: Int): Long =
      java.lang.Long.parseLong(md5hex(s"cm$j:$tok").take(8), 16) % m
    def grams3(t: String): Seq[String] = {
      val w = t.split(" ")
      if (w.length < 3) Seq.empty else w.sliding(3).map(_.mkString(" ")).toSeq
    }
    // two sources sharing a run of grams; >4 distinct grams per row of
    // a width-4 sketch forces collisions by pigeonhole
    val textA = "a b c d e f a b c d"   // 8 gram occurrences, 6 distinct
    val textB = "c d e f g h i j"       // shares "c d e" / "d e f"
    val docs = Seq((1L, "srcA", textA), (2L, "srcB", textB))
      .toDF("doc_id", "source", "text")
    val occA = grams3(textA); val occB = grams3(textB)
    val m = 4; val depth = 3
    def counters(occ: Seq[String]): Map[(Int, Long), Long] =
      occ.flatMap(g => (1 to depth).map(j => (j, pos(j, g, m))))
        .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val all = counters(occA ++ occB)
    def est(tok: String): Long =
      (1 to depth).map(j => all.getOrElse((j, pos(j, tok, m)), 0L)).min
    val truth = (occA ++ occB).groupBy(identity)
      .map { case (g, v) => g -> v.size.toLong }
    val ref3 = truth.map { case (g, t) => (g, t, est(g), est(g) - t) }.toSet
    // premise: the width-4 sketch actually overcounts somewhere
    assert(ref3.exists(_._4 > 0L), "collision premise vacuous")
    val got3 = DataOps.cmFreqEstimates(docs, width = m, depth = depth,
      topN = 40).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(got3 === ref3)
    // sk04 reference: per-source counters, inner-product min vs truth
    val cA = counters(occA); val cB = counters(occB)
    val refEst = (1 to depth).map { j =>
      (0L until m).map(p => cA.getOrElse((j, p), 0L) *
        cB.getOrElse((j, p), 0L)).sum
    }.min
    val refTrue = occA.groupBy(identity).map { case (g, v) =>
      v.size.toLong * occB.count(_ == g)
    }.sum
    assert(refEst >= refTrue)
    val got4 = DataOps.cmJoinSizes(docs, width = m, depth = depth)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toList
    assert(got4 === List(("srcA", "srcB", refEst, refTrue,
      refEst - refTrue)))
    // mergeability: counters(A ∪ B) = counters(A) + counters(B)
    // groupwise — the property the streaming ingest's merge rides
    def collectCtr(df: org.apache.spark.sql.DataFrame) =
      DataOps.cmCounters(DataOps.cmTokens(df), m, depth).collect()
        .map(r => (r.getString(0), r.getInt(1), r.getLong(2)) ->
          r.getLong(3)).toMap
    val half1 = docs.filter($"doc_id" === 1L)
    val half2 = docs.filter($"doc_id" === 2L)
    val merged = (collectCtr(half1).toSeq ++ collectCtr(half2).toSeq)
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).sum }
    assert(merged === collectCtr(docs))
    // real corpus: CM never undercounts, and the width-16384 lanes are
    // live (the 3-gram vocabulary exceeds the sketch width)
    val dir = sf("sf0.001")
    val corpus3 = DataOps.queries("sk03_cm_freq")(spark, dir)
      .collect().map(r => r.getLong(3))
    assert(corpus3.forall(_ >= 0L) && corpus3.exists(_ > 0L))
    val corpus4 = DataOps.queries("sk04_cm_join_size")(spark, dir)
      .collect().map(r => r.getLong(4))
    assert(corpus4.forall(_ >= 0L) && corpus4.exists(_ > 0L))
  }

  test("sk05 cm skew: F2 matches a JVM reference exactly (collision-free " +
    "width) and a hot key drives hot_ratio toward 1; the sketch never " +
    "undercounts on the real corpus") {
    // srcHot: one token repeated 13× → every 3-gram is "h h h" →
    // F2 = 11² = n², hot_ratio = 1.0 (the one-hot-key extreme).
    // srcFlat: 7 distinct tokens → 5 distinct grams once each →
    // F2 = n = 5, hot_ratio = 1/n (the uniform extreme). Tiny vocab at
    // width 16384 → no collisions → est == true == reference.
    val hot = (1 to 13).map(_ => "h").mkString(" ")
    val flat = "f1 f2 f3 f4 f5 f6 f7"
    val docs = Seq((1L, "srcHot", hot), (2L, "srcFlat", flat))
      .toDF("doc_id", "source", "text")
    val dir = java.nio.file.Files.createTempDirectory("sk05").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    def grams3(t: String): Seq[String] =
      t.split(" ").sliding(3).filter(_.length == 3)
        .map(_.mkString(" ")).toSeq
    def f2(t: String): Long = grams3(t).groupBy(identity)
      .map { case (_, v) => v.size.toLong * v.size }.sum
    val got = DataOps.queries("sk05_cm_skew")(spark, dir)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(6)))).toMap
    val nHot = grams3(hot).size.toLong
    val nFlat = grams3(flat).size.toLong
    assert(got("srcHot") === ((nHot, f2(hot), f2(hot),
      BigDecimal(f2(hot).toDouble / (nHot.toDouble * nHot))
        .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble)))
    assert(got("srcFlat") === ((nFlat, f2(flat), f2(flat),
      BigDecimal(f2(flat).toDouble / (nFlat.toDouble * nFlat))
        .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble)))
    // the hot source concentrates, the flat one doesn't
    assert(got("srcHot")._4 > 0.5 && got("srcFlat")._4 < 0.25)
    // real corpus: est >= true everywhere, collisions live somewhere
    val corpus = DataOps.queries("sk05_cm_skew")(spark, sf("sf0.001"))
      .collect().map(r => r.getLong(4))
    assert(corpus.forall(_ >= 0L) && corpus.exists(_ > 0L))
  }

  test("t38 pmi pairs: the planted collocation outranks independent " +
    "fillers and every row matches a JVM reference with identical " +
    "arithmetic") {
    // "nw yk" always adjacent; fillers f1..f4 rotate so their pairings
    // spread. All counts >= 5 by construction.
    val docs = (0 until 24).map { i =>
      (i.toLong, s"f${i % 4} nw yk f${(i + 1) % 4} f${(i + 2) % 4}")
    }.toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("t38").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    // independent reference
    val texts = (0 until 24).map(i =>
      s"f${i % 4} nw yk f${(i + 1) % 4} f${(i + 2) % 4}")
    val occ = texts.zipWithIndex.flatMap { case (t, doc) =>
      t.split(" ").zipWithIndex.map { case (tok, p) => (doc, p, tok) }
    }
    val uni = occ.groupBy(_._3).view.mapValues(_.size.toLong).toMap
    val n = occ.size.toLong
    val byDocPos = occ.map { case (doc, p, tok) => (doc, p) -> tok }.toMap
    val pairCounts = occ.flatMap { case (doc, p, a) =>
      Seq(1, 2).flatMap(o => byDocPos.get((doc, p + o)).map(b => (a, b)))
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
      .filter(_._2 >= 5L)
    val pTot = pairCounts.values.sum
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val ref = pairCounts.collect {
      case ((a, b), cab) if uni(a) >= 5 && uni(b) >= 5 =>
        (a, b, cab, r6(math.log((cab.toDouble * n.toDouble * n.toDouble) /
          (pTot.toDouble * uni(a).toDouble * uni(b).toDouble))))
    }.toSeq.sortBy(t => (-t._4, t._1, t._2)).take(60)
    val got = DataOps.queries("t38_pmi_pairs")(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3))).toSeq
    assert(got === ref)
    // the planted collocation is the top pair
    assert(got.head._1 === "nw" && got.head._2 === "yk")
  }

  test("o09 column profile: nulls counted, distincts exact, numeric " +
    "ranges in the double lane, string ranges in the string lane") {
    val ev = Seq(
      (1L, Some(10.5), 100L, "click", "{\"a\":1}", "2024-01-01 00:00:05"),
      (2L, None, 200L, "view", "{\"b\":2}", "2024-01-02 00:00:06"),
      (3L, Some(2.25), 100L, "click", "{\"a\":1}", "2024-01-03 00:00:07"))
      .toDF("event_id", "value", "user_id", "event_type", "props", "t")
      .withColumn("ts", to_timestamp($"t")).drop("t")
    val dir = java.nio.file.Files.createTempDirectory("o09").toString
    ev.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = DataOps.queries("o09_column_profile")(spark, dir)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        Option(r.get(3)), Option(r.get(4)), Option(r.get(5)),
        Option(r.get(6))))).toMap
    assert(got("value") === ((1L, 2L, Some(2.25), Some(10.5),
      None, None)))
    assert(got("user_id") === ((0L, 2L, Some(100.0), Some(200.0),
      None, None)))
    assert(got("event_type") === ((0L, 2L, None, None,
      Some("click"), Some("view"))))
    assert(got("props") === ((0L, 2L, None, None,
      Some("{\"a\":1}"), Some("{\"b\":2}"))))
    val ts = got("ts")
    assert(ts._1 === 0L && ts._2 === 3L &&
      (ts._4.get.asInstanceOf[Double] -
        ts._3.get.asInstanceOf[Double]) === 86400.0 * 2 + 2.0)
  }

  test("e08 truncation quality: a vector that only LOOKS close in the " +
    "first 16 dims displaces a true neighbor, and the overlap count " +
    "says exactly how much structure the cut destroyed") {
    // 20-dim space. X matches the probe perfectly in dims 1..16 but
    // carries a huge tail → full-dim cosine tiny, truncated cosine
    // 1.0. G1..G5 are honest near-neighbors everywhere. Full top-5 =
    // {G1..G5}; truncated top-5 = {X, G1..G4} → overlap 4.
    def v(head: Float, second: Float, tail: Float): Array[Float] = {
      val a = Array.fill(20)(0f)
      a(0) = head; a(1) = second; a(16) = tail; a
    }
    val vecs = (Seq(
      (0L, v(1f, 0f, 0f)),          // probe
      (9L, v(1f, 0f, 50f))) ++      // X: trunc-identical, far in full
      (1 to 5).map(i => (i.toLong, v(0.9f, 0.1f, 0f))))
      .map { case (id, a) => (id, a, 0) }
      .toDF("vec_id", "embedding", "label")
    val dir = java.nio.file.Files.createTempDirectory("e08").toString
    vecs.write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val got = DataOps.queries("e08_truncation_quality")(spark, dir)
      .filter($"probe_id" === 0L)
      .collect().map(r => (r.getLong(1), r.getDouble(2))).head
    assert(got === ((4L, 0.8)))
  }

  test("s13 filtered knn: a closer vector OUTSIDE the predicate never " +
    "appears — pre-filtering is exact where post-filtering a top-k " +
    "would lose it") {
    // probe 0 = (1,0,0,0). Vector 10 (label 1) sits at cos ≈ 0.995 —
    // closest overall — but only label-2 vectors may answer; the
    // label-2 winners are 20 (cos ≈ 0.9) then 21 (orthogonal-ish).
    val vecs = Seq(
      (0L, Array(1f, 0f, 0f, 0f), 2),
      (10L, Array(0.995f, 0.1f, 0f, 0f), 1),  // closest, WRONG label
      (20L, Array(0.9f, 0.44f, 0f, 0f), 2),
      (21L, Array(0.1f, 0.99f, 0f, 0f), 2))
      .toDF("vec_id", "embedding", "label")
    val dir = java.nio.file.Files.createTempDirectory("s13").toString
    vecs.write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val got = DataOps.queries("s13_filtered_knn")(spark, dir)
      .filter($"probe_id" === 0L)
      .collect().map(r => (r.getLong(1), r.getInt(3)))
    assert(got.toSet === Set((20L, 1), (21L, 2)))
    assert(!got.exists(_._1 == 10L),
      "the out-of-predicate vector must never answer")
  }

  test("x10 release manifest: per-shard checksum equals a JVM sha256 of " +
    "the numerically-sorted member ids; counts agree with x02") {
    val dir = sf("sf0.001")
    val members = DataOps.queries("x01_training_set")(spark, dir)
      .select($"doc_id", expr("first_chunk div 8").as("shard"),
        $"n_tokens")
      .collect().map(r => (r.getLong(1), r.getLong(0), r.getLong(2)))
    def sha(s: String): String =
      java.security.MessageDigest.getInstance("SHA-256")
        .digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString
    val ref = members.groupBy(_._1).map { case (shard, rows) =>
      shard -> ((rows.size.toLong, rows.map(_._3).sum,
        sha(rows.map(_._2).sorted.mkString(","))))
    }
    val got = DataOps.queries("x10_release_manifest")(spark, dir)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getString(3)))).toMap
    assert(got === ref)
    assert(got.nonEmpty)
  }

  test("x09 dataset card: mode ties break to the smaller lang, the t12 " +
    "quality predicate gates the pass rate, corpus shares sum to 1") {
    // srcA: 3 docs — en (6 distinct tokens, passes), en (passes),
    // de (4 tokens → FAILS the ≥5 gate) → top_lang en, pass 2/3,
    // n_langs 2, tokens (6,5,4) → p50 5. srcB: one 7-token doc.
    val long6 = "alpha beta gamma delta epsilon zeta"
    val long5 = "one two three four five"
    val short4 = "vier kurze worte hier"
    val long7 = "a b c d e f g"
    val docs = Seq(
      (1L, "srcA", "en", long6), (2L, "srcA", "en", long5),
      (3L, "srcA", "de", short4), (4L, "srcB", "fr", long7))
      .toDF("doc_id", "source", "lang", "text")
    val dir = java.nio.file.Files.createTempDirectory("x09").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = DataOps.queries("x09_dataset_card")(spark, dir)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getString(3), r.getLong(4), r.getDouble(5), r.getDouble(6),
        r.getDouble(7), r.getDouble(8)))).toMap
    assert(got === Map(
      "srcA" -> ((3L, 2L, "en", 15L, 5.0, 5.0, 0.666666667, 0.75)),
      "srcB" -> ((1L, 1L, "fr", 7L, 7.0, 7.0, 1.0, 0.25))))
    assert(math.abs(got.values.map(_._8).sum - 1.0) < 1e-9)
  }

  test("c06 semantic contamination: a planted paraphrase flags with its " +
    "bench anchor, orthogonal corpus stays clean, tied argmax picks the " +
    "smaller bench id") {
    // bench 53 is bench 0 scaled by 2 — cosine is invariant under
    // power-of-two scaling BIT-exactly (2a/(2|v|) = a/|v| in IEEE), so
    // every corpus vector ties between them and the heap's
    // (score desc, id asc) order must pick 0, never 53
    val vecs = Seq(
      (0L, Array(1f, 0f, 0f, 0f)),      // bench anchor A
      (53L, Array(2f, 0f, 0f, 0f)),     // bench: scaled copy of A
      (106L, Array(0f, 1f, 0f, 0f)),    // bench anchor B
      (1L, Array(0.9f, 0.1f, 0f, 0f)),  // near A → flagged via id 0
      (2L, Array(0.25f, 0.75f, 0f, 0f)), // near B → flagged via id 106
      (3L, Array(0f, 0f, 1f, 0f))       // orthogonal → stays clean
    ).map { case (id, v) => (id, v, 0) }
      .toDF("vec_id", "embedding", "label")
    val dir = java.nio.file.Files.createTempDirectory("c06").toString
    vecs.write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val got = DataOps.queries("c06_semantic_contamination")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 0L, 2L -> 106L))
    // real corpus: every emitted row clears the threshold
    val corpus = DataOps.queries("c06_semantic_contamination")(
      spark, sf("sf0.001")).collect().map(r => r.getDouble(2))
    assert(corpus.nonEmpty && corpus.forall(_ >= 0.35))
  }

  test("m07 silence runs: planted PCM patterns produce exact run algebra " +
    "(boundary sample is NOT silent, leading/trailing/all-silent cases); " +
    "decode round-trips sample-for-sample") {
    def wav(id: Long, samples: Array[Short]) =
      Multimodal.MediaBlob(id, "audio/wav",
        MediaCodec.encodeWav(samples, 8000))
    val media = Seq(
      // runs at idx 1..3 (len 3) and 5 (len 1); 255 silent, 256 NOT
      wav(1L, Array[Short](1000, 10, -255, 30, 256, 5, 1000)),
      wav(2L, Array[Short](0, 0, 0, 0)),          // all silent: one run
      wav(3L, Array[Short](300, -300, 2000)),     // no silence at all
      wav(4L, Array[Short](100, 999, -999, 50))   // leading + trailing
    ).toDS().toDF()
    val got = Multimodal.silenceRuns(media, 256).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))).toMap
    assert(got === Map(
      1L -> ((7L, 2L, 3L, 4L)),
      2L -> ((4L, 1L, 4L, 4L)),
      3L -> ((3L, 0L, 0L, 0L)),
      4L -> ((4L, 2L, 1L, 2L))))
    // decode round-trip: the samples that come back ARE the planted ones
    val plant = Array[Short](1000, 10, -255, 30, 256, 5, 1000)
    val back = Multimodal.decodeSamples(
        Seq(wav(9L, plant)).toDS().toDF())
      .collect().map(r => (r.getInt(1), r.getInt(2))).sortBy(_._1)
    assert(back.toSeq === plant.zipWithIndex.map {
      case (s, i) => (i, s.toInt) }.toSeq)
  }

  test("o08 aqp counts: the deterministic user sample matches a JVM md5 " +
    "reference, estimates scale by exactly 16, truth lane exact") {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString
    def inSample(uid: Long): Boolean =
      java.lang.Long.parseLong(md5hex(uid.toString).take(8), 16) % 16 == 0
    // 64 users × (uid % 3 + 1) events each, one type
    val events = (1L to 64L).flatMap { uid =>
      (0 until (uid % 3 + 1).toInt).map(k => (uid * 10 + k, uid))
    }
    val ev = events.toDF("event_id", "user_id")
      .withColumn("ts", to_timestamp(lit("2024-01-01 00:00:00")))
      .withColumn("event_type", lit("t"))
      .withColumn("value", lit(1.0)).withColumn("props", lit("{}"))
    val dir = java.nio.file.Files.createTempDirectory("o08").toString
    ev.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val sampledUsers = (1L to 64L).filter(inSample)
    assert(sampledUsers.nonEmpty, "sample premise vacuous")
    val nSample = events.count { case (_, uid) => inSample(uid) }.toLong
    val got = DataOps.queries("o08_aqp_counts")(spark, dir)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(5), r.getLong(6))).head
    assert(got === ((events.size.toLong, nSample, nSample * 16,
      64L, sampledUsers.size.toLong * 16)))
  }

  test("c07 split leakage: only users spanning the midpoint cutoff emit; " +
    "boundary day belongs to train") {
    // span 2024-01-01..2024-01-11 → cutoff = d0 + 10//2 = 2024-01-06.
    // user 1: events on 01 and 11 → leaks (1 train, 1 test).
    // user 2: events on 06 (the cutoff day — train side) only → clean.
    // user 3: events on 07 and 11 → test-only → clean.
    // user 4: 3 train (01,02,06) + 1 test (09) → test_frac 0.25.
    val rows = Seq(
      (1L, "2024-01-01"), (1L, "2024-01-11"),
      (2L, "2024-01-06"),
      (3L, "2024-01-07"), (3L, "2024-01-11"),
      (4L, "2024-01-01"), (4L, "2024-01-02"), (4L, "2024-01-06"),
      (4L, "2024-01-09"))
    val ev = rows.zipWithIndex.map { case ((u, day), id) =>
      (id.toLong, u, s"$day 10:00:00")
    }.toDF("event_id", "user_id", "t")
      .withColumn("ts", to_timestamp($"t")).drop("t")
      .withColumn("event_type", lit("t"))
      .withColumn("value", lit(1.0)).withColumn("props", lit("{}"))
    val dir = java.nio.file.Files.createTempDirectory("c07").toString
    ev.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = DataOps.queries("c07_split_leakage")(spark, dir)
      .collect().map(r => r.getLong(0) -> ((r.getDate(1).toString,
        r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(got === Map(
      1L -> (("2024-01-06", 1L, 1L, 0.5)),
      4L -> (("2024-01-06", 3L, 1L, 0.25))))
  }

  test("t37 js pairs: identical distributions score 0, a partial overlap " +
    "matches an independent JVM reference, fully-disjoint pairs are " +
    "absent by contract; corpus values stay inside [0, ln 2]") {
    def grams3(t: String): Seq[String] =
      t.split(" ").sliding(3).filter(_.length == 3)
        .map(_.mkString(" ")).toSeq
    def r(x: Double, dp: Int): Double =
      BigDecimal(x).setScale(dp, BigDecimal.RoundingMode.HALF_UP).toDouble
    // the engine's exact arithmetic, replicated independently
    def jsRef(ta: String, tb: String): Double = {
      val ca = grams3(ta).groupBy(identity).view.mapValues(_.size).toMap
      val cb = grams3(tb).groupBy(identity).view.mapValues(_.size).toMap
      val (na, nb) = (grams3(ta).size.toDouble, grams3(tb).size.toDouble)
      val inter = ca.keySet.intersect(cb.keySet).toSeq
      val ts = inter.map { g =>
        val p = ca(g) / na; val q = cb(g) / nb
        BigDecimal(r(p * r(math.log(2.0 * p / (p + q)), 6), 12) +
          r(q * r(math.log(2.0 * q / (p + q)), 6), 12))
      }.sum.toDouble
      val sca = inter.map(ca).sum.toDouble
      val scb = inter.map(cb).sum.toDouble
      r(0.5 * (ts + math.log(2.0) *
        ((1.0 - sca / na) + (1.0 - scb / nb))), 9)
    }
    val tX = "a b c d"            // grams: "a b c", "b c d"
    val tZ = "a b c e f g"        // shares "a b c"
    val tW = "q r s t"            // disjoint from all
    val docs = Seq((1L, "srcX", tX), (2L, "srcY", tX),
      (3L, "srcZ", tZ), (4L, "srcW", tW))
      .toDF("doc_id", "source", "text")
    val dir = java.nio.file.Files.createTempDirectory("t37").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = DataOps.queries("t37_js_pairs")(spark, dir)
      .collect().map(r0 => (r0.getString(0), r0.getString(1)) ->
        ((r0.getLong(2), r0.getDouble(3)))).toMap
    assert(got(("srcX", "srcY")) === ((2L, 0.0)))
    assert(got(("srcX", "srcZ")) === ((1L, jsRef(tX, tZ))))
    assert(got(("srcY", "srcZ")) === ((1L, jsRef(tX, tZ))))
    // disjoint pairs carry no row — the documented intersection contract
    assert(got.keySet === Set(("srcX", "srcY"), ("srcX", "srcZ"),
      ("srcY", "srcZ")))
    assert(jsRef(tX, tZ) > 0.0)
    // real corpus: JS is bounded by ln 2 and never negative
    val corpus = DataOps.queries("t37_js_pairs")(spark, sf("sf0.001"))
      .collect().map(_.getDouble(3))
    assert(corpus.nonEmpty &&
      corpus.forall(v => v >= 0.0 && v <= math.log(2.0) + 1e-9))
  }

  test("t36 effective tokens: a 2-way duplicate family counts once in " +
    "aggregate, singletons keep full weight") {
    val dup = "w1 w2 w3 w4 w5 w6"
    val uniq = "completely different words about storage"
    val docs = Seq(
      (1L, "srcA", dup), (2L, "srcA", dup),  // cluster of 2: eff 3+3
      (3L, "srcB", uniq))                    // singleton: eff 5
      .toDF("doc_id", "source", "text")
    val dir = java.nio.file.Files.createTempDirectory("t36").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = DataOps.queries("t36_effective_tokens")(spark, dir)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))).toMap
    assert(got === Map(
      "srcA" -> ((2L, 12L, 6.0, 0.5)),
      "srcB" -> ((1L, 5L, 5.0, 1.0))))
  }
}
