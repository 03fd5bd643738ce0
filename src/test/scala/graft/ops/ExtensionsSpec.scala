package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.Extensions

/** Extension-operator behavior beyond what the DuckDB oracle covers:
  * sketch equivalence, ANN recall, codegen expression, multimodal
  * batching, streaming/batch agreement.
  */
class ExtensionsSpec extends AnyFunSuite {

  private lazy val spark = graft.SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("minhash-LSH, simhash, and prefix-filter find exactly the brute-force pairs") {
    val brute = Extensions.queries("x_dedup_ngram_jaccard")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Extensions.queries("x_dedup_minhash_lsh")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val sim = Extensions.queries("x_dedup_simhash")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val pfx = Extensions.queries("x_dedup_ngram_prefix")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(brute.nonEmpty)
    assert(lsh == brute)
    assert(sim == brute)
    assert(pfx == brute)
  }

  test("IVF cell-blocked embedding near-dup: exact precision, bounded recall") {
    val emb = graft.engine.Tables.table(spark, sf, "embeddings")
    val exact = Dedup.embeddingCosinePairs(emb)
      .select("vec_a", "vec_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // nCells pinned: the adaptive √n default is sized for large
    // corpora; this spec tests the cell-blocking machinery itself
    val ann = Similarity.embeddingNearDupAnn(emb, nCells = 16)
      .select("vec_a", "vec_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // candidates pay the exact cosine, so every emitted pair is real
    assert(ann.subsetOf(exact), s"false pairs: ${ann -- exact}")
    val recall = (exact & ann).size.toDouble / exact.size
    assert(recall >= 0.3, s"embedding ANN recall $recall collapsed")
  }

  test("ANN quantizer sizing: ~sqrt(n) cells, clamped") {
    assert(Similarity.autoCells(100) == 16) // clamp floor
    assert(Similarity.autoCells(20000) == 141) // sqrt scaling
    assert(Similarity.autoCells(100000000L) == 4096) // clamp ceiling
    // the 10x-corpus blowup this prevents: fixed 16 cells at n=20k
    // put ~1250 vectors per cell; sqrt sizing holds per-cell
    // population to ~sqrt(n), keeping candidates O(n^1.5)
  }

  test("IVF ANN recall vs brute-force top-5 beats cell fraction") {
    val emb = graft.engine.Tables.table(spark, sf, "embeddings")
    val brute = Similarity.knnBrute(emb)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val ivf = Similarity.knnIvf(emb)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = (brute & ivf).size.toDouble / brute.size
    // probing 4 of 16 cells scans ~25% of the corpus; a working
    // quantizer concentrates true neighbors in probed cells
    assert(recall >= 0.3, s"IVF recall $recall")
  }

  test("kNN label propagation: majority vote with deterministic ties") {
    val sp = spark; import sp.implicits._
    // seed vectors 0-3: two axis-aligned clusters with labels 7 and 9
    // (and one mislabeled outlier in cluster A to force a 2-1 vote);
    // vectors 4-5 are unlabeled, one per cluster
    val emb = Seq(
      (0L, Array(1.0f, 0.02f, 0.05f), 7),
      (1L, Array(1.0f, 0.01f, 0.0f), 7),
      (2L, Array(0.99f, 0.0f, 0.02f), 9), // mislabeled outlier in A
      (3L, Array(0.0f, 1.0f, 0.0f), 9),
      (4L, Array(1.0f, 0.005f, 0.03f), -1), // unlabeled, cluster A
      (5L, Array(0.01f, 0.98f, 0.0f), -1) // unlabeled, cluster B
    ).toDF("vec_id", "embedding", "label")
    val out = Similarity.knnClassify(emb, k = 3, labeledMax = 4)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toList
    // vec 4's 3-NN are {0,1,2}: labels 7,7,9 -> majority 7 with 2 votes
    // vec 5's 3-NN include 3 (label 9) and two of cluster A; its top-1
    // is 3, but majority is the 2-vote cluster-A side: 7 beats 9 on
    // votes, proving the vote (not nearest-single) semantics
    assert(out == List((4L, 7, 2L), (5L, 7, 2L)))
    // the IVF cell-blocked form at nProbe == nCells scores every
    // labeled vector, so it must reproduce the exact path verbatim
    try {
      val ivf = Similarity
        .knnClassifyIvf(emb, k = 3, labeledMax = 4, nCells = 2, nProbe = 2,
          trainMod = 1)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toList
      assert(ivf == out)
    } finally Similarity.clearQuantizerCache()
  }

  test("IVF families over one corpus share a single memoized quantizer fit") {
    // the KMeans fit is the dominant cold constant of every IVF query
    // (~2 s at sf0.1); quantizerFor canonicalizes the training lineage
    // to (vec_id, fv) so the knn, classify, and quantized families all
    // hit ONE memo entry per (corpus, nCells) instead of refitting
    val emb = graft.engine.Tables.table(spark, "/root/testdata/sf0.001", "embeddings")
    try {
      Similarity.clearQuantizerCache()
      Similarity.knnIvf(emb, nCells = 16, nProbe = 16).count()
      assert(Similarity.quantizerCacheSize == 1)
      Similarity.knnClassifyIvf(emb, nCells = 16, nProbe = 16).count()
      assert(Similarity.quantizerCacheSize == 1,
        "classify must reuse the knnIvf quantizer, not refit")
      Similarity.knnQuantizedIvf(emb, nCells = 16, nProbe = 16).count()
      assert(Similarity.quantizerCacheSize == 1,
        "quantized must reuse the knnIvf quantizer, not refit")
      Similarity.embeddingNearDupAnn(emb, nCells = 16).count()
      assert(Similarity.quantizerCacheSize == 1,
        "ANN dedup must reuse the knnIvf quantizer, not refit")
    } finally Similarity.clearQuantizerCache()
  }

  test("PQ rerank equals brute top-k exactly at the covering candidate depth") {
    // the two-stage contract behind x_knn_pq_rerank's full brute
    // oracle: the PQ top-100 prefilter must cover every true top-5
    // neighbor on these corpora, after which the exact rerank output
    // is bit-identical to knnBrute (ordering, rounding, and all)
    try {
      for (sf <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
        val emb = graft.engine.Tables.table(spark, sf, "embeddings")
        val brute = Similarity.knnBrute(emb).collect().toSeq
        val pq = Pq.knnPqRerank(emb).collect().toSeq
        assert(pq == brute, s"PQ rerank diverged from brute at $sf")
      }
    } finally Pq.clearCodebookCache()
  }

  test("PQ codebooks memoize per corpus and codes stay in range") {
    import org.apache.spark.sql.functions._
    val emb = graft.engine.Tables.table(spark, "/root/testdata/sf0.001", "embeddings")
    try {
      Pq.clearCodebookCache()
      Pq.knnPqRerank(emb).count()
      assert(Pq.codebookCacheSize == 1)
      Pq.knnPqRerank(emb).count() // same corpus: no refit
      assert(Pq.codebookCacheSize == 1)
      // every vector carries m=16 codes, each addressing a real
      // centroid in [0, 32), and a strictly positive PQ norm
      val enc = Pq.encodedFor(emb)
      val bad = enc.filter(size(col("codes")) =!= 16
        || exists(col("codes"), c => c < 0 || c >= 32)
        || !(col("pq_norm") > 0d)).count()
      assert(bad == 0L)
      assert(Pq.codebookCacheSize == 1) // encode reused the same fit
    } finally Pq.clearCodebookCache()
  }

  test("IVF×PQ at full probes equals the full-scan PQ rerank (and brute)") {
    // the x_knn_pq_ivf_check contract: probing every cell makes the
    // cell-blocked candidate stream equal the full PQ scan's, so the
    // composed output must be bit-identical to both siblings; at
    // partial probes the composition still returns k rows per query
    val emb = graft.engine.Tables.table(spark, "/root/testdata/sf0.001", "embeddings")
    try {
      val brute = Similarity.knnBrute(emb).collect().toSeq
      val full = Pq.knnPqIvf(emb, nCells = 16, nProbe = 16).collect().toSeq
      assert(full == brute)
      val partial = Pq.knnPqIvf(emb, nCells = 16, nProbe = 4)
      assert(partial.groupBy("query_id").count().collect()
        .forall(_.getLong(1) == 5L))
    } finally {
      Pq.clearCodebookCache()
      Similarity.clearQuantizerCache()
    }
  }

  test("native pq_encode emits the same codes as the HOF argmin, element for element") {
    import org.apache.spark.sql.functions._
    try {
      for (sf <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
        val emb = graft.engine.Tables.table(spark, sf, "embeddings")
        val diverged = Pq.encodedBoth(emb)
          .filter(col("codes_native") =!= col("codes_hof")).count()
        assert(diverged == 0L, s"pq_encode drifted from the HOF argmin at $sf")
      }
    } finally Pq.clearCodebookCache()
  }

  test("native adc_dot pq_norm equals the HOF lookup-sum fold, bit for bit") {
    try {
      for (sf <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
        val emb = graft.engine.Tables.table(spark, sf, "embeddings")
        Pq.pqNormBoth(emb).collect().foreach { r =>
          assert(java.lang.Double.doubleToRawLongBits(r.getDouble(1))
            == java.lang.Double.doubleToRawLongBits(r.getDouble(2)),
            s"pq_norm drifted from the HOF fold at $sf: " +
              s"${r.getDouble(1)} != ${r.getDouble(2)} (vec ${r.getLong(0)})")
        }
      }
    } finally Pq.clearCodebookCache()
  }

  test("PQ prefilter covers the true neighbors with margin at the default depth") {
    // the contract behind reusing brute's oracle: if quantizer drift
    // ever pushes a true top-5 neighbor toward the 400-candidate
    // boundary, this margin check reddens BEFORE the driver gate does
    import org.apache.spark.sql.functions._
    try {
      for (sf <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
        val emb = graft.engine.Tables.table(spark, sf, "embeddings")
        val brute = Similarity.knnBrute(emb)
          .select(col("query_id"), col("neighbor_id"))
        val worst = brute
          .join(Pq.prefilterRanks(emb, 5, 16, 32, 1),
            Seq("query_id", "neighbor_id"))
          .agg(max(col("crk"))).head().getInt(0)
        assert(worst <= 200, s"covering margin eroded at $sf: worst=$worst")
      }
      // the depth the contract leans on scales with the corpus: fixed
      // 400 at fixture sizes, n/5 past 2,000 (at the 10× ScaleGen
      // corpus the worst true rank is 1,148 — a fixed fixture-tuned
      // depth would silently break brute-equality there)
      assert(Pq.autoCandidates(500) == 400)
      assert(Pq.autoCandidates(2000) == 400)
      assert(Pq.autoCandidates(20000) == 4000)
    } finally Pq.clearCodebookCache()
  }

  test("IVF classify emits NULL (not a dropped row) when probed cells hold no seeds") {
    val sp = spark; import sp.implicits._
    // seeds 0-1 sit in the +x cluster; unlabeled 2 is +x (covered),
    // unlabeled 3 is +y — its single probed cell contains no seeds
    val emb = Seq(
      (0L, Array(1.0f, 0.0f), 7),
      (1L, Array(0.99f, 0.01f), 7),
      (2L, Array(0.98f, 0.02f), -1),
      (3L, Array(0.0f, 1.0f), -1)
    ).toDF("vec_id", "embedding", "label")
    try {
      val out = Similarity
        .knnClassifyIvf(emb, k = 5, labeledMax = 2, nCells = 2, nProbe = 1,
          trainMod = 1)
        .collect()
        .map(r => (r.getLong(0),
          if (r.isNullAt(1)) None else Some(r.getInt(1)))).toList
      // every unlabeled vector appears; the uncovered one is flagged
      // NULL instead of silently missing from the output
      assert(out == List((2L, Some(7)), (3L, None)), out.toString)
    } finally Similarity.clearQuantizerCache()
  }

  test("keepBestPerCluster keeps the highest-quality member, not the min id") {
    val sp = spark; import sp.implicits._
    val base = (1 to 12).map(i => s"w$i").mkString(" ")  // 12 distinct words
    val fuller = base + " extra"                          // 13 — near-dup, better
    val docs = Seq((10L, base), (20L, fuller),
      (30L, "completely different words here now ok")).toDF("doc_id", "text")
    try {
      val rs = Dedup.keepBestPerCluster(docs).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3)))
      // cluster 10 = {10, 20}: doc 20 wins on score (13 > 12) despite
      // the larger id; doc 30 is a singleton representative of itself
      assert(rs.toSeq == Seq((10L, 20L, 13, 2L), (30L, 30L, 6, 1L)))
    } finally { Dedup.clearPairCache(); Dedup.clearShingleCache() }
  }

  test("streaming LSH candidate pairs equal the batch banding across micro-batches") {
    val docs = graft.engine.Tables.table(spark, sf, "documents")
    val dir = java.nio.file.Files.createTempDirectory("docs-lsh-stream").toString
    // 4 files + maxFilesPerTrigger=1 forces pairs to span micro-batch
    // boundaries, exercising bucket state surviving batches
    docs.repartition(4).write.mode("overwrite").parquet(dir)
    val q = graft.streaming.StreamingDedup.streamingMinhashPairs(
      spark, dir, docs.schema, "lsh_pairs_stream", maxFilesPerTrigger = 1)
    try q.processAllAvailable() finally q.stop()
    val rows = spark.table("lsh_pairs_stream").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val streamed = rows.toSet
    // exactly-once to the sink: a multi-band collision must not reach
    // a downstream verifier more than once
    assert(rows.length == streamed.size,
      s"sink received ${rows.length - streamed.size} duplicate pair rows")
    try {
      val batch = Dedup.minhashCandidates(
          Dedup.shingled(docs), leftMax = Long.MaxValue, bands = 32, rowsPerBand = 2)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(batch.nonEmpty, "fixture must contain banded candidates")
      assert(streamed == batch,
        s"streaming-only: ${streamed -- batch}; batch-only: ${batch -- streamed}")
    } finally Dedup.clearShingleCache()
  }

  test("minhash pairs TTL: bucket occupants past the id lag evicted, spanning pairs knowingly lost") {
    val sp = spark; import sp.implicits._
    // four IDENTICAL documents (same shingles → same buckets in every
    // band); controlled arrival order via one file per micro-batch
    val text = (1 to 8).map(i => s"w$i").mkString(" ")
    def rows(ids: Long*) = ids
      .map(id => (id, text, "en", "src", text.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val all = rows(1L, 2L, 1000L, 5L)
    val dir = java.nio.file.Files
      .createTempDirectory("docs-lsh-stream-ttl").toString
    def ship(batch: org.apache.spark.sql.DataFrame): Unit = {
      batch.coalesce(1).write.mode("append").parquet(dir)
      Thread.sleep(1100)
    }
    ship(rows(1L, 2L)); ship(rows(1000L)); ship(rows(5L))
    val q = graft.streaming.StreamingDedup.streamingMinhashPairs(
      spark, dir, all.schema, "lsh_pairs_stream_ttl",
      maxFilesPerTrigger = 1, ttlIdLag = 10)
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("lsh_pairs_stream_ttl").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // doc 1000's arrival pairs it with the still-live 1 and 2, THEN
    // pushes them past the horizon; doc 5 can only meet the surviving
    // 1000 — (1,5)/(2,5) are the knowingly-lost cost of bounded state
    assert(got == Set((1L, 2L), (1L, 1000L), (2L, 1000L), (5L, 1000L)))
  }

  test("Misra-Gries heavy hitters: certified-exact top-k, hostile capacity throws") {
    val sp = spark; import sp.implicits._
    // skewed stream: "hot" dominates, mid-frequency terms, long tail
    val rnd = new scala.util.Random(7)
    val words = Seq.fill(300)("hot") ++ Seq.fill(80)("warm") ++
      Seq.fill(40)("mild") ++ (1 to 400).map(i => s"tail${rnd.nextInt(200)}")
    val docs = rnd.shuffle(words).grouped(20).zipWithIndex
      .map { case (ws, i) => (i.toLong, ws.mkString(" ")) }
      .toSeq.toDF("doc_id", "text")
    // unigram equivalent via the trigram machinery is awkward here;
    // drive the sketch+gate directly through topTrigramsSketch on the
    // fixture instead, and the aggregator's bound on the hand stream
    val mg = docs.select(TextOps.words(col("text")).as("ws"))
      .select(explode(col("ws")).as("w"))
      .select(graft.functions.Sketches.freqItems(col("w"), 16).as("mg"))
      .select(col("mg.items"), col("mg.debt")).head()
    val items = mg.getSeq[String](0).toSet
    val debt = mg.getLong(1)
    // the MG guarantee: an absent item's true count is <= debt
    val truth = words.groupBy(identity).view.mapValues(_.size).toMap
    truth.foreach { case (w, n) =>
      if (!items.contains(w))
        assert(n <= debt, s"absent '$w' has count $n > debt $debt")
    }
    assert(items.contains("hot") && items.contains("warm"))

    // end-to-end on the corpus fixture: certified-exact == exact path
    val exact = Extensions.queries("x_corpus_top_trigrams")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val sketch = Extensions.queries("x_corpus_top_trigrams_sketch")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(sketch == exact)

    // hostile capacity: the gate must throw a named error, never
    // return unproven hitters. capacity < k is rejected up front
    val tooSmall = intercept[IllegalArgumentException] {
      CorpusStats.topTrigramsSketch(
        graft.engine.Tables.table(spark, sf, "documents"), capacity = 4)
    }
    assert(tooSmall.getMessage.contains("capacity >= k"))
    // capacity >= k but far below the vocabulary: uncertifiable
    val e = intercept[IllegalArgumentException] {
      CorpusStats.topTrigramsSketch(
        graft.engine.Tables.table(spark, sf, "documents"), capacity = 32)
    }
    assert(e.getMessage.contains("raise capacity"))
  }

  test("MG sketch refuses a truncated top-k even when surviving counts clear the debt") {
    val sp = spark; import sp.implicits._
    // 2 heavy trigrams (df 100) + ~1000 singleton trigrams: with
    // capacity 8 >= k 5, the sketch keeps only the heavy survivors,
    // so fewer than k candidate rows exist while each clears the
    // debt — certifying would silently drop ranks 3..5
    val rnd = new scala.util.Random(5)
    val hot = (1 to 100).map(i => (i.toLong, "alpha beta gamma delta"))
    val tail = (1 to 500).map(i =>
      (1000L + i, (1 to 4).map(_ => s"w${rnd.nextInt(100000)}").mkString(" ")))
    val docs = (hot ++ tail).toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      CorpusStats.topTrigramsSketch(docs, k = 5, capacity = 8)
    }
    assert(e.getMessage.contains("candidate rows") ||
      e.getMessage.contains("raise capacity"))
    // and with enough capacity the same corpus certifies and matches
    // the exact path
    val exact = CorpusStats.topTrigrams(docs, k = 5).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    val certified = CorpusStats.topTrigramsSketch(docs, k = 5, capacity = 4096)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(certified == exact)
  }

  test("mixtureDrift zero-fills one-sided cells so vanished strata alarm") {
    val sp = spark; import sp.implicits._
    val cur = Seq((1L, "a", "en"), (2L, "a", "en")).toDF("doc_id", "source", "lang")
    val prev = Seq((3L, "a", "en"), (4L, "b", "fr"), (5L, "b", "fr"),
      (6L, "b", "fr")).toDF("doc_id", "source", "lang")
    val rs = CorpusStats.mixtureDrift(cur, prev).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3), r.getLong(4), r.getDouble(5),
          r.getDouble(6))).toMap
    assert(rs(("a", "en")) == ((2L, 1.0, 1L, 0.25, 0.75)))
    // (b, fr) vanished from the incoming batch: zero-filled, not dropped
    assert(rs(("b", "fr")) == ((0L, 0.0, 3L, 0.75, -0.75)))
  }

  test("dimensionProfile flags collapsed and saturated dimensions") {
    val sp = spark; import sp.implicits._
    // dim 0 varies, dim 1 always 0 (collapsed), dim 2 = the max-abs
    // component on every row (saturated at code 127)
    val emb = Seq(
      (1L, Seq(0.5f, 0.0f, 1.0f)),
      (2L, Seq(-0.25f, 0.0f, 0.5f)),
      (3L, Seq(0.1f, 0.0f, 0.2f))).toDF("vec_id", "embedding")
    val rs = Quantize.dimensionProfile(emb).collect()
      .map(r => r.getInt(0) ->
        (r.getLong(1), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    // (n, min, max, n_zero) per dim
    assert(rs(1) == ((3L, 0L, 0L, 3L)), "collapsed dim: all-zero codes")
    assert(rs(2) == ((3L, 127L, 127L, 0L)), "saturated dim pinned at 127")
    assert(rs(0)._2 < rs(0)._3, "live dim keeps spread")
  }

  test("duplicateSpans: cross-doc windows only, merged-interval coverage") {
    val sp = spark; import sp.implicits._
    // w=3: docs 1 and 2 share "a b c" (d1 pos0 / d2 pos1) and
    // "b c d" (d1 pos1 / d2 pos2); doc 3 is clean; doc 4 repeats a
    // trigram WITHIN itself only, which must not count as duplicated
    val docs = Seq(
      (1L, "a b c d e f"),
      (2L, "x a b c d y"),
      (3L, "q r s t u v"),
      (4L, "m n o m n o m n o")).toDF("doc_id", "text")
    val rs = Dedup.duplicateSpans(docs, w = 3).collect()
      .map(r => r.getLong(0) ->
        (r.getInt(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    // d1: hits at pos {0,1} -> cov = (1-0) + 3 = 4 words (a b c d)
    assert(rs(1L) == ((6, 2L, 4L, 4.0 / 6)))
    // d2: hits at pos {1,2} -> 4 words (a b c d)
    assert(rs(2L) == ((6, 2L, 4L, 4.0 / 6)))
    assert(rs(3L) == ((6, 0L, 0L, 0.0)))
    assert(rs(4L) == ((9, 0L, 0L, 0.0)), "within-doc repeats excluded")
  }

  test("spanRemove deletes exactly the covered tokens, preserves order and spacing tokens") {
    val sp = spark; import sp.implicits._
    // same sharing structure as the duplicateSpans fixture, plus a
    // doc with a doubled space (split yields an empty token — the
    // canonical re-join must reproduce it) and a fully-covered doc
    val docs = Seq(
      (1L, "a b c d e f"),        // covered: a b c d -> "e f"
      (2L, "x a b c d y"),        // covered: a b c d -> "x y"
      (3L, "q r  s t u v"),       // clean, double space survives re-join
      (4L, "m n o m n o m n o"),  // within-doc repeats only: untouched
      (5L, "a b c"),              // whole doc = shared trigram -> ""
      (6L, "z a b c z2"))         // shares "a b c" with 1/2/5
      .toDF("doc_id", "text")
    val rs = Dedup.spanRemove(docs, w = 3).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3)))
      .toMap
    assert(rs(1L) == ((6L, 4L, "e f")))
    assert(rs(2L) == ((6L, 4L, "x y")))
    assert(rs(3L) == ((7L, 0L, "q r  s t u v")), "double space must round-trip")
    assert(rs(4L) == ((9L, 0L, "m n o m n o m n o")))
    assert(rs(5L) == ((3L, 3L, "")), "fully covered doc empties")
    assert(rs(6L) == ((5L, 3L, "z z2")))
    // removal is a FIXED POINT: cleaning the cleaned corpus changes
    // nothing (deletion only shortens docs, never splices new dups)
    val cleaned = Dedup.spanRemove(docs, w = 3)
      .select(col("doc_id"), col("clean_text").as("text"))
    val again = Dedup.spanRemove(cleaned, w = 3)
      .select(col("doc_id"), col("clean_text").as("text"))
    assert(cleaned.exceptAll(again).isEmpty && again.exceptAll(cleaned).isEmpty)
  }

  test("spanRemove and decontaminateRemove equal brute references on a randomized high-collision corpus") {
    val sp = spark; import sp.implicits._
    // tiny alphabet + short docs -> dense cross-doc trigram sharing,
    // overlapping windows, whole-doc removals, length-1/2 docs with
    // no grams at all; seeded so failures reproduce
    val rnd = new scala.util.Random(1234)
    // ~1700 possible trigrams vs ~1200 drawn: roughly half the grams
    // collide cross-doc, so docs mix duplicated and unique windows
    val vocab = ('a' to 'l').map(_.toString).toVector
    val corpus = (1L to 120L).map(i =>
      i -> Seq.fill(1 + rnd.nextInt(20))(vocab(rnd.nextInt(vocab.size)))
        .mkString(" "))
    val w = 3
    def gramsOf(t: String): Seq[(Int, String)] = {
      val ws = t.split(" ", -1)
      (0 to ws.length - w).map(p => p -> ws.slice(p, p + w).mkString(" "))
    }
    def removeRef(keep: Seq[(Long, String)], dupStarts: Map[Long, Seq[Int]])
        : Map[Long, (Long, Long, String)] =
      keep.map { case (id, t) =>
        val ws = t.split(" ", -1)
        val cov = dupStarts.getOrElse(id, Nil)
          .flatMap(p => p until math.min(p + w, ws.length)).toSet
        id -> ((ws.length.toLong, cov.size.toLong,
          ws.zipWithIndex.collect { case (tok, i) if !cov(i) => tok }
            .mkString(" ")))
      }.toMap
    // --- spanRemove reference: grams in >= 2 distinct docs
    val docGrams = corpus.map { case (id, t) => id -> gramsOf(t) }
    val byGram = docGrams.flatMap { case (id, gs) => gs.map(g => g._2 -> id) }
      .groupBy(_._1).map { case (g, xs) => g -> xs.map(_._2).distinct }
    val dupStarts = docGrams.map { case (id, gs) =>
      id -> gs.collect { case (p, g) if byGram(g).size >= 2 => p }
    }.toMap
    val wantSpan = removeRef(corpus, dupStarts)
    val docs = corpus.toDF("doc_id", "text")
    val gotSpan = Dedup.spanRemove(docs, w).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap
    assert(gotSpan == wantSpan)
    assert(wantSpan.values.exists(_._3.isEmpty), "corpus must fully empty some doc")
    assert(wantSpan.values.exists(v => v._2 > 0 && v._3.nonEmpty),
      "corpus must partially clean some doc")
    // --- decontaminateRemove reference: windows present in the bench slice
    val (bench, rest) = corpus.partition(_._1 <= 20)
    val benchGrams = bench.flatMap(b => gramsOf(b._2)).map(_._2).toSet
    val deconStarts = rest.map { case (id, t) =>
      id -> gramsOf(t).collect { case (p, g) if benchGrams(g) => p }
    }.toMap
    val wantDecon = removeRef(rest, deconStarts)
    val gotDecon = Dedup.decontaminateRemove(
        docs.filter(col("doc_id") > 20), docs.filter(col("doc_id") <= 20), w)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap
    assert(gotDecon == wantDecon)
  }

  test("withinDocRemove keeps the FIRST occurrence, collapses stutter, ignores cross-doc echoes") {
    val sp = spark; import sp.implicits._
    val docs = Seq(
      (1L, "a b c X a b c Y"),      // 2nd "a b c" (grams idx 5) removed
      (2L, "a a a a a"),            // stutter: windows 2,3 flagged -> keep "a"
      (3L, "p q r s t u"),          // echo-free: untouched
      (4L, "a b c d e f"))          // shares "a b c" with doc 1 — WITHIN only
      .toDF("doc_id", "text")
    val rs = Dedup.withinDocRemove(docs, w = 3).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap
    assert(rs(1L) == ((8L, 3L, "a b c X Y")))
    assert(rs(2L) == ((5L, 4L, "a")))
    assert(rs(3L) == ((6L, 0L, "p q r s t u")))
    assert(rs(4L) == ((6L, 0L, "a b c d e f")),
      "cross-doc repeats are spanRemove's job, not this one's")
    // fixture sanity: the corpus contains real within-doc echoes at w=3
    val touched = Dedup.withinDocRemove(
        graft.engine.Tables.table(spark, sf, "documents"))
      .filter(col("n_removed") > 0).count()
    assert(touched > 0, "fixture must contain within-doc repeats")
  }

  test("withinDocRemove in-row sort equals the naive prefix probe on randomized docs") {
    val sp = spark; import sp.implicits._
    val w = 2
    val rnd = new scala.util.Random(7)
    // tiny vocab forces heavy gram repetition (adjacent-duplicate runs
    // in the sort); varied lengths cover the empty/short-doc guards
    val rows = (1L to 60L).map { i =>
      val n = rnd.nextInt(40)
      i -> (0 until n).map(_ => s"w${rnd.nextInt(6)}").mkString(" ")
    }
    def ref(text: String): (Long, Long, String) = {
      val ws = text.split(" ")
      val gs =
        if (ws.length >= w) (0 to ws.length - w).map(j => ws.slice(j, j + w).toSeq)
        else Seq.empty
      val seen = scala.collection.mutable.HashSet[Seq[String]]()
      val cov = scala.collection.mutable.SortedSet[Int]()
      gs.zipWithIndex.foreach { case (g, j0) =>
        if (!seen.add(g)) cov ++= (j0 + 1 to j0 + w)
      }
      val clean = ws.zipWithIndex
        .collect { case (t, i0) if !cov.contains(i0 + 1) => t }.mkString(" ")
      (ws.length.toLong, cov.size.toLong, clean)
    }
    val got = Dedup.withinDocRemove(rows.toDF("doc_id", "text"), w).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap
    rows.foreach { case (id, text) =>
      assert(got(id) == ref(text), s"doc $id: '$text'")
    }
  }

  test("decontaminateRemove deletes exactly the benchmark-overlapping windows") {
    val sp = spark; import sp.implicits._
    val bench = Seq(
      (1L, "alpha beta gamma delta epsilon zeta")).toDF("doc_id", "text")
    val corpus = Seq(
      // contains bench 5-gram "alpha..epsilon" at 0-based pos 1 only
      (100L, "pre alpha beta gamma delta epsilon post tail more words"),
      (101L, "nothing shared here at all okay"),
      // the whole doc IS a benchmark window
      (102L, "beta gamma delta epsilon zeta")).toDF("doc_id", "text")
    val rs = Dedup.decontaminateRemove(corpus, bench)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(rs.keySet == Set(100L, 101L, 102L),
      "benchmark docs must not appear in the output")
    assert(rs(100L) == ((10L, 5L, "pre post tail more words")))
    assert(rs(101L) == ((6L, 0L, "nothing shared here at all okay")))
    assert(rs(102L) == ((5L, 5L, "")))
  }

  test("cluster-safe splits: near-dup pairs never straddle a train/eval cut") {
    val asg = Extensions.queries("x_split_cluster_safe")(spark, sf)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(3))))
      .toMap
    val docs = graft.engine.Tables.table(spark, sf, "documents")
    assert(asg.size == docs.count(), "annotate-don't-filter: every doc splits")
    val pairs = Extensions.queries("x_dedup_minhash_lsh")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty, "fixture must contain near-dup pairs")
    pairs.foreach { case (a, b) =>
      assert(asg(a)._1 == asg(b)._1 && asg(a)._2 == asg(b)._2,
        s"near-dup pair ($a,$b) must share cluster and split: ${asg(a)} ${asg(b)}")
    }
    assert(asg.values.map(_._2).toSet == Set("train", "val", "test"),
      "500 docs must populate all three splits")
  }

  test("embeddingOutliers flags exactly the strict type-1 tails") {
    val sp = spark; import sp.implicits._
    // per-vector scaling makes selfq shape-dependent: (1,1,0)-shaped
    // vectors all land at 32258 whatever their magnitude; one
    // (1,0,0) sits low at 16129 and one (1,1,1) high at 48387. n=100:
    // lo rank ceil(100/50)=2 and hi rank ceil(49*100/50)=98 both
    // select 32258, so exactly the two strict outliers flag.
    val rows =
      Seq(1L -> Seq(5f, 0f, 0f), 100L -> Seq(2f, 2f, 2f)) ++
        (2L to 99L).map(i => i -> Seq(i.toFloat, i.toFloat, 0f))
    val got = Quantize.embeddingOutliers(rows.toDF("vec_id", "embedding"))
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getInt(4)))).toMap
    assert(got.size == 100)
    assert(got(1L) == ((16129L, 32258L, 32258L, 1)), s"low tail: ${got(1L)}")
    assert(got(100L) == ((48387L, 32258L, 32258L, 1)), s"high tail: ${got(100L)}")
    assert(got.collect { case (id, (_, _, _, 1)) => id }.toSet == Set(1L, 100L))
  }

  test("embeddingOutliersSketch agrees with the exact audit and carries no single-task window") {
    val emb = graft.engine.Tables.table(spark, sf, "embeddings")
    val exact = Quantize.embeddingOutliers(emb).collect()
      .map(r => r.getLong(0) -> r.getInt(4)).toMap
    val sk = Quantize.embeddingOutliersSketch(emb)
    val sketch = sk.collect().map(r => r.getLong(0) -> r.getInt(4)).toMap
    assert(sketch.keySet == exact.keySet,
      "annotate-don't-filter: sketch form must emit every vector too")
    val agree = sketch.count { case (id, f) => exact(id) == f }
    assert(agree.toDouble / sketch.size >= 0.99,
      s"sketch flags must track the exact audit: $agree/${sketch.size}")
    // the scale claim itself: the sketch plan must contain NO window
    // (the exact form's threshold pass sorts the corpus in one
    // window task — exactly what this operator exists to avoid)
    val plan = sk.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"),
      s"sketch plan must be window-free:\n$plan")
    // and the check gate holds: every ok flag is 1
    val check = Quantize.embeddingOutliersSketchCheck(emb).collect()
    assert(check.length == 2 && check.forall(_.getInt(5) == 1),
      s"sketch thresholds must sit inside the exact envelope: ${check.toSeq}")
  }

  test("capPerGroup: salted two-phase rank equals the naive global window") {
    val sp = spark; import sp.implicits._
    val rnd = new scala.util.Random(11)
    // 200 rows over 3 groups + a NULL group; scores collide on purpose
    // so the id tie-break matters
    val rows = (1L to 200L).map(i =>
      (i, if (i % 17 == 0) None else Some(s"g${i % 3}"), rnd.nextInt(20)))
    val df = rows.toDF("id", "grp", "score")
    val capped = Sampling.capPerGroup(df, "grp", "id", "score", n = 5, salts = 8)
      .collect().map(r => (Option(r.get(1)).map(_.toString),
        r.getLong(0), r.getInt(3))).toSet
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("grp")).orderBy(col("score").desc_nulls_last, col("id"))
    val naive = df.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 5).collect()
      .map(r => (Option(r.get(1)).map(_.toString),
        r.getLong(0), r.getInt(3))).toSet
    assert(capped == naive, "salt prune must be lossless")
    assert(capped.count(_._1.isEmpty) == 5, "NULL group capped like any other")
  }

  test("quantized IVF at nProbe == nCells equals knnQuantized bit-for-bit") {
    val emb = graft.engine.Tables.table(spark, sf, "embeddings")
    try {
      val full = Quantize.knnQuantized(emb).collect().toSeq
      val ivf = Similarity.knnQuantizedIvf(emb, nCells = 4, nProbe = 4,
        trainMod = 2).collect().toSeq
      assert(full == ivf)
    } finally Similarity.clearQuantizerCache()
  }

  test("quantized IVF at production probes keeps most of the quantized top-k") {
    val emb = graft.engine.Tables.table(spark, sf, "embeddings")
    try {
      val full = Quantize.knnQuantized(emb).collect()
        .map(r => (r.getLong(0), r.getLong(2))).toSet
      val ivf = Similarity.knnQuantizedIvf(emb, nCells = 4, nProbe = 2,
        trainMod = 2).collect()
        .map(r => (r.getLong(0), r.getLong(2))).toSet
      // soft sanity only — correctness is the bit-exact
      // nProbe == nCells test above. On THIS corpus (600 random unit
      // vectors, cosine structure ≈ noise) recall at half the cells
      // hovers at the half-the-corpus floor and moves a few points
      // with the particular quantizer optimum: the round-14 MLlib
      // draw measured ≥0.5, the round-15 deterministic kmeans++ draw
      // 0.48 — same machinery, different (equally converged) local
      // optimum. The floor below catches a BROKEN probe path (wrong
      // cells ≈ probed-mass recall well under the floor), not
      // optimizer luck.
      val recall = (full & ivf).size.toDouble / full.size
      assert(recall >= 0.45, s"recall $recall")
    } finally Similarity.clearQuantizerCache()
  }

  test("LSH ANN recall vs brute-force top-5 is reasonable") {
    val brute = Similarity.knnBrute(graft.engine.Tables.table(spark, sf, "embeddings"))
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val lsh = Similarity.knnLsh(graft.engine.Tables.table(spark, sf, "embeddings"))
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = (brute & lsh).size.toDouble / brute.size
    assert(recall >= 0.2, s"LSH recall $recall collapsed — bucketing is broken")
    // and LSH scored strictly fewer candidates than brute force would
    assert(lsh.size <= brute.size + 25)
  }

  test("LSH ANN multi-probe plans as a hash join on bucket, not a nested loop") {
    val plan = Similarity.knnLsh(graft.engine.Tables.table(spark, sf, "embeddings"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected hash join on bucket:\n$plan")
    assert(!plan.contains("NestedLoop"), s"nested loop crept back into knnLsh:\n$plan")
  }

  test("rolling_hash: codegen result matches a reference implementation") {
    graft.functions.RollingHash.register(spark)
    import spark.implicits._
    val got = Seq("abc", "", "hello world", "日本語")
      .toDF("s").select(expr("rolling_hash(s)")).collect().map(_.getLong(0))
    def ref(s: String): Long =
      s.getBytes("UTF-8").foldLeft(0L)((h, b) => h * 1000003L + b)
    assert(got.toSeq == Seq(ref("abc"), ref(""), ref("hello world"), ref("日本語")))
  }

  test("rolling_hash property: codegen == reference over arbitrary strings") {
    graft.functions.RollingHash.register(spark)
    import spark.implicits._
    def ref(s: String): Long =
      s.getBytes("UTF-8").foldLeft(0L)((h, b) => h * 1000003L + b)
    // arbitrary well-formed strings, multi-byte heavy (lone surrogates
    // excluded: String→UTF-8 replaces them, which is an encoding
    // question, not a hash one)
    val charGen = org.scalacheck.Gen.frequency(
      5 -> org.scalacheck.Gen.alphaNumChar,
      2 -> org.scalacheck.Gen.oneOf('é', 'ß', 'ü', 'λ', 'Ж'),
      2 -> org.scalacheck.Gen.oneOf('日', '本', '語', '中', '文'),
      1 -> org.scalacheck.Gen.oneOf(' ', '\t', '\n', '"', '\\', '\u0000'))
    val strGen = org.scalacheck.Gen.listOf(charGen).map(_.mkString)
    val prop = org.scalacheck.Prop.forAll(
      org.scalacheck.Gen.listOfN(20, strGen)) { ss: List[String] =>
      val got = ss.toDF("s").select(expr("rolling_hash(s)"))
        .collect().map(_.getLong(0)).toList
      got == ss.map(ref)
    }
    val result = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(10), prop)
    assert(result.passed, result.status.toString)
  }

  test("multimodal plumbing: binary payloads + batch decoder, schema intact") {
    import spark.implicits._
    val df = Seq((1L, "hello"), (2L, ""), (3L, "x" * 1000))
      .toDF("id", "s")
      .select(col("id"), encode(col("s"), "UTF-8").as("payload"))
      .repartition(2) // decoder must work per-partition
    val out = Multimodal.withMediaMeta(df, "payload")
    assert(out.schema("media").dataType == Multimodal.MediaMetaType)
    val byId = out.select("id", "media.width", "media.n_frames")
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2))).toMap
    assert(byId(1L) == (5, 'h'.toInt & 0x0f))
    assert(byId(2L) == (0, 0))
    assert(byId(3L) == (1000 % 640, 'x'.toInt & 0x0f))
    // frame sampling over the decoded metadata
    val sampled = Multimodal.sampleFrames(out)
    assert(sampled.schema.fieldNames.contains("sampled_frames"))
    assert(sampled.count() == 3)
  }

  test("multimodal edge cases: null payloads are total; zero frames sample empty; " +
    "a skipping decoder errors instead of misaligning") {
    import spark.implicits._
    val df = Seq((1L, Some("abc")), (2L, None))
      .toDF("id", "s")
      .select(col("id"), encode(col("s"), "UTF-8").as("payload"))
    // null payload → the zero-byte fallback row, not an NPE
    val metas = Multimodal.withMediaMeta(df, "payload")
      .select("id", "media.n_frames")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(metas(2L) == 0)
    // n_frames = 0 → no sampled frames (there is no frame 0)
    val sampled = Multimodal.sampleFrames(Multimodal.withMediaMeta(df, "payload"))
      .select("id", "sampled_frames")
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(sampled(2L).isEmpty && sampled(1L) == Seq(0))
    // null payload through resize → null, not a task failure
    val resizedNull = Multimodal.resizeImages(df, "payload")
      .filter(col("id") === 2L).select("resized").head()
    assert(resizedNull.isNullAt(0))
    // a decoder that drops a payload must fail loudly (1:1 contract)
    val skipping = new Multimodal.Decoder {
      override def decodeBatch(p: Iterator[Array[Byte]]): Iterator[org.apache.spark.sql.Row] =
        p.drop(1).map(_ => org.apache.spark.sql.Row("bad", 0, 0, 0))
    }
    val e = intercept[org.apache.spark.SparkException] {
      Multimodal.withMediaMeta(df, "payload", skipping).collect()
    }
    assert(e.getMessage.contains("1:1") ||
      Option(e.getCause).exists(_.getMessage.contains("1:1")))
  }

  test("as-of join ignores right rows with a NULL time") {
    import spark.implicits._
    val left = Seq((1L, 5L)).toDF("k", "t")
    val right = Seq((1L, Some(3L), "real"), (1L, None, "phantom"))
      .toDF("k", "rt", "p")
      .select(col("k"), col("rt").cast("long").as("rt"), col("p"))
    val got = AsofJoin.asof(left, right, "k", "k", "t", "rt", payload = Seq("p"))
      .select("p").head().getString(0)
    assert(got == "real")
    // with ONLY a null-time right row, the left row matches nothing
    val rightNull = Seq((1L, Option.empty[Long], "phantom"))
      .toDF("k", "rt", "p")
    val none = AsofJoin.asof(left, rightNull, "k", "k", "t", "rt", payload = Seq("p"))
      .select("p").head()
    assert(none.isNullAt(0))
  }

  test("wrong-arity SQL calls to injected functions raise a named error") {
    val e = intercept[Exception] {
      spark.sql("SELECT dot_d(array(1.0))").collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Seq.empty else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(m => m.contains("dot_d") && m.contains("2 argument")))
  }

  test("containment catches the subset-duplicate the Jaccard cut structurally misses") {
    val sp = spark; import sp.implicits._
    // short doc quoted WHOLE inside a 4x-longer doc: containment of
    // the smaller = 1.0 while Jaccard ~ short/long < 1/2
    val short = (1 to 10).map(i => s"s$i").mkString(" ")
    val long = short + " " + (1 to 40).map(i => s"pad$i").mkString(" ")
    val docs = Seq((1L, short), (2L, long),
      (3L, "entirely unrelated other text here")).toDF("doc_id", "text")
    try {
      val cont = Dedup.containmentPairs(docs).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      assert(cont.toSeq == Seq((1L, 2L, 1.0)),
        "the quoted-whole pair must surface at containment 1.0")
      // the same pair fails the family's symmetric Jaccard cut
      val jac = Dedup.ngramJaccardBrute(docs).collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      assert(!jac.contains((1L, 2L)),
        "fixture must actually be the case Jaccard misses")
      // threshold is a validated rational
      intercept[IllegalArgumentException](Dedup.containmentPairs(docs, 3, 2))
      // plan: candidates come from the shingle equi-join, never a
      // cartesian
      val p = Dedup.containmentPairs(docs).queryExecution.executedPlan.toString
      assert(!p.contains("CartesianProduct") &&
        !p.contains("BroadcastNestedLoopJoin"), p)
    } finally { Dedup.clearPairCache(); Dedup.clearShingleCache() }
  }

  test("curation v4: all four verdict classes fire with first-match precedence") {
    val sp = spark; import sp.implicits._
    // the synthetic corpus can never produce 'contained' (a contained
    // doc there always shares the 3-word prefix and drops as 'exact'
    // first) or 'short' — this fixture exercises every class:
    //   1 small template (its grams recur in 4)      -> boilerplate
    //   2 byte-copy of 1                             -> exact
    //   3 two words, no trigrams                     -> short
    //   4 own prefix + the whole template + fresh    -> contained
    //   5 fresh unrelated text                       -> keep
    val template = (1 to 8).map(i => s"t$i").mkString(" ")
    val docs = Seq(
      (1L, template),
      (2L, template),
      (3L, "xx yy"),
      (4L, (1 to 6).map(i => s"u$i").mkString(" ") + " " + template + " " +
        (1 to 30).map(i => s"fresh$i").mkString(" ")),
      (5L, (1 to 40).map(i => s"novel$i").mkString(" ")))
      .map { case (id, text) => (id, text, "en", "src", text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("curation-v4").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    try {
      val got = Extensions.queries("x_pipeline_curation_v4")(spark, dir)
        .collect().map(r => r.getLong(0) ->
          ((r.getInt(1), Option(r.getString(2))))).toMap
      assert(got(1L) == ((0, Some("boilerplate"))))
      assert(got(2L) == ((0, Some("exact"))))
      assert(got(3L) == ((0, Some("short"))))
      assert(got(4L) == ((0, Some("contained"))))
      assert(got(5L) == ((1, None)))
    } finally { Dedup.clearPairCache(); Dedup.clearShingleCache() }
  }

  test("capped containment: ubiquitous grams leave the index, survivors keep TRUE values") {
    val sp = spark; import sp.implicits._
    // boilerplate: the same licence-header text on docs 1..6 (gram df
    // 6 > cap 3); docs 1 and 2 are boilerplate-ONLY near-dups; docs
    // 10/11 share rare content grams
    val boiler = (1 to 8).map(i => s"lic$i").mkString(" ")
    val content = (1 to 10).map(i => s"body$i").mkString(" ")
    val docs = (
      (1L to 6L).map(id => (id, boiler + s" tail$id only")) ++ Seq(
        (10L, content),
        (11L, content + " extra trailing words here"))).toDF("doc_id", "text")
    try {
      val exact = Dedup.containmentPairs(docs).collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
      val capped = Dedup.containmentPairsCapped(docs, maxGramDf = 3).collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
      // the content pair survives the cap WITH its exact value
      assert(capped.contains((10L, 11L)))
      assert(capped((10L, 11L)) == exact((10L, 11L)))
      assert(capped((10L, 11L)) == 1.0)
      // boilerplate-only pairs are the KNOWING loss: exact finds them,
      // the capped index never generates them
      assert(exact.keys.exists(p => p._1 <= 6 && p._2 <= 6))
      assert(!capped.keys.exists(p => p._1 <= 6 && p._2 <= 6))
      // with a cap nothing exceeds, the two forms are identical
      val wide = Dedup.containmentPairsCapped(docs, maxGramDf = 1000).collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
      assert(wide == exact)
      intercept[IllegalArgumentException](
        Dedup.containmentPairsCapped(docs, maxGramDf = 0))
    } finally { Dedup.clearPairCache(); Dedup.clearShingleCache() }
  }

  test("gram novelty: boilerplate scores 0 ppm, fresh text 1e6, trigram-less docs NULL") {
    val sp = spark; import sp.implicits._
    val template = "the same template text repeated verbatim again"
    val docs = Seq(
      (1L, template), (2L, template), // every trigram shared → 0 ppm
      (3L, "completely novel wording nobody else uses"), // all unique → 1e6
      (4L, "too short"), // < 3 words: no trigrams → NULL ppm
      (5L, template + " plus a fresh unique tail")) // mixed
      .toDF("doc_id", "text")
    try {
      val got = CorpusStats.gramNovelty(docs).collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) -1L else r.getLong(3)))).toMap
      assert(got(1L)._3 == 0L && got(2L)._3 == 0L)
      assert(got(3L) == ((4L, 4L, 1000000L)))
      assert(got(4L) == ((0L, 0L, -1L)), "no trigrams → NULL ppm, not a dropped row")
      // doc 5: template trigrams are shared (df>=2), the tail's are
      // unique to it — strictly between 0 and 1e6
      assert(got(5L)._3 > 0L && got(5L)._3 < 1000000L)
      assert(got(5L)._1 > got(1L)._1, "doc 5 has more grams than the bare template")
    } finally { Dedup.clearPairCache(); Dedup.clearShingleCache() }
  }

  test("NFC-normalized exact dedup catches a decomposed-form duplicate; default off misses it") {
    import spark.implicits._
    // visually identical, byte-different: precomposed U+00E9 vs
    // e + combining U+0301 — the NfcNorm motivating scenario
    val docs = Seq(
      (1L, "caf\u00e9 r\u00e9sum\u00e9 body one"),
      (2L, "cafe\u0301 re\u0301sume\u0301 body two"),
      (3L, "plain ascii text here")).toDF("doc_id", "text")
    val off = Dedup.exactByPrefix(docs)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(off.size == 3, "without normalization the decomposed twin survives apart")
    assert(off.values.forall(_ == 1L))
    val on = Dedup.exactByPrefix(docs, normalize = true)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(on.size == 2, "with the NFC fold both variants land on one key")
    assert(on("caf\u00e9 r\u00e9sum\u00e9 body") == (1L, 2L))
    // the fingerprint pre-step folds the same way
    val fps = docs.select(
      TextOps.fingerprintMd5(col("text"), normalize = true).as("fp"))
      .collect().map(_.getString(0))
    assert(fps.distinct.size == 3) // bodies differ → fingerprints differ
    val fpPair = Seq((1L, "caf\u00e9"), (2L, "cafe\u0301")).toDF("id", "text")
      .select(TextOps.fingerprintMd5(col("text"), normalize = true).as("fp"))
      .collect().map(_.getString(0))
    assert(fpPair.distinct.size == 1, "same text modulo composition → same fingerprint")
  }

  test("repeat dedup calls hit the pair memo (same pinned result back)") {
    val docs = graft.engine.Tables.table(spark, sf, "documents")
    assert(Dedup.minhashLsh(docs) eq Dedup.minhashLsh(docs))
  }

  test("ImageIoDecoder decodes real PNG/JPEG dimensions; non-images fall back") {
    import spark.implicits._
    // real images rendered in-test via the same JDK imageio that decodes
    def imageBytes(w: Int, h: Int, fmt: String): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      (0 until w).foreach(x => img.setRGB(x, 0, x * 31))
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, fmt, out)
      out.toByteArray
    }
    val df = Seq(
      (1L, imageBytes(17, 9, "png")),
      (2L, imageBytes(320, 200, "jpg")),
      (3L, "not an image at all".getBytes("UTF-8")))
      .toDF("id", "payload")
      .repartition(2)
    val out = Multimodal.withMediaMeta(df, "payload", Multimodal.ImageIoDecoder)
      .select(col("id"), col("media.format"), col("media.width"),
        col("media.height"), col("media.n_frames"))
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getInt(2), r.getInt(3), r.getInt(4))).toMap
    assert(out(1L) == ("png", 17, 9, 1))
    assert(out(2L) == ("jpeg", 320, 200, 1))
    assert(out(3L) == ("stub", 19 % 640, (19 / 2) % 480, 'n'.toInt & 0x0f))
  }

  test("AudioIoDecoder parses an in-test-rendered WAV header; MediaIoDecoder routes modalities") {
    import spark.implicits._
    // a real 16-bit mono 8 kHz WAV rendered via the same JDK sound
    // SPI that parses it back: 400 PCM frames of a square-ish wave
    def wavBytes(frames: Int, rate: Float, channels: Int): Array[Byte] = {
      val fmt = new javax.sound.sampled.AudioFormat(rate, 16, channels, true, false)
      val pcm = new Array[Byte](frames * fmt.getFrameSize)
      pcm.indices.foreach(i => pcm(i) = ((i % 64) - 32).toByte)
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, frames.toLong)
      val out = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
      out.toByteArray
    }
    def pngBytes(w: Int, h: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", out)
      out.toByteArray
    }
    val df = Seq(
      (1L, wavBytes(400, 8000f, 1)),
      (2L, wavBytes(123, 44100f, 2)),
      (3L, pngBytes(17, 9)),
      (4L, "neither image nor audio".getBytes("UTF-8")))
      .toDF("id", "payload").repartition(2)
    // the audio-only decoder: WAVs parse, the png falls back
    val audio = Multimodal.withMediaMeta(df, "payload", Multimodal.AudioIoDecoder)
      .select(col("id"), col("media.format"), col("media.width"),
        col("media.height"), col("media.n_frames"))
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getInt(2), r.getInt(3), r.getInt(4))).toMap
    assert(audio(1L) == ("wave", 8000, 1, 400))
    assert(audio(2L) == ("wave", 44100, 2, 123))
    assert(audio(3L)._1 == "stub", "an image must not parse as audio")
    // the mixed decoder routes each payload to its real codec
    val mixed = Multimodal.withMediaMeta(df, "payload", Multimodal.MediaIoDecoder)
      .select(col("id"), col("media.format"), col("media.width"),
        col("media.height"), col("media.n_frames"))
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getInt(2), r.getInt(3), r.getInt(4))).toMap
    assert(mixed(1L) == ("wave", 8000, 1, 400))
    assert(mixed(3L) == ("png", 17, 9, 1))
    assert(mixed(4L)._1 == "stub", "garbage stays total via the stub row")
  }

  test("magic-byte sniff routes every modality; text payloads take the codec-free stub path") {
    import Multimodal.sniffModality
    def png = {
      val img = new java.awt.image.BufferedImage(
        4, 4, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", out)
      out.toByteArray
    }
    def jpg = {
      val img = new java.awt.image.BufferedImage(
        4, 4, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", out)
      out.toByteArray
    }
    def wav = {
      val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(new Array[Byte](32)), fmt, 16L)
      val out = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
      out.toByteArray
    }
    // real rendered containers sniff to their modality
    assert(sniffModality(png) == 'i')
    assert(sniffModality(jpg) == 'i')
    assert(sniffModality(wav) == 'a')
    // hand-built magics for the containers this box can't render
    assert(sniffModality("GIF89a-rest".getBytes("US-ASCII")) == 'i')
    assert(sniffModality("BM0000".getBytes("US-ASCII")) == 'i')
    assert(sniffModality(Array[Byte]('I', 'I', 0x2a, 0, 1, 2)) == 'i') // TIFF LE
    assert(sniffModality(Array[Byte]('M', 'M', 0, 0x2a, 1, 2)) == 'i') // TIFF BE
    assert(sniffModality(Array[Byte](0, 0, 40, 40)) == 'i') // WBMP candidate
    assert(sniffModality("FORMxxxxAIFF".getBytes("US-ASCII")) == 'a')
    assert(sniffModality(".snd0000".getBytes("US-ASCII")) == 'a')
    // text / short / null payloads sniff 'o' — by construction they
    // dispatch straight to the stub: no ImageIO stream, no audio-SPI
    // exception, per row (the round-12 8x x_multimodal_meta regression)
    assert(sniffModality("The quick brown fox".getBytes("UTF-8")) == 'o')
    assert(sniffModality("RIFFxxxxDATA".getBytes("US-ASCII")) == 'o') // RIFF but not WAVE
    assert(sniffModality("FO".getBytes("US-ASCII")) == 'o')
    assert(sniffModality(Array.emptyByteArray) == 'o')
    assert(sniffModality(null) == 'o')
    // end-to-end: a pure-text corpus through the mixed decoder lands
    // entirely on the deterministic stub rows (the gate-query shape)
    import spark.implicits._
    val texts = (1 to 64).map(i => (i.toLong, s"document number $i body".getBytes("UTF-8")))
    val out = Multimodal.withMediaMeta(
        texts.toDF("id", "payload").repartition(3), "payload",
        Multimodal.MediaIoDecoder)
      .select(col("media.format")).distinct().collect()
    assert(out.map(_.getString(0)).toSeq == Seq("stub"))
  }

  test("imageFeatures: exact channel means on controlled pixels; non-images NULL") {
    import spark.implicits._
    // pixels we control exactly: PNG is lossless, so the integer
    // channel means are fully determined
    def png(pixels: Seq[Seq[Int]]): Array[Byte] = {
      val h = pixels.length; val w = pixels.head.length
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, pixels(y)(x))
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", out)
      out.toByteArray
    }
    val redBlue = png(Seq(Seq(0xff0000, 0x0000ff))) // 2x1: red, blue
    val gray = png(Seq(Seq(0x808080, 0x808080), Seq(0x808080, 0x808080)))
    // CORRUPT payloads behind a VALID magic: the sniff routes them to
    // the codec, which throws (often UNCHECKED — AIOOBE on truncated
    // bodies, CMMException on bad profiles); the total contract says
    // they land as NULL features, never a task failure
    val truncatedPng = redBlue.take(20)
    val jpegGarbage = Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte) ++
      "garbage after a JPEG magic".getBytes("UTF-8")
    val df = Seq(
      (1L, redBlue),
      (2L, gray),
      (3L, "not an image".getBytes("UTF-8")),
      (4L, null.asInstanceOf[Array[Byte]]),
      (5L, truncatedPng),
      (6L, jpegGarbage))
      .toDF("id", "payload").repartition(2)
    val got = Multimodal.imageFeatures(df, "payload")
      .select(col("id"), col("img_features")).collect()
      .map(r => r.getLong(0) -> Option(r.getStruct(1))
        .map(s => (s.getInt(0), s.getInt(1), s.getInt(2), s.getInt(3), s.getInt(4))))
      .toMap
    // (255+0)/2 = 127 (integer div), green 0, blue 127
    assert(got(1L).contains((2, 1, 127, 0, 127)))
    assert(got(2L).contains((2, 2, 0x80, 0x80, 0x80)))
    assert(got(3L).isEmpty && got(4L).isEmpty)
    assert(got(5L).isEmpty && got(6L).isEmpty)

    // the same corrupt payloads are total through the metadata chain
    val meta = Multimodal.withMediaMeta(
      Seq((5L, truncatedPng), (6L, jpegGarbage)).toDF("id", "payload"),
      "payload", Multimodal.MediaIoDecoder)
      .select(col("id"), col("media.format")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // fallback rows, not exceptions (format is the deterministic stub's)
    assert(meta.size == 2)
  }

  test("resizeImages downscales into the box; small and non-image payloads handled") {
    import spark.implicits._
    def imageBytes(w: Int, h: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", out)
      out.toByteArray
    }
    val df = Seq(
      (1L, imageBytes(320, 200)), // above the box → scaled
      (2L, imageBytes(40, 30)), // inside the box → untouched
      (3L, "plain text".getBytes("UTF-8"))) // not an image → null
      .toDF("id", "payload").repartition(2)
    val resized = Multimodal.resizeImages(df, "payload", maxW = 100, maxH = 100)
    val decoded = Multimodal.withMediaMeta(
        resized.filter(col("resized").isNotNull)
          .select(col("id"), col("resized").as("payload")),
        "payload", Multimodal.ImageIoDecoder)
      .select(col("id"), col("media.width"), col("media.height"))
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2))).toMap
    assert(decoded(1L) == (100, 63)) // 200 * (100/320) = 62.5 → round 63
    assert(decoded(2L) == (40, 30))
    val nulls = resized.filter(col("resized").isNull).select("id").collect()
    assert(nulls.map(_.getLong(0)).toSeq == Seq(3L))
  }

  test("streaming tumbling agg equals the batch form (watermark + AvailableNow)") {
    val events = graft.engine.Tables.table(spark, sf, "events")
    val dir = java.nio.file.Files.createTempDirectory("events-stream").toString
    events.write.mode("overwrite").parquet(dir)
    val q = graft.streaming.EventWindows.streamingTumblingHourly(
      spark, dir, events.schema, "stream_out")
    try q.processAllAvailable() finally q.stop()
    // full-row parity: counts AND the value aggregate (a streaming
    // form that silently dropped sum_value would still pass a
    // count-only check). Counts compare exactly; the double sum
    // compares within a rounding-boundary tolerance — batch and
    // streaming accumulate partials in different orders, so a sum
    // sitting on a .xx5 boundary can round differently by one ulp's
    // worth, and exact equality would flake.
    val streamed = spark.table("stream_out")
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n").as("n_s"), col("sum_value").as("sv_s"))
    val batch = graft.streaming.EventWindows.tumblingHourly(events)
      .select(col("window_start"), col("event_type"),
        col("n").as("n_b"), col("sum_value").as("sv_b"))
    val joined = streamed.join(batch, Seq("window_start", "event_type"), "full_outer")
    // the null disjuncts are load-bearing: abs(null - x) > t is SQL
    // NULL and would silently drop a row that exists on one side only
    // or nulled its sum on one side
    val divergent = joined.filter(
      col("n_s").isNull || col("n_b").isNull || col("n_s") =!= col("n_b")
        || (col("sv_s").isNull =!= col("sv_b").isNull)
        || abs(col("sv_s") - col("sv_b")) > lit(0.011))
      .collect()
    assert(divergent.isEmpty, divergent.mkString("; "))
  }

  test("streaming sliding windows equal the batch form") {
    // counts only (no float sums), so the parity check is exact
    val events = graft.engine.Tables.table(spark, sf, "events")
    val dir = java.nio.file.Files.createTempDirectory("events-sliding").toString
    events.write.mode("overwrite").parquet(dir)
    val q = graft.streaming.EventWindows.streamingSlidingTwoHour(
      spark, dir, events.schema, "sliding_out")
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("sliding_out")
      .select(col("window.start").as("window_start"), col("event_type"), col("n"))
    val batch = graft.streaming.EventWindows.slidingTwoHour(events)
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
  }

  test("stateful streaming retention equals the batch form across micro-batches") {
    val events = graft.engine.Tables.table(spark, sf, "events")
    val dir = java.nio.file.Files.createTempDirectory("events-retention").toString
    // several files + maxFilesPerTrigger=1: state (cohort + day set)
    // must survive batches, and a batch carrying an earlier first
    // event must rewrite the user's cohort via the snapshot emission
    events.repartition(4).write.mode("overwrite").parquet(dir)
    val q = graft.streaming.EventWindows.streamingRetention(
      spark, dir, events.schema, "retention_out", maxFilesPerTrigger = 1)
    try q.processAllAvailable() finally q.stop()
    val snap = spark.table("retention_out")
    // keep each user's latest snapshot (max version), then aggregate
    val byUser = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id"))
    val latest = snap
      .withColumn("maxv", max(col("version")).over(byUser))
      .filter(col("version") === col("maxv"))
    val streamed = latest.groupBy(col("cohort_day"), col("day_offset"))
      .agg(countDistinct(col("user_id")).as("n_users"))
    val batch = Extensions.queries("x_events_retention")(spark, sf)
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
  }

  test("stateful streaming sessionization equals the batch form") {
    val events = graft.engine.Tables.table(spark, sf, "events")
    val dir = java.nio.file.Files.createTempDirectory("events-sessions").toString
    events.write.mode("overwrite").parquet(dir)
    val q = graft.streaming.EventWindows.streamingUserSessions(
      spark, dir, events.schema, "session_out")
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("session_out")
    val batch = graft.streaming.EventWindows.userSessions(events)
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
  }

  test("session_window streaming sessionization equals the batch form") {
    // the watermark-tolerant alternative to mapGroupsWithState the
    // ordering-contract scaladoc points to — per-user summaries folded
    // from the per-session sink rows must equal userSessions exactly
    val events = graft.engine.Tables.table(spark, sf, "events")
    val dir = java.nio.file.Files.createTempDirectory("events-sessionw").toString
    events.write.mode("overwrite").parquet(dir)
    val q = graft.streaming.EventWindows.streamingSessionWindows(
      spark, dir, events.schema, "sessionw_out")
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("sessionw_out")
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_sessions"),
        max(col("n_events")).as("max_session_events"))
    val batch = graft.streaming.EventWindows.userSessions(events)
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
  }

  test("session_window append mode: watermark-closed sessions emitted exactly once") {
    // the eviction contract of the real-unbounded shape: a session is
    // emitted once its watermark passes its end, never re-emitted, and
    // trailing sessions the watermark never closes are withheld. The
    // phases are written WHILE the query runs with
    // `processAllAvailable()` barriers between them — the only
    // arrival-order control that doesn't lean on file mod-time
    // ordering (pinned mod-times proved non-deterministic here):
    //   A: user 1 sessions [00:00,00:50) n=3 and [01:30,02:00) n=1,
    //      user 2 session [00:05,00:35) n=1           (max ET 01:30)
    //   B: users 1,3 events at 10:00+ — advances the watermark to
    //      08:05, past every phase-A session end → they emit
    // Phase B sessions end at 10:35+ > final watermark → withheld.
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("events-sessionw-append").toString
    def ts(s: String) = java.sql.Timestamp.valueOf(s"2026-01-01 $s")
    val phaseA = Seq(
      (1L, ts("00:00:00")), (1L, ts("00:10:00")), (1L, ts("00:20:00")),
      (1L, ts("01:30:00")),
      (2L, ts("00:05:00"))).toDF("user_id", "ts")
    val phaseB = Seq(
      (3L, ts("10:00:00")), (3L, ts("10:05:00")),
      (1L, ts("10:00:00"))).toDF("user_id", "ts")
    phaseA.coalesce(1).write.mode("append").parquet(dir)
    val q = graft.streaming.EventWindows.streamingSessionWindows(
      spark, dir, phaseA.schema, "sessionw_append",
      outputMode = "append", availableNow = false)
    try {
      q.processAllAvailable()
      phaseB.coalesce(1).write.mode("append").parquet(dir)
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("sessionw_append")
      .select(col("user_id"), col("session.start").cast("string").as("s"),
        col("session.end").cast("string").as("e"), col("n_events"))
      .collect()
    val got = rows.map(r =>
      (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))).toSet
    val expected = Set(
      (1L, "2026-01-01 00:00:00", "2026-01-01 00:50:00", 3L),
      (1L, "2026-01-01 01:30:00", "2026-01-01 02:00:00", 1L),
      (2L, "2026-01-01 00:05:00", "2026-01-01 00:35:00", 1L))
    // row count == set size pins exactly-once (no duplicate emission
    // across batches); set equality pins both the closed-session
    // payload and the withholding of the unclosed 10:00+ sessions
    assert(rows.length == 3, s"expected 3 emissions, got ${rows.toSeq}")
    assert(got == expected, s"got $got")
  }

  test("tumbling append mode drops late rows behind the watermark") {
    // the other half of the eviction contract: an event arriving AFTER
    // the watermark has passed its window must be dropped, not merged
    // or re-emitted. Phases written while the query runs, barriered by
    // processAllAvailable (see the session-window append spec):
    //   A: hour-00 views (1.0, 2.0) + hour-01 click (1.5)  (max ET 01:30)
    //   B: hour-10 view — advances the watermark to 08:00, closing and
    //      emitting the hour-00/01 windows
    //   C: a LATE view at 00:30 value 100.0 — behind the 08:00
    //      watermark: dropped, never merged, never re-emitted
    // Expected append output: exactly the two closed windows with
    // phase-A-only aggregates; the hour-10 window stays open/withheld.
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("events-tumbling-append").toString
    def ts(s: String) = java.sql.Timestamp.valueOf(s"2026-01-01 $s")
    val phaseA = Seq(
      (ts("00:10:00"), "view", 1.0), (ts("00:20:00"), "view", 2.0),
      (ts("01:30:00"), "click", 1.5)).toDF("ts", "event_type", "value")
    val phaseB = Seq((ts("10:00:00"), "view", 1.0))
      .toDF("ts", "event_type", "value")
    val phaseC = Seq((ts("00:30:00"), "view", 100.0))
      .toDF("ts", "event_type", "value")
    phaseA.coalesce(1).write.mode("append").parquet(dir)
    val q = graft.streaming.EventWindows.streamingTumblingHourly(
      spark, dir, phaseA.schema, "tumbling_append",
      outputMode = "append", availableNow = false)
    try {
      q.processAllAvailable()
      phaseB.coalesce(1).write.mode("append").parquet(dir)
      q.processAllAvailable()
      phaseC.coalesce(1).write.mode("append").parquet(dir)
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("tumbling_append")
      .select(col("window.start").cast("string").as("s"), col("event_type"),
        col("n"), col("sum_value"))
      .collect()
    val got = rows.map(r =>
      (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    val expected = Set(
      ("2026-01-01 00:00:00", "view", 2L, 3.0),
      ("2026-01-01 01:00:00", "click", 1L, 1.5))
    assert(rows.length == 2, s"expected 2 emissions, got ${rows.toSeq}")
    assert(got == expected, s"got $got")
  }

  test("stateful streaming funnel equals the batch form across micro-batches") {
    val events = graft.engine.Tables.table(spark, sf, "events")
    val dir = java.nio.file.Files.createTempDirectory("events-funnel").toString
    // several files + maxFilesPerTrigger=1 → state must survive
    // multiple micro-batches to produce the right firsts
    events.repartition(4).write.mode("overwrite").parquet(dir)
    val q = graft.streaming.EventWindows.streamingFunnelFirsts(
      spark, dir, events.schema, "funnel_out", maxFilesPerTrigger = 1)
    try q.processAllAvailable() finally q.stop()
    // firsts are monotone non-increasing, so min over the per-batch
    // emissions is the final state
    val firsts = spark.table("funnel_out").groupBy(col("user_id")).agg(
      min(col("t_view_us")).as("tv"), min(col("t_click_us")).as("tc"),
      min(col("t_purchase_us")).as("tp"))
    val streamed = firsts.agg(
      sum(when(col("tv") =!= Long.MaxValue, 1L).otherwise(0L)).as("n_view"),
      sum(when(col("tv") < col("tc") && col("tc") =!= Long.MaxValue, 1L)
        .otherwise(0L)).as("n_view_click"),
      sum(when(col("tv") < col("tc") && col("tc") =!= Long.MaxValue &&
          col("tc") < col("tp") && col("tp") =!= Long.MaxValue, 1L)
        .otherwise(0L)).as("n_view_click_purchase")).head()
    val batch = Extensions.queries("x_events_funnel")(spark, sf).head()
    assert(streamed.getLong(0) == batch.getAs[Long]("n_view"))
    assert(streamed.getLong(1) == batch.getAs[Long]("n_view_click"))
    assert(streamed.getLong(2) == batch.getAs[Long]("n_view_click_purchase"))
  }

  test("viewClickPairs: inclusive bounds, per-user, exact integer lag") {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s"2026-01-01 $s")
    val events = Seq(
      (100L, 1L, ts("00:00:00"), "view"),
      (101L, 1L, ts("00:00:00"), "click"),  // same instant: lag 0, kept
      (102L, 1L, ts("00:30:00"), "click"),  // exactly +30m: inclusive
      (103L, 1L, ts("00:30:00.000001"), "click"), // 1 µs past: dropped
      (104L, 2L, ts("00:10:00"), "click"),  // other user: no pair
      (105L, 3L, ts("00:05:00"), "view"),
      (106L, 3L, ts("00:04:00"), "click"))  // click BEFORE view: dropped
      .toDF("event_id", "user_id", "ts", "event_type")
    val got = graft.streaming.EventWindows.viewClickPairs(events)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    assert(got == Seq(
      (1L, 100L, 101L, 0L),
      (1L, 100L, 102L, 1800000000L)), s"got $got")
  }

  test("stream-stream interval join equals the batch form on the fixture") {
    val events = graft.engine.Tables.table(spark, sf, "events")
    val dir = java.nio.file.Files.createTempDirectory("events-ssjoin").toString
    events.write.mode("overwrite").parquet(dir)
    val q = graft.streaming.EventWindows.streamingViewClickPairs(
      spark, dir, events.schema, "ssjoin_out")
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("ssjoin_out")
    val batch = graft.streaming.EventWindows.viewClickPairs(events)
    assert(batch.count() > 0, "fixture must produce pairs")
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
  }

  test("stream-stream join pairs across batches and evicts watermark-dead state") {
    // the contract that distinguishes a STREAM join from a batch one:
    //   A: views for users 1 and 2 at 00:00
    //   B: user 1's click at 00:10 — arrives a batch later, must still
    //      pair (view state alive); a user-3 view and a user-4 click
    //      at 05:00 advance BOTH sides' watermarks (the global
    //      watermark is the MIN across watermark operators, so one
    //      side advancing alone holds it back) to 03:00, past every
    //      phase-A view's 30-minute match window → their state is
    //      evicted
    //   C: user 2's click at 00:05 — in-lag by event time but behind
    //      the 03:00 watermark: dropped as late, no pair (exactly the
    //      unbounded-state leak this eviction exists to prevent)
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s"2026-01-01 $s")
    def df(rows: (Long, Long, String, String)*) =
      rows.map { case (e, u, t, et) => (e, u, ts(t), et) }
        .toDF("event_id", "user_id", "ts", "event_type")
    val dir = java.nio.file.Files
      .createTempDirectory("events-ssjoin-phased").toString
    val phaseA = df((100L, 1L, "00:00:00", "view"),
      (200L, 2L, "00:00:00", "view"))
    val phaseB = df((101L, 1L, "00:10:00", "click"),
      (300L, 3L, "05:00:00", "view"),
      (400L, 4L, "05:00:00", "click"))
    val phaseC = df((201L, 2L, "00:05:00", "click"))
    phaseA.coalesce(1).write.mode("append").parquet(dir)
    val q = graft.streaming.EventWindows.streamingViewClickPairs(
      spark, dir, phaseA.schema, "ssjoin_phased", availableNow = false)
    try {
      q.processAllAvailable()
      phaseB.coalesce(1).write.mode("append").parquet(dir)
      q.processAllAvailable()
      phaseC.coalesce(1).write.mode("append").parquet(dir)
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("ssjoin_phased")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(got == Set((1L, 100L, 101L, 600000000L)), s"got $got")
  }

  test("stream-stream join state is BOUNDED: numRowsTotal falls back after watermark passage") {
    // the behavioral eviction spec above proves late rows don't PAIR;
    // this one proves the state store itself shrinks — the metric a
    // 100 TB deployment alarms on. Phases mirror the eviction spec:
    //   A: 2 views at 00:00            → state holds 2 rows
    //   B: watermark-advancing events  → phase-A view state evicted:
    //      total state falls below (A's rows + B's rows); only the
    //      watermark-live B rows remain
    //   C: a late click                → dropped BEFORE the join, so
    //      state does not grow at all
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s"2026-01-01 $s")
    def df(rows: (Long, Long, String, String)*) =
      rows.map { case (e, u, t, et) => (e, u, ts(t), et) }
        .toDF("event_id", "user_id", "ts", "event_type")
    val dir = java.nio.file.Files
      .createTempDirectory("events-ssjoin-state").toString
    val phaseA = df((100L, 1L, "00:00:00", "view"),
      (200L, 2L, "00:00:00", "view"))
    val phaseB = df((101L, 1L, "00:10:00", "click"),
      (300L, 3L, "05:00:00", "view"),
      (400L, 4L, "05:00:00", "click"))
    val phaseC = df((201L, 2L, "00:05:00", "click"))
    phaseA.coalesce(1).write.mode("append").parquet(dir)
    val q = graft.streaming.EventWindows.streamingViewClickPairs(
      spark, dir, phaseA.schema, "ssjoin_state", availableNow = false)
    // state rows across ALL stateful operators at the latest batch
    def stateRows: Long = Option(q.lastProgress).toSeq
      .flatMap(_.stateOperators).map(_.numRowsTotal).sum
    try {
      q.processAllAvailable()
      val afterA = stateRows
      assert(afterA == 2, s"phase A must buffer both views, got $afterA")
      phaseB.coalesce(1).write.mode("append").parquet(dir)
      q.processAllAvailable()
      val afterB = stateRows
      // no eviction would leave 2+3 = 5; the watermark (03:00) must
      // have reclaimed the phase-A views and the 00:10 click, leaving
      // only the two 05:00 rows
      assert(afterB == 2, s"watermark must evict dead join state, got $afterB")
      phaseC.coalesce(1).write.mode("append").parquet(dir)
      q.processAllAvailable()
      val afterC = stateRows
      assert(afterC == afterB,
        s"a late row must never grow join state: $afterB -> $afterC")
    } finally q.stop()
  }

  test("stream-stream LEFT-OUTER join: unmatched views emit once the watermark proves abandonment") {
    // phase A: views for users 1 and 2 at 00:00
    // phase B: user 1's click at 00:10 (matched pair emits); a user-3
    //   view and user-4 click at 05:00 advance BOTH watermarks to
    //   03:00, past 00:00+30m — user 2's view is now provably
    //   unconverted and must emit exactly once with null click
    //   columns; user 3's own view (05:00) is NOT yet provably
    //   unmatched and stays withheld; the unmatched user-4 click
    //   never emits (left outer, not full)
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s"2026-01-01 $s")
    def df(rows: (Long, Long, String, String)*) =
      rows.map { case (e, u, t, et) => (e, u, ts(t), et) }
        .toDF("event_id", "user_id", "ts", "event_type")
    val dir = java.nio.file.Files
      .createTempDirectory("events-ssjoin-outer").toString
    val phaseA = df((100L, 1L, "00:00:00", "view"),
      (200L, 2L, "00:00:00", "view"))
    val phaseB = df((401L, 1L, "00:10:00", "click"),
      (300L, 3L, "05:00:00", "view"),
      (400L, 4L, "05:00:00", "click"))
    phaseA.coalesce(1).write.mode("append").parquet(dir)
    val q = graft.streaming.EventWindows.streamingViewClickPairsOuter(
      spark, dir, phaseA.schema, "ssjoin_outer", availableNow = false)
    try {
      q.processAllAvailable()
      phaseB.coalesce(1).write.mode("append").parquet(dir)
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("ssjoin_outer").collect()
    val got = rows.map(r => (r.getLong(0), r.getLong(1),
      if (r.isNullAt(2)) -1L else r.getLong(2),
      if (r.isNullAt(3)) -1L else r.getLong(3))).toSet
    assert(rows.length == 2, s"exactly-once per row kind, got ${rows.toSeq}")
    assert(got == Set((1L, 100L, 401L, 600000000L), (2L, 200L, -1L, -1L)),
      s"got $got")
  }

  test("dedupAgainstCorpus flags only incoming docs near-dup to corpus") {
    import spark.implicits._
    val mk = (ws: Seq[String]) => ws.mkString(" ")
    val base = (1 to 30).map(i => s"w$i")
    val docs = Seq(
      (10L, mk(base)),                        // incoming: dup of 11
      (20L, mk((1 to 30).map(i => s"z$i"))),  // incoming: unique
      (11L, mk(base :+ "tail")),              // corpus: near-dup of 10
      (12L, mk((1 to 30).map(i => s"q$i")))) // corpus: unrelated
      .toDF("doc_id", "text")
    val rs = Dedup.dedupAgainstCorpus(
        docs.filter(col("doc_id") % 10 === 0),
        docs.filter(col("doc_id") % 10 =!= 0))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(rs.toSeq == Seq((10L, 11L)))
  }

  test("as-of join single-pass form equals the range-join reference") {
    import org.apache.spark.sql.expressions.Window
    val events = graft.engine.Tables.table(spark, sf, "events")
      .select(col("event_id"), col("user_id"), col("ts"))
    val orders = graft.engine.Tables.table(spark, sf, "orders")
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
        col("o_orderdate").cast("timestamp").as("o_ts"))
    val got = AsofJoin.asof(events, orders, "user_id", "o_custkey", "ts", "o_ts",
        payload = Seq("o_orderkey", "o_orderdate"), tieBreak = Seq("o_orderkey"))
      .select("event_id", "o_orderkey", "o_orderdate")
    val w = Window.partitionBy("event_id")
      .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
    val ref = events.join(orders,
        events("user_id") === orders("o_custkey") && orders("o_ts") <= events("ts"),
        "left")
      .withColumn("rk", row_number().over(w)).filter(col("rk") === 1)
      .select("event_id", "o_orderkey", "o_orderdate")
    assert(got.count() == events.count())
    assert(got.exceptAll(ref).isEmpty && ref.exceptAll(got).isEmpty)
  }

  test("streaming dedup keeps each key's first arrival across micro-batches") {
    val events = graft.engine.Tables.table(spark, sf, "events")
    val dir = java.nio.file.Files.createTempDirectory("events-dedup").toString
    // write every event twice so the stream genuinely contains dups
    events.write.mode("overwrite").parquet(dir)
    events.write.mode("append").parquet(dir)
    assert(spark.read.parquet(dir).count() == events.count() * 2)
    val q = graft.streaming.StreamingDedup.streamingDedupFirst(
      spark, dir, events.schema, "dedup_out", Seq("event_id"))
    try q.processAllAvailable() finally q.stop()
    assert(spark.table("dedup_out").count() == events.count())
    assert(spark.table("dedup_out").select("event_id").distinct().count()
      == events.count())
    // an empty key list is a config error with a named message, not a
    // bare NoSuchElementException from keys.head
    val e = intercept[IllegalArgumentException] {
      graft.streaming.StreamingDedup.streamingDedupFirst(
        spark, dir, events.schema, "dedup_none", Seq.empty)
    }
    assert(e.getMessage.contains("dedup key"))
  }

  test("all extension queries execute and return rows at sf0.001") {
    Extensions.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val n = fn(spark, sf).count()
      assert(n > 0, s"$name returned no rows")
    }
  }

  test("every extension query has an oracle or a documented reason not to") {
    val noOracle = Extensions.queries.keySet -- Extensions.oracle.keySet
    // rows-only by design: the production-probe IVF paths (engine-
    // trained KMeans quantizer, not SQL-expressible) are each pinned
    // by a hash-matched sibling — x_knn_ivf_recall /
    // x_dedup_embedding_ann_recall run the same machinery at probe
    // counts that provably reproduce the exact baseline — and the
    // sketch profile (engine-specific HLL/KLL internals) is accuracy-
    // pinned against the exact profile operators in ProfileSpec, and
    // the per-group GK sketch quantiles by the hash-matched
    // x_profile_group_quantiles_sketch_check envelope sibling. The
    // LSH path has a FULL value oracle (deterministic hyperplane
    // literals).
    // x_embed_outliers_sketch joins the rows-only set with the same
    // contract: GK-sketch thresholds are engine-specific, pinned by
    // the hash-matched x_embed_outliers_sketch_check envelope sibling
    assert(noOracle ==
      Set("x_knn_ivf", "x_dedup_embedding_ann", "x_profile_sketch",
        "x_profile_group_quantiles_sketch", "x_embed_outliers_sketch"))
    assert((Extensions.oracle.keySet -- Extensions.queries.keySet).isEmpty)
  }

  test("langid predictions are accurate where the heuristic applies (en/zh)") {
    val out = Extensions.queries("x_text_langid")(spark, sf)
      .filter(col("lang").isin("en", "zh")).collect()
    val acc = out.count(r => r.getString(1) == r.getString(2)).toDouble / out.length
    assert(acc > 0.5, s"langid accuracy $acc on en/zh")
  }

  test("embeddingDecontaminate flags exactly the threshold-crossing corpus vectors") {
    val e = graft.engine.Tables.table(spark, sf, "embeddings")
    val bench = e.filter(col("vec_id") < 25)
    val corpus = e.filter(col("vec_id") >= 25)
    val got = Similarity.embeddingDecontaminate(corpus, bench, minCosine = 0.3)
      .collect().map(r => r.getLong(0) -> r).toMap
    // reference: the bounded brute pair relation restricted to
    // (benchmark, corpus) pairs at the same threshold
    val pairs = Dedup.embeddingCosinePairs(e, minCosine = 0.3, leftMax = 25)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .filter { case (a, b, _) => a < 25 && b >= 25 }
    val want = pairs.groupBy(_._2).map { case (v, ps) =>
      v -> (ps.size.toLong, ps.map(_._3).max, ps.map(_._1).min)
    }
    assert(want.nonEmpty, "fixture must contain near-benchmark vectors")
    assert(got.keySet == want.keySet)
    want.foreach { case (v, (n, maxCos, minId)) =>
      val r = got(v)
      assert(r.getAs[Long]("n_near") == n, s"vec $v n_near")
      assert(r.getAs[Double]("max_cosine") == maxCos, s"vec $v max_cosine")
      assert(r.getAs[Long]("nearest_min_id") == minId, s"vec $v nearest id")
    }
  }
}
