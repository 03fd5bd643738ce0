package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming cluster-occupancy monitor pinned equal to the batch
  * assignment: same rows, forced multi-micro-batch arrival, frozen
  * batch-fit centroids.
  */
class StreamingKmeansSpec extends AnyFunSuite {

  private lazy val spark = graft.SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("streaming cluster counts equal the batch assignment across micro-batches") {
    val emb = graft.engine.Tables.table(spark, sf, "embeddings")
    val cents = Kmeans.centroids(emb)
    val dir = java.nio.file.Files
      .createTempDirectory("emb-stream-kmeans").toString
    // several files -> with maxFilesPerTrigger=1 the stream must carry
    // aggregate state across micro-batches to reach the batch answer
    emb.repartition(4).write.mode("overwrite").parquet(dir)
    val q = graft.streaming.StreamingKmeans.streamingClusterCounts(
      spark, dir, emb.schema, "kmeans_stream_counts", cents,
      maxFilesPerTrigger = 1)
    try q.processAllAvailable() finally q.stop()
    assert(q.recentProgress.count(_.numInputRows > 0) > 1,
      "fixture must actually exercise multiple micro-batches")
    val streamed = spark.table("kmeans_stream_counts")
    val batch = Kmeans.kmeansAssign(emb)
      .groupBy(col("cluster"))
      .agg(count(lit(1)).as("n"), sum(col("dist2")).as("sum_dist2"))
    assert(batch.count() > 1, "fixture must populate several clusters")
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
  }

  test("streaming drift trigger: final micro-batch report equals the batch occupancyDrift") {
    val emb = graft.engine.Tables.table(spark, sf, "embeddings")
    // offline-fit / online-serve split: fit + baseline from the even
    // half, stream the odd half and watch its shares drift
    val base = emb.filter(col("vec_id") % 2 === 0)
    val cur = emb.filter(col("vec_id") % 2 =!= 0)
    val cents = Kmeans.centroids(base)
    val baseCounts = Kmeans.assignWithCentroids(base, cents)
      .groupBy(col("cluster")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val dir = java.nio.file.Files
      .createTempDirectory("emb-stream-drift").toString
    cur.repartition(4).write.mode("overwrite").parquet(dir)
    val q = graft.streaming.StreamingKmeans.streamingClusterDrift(
      spark, dir, cur.schema, "kmeans_stream_drift", cents, baseCounts,
      num = 1, den = 50, maxFilesPerTrigger = 1)
    try q.processAllAvailable() finally q.stop()
    val sink = spark.table("kmeans_stream_drift")
    val lastUpd = sink.agg(max(col("upd"))).head().getLong(0)
    assert(lastUpd > 1, "fixture must exercise multiple micro-batches")
    // every batch emitted a full per-cluster report (online history)
    assert(sink.select(col("upd")).distinct().count() == lastUpd)
    val streamed = sink.filter(col("upd") === lastUpd)
      .select(col("cluster"), col("n_base"), col("n_cur"),
        round(col("share_base"), 4).as("share_base"),
        round(col("share_cur"), 4).as("share_cur"),
        round(col("delta_share"), 4).as("delta_share"), col("drift"))
    val batch = Kmeans.occupancyDrift(
      Kmeans.assignWithCentroids(base, cents)
        .groupBy(col("cluster")).agg(count(lit(1)).as("n_base")),
      Kmeans.assignWithCentroids(cur, cents)
        .groupBy(col("cluster")).agg(count(lit(1)).as("n_cur")),
      num = 1, den = 50)
    assert(batch.filter(col("drift") === 1).count() > 0,
      "fixture + threshold must actually raise a drift flag")
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty,
      "final streaming report must equal the batch drift report")
  }

  test("streaming decontamination flags equal the batch form across micro-batches") {
    val docs = graft.engine.Tables.table(spark, sf, "documents")
    val bench = docs.filter(col("doc_id") < 50)
    val corpus = docs.filter(col("doc_id") >= 50)
    val dir = java.nio.file.Files
      .createTempDirectory("docs-stream-decon").toString
    corpus.repartition(4).write.mode("overwrite").parquet(dir)
    val q = graft.streaming.StreamingDecontaminate.streamingFlags(
      spark, dir, corpus.schema, "decon_stream", bench, minShared = 5,
      maxFilesPerTrigger = 1)
    try q.processAllAvailable() finally q.stop()
    assert(q.recentProgress.count(_.numInputRows > 0) > 1,
      "fixture must exercise multiple micro-batches")
    val streamed = spark.table("decon_stream")
    // batch reference: same expressions, batch execution
    import graft.ops.TextOps
    val batch = corpus
      .select(col("doc_id"), TextOps.words(col("text")).as("ws"))
      .select(col("doc_id"), TextOps.ngramsOf(col("ws"), 3).as("g"))
      .crossJoin(broadcast(
        bench.select(TextOps.words(col("text")).as("ws"))
          .select(explode(TextOps.ngramsOf(col("ws"), 3)).as("g"))
          .distinct().agg(collect_set(col("g")).as("bg"))))
      .select(col("doc_id"),
        size(array_intersect(col("g"), col("bg"))).as("n_shared"))
      .filter(col("n_shared") >= 5)
    assert(batch.count() > 0, "fixture must contain contaminated docs")
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
    // the flagged doc set must agree with the pairwise batch detector
    val pairDocs = graft.ops.Dedup.decontaminate(corpus, bench)
      .select(col("doc_id")).distinct()
      .collect().map(_.getLong(0)).toSet
    val flagged = streamed.select(col("doc_id"))
      .collect().map(_.getLong(0)).toSet
    assert(flagged.intersect(pairDocs) == pairDocs,
      "every pairwise-flagged doc must flag against the union set")
  }

  test("decontamination scorer is the relation join at ANY benchmark size — " +
      "no per-row set rebuild, no ceiling, flags equal the intersect semantics") {
    val docs = graft.engine.Tables.table(spark, sf, "documents")
    val bench = docs.filter(col("doc_id") < 50)
    val corpus = docs.filter(col("doc_id") >= 50)
    import graft.ops.TextOps
    // semantic anchor: the flag relation must equal the literal
    // distinct-gram-intersection definition (computed here with the
    // single-row intersect form the implementation deliberately
    // dropped — it rebuilt the benchmark hash set per document row,
    // measured 12.6× slower at sf0.1 and unbounded at 10×)
    val reference = corpus
      .select(col("doc_id"), TextOps.words(col("text")).as("ws"))
      .select(col("doc_id"), TextOps.ngramsOf(col("ws"), 3).as("g"))
      .crossJoin(broadcast(
        bench.select(TextOps.words(col("text")).as("ws"))
          .select(explode(TextOps.ngramsOf(col("ws"), 3)).as("g"))
          .distinct().agg(collect_set(col("g")).as("bg"))))
      .select(col("doc_id"),
        size(array_intersect(col("g"), col("bg"))).as("n_shared"))
      .filter(col("n_shared") >= 5)
    val h = graft.streaming.StreamingDecontaminate.scorer(bench, 5)
    try {
      val got = h.score(corpus)
      assert(reference.count() > 0)
      assert(got.exceptAll(reference).isEmpty && reference.exceptAll(got).isEmpty,
        "join-form flags must equal the distinct-gram intersection definition")
      // and the shape is pinned: a join + aggregate, never the per-row
      // array_intersect probe
      val plan = got.queryExecution.optimizedPlan.toString
      assert(!plan.contains("array_intersect") && plan.contains("Aggregate"),
        s"the scorer must be the relation join:\n$plan")
    } finally h.retained.unpersist()

    val e = intercept[IllegalArgumentException] {
      graft.streaming.StreamingDecontaminate.scorer(bench, 0)
    }
    assert(e.getMessage.contains("minShared"))
  }

  test("streaming semantic pairs equal the batch SemDeDup relation across micro-batches") {
    val emb = graft.engine.Tables.table(spark, sf, "embeddings")
    val cents = Kmeans.centroids(emb)
    val dir = java.nio.file.Files
      .createTempDirectory("emb-stream-semdedup").toString
    emb.repartition(4).write.mode("overwrite").parquet(dir)
    val q = graft.streaming.StreamingKmeans.streamingSemanticPairs(
      spark, dir, emb.schema, "kmeans_stream_sem", cents,
      maxFilesPerTrigger = 1)
    try q.processAllAvailable() finally q.stop()
    assert(q.recentProgress.count(_.numInputRows > 0) > 1,
      "fixture must actually exercise multiple micro-batches")
    val pairs = spark.table("kmeans_stream_sem")

    // the batch relation, re-derived per the operator's definition:
    // n_dups_before(v) = pairs with vec_b = v; keep(v) = none exist
    val batch = Kmeans.semanticDedup(emb)
    val fromPairs = batch.select(col("vec_id"), col("cluster"))
      .join(pairs.groupBy(col("vec_b").as("vec_id"))
        .agg(count(lit(1)).as("d")), Seq("vec_id"), "left")
      .select(col("vec_id"), col("cluster"),
        coalesce(col("d"), lit(0L)).as("n_dups_before"),
        col("d").isNull.cast("int").as("keep"))
    assert(batch.exceptAll(fromPairs).isEmpty &&
      fromPairs.exceptAll(batch).isEmpty,
      "completed-stream pair relation must reproduce the batch keep/drop table")
    // the relation is non-trivial on the fixture and each pair is
    // emitted exactly once (the later-arrival contract)
    assert(pairs.count() > 0)
    assert(pairs.distinct().count() == pairs.count())
  }

  test("semantic pairs TTL: sliding id-window evicts, far-spanning pairs knowingly lost") {
    import spark.implicits._
    // four IDENTICAL vectors (cosine 1 — always dups) in one cell;
    // controlled arrival order via one file per micro-batch, distinct
    // mtimes so FileStreamSource processes oldest-first
    val vec = Array.fill(16)(1.0f).toSeq
    def rows(ids: Long*) = ids.map(id => (id, vec, 0)).toDF("vec_id", "embedding", "label")
    val all = rows(1L, 2L, 1000L, 5L)
    val cents = Kmeans.centroids(all)
    val dir = java.nio.file.Files
      .createTempDirectory("emb-stream-sem-ttl").toString
    def ship(batch: org.apache.spark.sql.DataFrame): Unit = {
      batch.coalesce(1).write.mode("append").parquet(dir)
      Thread.sleep(1100) // distinct source timestamps → deterministic order
    }
    ship(rows(1L, 2L)); ship(rows(1000L)); ship(rows(5L))

    val q = graft.streaming.StreamingKmeans.streamingSemanticPairs(
      spark, dir, all.schema, "kmeans_stream_sem_ttl", cents,
      maxFilesPerTrigger = 1, ttlIdLag = 10)
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("kmeans_stream_sem_ttl")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // batch 1: (1,2). batch 2: 1000 pairs with BOTH live members, then
    // 1 and 2 fall behind the max-id horizon and are evicted.
    // batch 3: 5 pairs only with the surviving 1000 — the (1,5)/(2,5)
    // pairs are the KNOWINGLY-lost cost of bounded state.
    assert(got == Set((1L, 2L), (1L, 1000L), (2L, 1000L), (5L, 1000L)))
    assert(!got.contains((1L, 5L)) && !got.contains((2L, 5L)))

    // the default (no TTL) on the same files recovers every pair
    val q0 = graft.streaming.StreamingKmeans.streamingSemanticPairs(
      spark, dir, all.schema, "kmeans_stream_sem_nottl", cents,
      maxFilesPerTrigger = 1)
    try q0.processAllAvailable() finally q0.stop()
    val full = spark.table("kmeans_stream_sem_nottl")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(full == Set((1L, 2L), (1L, 5L), (2L, 5L),
      (1L, 1000L), (2L, 1000L), (5L, 1000L)))
  }
}
