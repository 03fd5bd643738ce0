package graft.ops

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The composed IVF×PQ store's contracts: exhaustive-settings
  * equality with brute force (the machinery pin), BOTH pruning levers
  * visible in the executed plan (dynamic partition pruning on the
  * cell join; the ADC scan reading packed codes, not vectors), and
  * the store-family lifecycle (idempotent appends, tombstones,
  * compaction).
  */
class IvfPqStoreSpec extends AnyFunSuite {

  private lazy val spark = graft.SparkTestSession.spark

  private def emb(sf: String) =
    graft.engine.Tables.table(spark, s"/root/testdata/$sf", "embeddings")

  private def tmpDir(tag: String): String =
    Files.createTempDirectory(s"graft_ivfpq_$tag").toString

  test("exhaustive probes + exhaustive depth equal brute force") {
    val dir = tmpDir("brute")
    val e = emb("sf0.001")
    try {
      IvfPqStore.save(e, dir, nCells = 16)
      val got = IvfPqStore.querySelf(spark, dir, nProbe = 16,
        candidates = e.count().toInt).collect().toSeq
      val want = Similarity.knnBrute(e).collect().toSeq
      assert(want.nonEmpty)
      assert(got == want,
        s"nProbe == nCells + depth == n must equal brute " +
          s"(got ${got.size} rows, want ${want.size})")
    } finally Pq.clearCodebookCache()
  }

  test("plan: both levers fire — dynamic pruning AND a codes-only ADC scan") {
    val dir = tmpDir("plan")
    val e = emb("sf0.001")
    try {
      IvfPqStore.save(e, dir, nCells = 16)
      val q = IvfPqStore.querySelf(spark, dir, nProbe = 4)
      q.collect()
      val plan = q.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      assert(plan.contains("dynamicpruning"),
        s"the cell join must dynamic-prune the partitioned scan:\n$plan")
      val reads = "ReadSchema: struct<([^>]*)>".r
        .findAllMatchIn(plan).map(_.group(1)).toSeq
      val codeScans = reads.filter(_.contains("pcodes"))
      assert(codeScans.nonEmpty && codeScans.exists(!_.contains("v:array")),
        s"stage 1 must scan packed codes without the vectors:\n$reads")
      assert(reads.exists(r => r.contains("v:array") && !r.contains("pcodes")),
        s"the rerank fetch must read vectors without the codes:\n$reads")
    } finally Pq.clearCodebookCache()
  }

  test("plan: the exhaustive-regime cell join broadcasts bare probe pairs (r17 split)") {
    val dir = tmpDir("plansplit")
    val e = emb("sf0.001")
    try {
      IvfPqStore.save(e, dir, nCells = 16)
      val incoming = e.select(col("vec_id").as("query_id"),
        col("embedding").as("qv"))
      // the 100x exhaustive proportions, scaled to the fixture: the
      // qtab ceiling sits ABOVE nQ but BELOW nQ*nProbe — the r15
      // shape (qtab duplicated per probe row, one ceiling on the
      // product) fell off the broadcast cliff exactly here and ran
      // the cell join PARTITIONED on the nCells-value key, a
      // parallelism collapse to nCells shuffle partitions; the r17
      // split must keep it broadcast
      val q = IvfPqStore.dedupAgainst(spark, dir, incoming,
        minCosine = 0.3, nProbe = 16, margin = 2.0,
        maxBroadcastProbeRows = 1000)
      q.collect()
      val plan = q.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      // no shuffle join may key on the bare cell column (the survivor
      // fetch legitimately sort-merges on (cell, corpus_id) — its key
      // list is wider)
      val cellOnlyShuffleJoin =
        "(SortMergeJoin|ShuffledHashJoin) \\[cell#\\d+L?\\], \\[cell#\\d+".r
      assert(cellOnlyShuffleJoin.findFirstIn(plan).isEmpty,
        s"the cell join collapsed onto the nCells-key shuffle:\n$plan")
      assert("BroadcastHashJoin".r.findAllIn(plan).size >= 2,
        s"bare probes AND per-query qtab must both broadcast:\n$plan")
    } finally Pq.clearCodebookCache()
  }

  test("external query ids are a separate namespace: no self-exclusion") {
    val sp = spark; import sp.implicits._
    val dir = tmpDir("extq")
    val e = emb("sf0.001")
    try {
      IvfPqStore.save(e, dir, nCells = 16)
      val q0 = e.filter(col("vec_id") === 0)
        .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
      val top = IvfPqStore.query(spark, dir, q0, k = 1, nProbe = 16,
          candidates = e.count().toInt)
        .select(col("neighbor_id")).as[Long].collect().toSeq
      assert(top == Seq(0L),
        s"external id 0 must still see stored vector 0, got $top")
    } finally Pq.clearCodebookCache()
  }

  test("append assigns to stored centroids, encodes with the stored codebook; retry idempotent") {
    val dir = tmpDir("append")
    val e = emb("sf0.001")
    try {
      IvfPqStore.save(e.filter(col("vec_id") % 2 === 0), dir, nCells = 16)
      IvfPqStore.append(e.filter(col("vec_id") % 2 === 1), dir, "odd")
      val idx = spark.read.parquet(
        s"${StoreVersioning.requireRoot(spark, dir)}/vectors")
      assert(idx.count() == e.count())
      assert(idx.select(col("vec_id")).distinct().count() == e.count())
      val want = Similarity.knnBrute(e).collect().toSeq
      val got = IvfPqStore.querySelf(spark, dir, nProbe = 16,
        candidates = e.count().toInt).collect().toSeq
      assert(got == want)
      IvfPqStore.append(e.filter(col("vec_id") % 2 === 1), dir, "odd")
      assert(spark.read.parquet(
        s"${StoreVersioning.requireRoot(spark, dir)}/vectors")
        .count() == e.count(), "a retried append must be idempotent")
      assert(IvfPqStore.querySelf(spark, dir, nProbe = 16,
        candidates = e.count().toInt).collect().toSeq == want)
    } finally Pq.clearCodebookCache()
  }

  test("incremental dedup against the store equals the exact pair set") {
    val sp = spark; import sp.implicits._
    val dir = tmpDir("dedup")
    val e = emb("sf0.001")
    try {
      IvfPqStore.save(e, dir, nCells = 16)
      val incoming = e.filter(col("vec_id") < 8)
        .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
      val got = IvfPqStore.dedupAgainst(spark, dir, incoming,
        minCosine = 0.3, nProbe = 16, margin = 2.0).collect().toSeq
      // exact baseline: plain threshold join, same rounding/order
      val q = Similarity.withNorm(e.filter(col("vec_id") < 8))
        .select(col("vec_id").as("query_id"), col("v").as("qv"),
          col("norm").as("qn"))
      val c = Similarity.withNorm(e)
        .select(col("vec_id").as("corpus_id"), col("v"), col("norm"))
      val cosEx = Similarity.cosineWithNorms(col("qv"), col("v"),
        col("qn"), col("norm"))
      val want = c.crossJoin(broadcast(q))
        .select(col("query_id"), col("corpus_id"), cosEx.as("cos"))
        .filter(col("cos") >= 0.3)
        .select(col("query_id"), col("corpus_id"),
          round(col("cos"), 4).as("cosine"))
        .orderBy(col("query_id"), col("corpus_id")).collect().toSeq
      assert(want.nonEmpty, "fixture must contain qualifying pairs")
      assert(got == want,
        s"store dedup must equal the exact pairs (got ${got.size}, " +
          s"want ${want.size})")
      // a retracted corpus vector stops matching immediately
      val victim = got.map(_.getLong(1)).filter(_ >= 8).head
      IvfPqStore.delete(Seq(victim).toDF("vec_id"), dir)
      val after = IvfPqStore.dedupAgainst(spark, dir, incoming,
        minCosine = 0.3, nProbe = 16, margin = 2.0).collect().toSeq
      assert(after == want.filterNot(_.getLong(1) == victim))
    } finally Pq.clearCodebookCache()
  }

  test("tombstones retract immediately; compaction reclaims and answers identically") {
    val sp = spark; import sp.implicits._
    val dir = tmpDir("tomb")
    val e = emb("sf0.001")
    try {
      IvfPqStore.save(e, dir, nCells = 16)
      val depth = e.count().toInt
      val base = IvfPqStore.querySelf(spark, dir, nProbe = 16,
        candidates = depth).collect().toSeq
      val victim = base.map(_.getLong(2)).filter(_ >= 5)
        .groupBy(identity).maxBy(_._2.size)._1
      IvfPqStore.delete(Seq(victim).toDF("vec_id"), dir)
      val after = IvfPqStore.querySelf(spark, dir, nProbe = 16,
        candidates = depth).collect().toSeq
      assert(after == Similarity.knnBrute(
        e.filter(col("vec_id") =!= victim)).collect().toSeq)
      // pruning survives the tombstone anti join
      val q = IvfPqStore.querySelf(spark, dir, nProbe = 4)
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("dynamicpruning"),
        s"tombstones must not revert the scan to a full read:\n$plan")
      def stat(name: String): Long =
        IvfPqStore.stats(spark, dir).select(col(name)).head.getLong(0)
      assert(stat("n_tombstoned") == 1 && stat("n_cells") == 16)
      IvfPqStore.compact(spark, dir)
      assert(stat("n_tombstoned") == 0 && stat("n_vectors") == e.count() - 1)
      assert(IvfPqStore.querySelf(spark, dir, nProbe = 16,
        candidates = depth).collect().toSeq == after)
      assert(spark.read.parquet(
        s"${StoreVersioning.requireRoot(spark, dir)}/vectors")
        .filter(col("vec_id") === victim).count() == 0)
    } finally Pq.clearCodebookCache()
  }

  test("dedupAgainst size-gated regimes agree row-for-row (probe AND rerank broadcasts)") {
    val dir = tmpDir("regimes")
    val e = emb("sf0.001")
    try {
      IvfPqStore.save(e, dir, nCells = 16)
      val incoming = e.filter(col("vec_id") < 8)
        .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
      val hinted = IvfPqStore.dedupAgainst(spark, dir, incoming,
        minCosine = 0.3, nProbe = 16, margin = 2.0).collect().toSeq
      // force the partitioned regime on BOTH gates: a 1-row ceiling
      // puts any real batch past the probe-join hint AND the
      // exact-verify query-fetch hint — the "pathological corpus-sized
      // incoming batch" path the gates exist for. Rows must be
      // bit-identical (only physical join strategies change); the
      // margin=2.0 pass-all setting makes this the worst case (every
      // pair reaches the exact verify).
      val partitioned = IvfPqStore.dedupAgainst(spark, dir, incoming,
        minCosine = 0.3, nProbe = 16, margin = 2.0,
        maxBroadcastProbeRows = 1L, maxBroadcastQueryRows = 1L)
        .collect().toSeq
      assert(hinted.nonEmpty)
      assert(partitioned == hinted,
        "the size-gated regimes must agree row-for-row")
    } finally Pq.clearCodebookCache()
  }

  test("dedupAgainst certifies the store's ADC margin; degraded geometry refuses") {
    val sp = spark; import sp.implicits._
    val e = emb("sf0.001")
    val incoming = e.filter(col("vec_id") < 4)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    // adversarial store geometry: 2 codes per 32-dim subspace cannot
    // represent these vectors, so the stored reconstructions are noise
    // and a small margin provably loses pairs — the run must refuse
    // loudly instead of under-recalling in silence
    val badDir = tmpDir("badgeom")
    try {
      IvfPqStore.save(e, badDir, nCells = 4, m = 2, kCodes = 2)
      val err = intercept[IllegalArgumentException] {
        IvfPqStore.dedupAgainst(spark, badDir, incoming,
          minCosine = 0.3, margin = 0.05).collect()
      }
      assert(err.getMessage.contains("cannot certify"),
        s"wrong refusal: ${err.getMessage}")
      // explicit opt-out keeps the knob a knob — just never silent
      IvfPqStore.dedupAgainst(spark, badDir, incoming,
        minCosine = 0.3, margin = 0.05, certifyMargin = false).collect()
    } finally Pq.clearCodebookCache()
    // the default-geometry store at the default margin certifies
    // clean — not raising IS the assertion (ADC error is one-sided
    // smaller than the measured SDC margins)
    val okDir = tmpDir("okgeom")
    try {
      IvfPqStore.save(e, okDir, nCells = 16)
      IvfPqStore.dedupAgainst(spark, okDir, incoming).collect()
    } finally Pq.clearCodebookCache()
  }

  test("a query batch past the qtab ceiling runs partitioned instead of refusing") {
    val sp = spark; import sp.implicits._
    val dir = tmpDir("bigbatch")
    val e = emb("sf0.001")
    try {
      IvfPqStore.save(e, dir, nCells = 16)
      // past the 24k qtab-broadcast ceiling but under the 4M candidate
      // cap at this depth: round 15's shared bound threw here
      // unconditionally, though THIS path size-gates its own qtab hint
      // and executes safely as a partitioned join — the regression the
      // split bounds close (the hard width cap now binds only the
      // unconditionally-hinted pqRank paths)
      val nBig = Pq.MaxBroadcastQtabRows + 1
      val big = sp.range(0, nBig).select(col("id").as("query_id"),
        transform(sequence(lit(1), lit(64)),
          // +1 keeps every vector nonzero whatever the multiplier
          i => (((i * ((col("id") % 13) + 1)) % 7) + 1)
            .cast("float")).as("qv"))
      val got = IvfPqStore.query(spark, dir, big, k = 1, nProbe = 16,
        candidates = 8)
      assert(got.count() == nBig,
        "every query must rank against the exhaustively-probed store")
      // regime agreement: the same queries alone ride the broadcast
      // hint and must produce the identical rows
      val head = big.filter(col("query_id") < 50)
      val want = IvfPqStore.query(spark, dir, head, k = 1, nProbe = 16,
        candidates = 8).collect().toSeq
      assert(want.nonEmpty)
      assert(got.filter(col("query_id") < 50)
        .orderBy(col("query_id"), col("rank")).collect().toSeq == want,
        "the size-gated regimes must agree row-for-row")
    } finally Pq.clearCodebookCache()
  }

  test("append invalidates the margin certification: a drifted append re-probes") {
    val sp = spark; import sp.implicits._
    val dir = tmpDir("certdrift")
    val e = emb("sf0.001")
    val incoming = e.filter(col("vec_id") < 4)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    try {
      IvfPqStore.save(e, dir, nCells = 16)
      // pass 1: the healthy store certifies clean at the default
      // margin and MEMOIZES the sampled gap
      IvfPqStore.dedupAgainst(spark, dir, incoming).collect()
      // drifted append under the SAME root: one-hot-ish spikes far
      // outside the training distribution — the frozen codebook's
      // reconstructions of them are noise, so mutually-identical spike
      // pairs (exact cosine 1.0) have a huge exact−ADC gap. A memo
      // keyed on the root alone would keep certifying against the
      // pre-append sample and silently lose exactly these pairs.
      val spikes = sp.range(10000, 10300).select(col("id").as("vec_id"),
        transform(sequence(lit(1), lit(64)),
          i => when(i === (col("id") % 64) + 1, 1000.0f)
            .otherwise(0.001f)).as("embedding"))
      IvfPqStore.append(spikes, dir, "drift1")
      val err = intercept[IllegalArgumentException] {
        IvfPqStore.dedupAgainst(spark, dir, incoming).collect()
      }
      assert(err.getMessage.contains("cannot certify"),
        s"the post-append run must re-probe and refuse: ${err.getMessage}")
    } finally Pq.clearCodebookCache()
  }

  test("stats expose the frozen model lineage from _META") {
    val dir = tmpDir("lineage")
    val e = emb("sf0.001")
    try {
      IvfPqStore.save(e, dir, nCells = 16, m = 16, kCodes = 32)
      val s = IvfPqStore.stats(spark, dir).head()
      def str(name: String): String =
        s.getString(s.fieldIndex(name))
      assert(str("layout") == "1")
      assert(str("m") == "16" && str("k_codes") == "32")
      // the fingerprint is the training corpus' file-listing hash: a
      // maintenance job compares it against today's corpus to tell a
      // stale-geometry store (rebuild) from a fragmented one (compact)
      assert(str("train_fingerprint") ==
        StoreVersioning.trainFingerprint(e))
      // compaction carries the lineage verbatim — geometry is frozen
      IvfPqStore.compact(spark, dir)
      val s2 = IvfPqStore.stats(spark, dir).head()
      assert(s2.getString(s2.fieldIndex("train_fingerprint")) ==
        StoreVersioning.trainFingerprint(e))
      assert(s2.getString(s2.fieldIndex("layout")) == "1")
    } finally Pq.clearCodebookCache()
  }
}
