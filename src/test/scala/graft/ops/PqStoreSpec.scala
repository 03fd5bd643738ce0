package graft.ops

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The persisted PQ store's contracts (the [[IvfIndexSpec]] trio,
  * applied to the codebook+codes lifecycle):
  *
  *  1. PARITY — build→persist→read→query returns exactly what the
  *     in-session [[Pq.knnPqRerank]] returns at the same parameters
  *     (same codebook lineage, same ADC prefilter, same exact
  *     rerank), which is what lets the driver gate share the brute
  *     oracle at covering depth.
  *  2. EXHAUSTIVE EXACTNESS — at candidate depth >= store size the
  *     prefilter passes every pair and the store answers like brute
  *     force over its live contents, whatever the codebook: the pin
  *     for append/tombstone/compact machinery.
  *  3. LIFECYCLE — idempotent rebuilds and retried appends, loud
  *     external-id semantics, physical reclamation by compact.
  */
class PqStoreSpec extends AnyFunSuite {

  private lazy val spark = graft.SparkTestSession.spark

  private def emb(sf: String) =
    graft.engine.Tables.table(spark, s"/root/testdata/$sf", "embeddings")

  private def tmpDir(tag: String): String =
    Files.createTempDirectory(s"graft_pq_store_$tag").toString

  private def exhaustive(e: org.apache.spark.sql.DataFrame): Int =
    e.count().toInt

  test("persisted store query equals the in-session knnPqRerank bit-for-bit") {
    val dir = tmpDir("parity")
    val e = emb("sf0.001")
    try {
      PqStore.save(e, dir)
      val got = PqStore.querySelf(spark, dir).collect().toSeq
      val want = Pq.knnPqRerank(e).collect().toSeq
      assert(want.nonEmpty, "fixture must produce neighbors")
      assert(got == want,
        s"persisted-store query must equal knnPqRerank (got ${got.size} " +
          s"rows, want ${want.size})")
    } finally Pq.clearCodebookCache()
  }

  test("save is overwrite-idempotent: a rebuilt store answers identically") {
    val dir = tmpDir("idem")
    val e = emb("sf0.001")
    try {
      PqStore.save(e, dir)
      val first = PqStore.querySelf(spark, dir).collect().toSeq
      PqStore.save(e, dir)
      val second = PqStore.querySelf(spark, dir).collect().toSeq
      assert(first == second)
    } finally Pq.clearCodebookCache()
  }

  test("external query ids are a separate namespace: no self-exclusion") {
    val sp = spark; import sp.implicits._
    val dir = tmpDir("extq")
    val e = emb("sf0.001")
    try {
      PqStore.save(e, dir)
      // an external query that IS vector 0's embedding, under the
      // colliding external id 0: stored vector 0 must come back as
      // the top neighbor (cosine 1.0), not be silently excluded
      val q0 = e.filter(col("vec_id") === 0)
        .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
      val top = PqStore.query(spark, dir, q0, k = 1,
          candidates = exhaustive(e))
        .select(col("neighbor_id")).as[Long].collect().toSeq
      assert(top == Seq(0L),
        s"external id 0 must still see stored vector 0, got $top")
    } finally Pq.clearCodebookCache()
  }

  test("tombstoned vectors stop appearing as neighbors; rebuild resets") {
    val sp = spark; import sp.implicits._
    val dir = tmpDir("tombstone")
    val e = emb("sf0.001")
    try {
      PqStore.save(e, dir)
      val depth = exhaustive(e)
      val before = PqStore.querySelf(spark, dir, candidates = depth)
        .collect().toSeq
      assert(before.nonEmpty)
      // exhaustive depth == brute: the baseline every retraction
      // comparison below leans on
      assert(before == Similarity.knnBrute(e).collect().toSeq)
      val victim = before.map(_.getLong(2)).filter(_ >= 5)
        .groupBy(identity).maxBy(_._2.size)._1
      PqStore.delete(Seq(victim).toDF("vec_id"), dir)
      val after = PqStore.querySelf(spark, dir, candidates = depth)
        .collect().toSeq
      val want = Similarity.knnBrute(e.filter(col("vec_id") =!= victim))
        .collect().toSeq
      assert(after == want,
        "a retracted vector must vanish and displaced ranks refill")
      PqStore.save(e, dir)
      assert(PqStore.querySelf(spark, dir, candidates = depth)
        .collect().toSeq == before,
        "a rebuild must reset the tombstones")
    } finally Pq.clearCodebookCache()
  }

  test("append through the stored codebook: exhaustive depth equals brute over the union") {
    val dir = tmpDir("append")
    val e = emb("sf0.001")
    try {
      PqStore.save(e.filter(col("vec_id") % 2 === 0), dir)
      PqStore.append(e.filter(col("vec_id") % 2 === 1), dir, "odd")
      val root = StoreVersioning.requireRoot(spark, dir)
      val idx = spark.read.parquet(s"$root/vectors")
      assert(idx.count() == e.count())
      assert(idx.select(col("vec_id")).distinct().count() == e.count())
      val want = Similarity.knnBrute(e).collect().toSeq
      val got = PqStore.querySelf(spark, dir, candidates = exhaustive(e))
        .collect().toSeq
      assert(got == want,
        s"exhaustive depth over the appended store must equal brute " +
          s"(got ${got.size} rows, want ${want.size})")
      // a retried append replaces its own ingest partitions — never
      // double-inserts (a duplicate would occupy two top-k ranks)
      PqStore.append(e.filter(col("vec_id") % 2 === 1), dir, "odd")
      val idx2 = spark.read.parquet(
        s"${StoreVersioning.requireRoot(spark, dir)}/vectors")
      assert(idx2.count() == e.count(), "a retried append must be idempotent")
      assert(PqStore.querySelf(spark, dir, candidates = exhaustive(e))
        .collect().toSeq == want)
    } finally Pq.clearCodebookCache()
  }

  test("plan: the ADC prefilter scan prunes the 256-byte vectors out") {
    val dir = tmpDir("prune")
    val e = emb("sf0.001")
    try {
      PqStore.save(e, dir)
      val q = PqStore.querySelf(spark, dir)
      q.collect()
      val plan = q.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      // the store parquet is scanned twice with DIFFERENT pruned
      // schemas: stage 1 (the per-pair ADC ranking over the whole
      // store) must read only the 10-byte packed codes + norm — the
      // entire point of PQ's resident-size lever — while only the
      // Q·depth rerank branch touches the full vectors
      val reads = "ReadSchema: struct<([^>]*)>".r
        .findAllMatchIn(plan).map(_.group(1)).toSeq
      val codeScans = reads.filter(_.contains("pcodes"))
      assert(codeScans.nonEmpty, s"expected a packed-codes scan:\n$plan")
      assert(codeScans.exists(!_.contains("v:array")),
        s"the ADC scan must not read the full vectors:\n$reads")
    } finally Pq.clearCodebookCache()
  }

  test("compaction drops tombstoned vectors physically and answers identically") {
    val sp = spark; import sp.implicits._
    val dir = tmpDir("compact")
    val e = emb("sf0.001")
    try {
      PqStore.save(e.filter(col("vec_id") % 2 === 0), dir)
      PqStore.append(e.filter(col("vec_id") % 2 === 1), dir, "odd")
      val depth = exhaustive(e)
      val victim = PqStore.querySelf(spark, dir, candidates = depth)
        .select(col("neighbor_id")).as[Long].collect()
        .filter(_ >= 5).head
      PqStore.delete(Seq(victim).toDF("vec_id"), dir)
      val before = PqStore.querySelf(spark, dir, candidates = depth)
        .collect().toSeq
      def stat(name: String): Long =
        PqStore.stats(spark, dir).select(col(name)).head.getLong(0)
      assert(stat("n_ingests") == 2 && stat("n_tombstoned") == 1)
      PqStore.compact(spark, dir)
      assert(stat("n_ingests") == 1 && stat("n_tombstoned") == 0)
      assert(stat("n_vectors") == e.count() - 1)
      val after = PqStore.querySelf(spark, dir, candidates = depth)
        .collect().toSeq
      assert(after == before)
      val root = StoreVersioning.requireRoot(spark, dir)
      assert(spark.read.parquet(s"$root/vectors")
        .filter(col("vec_id") === victim).count() == 0,
        "compaction must physically drop tombstoned vectors")
    } finally Pq.clearCodebookCache()
  }

  test("a qtab-carrying query batch past the broadcast ceiling is refused loudly") {
    val sp = spark; import sp.implicits._
    val dir = tmpDir("qcap")
    val e = emb("sf0.001")
    try {
      PqStore.save(e, dir)
      // the 4M CANDIDATE cap alone would admit this batch at shallow
      // depth; each query row also carries the ~4 KB ADC table, so
      // the broadcast would be ~100 MB × (nQ / 24k) — the loud
      // qtab-width cap must refuse it before any work runs
      val q = sp.range(0, Pq.MaxBroadcastQtabRows + 1)
        .select(col("id").as("query_id"),
          transform(sequence(lit(1), lit(64)),
            i => (i % lit(7)).cast("float")).as("qv"))
      val err = intercept[IllegalArgumentException] {
        PqStore.query(spark, dir, q, k = 1, candidates = 1).collect()
      }
      assert(err.getMessage.contains("qtab-carrying"),
        s"wrong refusal: ${err.getMessage}")
      // a batch AT the ceiling with the same depth passes the bound
      // checks (it may broadcast ~100 MB — by design the comfort cap)
      Pq.requireRerankBound(Pq.MaxBroadcastQtabRows, 1)
    } finally Pq.clearCodebookCache()
  }
}
