package graft.ops

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The persisted IVF index's three contracts:
  *
  *  1. PARITY — build→persist→read→query returns exactly what the
  *     in-session [[Similarity.knnIvf]] returns at the same
  *     parameters (same quantizer lineage, same assignment, same
  *     cosine arithmetic), which is what lets the driver gate share
  *     the brute oracle at the recall-exhaustive probe count.
  *  2. PRUNING — the query's scan of the cell-partitioned vector
  *     relation carries a dynamic partition pruning filter: probing
  *     nProbe of nCells cells READS nProbe of nCells partitions,
  *     the whole point of partitioning the index by cell.
  *  3. APPEND — growing the index against the stored centroids loses
  *     and duplicates nothing: at nProbe == nCells the grown index
  *     answers exactly like brute force over the full corpus.
  */
class IvfIndexSpec extends AnyFunSuite {

  private lazy val spark = graft.SparkTestSession.spark

  private def emb(sf: String) =
    graft.engine.Tables.table(spark, s"/root/testdata/$sf", "embeddings")

  private def tmpDir(tag: String): String =
    Files.createTempDirectory(s"graft_ivf_spec_$tag").toString

  test("persisted index query equals the in-session IVF path bit-for-bit") {
    val dir = tmpDir("parity")
    val e = emb("sf0.001")
    IvfIndex.save(e, dir, nCells = 16)
    val got = IvfIndex.querySelf(spark, dir, nProbe = 12).collect().toSeq
    val want = Similarity.knnIvf(e, nProbe = 12).collect().toSeq
    assert(want.nonEmpty, "fixture must produce neighbors")
    assert(got == want,
      s"persisted-index query must equal knnIvf (got ${got.size} rows, " +
        s"want ${want.size})")
  }

  test("save is overwrite-idempotent: a rebuilt index answers identically") {
    val dir = tmpDir("idem")
    val e = emb("sf0.001")
    IvfIndex.save(e, dir, nCells = 16)
    val first = IvfIndex.querySelf(spark, dir, nProbe = 12).collect().toSeq
    IvfIndex.save(e, dir, nCells = 16)
    val second = IvfIndex.querySelf(spark, dir, nProbe = 12).collect().toSeq
    assert(first == second)
  }

  test("probe join prunes index partitions dynamically at the scan") {
    val dir = tmpDir("prune")
    IvfIndex.save(emb("sf0.001"), dir, nCells = 16)
    val q = IvfIndex.querySelf(spark, dir, nProbe = 4)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"),
      "the cell-partitioned vector scan must carry a dynamic partition " +
        s"pruning filter; got plan:\n$plan")
  }

  test("external query ids are a separate namespace: no self-exclusion") {
    val sp = spark; import sp.implicits._
    val dir = tmpDir("extq")
    val e = emb("sf0.001")
    IvfIndex.save(e, dir, nCells = 16)
    // an external query that IS vector 0's embedding, under the
    // colliding external id 0: vector 0 itself must come back as the
    // top neighbor (cosine 1.0), not be silently excluded
    val q0 = e.filter(col("vec_id") === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val top = IvfIndex.query(spark, dir, q0, k = 1, nProbe = 16)
      .select(col("neighbor_id")).as[Long].collect().toSeq
    assert(top == Seq(0L),
      s"external id 0 must still see indexed vector 0 as its neighbor, got $top")
  }

  test("pruning survives tombstones: the anti join stays off the scan side") {
    val sp = spark; import sp.implicits._
    val dir = tmpDir("prunedel")
    val e = emb("sf0.001")
    IvfIndex.save(e, dir, nCells = 16)
    IvfIndex.delete(Seq(9999999L).toDF("vec_id"), dir)
    val q = IvfIndex.querySelf(spark, dir, nProbe = 4)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"),
      "a tombstoned index must still dynamic-prune the vector scan; " +
        s"got plan:\n$plan")
  }

  test("tombstoned vectors stop appearing as neighbors; rebuild resets") {
    val sp = spark; import sp.implicits._
    val dir = tmpDir("tombstone")
    val e = emb("sf0.001")
    IvfIndex.save(e, dir, nCells = 16)
    val before = IvfIndex.querySelf(spark, dir, nProbe = 16)
      .select(col("query_id"), col("neighbor_id")).as[(Long, Long)]
      .collect().toSeq
    assert(before.nonEmpty)
    // retract the single most popular neighbor: it must vanish from
    // every top-k, and the displaced ranks must refill — equal to an
    // index that never contained it (exhaustive probe = brute over
    // the remainder, minus its own queries)
    // victim from outside the self-query id range: retracting a doc
    // that is itself a gate query would also remove the query row,
    // which is querySelf's caller contract, not the index's
    val victim = before.filter(_._2 >= 5).groupBy(_._2).maxBy(_._2.size)._1
    IvfIndex.delete(Seq(victim).toDF("vec_id"), dir)
    val after = IvfIndex.querySelf(spark, dir, nProbe = 16)
      .collect().toSeq
    val want = Similarity.knnBrute(e.filter(col("vec_id") =!= victim))
      .collect().toSeq
    assert(after == want)
    IvfIndex.save(e, dir, nCells = 16)
    val rebuilt = IvfIndex.querySelf(spark, dir, nProbe = 16)
      .select(col("query_id"), col("neighbor_id")).as[(Long, Long)]
      .collect().toSeq
    assert(rebuilt == before)
  }

  test("compaction drops tombstoned vectors physically and answers identically") {
    val sp = spark; import sp.implicits._
    val dir = tmpDir("compactivf")
    val e = emb("sf0.001")
    IvfIndex.save(e.filter(col("vec_id") % 2 === 0), dir, nCells = 16)
    IvfIndex.append(e.filter(col("vec_id") % 2 === 1), dir, "odd")
    val pairs = IvfIndex.querySelf(spark, dir, nProbe = 16)
      .select(col("neighbor_id")).as[Long].collect().toSeq
    val victim = pairs.filter(_ >= 5).head
    IvfIndex.delete(Seq(victim).toDF("vec_id"), dir)
    val before = IvfIndex.querySelf(spark, dir, nProbe = 16).collect().toSeq
    val rootBefore = StoreVersioning.requireRoot(spark, dir)
    IvfIndex.compact(spark, dir)
    val rootAfter = StoreVersioning.requireRoot(spark, dir)
    assert(rootAfter != rootBefore)
    assert(new java.io.File(rootBefore).exists(),
      "the superseded version must survive one commit for readers")
    IvfIndex.compact(spark, dir)
    assert(!new java.io.File(rootBefore).exists(),
      "the second commit must prune the twice-superseded version")
    val after = IvfIndex.querySelf(spark, dir, nProbe = 16).collect().toSeq
    assert(after == before)
    assert(!new java.io.File(s"$rootAfter/deletes").exists())
    val vecs = spark.read.parquet(s"$rootAfter/vectors")
    assert(vecs.filter(col("vec_id") === victim).count() == 0,
      "compaction must physically drop tombstoned vectors")
    assert(vecs.count() == e.count() - 1)
  }

  test("append against stored centroids: exhaustive probe equals brute over the union") {
    val dir = tmpDir("append")
    val e = emb("sf0.001")
    IvfIndex.save(e.filter(col("vec_id") % 2 === 0), dir, nCells = 16)
    IvfIndex.append(e.filter(col("vec_id") % 2 === 1), dir, "odd")
    // no vector lost or duplicated by the append
    val idx = spark.read.parquet(
      s"${StoreVersioning.requireRoot(spark, dir)}/vectors")
    assert(idx.count() == e.count())
    assert(idx.select(col("vec_id")).distinct().count() == e.count())
    val got = IvfIndex.querySelf(spark, dir, nProbe = 16).collect().toSeq
    val want = Similarity.knnBrute(e).collect().toSeq
    assert(got == want,
      s"exhaustive probe over the appended index must equal brute " +
        s"(got ${got.size} rows, want ${want.size})")
    // retrying the SAME append (the recovery contract for a failed or
    // replayed append) overwrites its own ingest partitions instead of
    // double-inserting vectors — a duplicated vector would occupy two
    // top-k ranks in every query it neighbors
    IvfIndex.append(e.filter(col("vec_id") % 2 === 1), dir, "odd")
    val idx2 = spark.read.parquet(
      s"${StoreVersioning.requireRoot(spark, dir)}/vectors")
    assert(idx2.count() == e.count(), "a retried append must be idempotent")
    assert(IvfIndex.querySelf(spark, dir, nProbe = 16).collect().toSeq == want)
  }

  test("query above the broadcast gate degrades to a partitioned join, same rows") {
    val dir = tmpDir("bcgate")
    val e = emb("sf0.001")
    IvfIndex.save(e, dir, nCells = 16)
    val q = e.filter(col("vec_id") >= 100 && col("vec_id") < 110)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val broadcastRegime =
      IvfIndex.query(spark, dir, q, k = 5, nProbe = 16).collect().toSeq
    // force the shuffle regime: a gate of 1 probe row puts ANY real
    // query batch past it, the hint drops, AQE plans from sizes — the
    // rows must be bit-identical (only the physical join strategy and
    // the pruning opportunity change)
    val shuffleRegime = IvfIndex.query(spark, dir, q, k = 5, nProbe = 16,
      maxBroadcastProbeRows = 1L).collect().toSeq
    assert(broadcastRegime.nonEmpty)
    assert(shuffleRegime == broadcastRegime,
      "the size-gated regimes must agree row-for-row")
  }

  test("a training sample smaller than nCells refuses the fit loudly") {
    // round-16 guard: a sub-nCells sample would seed DUPLICATE
    // centroids, and the strict-< argmin (ties to the lower cell)
    // starves every duplicate cell permanently — the store would
    // silently commit fewer effective cells than requested. The fit
    // must refuse with the remedy named, in both init regimes.
    val e = emb("sf0.001")
    // kmeans++ regime (nCells <= 64): 8 corpus rows, trainMod=1 keeps
    // all 8 in the sample — still short of 16 cells
    val err = intercept[IllegalArgumentException] {
      IvfIndex.save(e.filter(col("vec_id") < 8), tmpDir("tiny"),
        nCells = 16, trainMod = 1)
    }
    assert(err.getMessage.contains("Lower trainMod") &&
      err.getMessage.contains("nCells=16"),
      s"wrong refusal: ${err.getMessage}")
    // spread-Forgy regime (nCells > 64): the full 500-row fixture at
    // trainMod=8 hash-samples ~60 rows < 100 cells
    val err2 = intercept[IllegalArgumentException] {
      IvfIndex.save(e, tmpDir("tiny2"), nCells = 100, trainMod = 8)
    }
    assert(err2.getMessage.contains("Lower trainMod"),
      s"wrong refusal: ${err2.getMessage}")
    // the guard counts DISTINCT sample points: a corpus of enough ROWS
    // whose duplicated vectors collapse below nCells must refuse too —
    // duplicate seeds starve their cells exactly like a short sample
    val sp2 = spark
    import sp2.implicits._
    val dup = sp2.range(0, 40).select(col("id").as("vec_id"),
      org.apache.spark.sql.functions.transform(
        org.apache.spark.sql.functions.sequence(
          org.apache.spark.sql.functions.lit(1),
          org.apache.spark.sql.functions.lit(64)),
        i => (i % ((col("vec_id") % 4) + 2)).cast("float")).as("embedding"))
    val err3 = intercept[IllegalArgumentException] {
      // 40 rows but only 4 distinct vectors (id mod 4 shapes) < 16
      IvfIndex.save(dup, tmpDir("dupseeds"), nCells = 16, trainMod = 1)
    }
    assert(err3.getMessage.contains("distinct"),
      s"wrong refusal: ${err3.getMessage}")
  }
}
