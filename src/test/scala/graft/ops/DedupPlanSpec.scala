package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape regression tests for the dedup candidate stages.
  *
  * The public dedup builders eagerly checkpoint (the shared-shingle
  * design), so their returned plans show a checkpoint RDD scan, not
  * the pipeline — these specs pin the shapes on the PRE-checkpoint
  * candidate stages instead: a refactor that reintroduces a window
  * sort or lets a blocking join degenerate into a nested loop fails
  * here, not in a bench regression three rounds later.
  */
class DedupPlanSpec extends AnyFunSuite {

  private lazy val spark = graft.SparkTestSession.spark
  private lazy val sh = Dedup.shingled(
    graft.engine.Tables.table(spark, "/root/testdata/sf0.001", "documents"))

  private def physical(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("prefix-filter candidates: no Window node anywhere in the plan") {
    val plan = physical(Dedup.prefixCandidates(sh, leftMax = 200))
    assert(!plan.contains("Window"),
      s"prefix path reintroduced a window sort:\n$plan")
  }

  test("no nested-loop or cartesian join in any candidate stage") {
    val plans = Map(
      "prefix" -> physical(Dedup.prefixCandidates(sh, 200)),
      "minhash" -> physical(Dedup.minhashCandidates(sh, 200, 32, 2)),
      "simhash" -> physical(Dedup.simhashCandidates(sh, 200, 160, 8, 16)))
    plans.foreach { case (name, plan) =>
      assert(!plan.contains("BroadcastNestedLoopJoin"),
        s"$name candidates degenerated to a nested loop:\n$plan")
      assert(!plan.contains("CartesianProduct"),
        s"$name candidates degenerated to a cartesian product:\n$plan")
    }
  }

  test("minhash and simhash candidate joins are hash equi-joins") {
    val hashJoin = """(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin)""".r
    Seq(
      "minhash" -> physical(Dedup.minhashCandidates(sh, 200, 32, 2)),
      "simhash" -> physical(Dedup.simhashCandidates(sh, 200, 160, 8, 16)))
      .foreach { case (name, plan) =>
        assert(hashJoin.findFirstIn(plan).isDefined,
          s"$name candidate join is not a hash equi-join:\n$plan")
      }
  }

  test("duplicateSpans: corpus exploded once, cross-doc test fused in-partition") {
    val docs = graft.engine.Tables
      .table(spark, "/root/testdata/sf0.001", "documents")
    val plan = physical(Dedup.duplicateSpans(docs))
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"span detection degenerated from equi-joins:\n$plan")
    // the positional-gram explode is the expensive relation: the
    // cross-doc min/max must run as a window INSIDE the gram
    // partition — an aggregate-then-join-back shape re-explodes the
    // corpus (a second Generate), doubling the dominant cost
    val generates = "Generate posexplode".r.findAllIn(plan).size
    assert(generates == 1,
      s"expected exactly 1 posexplode of the corpus, found $generates:\n$plan")
  }

  test("spanRemove / decontaminateRemove: equi-joins only, one corpus explode per gram relation") {
    val docs = graft.engine.Tables
      .table(spark, "/root/testdata/sf0.001", "documents")
    val remove = physical(Dedup.spanRemove(docs))
    assert(!remove.contains("BroadcastNestedLoopJoin") &&
      !remove.contains("CartesianProduct"),
      s"span removal degenerated from equi-joins:\n$remove")
    // the hit relation must come from the SAME single fused-window
    // explode as duplicateSpans (one posexplode of the corpus); the
    // reconstruction side re-splits the docs but never re-explodes
    val gen = "Generate posexplode".r.findAllIn(remove).size
    assert(gen == 1,
      s"expected exactly 1 posexplode in spanRemove, found $gen:\n$remove")
    val decon = physical(Dedup.decontaminateRemove(
      docs.filter(org.apache.spark.sql.functions.col("doc_id") >= 50),
      docs.filter(org.apache.spark.sql.functions.col("doc_id") < 50)))
    assert(!decon.contains("CartesianProduct"),
      s"decontaminateRemove degenerated to a cartesian:\n$decon")
  }

  test("embeddingCosinePairs rejects an unbounded left side") {
    val emb = graft.engine.Tables.table(spark, "/root/testdata/sf0.001", "embeddings")
    val e = intercept[IllegalArgumentException] {
      Dedup.embeddingCosinePairs(emb, leftMax = Long.MaxValue)
    }
    assert(e.getMessage.contains("embeddingNearDupAnn"))
    // the sanctioned bound still constructs
    Dedup.embeddingCosinePairs(emb, leftMax = 500)
  }

  test("full-corpus ANN: the only nested loop is the tiny centroid broadcast") {
    // the per-vector centroid scoring is crossJoin(broadcast(nCells
    // rows)) — physically a BroadcastNestedLoopJoin whose build side
    // is the 16-row centroid LocalTableScan: bounded and sanctioned.
    // Since the r19 assign-once checkpoint, that subtree lives in the
    // ONE materialized probes relation (seen through the PlanAudit
    // sink), and the returned candidate plan must contain NO nested
    // loop at all — both sides of the cell pairing read the
    // checkpointed probes. Everything else (candidate pairing on
    // cell, vector re-joins) must stay hash equi-joins; a nested loop
    // in the final plan, a non-centroid nested loop in the probes
    // pipeline, or a cartesian over corpus-sized relations is the
    // regression this pins.
    val emb = graft.engine.Tables.table(spark, "/root/testdata/sf0.001", "embeddings")
    val captured = scala.collection.mutable.ArrayBuffer[String]()
    val ann = PlanAudit.withSink(df => captured += physical(df)) {
      physical(Similarity.embeddingNearDupAnn(emb))
    }
    assert(!ann.contains("BroadcastNestedLoopJoin"),
      s"candidate plan nest-loops (probes no longer assigned once?):\n$ann")
    assert(!ann.contains("CartesianProduct"),
      s"ANN path contains a shuffled cartesian product:\n$ann")
    val cellJoin = """(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin) \[cell""".r
    assert(cellJoin.findFirstIn(ann).isDefined,
      s"candidate pairing is not an equi-join on cell:\n$ann")
    // exactly one probes materialization, carrying exactly the
    // sanctioned centroid broadcast-cross shape
    assert(captured.size == 1,
      s"expected one checkpointed probes relation, saw ${captured.size}")
    val probes = captured.head
    val bnljAll = "BroadcastNestedLoopJoin".r.findAllIn(probes).size
    val bnljCentroid =
      "BroadcastNestedLoopJoin BuildRight, Cross".r.findAllIn(probes).size
    assert(bnljAll == bnljCentroid && bnljAll > 0,
      s"non-centroid nested loop in the probes pipeline " +
        s"($bnljCentroid/$bnljAll):\n$probes")
    assert(!probes.contains("CartesianProduct"),
      s"probes pipeline contains a shuffled cartesian product:\n$probes")
  }

  test("ANN boundA split: branches disjoint, pairs equal the filtered unbounded set") {
    import org.apache.spark.sql.functions.col
    val emb = graft.engine.Tables.table(spark, "/root/testdata/sf0.001", "embeddings")
    val boundA = 250L
    try {
      val bounded = Similarity.embeddingNearDupAnn(emb, boundA = boundA)
      val full = Similarity.embeddingNearDupAnn(emb)
      def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
        df.select(col("vec_a"), col("vec_b")).collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
      val b = pairs(bounded)
      val f = pairs(full.filter(col("vec_a") < boundA))
      assert(pairs(full).nonEmpty, "unbounded ANN found no pairs at sf0.001")
      assert(b == f,
        s"boundA path diverges from the filtered unbounded set: " +
          s"only-bounded=${b -- f}, only-full=${f -- b}")
      // disjointness marker: the second union branch's probe side must
      // carry the complementary >= filter, or overlapping pairs are
      // scored twice before the distinct (the round-7 review fix)
      val plan = physical(bounded)
      assert(plan.contains(">= 250"),
        s"second boundA branch lost its complementary probe-side filter:\n$plan")
    } finally Similarity.clearQuantizerCache()
  }

  test("full-corpus ANN: the similarity threshold prunes BELOW the distinct shuffle") {
    // the round-7 fusion contract: scoring happens inside the cell
    // join and the threshold filter runs in-partition, so the only
    // exchange over pair-shaped rows is the distinct over threshold
    // SURVIVORS. In the top-down plan print, the distinct's exchange
    // must therefore sit ABOVE the threshold filter; a refactor that
    // reintroduces distinct-then-score would flip that order and
    // reinstate a shuffle proportional to the candidate count
    // (measured 20x at the 100x profile, PROF_SF1.md).
    val emb = graft.engine.Tables.table(spark, "/root/testdata/sf0.001", "embeddings")
    val ann = physical(Similarity.embeddingNearDupAnn(emb, minCosine = 0.4))
    val distinctExchange = ann.indexOf("Exchange hashpartitioning(vec_a")
    val thresholdFilter = ann.indexOf(">= 0.4")
    assert(distinctExchange >= 0, s"no distinct exchange over pairs found:\n$ann")
    assert(thresholdFilter >= 0, s"no similarity-threshold filter found:\n$ann")
    assert(distinctExchange < thresholdFilter,
      s"threshold filter sits above the distinct exchange — the pair " +
        s"stream is being shuffled before pruning:\n$ann")
  }
}
