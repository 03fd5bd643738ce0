package graft.ops

import org.apache.spark.sql.functions._

/** Sub-stage attribution for the hammingClusters machinery (r19): at
  * sf0.1 the media cluster legs cost ~4s over their pairs siblings —
  * this times each stage (decode+persist fill, guard, groups, rep
  * pairs, label loop, final join) so the overhead is attributable
  * before touching the plan. Run:
  * `runMain graft.ops.ProfClusters /root/testdata/sf0.1`.
  */
object ProfClusters {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.engine.Sessions.local()
    graft.engine.Tables.table(spark, dir, "documents").count()
    val sp = spark; import sp.implicits._

    def timed[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROFC $name ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }

    // the audio gate's corpus derivation: the SHARED bigram bit rule
    // (Multimodal.bigramBitIndex — one definition, ADVICE r19)
    // rendered as WAVs
    val idx = Multimodal.bigramBitIndex(col("g"))
    val bits = graft.engine.Tables.table(spark, dir, "documents")
      .select(col("doc_id"), TextOps.words(col("text")).as("ws"))
      .select(col("doc_id"), explode(TextOps.ngramsOf(col("ws"), 2)).as("g"))
      .select(col("doc_id"),
        call_function("shiftleft", lit(1L), idx.cast("int")).as("bit"))
      .groupBy(col("doc_id")).agg(bit_or(col("bit")).as("h"))
      .as[(Long, Long)]
    val docs = bits.map { case (id, h) =>
      (id, Multimodal.energyCellsWav(Multimodal.cellsForBits(h)))
    }.toDF("doc_id", "payload")

    (1 to 2).foreach { round =>
      println(s"== round $round ==")
      val fps = Multimodal.audioFingerprint(docs, "payload").persist()
      val base = timed("base_distinct+persist_fill")(
        Dedup.hammingBase(fps, "doc_id", "afp").distinct().persist())
      timed("base_count")(base.count())
      timed("guard_multihash")(base.groupBy(col("id"))
        .agg(count(lit(1)).as("nh")).filter(col("nh") > 1)
        .select(col("id")).head(3))
      val groups = Dedup.hammingGroups(base)
      timed("groups_count")(groups.count())
      val repPairs = Dedup.hammingBandPairs(
        groups.select(col("rep").as("id"), col("h")), 3, 4)
      timed("rep_pairs_count")(repPairs.count())
      val labels = timed("cluster_labels_loop")(Dedup.clusterLabelsOf(
        repPairs.select(col("id_a").as("doc_a"), col("id_b").as("doc_b"))))
      val out = base.join(groups, Seq("h"))
        .join(labels.select(col("doc_id").as("rep"), col("cluster_id")),
          Seq("rep"), "left")
        .filter(col("cluster_id").isNotNull || col("n_members") >= 2)
        .select(col("id").as("doc_id"),
          coalesce(col("cluster_id"), col("rep")).as("cluster_id"))
        .orderBy(col("doc_id"))
      timed("final_join_materialize")(
        out.write.format("noop").mode("overwrite").save())
      base.unpersist(blocking = false)
      fps.unpersist(blocking = false)
      timed("full_leg_audioFpClusters")(
        Dedup.audioFpClusters(docs, "doc_id", "payload")
          .write.format("noop").mode("overwrite").save())
    }
    spark.stop()
  }
}
