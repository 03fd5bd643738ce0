package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery}
import org.apache.spark.sql.types.StructType

import graft.ops.Kmeans

/** Streaming serving half of the lattice k-means family — the
  * topic-mixture monitor a live ingestion pipeline runs: vectors
  * arriving on a stream are assigned to BATCH-FIT centroids (the
  * standard offline-fit / online-serve split: Lloyd needs multi-pass,
  * a stream gets the frozen model), and the running per-cluster
  * occupancy + lattice inertia surface as a continuously-updated
  * table. A cluster whose share of arriving data drifts from the
  * fit-time mixture is the earliest online signal of topic drift /
  * mode collapse in a data feed.
  *
  * State is k rows of counters (cluster → n, Σdist²) — O(k), never
  * the vectors; the assignment itself is a stateless per-row
  * projection (quantize + one native int8_dot per centroid), so the
  * streaming plan is exactly the batch plan's map stage feeding a
  * tiny running aggregate. Determinism carries over: the same rows
  * in any arrival order and any micro-batching produce the same
  * final table as the batch assignment — pinned by the multi-batch
  * parity spec.
  */
object StreamingKmeans {

  /** Running (cluster, n, sum_dist2) over a parquet-file stream of
    * embedding rows, in complete mode to a memory sink named
    * `queryName`. `maxFilesPerTrigger > 0` forces multi-batch
    * execution so specs exercise aggregate state across batches.
    */
  def streamingClusterCounts(spark: SparkSession, dir: String,
      schema: StructType, queryName: String,
      cents: Array[Array[Long]],
      maxFilesPerTrigger: Int = 0): StreamingQuery = {
    val reader = spark.readStream.schema(schema)
    val src = (if (maxFilesPerTrigger > 0)
        reader.option("maxFilesPerTrigger", maxFilesPerTrigger)
      else reader).parquet(dir)
    Kmeans.assignWithCentroids(src, cents)
      .groupBy(col("cluster"))
      .agg(count(lit(1)).as("n"), sum(col("dist2")).as("sum_dist2"))
      .writeStream.outputMode("complete")
      .format("memory").queryName(queryName)
      .start()
  }

  /** The ONLINE drift trigger composing the cluster monitor with the
    * batch mixture-drift contract: arriving vectors assign to the
    * frozen batch-fit centroids, running per-cluster occupancy
    * compares each micro-batch against the fit-time `baseCounts`,
    * and a cluster whose arrival share has moved more than `num/den`
    * from its baseline share emits `drift = 1` — the earliest online
    * signal that a feed's topic mixture is walking away from the
    * corpus the model was curated on. Emits the FULL per-cluster
    * report every micro-batch (append mode, `upd` stamps the batch),
    * so the sink holds the online history and its last `upd` is the
    * exact batch report — parity with [[graft.ops.Kmeans
    * .occupancyDrift]] is spec-pinned, flag arithmetic included
    * (BigInt cross-multiplication here == DECIMAL(38,0) there).
    *
    * Scale shape: assignment is the stateless per-row projection;
    * per-batch counts PRE-AGGREGATE per partition (mapPartitions)
    * before funnelling into the single O(k)-state group, so the
    * stateful task sees ≤ partitions·k counter rows per batch, never
    * the vectors.
    */
  def streamingClusterDrift(spark: SparkSession, dir: String,
      schema: StructType, queryName: String,
      cents: Array[Array[Long]], baseCounts: Map[Int, Long],
      num: Int = 1, den: Int = 10,
      maxFilesPerTrigger: Int = 0): StreamingQuery = {
    require(num > 0 && den > 0, s"threshold must be a positive rational: $num/$den")
    import spark.implicits._
    val reader = spark.readStream.schema(schema)
    val src = (if (maxFilesPerTrigger > 0)
        reader.option("maxFilesPerTrigger", maxFilesPerTrigger)
      else reader).parquet(dir)
    val tb = baseCounts.values.sum
    val partial = Kmeans.assignWithCentroids(src, cents)
      .select(col("cluster")).as[Int]
      .mapPartitions { it =>
        val m = scala.collection.mutable.Map.empty[Int, Long]
        it.foreach(c => m(c) = m.getOrElse(c, 0L) + 1L)
        m.iterator
      }
    partial
      .groupByKey(_ => 0)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout) {
        (_: Int, rows: Iterator[(Int, Long)],
            state: GroupState[DriftState]) =>
          val prev = state.getOption.getOrElse(DriftState(0L, Map.empty))
          val m = scala.collection.mutable.Map(prev.counts.toSeq: _*)
          rows.foreach { case (c, n) => m(c) = m.getOrElse(c, 0L) + n }
          val st = DriftState(prev.upd + 1, m.toMap)
          state.update(st)
          val tc = st.counts.values.sum
          (baseCounts.keySet ++ st.counts.keySet).toSeq.sorted.iterator
            .map { c =>
              val nb = baseCounts.getOrElse(c, 0L)
              val nc = st.counts.getOrElse(c, 0L)
              DriftRow(st.upd, c, nb, nc,
                if (tb > 0) Some(nb.toDouble / tb) else None,
                if (tc > 0) Some(nc.toDouble / tc) else None,
                if (tb > 0 && tc > 0)
                  Some(nc.toDouble / tc - nb.toDouble / tb) else None,
                if ((BigInt(nc) * tb - BigInt(nb) * tc).abs * den
                    > BigInt(num) * tb * tc) 1 else 0)
            }
      }
      .writeStream.outputMode("append")
      .format("memory").queryName(queryName)
      .start()
  }

  /** Streaming SemDeDup — the online counterpart of
    * [[graft.ops.Kmeans.semanticDedup]] under the same offline-fit /
    * online-serve split as the cluster monitor: arriving vectors
    * assign to the frozen batch-fit centroids (stateless projection),
    * and per CELL a stateful stage emits the duplicate-pair relation
    * `(vec_a, vec_b)` (lower id first) whenever the later-arriving
    * side of a qualifying pair lands. Like the streaming MinHash
    * candidates, the emitted PAIR SET is arrival-order-invariant —
    * pair {a,b} appears exactly when the second of the two arrives,
    * under any micro-batching — so the completed stream equals the
    * batch pair relation, and the batch keep/drop flags are a
    * grouped count downstream (`keep(v) = no pair with vec_b = v`),
    * parity spec-pinned. Emitting pairs rather than keep flags is
    * what makes append mode correct: a keep decision could be
    * retracted by a later smaller-id arrival, a pair never is.
    *
    * The duplicate cut is the batch operator's exact integer algebra
    * (`dot > 0 ∧ dot²·den² ≥ num²·‖a‖²·‖b‖²` in BigInt) on the packed
    * int8 codes.
    *
    * STATE CONTRACT: with the default `ttlIdLag = 0`, state per cell
    * is its FULL member list so far (64 B of codes per member) — cell
    * occupancy, not corpus size, but on an infinite stream it grows
    * without bound: complete batch parity and bounded state cannot
    * coexist (a forgotten member is a missable pair). The default is
    * therefore for BOUNDED corpora (a backfill, a day's partition);
    * route ancient history through the batch operator. For infinite
    * streams, `ttlIdLag > 0` turns on eviction: after each update a
    * cell forgets members whose id trails the cell's max seen id by
    * more than the lag — under the operator's own contract that
    * `vec_id` is the arrival order, this is a sliding dedup window,
    * and pairs spanning more than the lag are KNOWINGLY lost (the
    * eviction spec shows exactly which). An evicted member was
    * already compared against everything that arrived before its
    * eviction, so near-window pairs are unaffected.
    */
  def streamingSemanticPairs(spark: SparkSession, dir: String,
      schema: StructType, queryName: String,
      cents: Array[Array[Long]], num: Int = 2, den: Int = 5,
      maxFilesPerTrigger: Int = 0, ttlIdLag: Long = 0): StreamingQuery = {
    require(num > 0 && den > 0 && num <= den,
      s"cosine threshold must be a rational in (0, 1]: $num/$den")
    import spark.implicits._
    val reader = spark.readStream.schema(schema)
    val src = (if (maxFilesPerTrigger > 0)
        reader.option("maxFilesPerTrigger", maxFilesPerTrigger)
      else reader).parquet(dir)

    def isDup(a: Array[Byte], b: Array[Byte]): Boolean = {
      var dot = 0L; var sa = 0L; var sb = 0L; var i = 0
      while (i < a.length) {
        dot += a(i).toLong * b(i); sa += a(i).toLong * a(i)
        sb += b(i).toLong * b(i); i += 1
      }
      dot > 0 && BigInt(dot) * BigInt(dot) * (den.toLong * den) >=
        BigInt(num.toLong * num) * BigInt(sa) * BigInt(sb)
    }

    def update(cluster: Int, rows: Iterator[(Int, Long, Array[Byte])],
        state: GroupState[List[(Long, Array[Byte])]]): Iterator[(Long, Long)] = {
      var seen = state.getOption.getOrElse(List.empty)
      val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
      // ascending id within the batch: both orders of an in-batch
      // pair resolve identically, and re-delivered rows are dropped
      rows.toSeq.sortBy(_._2).foreach { case (_, id, pack) =>
        if (!seen.exists(_._1 == id)) {
          seen.foreach { case (pid, ppack) =>
            if (isDup(ppack, pack))
              out += ((math.min(pid, id), math.max(pid, id)))
          }
          seen = (id, pack) :: seen
        }
      }
      if (ttlIdLag > 0 && seen.nonEmpty) {
        // sliding-window eviction: ids are the arrival order, so the
        // cell's max id is its clock; members older than the lag can
        // no longer form a within-window pair
        val horizon = seen.iterator.map(_._1).max - ttlIdLag
        seen = seen.filter(_._1 >= horizon)
      }
      state.update(seen)
      out.iterator
    }

    EventWindows.runToMemory(
      Kmeans.assignWithCentroidsPacked(src, cents)
        .select(col("cluster"), col("vec_id"), col("pack"))
        .as[(Int, Long, Array[Byte])]
        .groupByKey(_._1)
        .flatMapGroupsWithState(OutputMode.Append,
          GroupStateTimeout.NoTimeout)(update)
        .toDF("vec_a", "vec_b"),
      queryName, "append")
  }
}

/** One emitted drift-report row, per cluster per micro-batch. `upd`
  * is the batch sequence number — the LAST upd's rows are the current
  * report, earlier upds its online history. Top-level (not nested in
  * the object): encoder codegen for flatMapGroupsWithState resolves
  * constructors reflectively and object-nested case classes trip it.
  */
final case class DriftRow(upd: Long, cluster: Int, n_base: Long,
    n_cur: Long, share_base: Option[Double], share_cur: Option[Double],
    delta_share: Option[Double], drift: Int)

/** Running per-cluster arrival counts + the batch sequence number —
  * the O(k) state of [[StreamingKmeans.streamingClusterDrift]].
  */
final case class DriftState(upd: Long, counts: Map[Int, Long])
