package graft.ops

import java.util.concurrent.atomic.AtomicReference

import org.apache.spark.sql.DataFrame

/** Test seam for the eager (checkpointing) builders: the optimized
  * plan of a checkpointed DataFrame is an RDD scan, so plan-shape
  * regression specs (e.g. the distinct+buffered-aggregate mix net in
  * `AggregateMixSpec`) cannot see the pipeline that BUILT it. Builders
  * route every eager materialization through [[checkpointed]], which
  * reports the pre-checkpoint DataFrame to the registered sink (if
  * any) before truncating its lineage. Production runs register no
  * sink — the hook costs a single volatile null read per checkpoint.
  */
private[graft] object PlanAudit {
  private val sink = new AtomicReference[DataFrame => Unit](null)

  /** Register `f` for the duration of `body` (test-only; one sink at
    * a time — concurrent registration is a harness bug, not a race to
    * resolve silently).
    */
  def withSink[T](f: DataFrame => Unit)(body: => T): T = {
    require(sink.compareAndSet(null, f), "PlanAudit sink already registered")
    try body finally sink.set(null)
  }

  /** Eagerly checkpoint `df`, reporting the pre-checkpoint plan to
    * the sink first (while its lineage is still the full pipeline).
    *
    * LIFETIME (ADVICE r19): the materialized blocks belong to the
    * returned plan and stay in executor storage until the Spark
    * ContextCleaner reclaims the underlying RDD after the LAST
    * DataFrame referencing it is GC'd — there is deliberately no
    * eager release seam here, because every call site's RETURNED
    * relation depends on its blocks (releasing early would kill
    * results callers still hold; see `Dedup.clearPairCache`'s
    * scaladoc for the one place an explicit release IS safe). The
    * blocks are bounded per query (each site materializes a
    * model/candidate-sized or corpus-linear relation exactly once),
    * and a long session's accumulation is reclaimed by GC; the
    * bench's interleaved passes run with this behavior, so the
    * published numbers INCLUDE any eviction churn it causes.
    */
  def checkpointed(df: DataFrame): DataFrame = {
    val s = sink.get()
    if (s != null) s(df)
    df.localCheckpoint(eager = true)
  }
}
