package graft.ops

import org.apache.spark.sql.functions._

/** A/B harness for the media gates' shared fixture-bits derivation:
  * the explode + bit_or groupBy shape (one full shuffle of the
  * exploded bigram relation) versus a per-row `aggregate` fold (zero
  * shuffle). Times both with a noop sink, checks bit-identity both
  * ways, and writes the two formatted plans to
  * plans/r19/fixture_bits_{explode_kept,fold_rejected}.txt.
  *
  * VERDICT (r19 optimization round, measured at sf0.1, local[32]):
  * the zero-shuffle fold LOST 3.3× (3.0–3.3 s vs 0.68–0.95 s over 3
  * noop passes, outputs bit-identical) — ArrayAggregate evaluates its
  * lambda interpreted per element while the explode + bit_or pipeline
  * is whole-stage-codegen'd end to end, and the shuffle it removes is
  * only ~8 B × distinct-bigram rows after map-side combine. The
  * explode shape stays (guide §1.1: the "ideal" fewer-shuffle plan
  * lost to the empirical loop; re-run this harness if Spark ever
  * codegens higher-order functions). Run:
  * `runMain graft.ops.ProfFixtureBits /root/testdata/sf0.1`.
  */
object ProfFixtureBits {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.engine.Sessions.local()
    val docs = graft.engine.Tables.table(spark, dir, "documents")
    docs.count()

    // the SHARED bigram bit rule (Multimodal.bigramBitIndex — one
    // definition, ADVICE r19: an inline copy here would let this
    // harness's recorded keep/reject verdict measure a stale shape)
    def idxOf(g: org.apache.spark.sql.Column) = Multimodal.bigramBitIndex(g)

    // BEFORE: explode + shiftleft + bit_or groupBy (one shuffle)
    def bitsExplode = docs
      .select(col("doc_id"), TextOps.words(col("text")).as("ws"))
      .select(col("doc_id"), explode(TextOps.ngramsOf(col("ws"), 2)).as("g"))
      .select(col("doc_id"), call_function("shiftleft", lit(1L),
        idxOf(col("g")).cast("int")).as("bit"))
      .groupBy(col("doc_id")).agg(bit_or(col("bit")).as("h"))

    // AFTER: per-row aggregate fold (zero shuffle)
    def bitsFold = docs
      .select(col("doc_id"), TextOps.words(col("text")).as("ws"))
      .select(col("doc_id"), TextOps.ngramsOf(col("ws"), 2).as("gs"))
      .filter(size(col("gs")) > 0)
      .select(col("doc_id"), aggregate(col("gs"), lit(0L),
        (acc, g) => acc.bitwiseOR(call_function("shiftleft", lit(1L),
          idxOf(g).cast("int")))).as("h"))

    val outDir = java.nio.file.Paths.get("plans/r19")
    java.nio.file.Files.createDirectories(outDir)
    java.nio.file.Files.write(outDir.resolve("fixture_bits_explode_kept.txt"),
      bitsExplode.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode).getBytes("UTF-8"))
    java.nio.file.Files.write(outDir.resolve("fixture_bits_fold_rejected.txt"),
      bitsFold.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode).getBytes("UTF-8"))

    // bit-identity both ways (exceptAll is multiset-exact)
    val aMinusB = bitsExplode.exceptAll(bitsFold).count()
    val bMinusA = bitsFold.exceptAll(bitsExplode).count()
    println(s"PROFB identical=${aMinusB == 0 && bMinusA == 0} " +
      s"(explode-fold=$aMinusB fold-explode=$bMinusA)")

    def timed(name: String)(f: => Unit): Unit = (1 to 3).foreach { i =>
      val t0 = System.nanoTime()
      f
      println(f"PROFB $name pass$i ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    timed("explode_groupby")(
      bitsExplode.write.format("noop").mode("overwrite").save())
    timed("aggregate_fold")(
      bitsFold.write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
