package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Synthesizes a 10× (sf1.0-equivalent) documents/embeddings corpus
  * from the sf0.1 fixture, for scale-sanity profiling of the
  * dedup/ANN family (the driver's fixtures stop at sf0.1).
  *
  * The copies are structure-preserving, so per-copy ground truth is
  * known without recomputing it:
  * - documents: every word in copy k is prefixed `c<k>_` — a vocabulary
  *   bijection, so trigram sets map 1:1, every within-copy Jaccard is
  *   EXACTLY preserved, and cross-copy similarity is exactly 0 (no
  *   shared shingles → no cross-copy candidates).
  * - embeddings: copy k flips the sign of a deterministic
  *   hash-selected dim subset — an orthogonal transform, so within-copy
  *   cosines are exactly preserved while copies land in different
  *   regions of the space.
  * IDs offset by k·10⁷ per copy.
  *
  * Run: `runMain graft.ops.ScaleGen [srcDir outDir copies]`.
  */
object ScaleGen {
  def main(args: Array[String]): Unit = {
    val spark = graft.engine.Sessions.local()
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val out = args.lift(1).getOrElse("target/sf1")
    val copies = args.lift(2).map(_.toInt).getOrElse(10)
    gen(spark, src, out, copies)
    spark.stop()
  }

  def gen(spark: SparkSession, src: String, out: String, copies: Int): Unit = {
    val docs = graft.engine.Tables.table(spark, src, "documents")
    val emb = graft.engine.Tables.table(spark, src, "embeddings")

    def copyOf(df: DataFrame, k: Int, idCol: String)(body: DataFrame => DataFrame): DataFrame =
      body(df).withColumn(idCol, col(idCol) + lit(k * 10000000L))

    val docsOut = (0 until copies).map { k =>
      copyOf(docs, k, "doc_id") { d =>
        if (k == 0) d
        else d.withColumn("text",
          array_join(transform(split(col("text"), " "),
            w => concat(lit(s"c${k}_"), w)), " "))
      }
    }.reduce(_ unionByName _)

    val embOut = (0 until copies).map { k =>
      copyOf(emb, k, "vec_id") { e =>
        if (k == 0) e
        else e.withColumn("embedding",
          zip_with(col("embedding"),
            sequence(lit(0), size(col("embedding")) - 1),
            (x, i) => when(pmod(xxhash64(i, lit(k)), lit(2)) === 0, -x).otherwise(x)))
      }
    }.reduce(_ unionByName _)

    // events: copy k shifts user_id (and event_id) into its own id
    // space, so per-user structure — sessions, funnels, view→click
    // pairs — is exactly preserved per copy and never crosses copies;
    // the event-time distribution is left untouched (watermarks and
    // windows see the same timeline, copies only multiply users)
    val ev = graft.engine.Tables.table(spark, src, "events")
    // the copy stride must clear every base user_id, or copies silently
    // collide and corrupt the "per-user structure never crosses copies"
    // invariant the scale rows depend on
    val maxUser = ev.agg(max(col("user_id"))).head().getLong(0)
    require(maxUser < 1000000L,
      s"events user_id stride 1e6 would collide: max base user_id $maxUser")
    val evOut = (0 until copies).map { k =>
      copyOf(ev, k, "event_id") { e =>
        if (k == 0) e
        else e.withColumn("user_id", col("user_id") + lit(k * 1000000L))
      }
    }.reduce(_ unionByName _)

    docsOut.repartition(8).write.mode("overwrite").parquet(s"$out/documents.parquet")
    embOut.repartition(8).write.mode("overwrite").parquet(s"$out/embeddings.parquet")
    evOut.repartition(8).write.mode("overwrite").parquet(s"$out/events.parquet")
    println(s"SCALEGEN wrote ${copies}x corpus to $out: " +
      s"docs=${spark.read.parquet(s"$out/documents.parquet").count()} " +
      s"embs=${spark.read.parquet(s"$out/embeddings.parquet").count()} " +
      s"events=${spark.read.parquet(s"$out/events.parquet").count()}")
  }
}
