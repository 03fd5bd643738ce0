package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Fixture-table access for the probe corpus and extension operators.
  *
  * Tables are the driver-generated TPC-H-ish parquet fixtures
  * (`TESTDATA.md`). Reads go through `spark.read.parquet` so Catalyst's
  * vectorized `FileSourceScan` applies column pruning and predicate
  * pushdown automatically — at 100 TB the scan only reads the columns
  * and row-groups a query touches.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    // events.ts is parquet TIMESTAMP(NANOS); with
    // spark.sql.legacy.parquet.nanosAsLong it arrives as a long that we
    // rebuild into a proper TimestampType (integer DIV — a double
    // division would lose precision above 2^53 ns).
    df.schema.fields.find(f => f.name == "ts" && f.dataType == LongType) match {
      case Some(_) if name == "events" =>
        df.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case _ => df
    }
  }

  /** Register every fixture table as a temp view named exactly as the
    * table, for `spark.sql` probes. Idempotent; view creation is a
    * metadata-only operation.
    */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => table(spark, dir, n).createOrReplaceTempView(n))
}
