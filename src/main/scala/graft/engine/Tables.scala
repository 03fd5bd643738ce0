package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

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

  /** Scoped table overlay — the adapter seam that lets the stage
    * orchestrator point a registry operator at a NON-fixture relation
    * (a renamed-column corpus, a prior stage's landed output) without
    * copying data: inside [[withOverlay]], [[table]] resolves an
    * overlaid name to the given DataFrame instead of reading
    * `dir/<name>.parquet`. The overlay is a plan substitution, so
    * column pruning and predicate pushdown flow through the renames to
    * the real source scan. Dynamically scoped (and inherited by child
    * threads): registry operators BUILD their plans inside the caller'
    * s scope, and the returned DataFrame keeps the substituted plan
    * after the scope closes.
    */
  private val overlay =
    new scala.util.DynamicVariable[Map[String, DataFrame]](Map.empty)

  def withOverlay[T](tables: Map[String, DataFrame])(body: => T): T =
    overlay.withValue(overlay.value ++ tables)(body)

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    overlay.value.get(name) match {
      case Some(df) => df
      case None => read(spark, dir, name)
    }

  private def read(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    // Normalize events.ts to TimestampType whatever the fixture stores:
    //  - TIMESTAMP(NANOS) + spark.sql.legacy.parquet.nanosAsLong → a
    //    long we rebuild (integer DIV — a double division would lose
    //    precision above 2^53 ns);
    //  - TIMESTAMP(MICROS, isAdjustedToUTC=false) → TIMESTAMP_NTZ,
    //    which epoch functions (unix_micros) reject; timestampdiff on
    //    two NTZ operands is pure wall-clock arithmetic, so rebuilding
    //    from the micros-since-epoch diff copies the stored micros
    //    exactly REGARDLESS of the session timezone. A bare
    //    .cast(TimestampType) — and, less obviously, to_utc_timestamp —
    //    shift by the session offset when the session isn't UTC;
    //    TablesTsSpec pins the non-UTC case.
    if (name != "events") df
    else df.schema.fields.find(_.name == "ts").map(_.dataType) match {
      case Some(LongType) =>
        df.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case Some(TimestampNTZType) =>
        df.withColumn("ts", timestamp_micros(expr(
          "timestampdiff(MICROSECOND, TIMESTAMP_NTZ'1970-01-01 00:00:00', ts)")))
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
