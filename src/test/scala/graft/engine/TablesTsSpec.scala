package graft.engine

import java.nio.file.Files

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{Path => HPath}
import org.apache.parquet.example.data.simple.SimpleGroupFactory
import org.apache.parquet.hadoop.example.ExampleParquetWriter
import org.apache.parquet.hadoop.util.HadoopOutputFile
import org.apache.parquet.schema.{LogicalTypeAnnotation, MessageType, Types}
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Pins `Tables.table`'s events.ts normalization for BOTH parquet
  * encodings the driver fixtures have shipped so far:
  *
  *   - `TIMESTAMP(NANOS, isAdjustedToUTC=true)` — rejected by Spark's
  *     reader unless `spark.sql.legacy.parquet.nanosAsLong=true`
  *     (set in `Sessions.configure`), arriving as a nanos LONG;
  *   - `TIMESTAMP(MICROS, isAdjustedToUTC=false)` — arriving as
  *     TIMESTAMP_NTZ, which epoch functions reject.
  *
  * The round-7 bench went red on exactly an unpinned fixture flip
  * between these two; this spec makes a third flip (or a regression
  * in either branch) fail in `sbt test` rather than in the driver.
  * Both encodings must arrive as identical TimestampType micros, and
  * the NTZ relabel must be exact under a NON-UTC session timezone
  * too (ADVICE r8: a bare cast silently shifts by the local offset).
  */
class TablesTsSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark

  // instants exercising sub-second micros, the epoch, and a +1us edge
  private val micros: Seq[Long] =
    Seq(1709296496789012L, 0L, 1709296497000001L)

  /** Real TIMESTAMP(NANOS) parquet via parquet-mr's example writer —
    * Spark itself cannot write the nanos annotation, and the whole
    * point is to pin the read path the driver fixtures once used.
    */
  private def writeNanosFixture(dir: String): Unit = {
    val schema: MessageType = Types.buildMessage()
      .addField(Types.required(PrimitiveTypeName.INT64)
        .as(LogicalTypeAnnotation.timestampType(true,
          LogicalTypeAnnotation.TimeUnit.NANOS))
        .named("ts"))
      .addField(Types.required(PrimitiveTypeName.INT64).named("user_id"))
      .named("events")
    val factory = new SimpleGroupFactory(schema)
    val writer = ExampleParquetWriter.builder(HadoopOutputFile.fromPath(
        new HPath(s"$dir/events.parquet/part-00000.parquet"),
        new Configuration()))
      .withType(schema).build()
    micros.zipWithIndex.foreach { case (us, i) =>
      val g = factory.newGroup()
      g.add("ts", us * 1000L)
      g.add("user_id", i.toLong)
      writer.write(g)
    }
    writer.close()
  }

  /** TIMESTAMP(MICROS, isAdjustedToUTC=false): what Spark writes for
    * a TIMESTAMP_NTZ column — the encoding of the regenerated (r8+)
    * driver fixtures.
    */
  private def writeNtzFixture(dir: String): Unit = {
    import spark.implicits._
    // TimestampType -> NTZ cast copies the UTC wall clock under the
    // UTC-pinned test session, so the stored NTZ micros == `micros`
    micros.zipWithIndex.toDF("us", "user_id")
      .select(
        timestamp_micros(col("us")).cast(TimestampNTZType).as("ts"),
        col("user_id").cast("long").as("user_id"))
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
  }

  private def readMicros(dir: String): Seq[Long] = {
    val df = Tables.table(spark, dir, "events")
    assert(df.schema("ts").dataType == TimestampType,
      s"ts must normalize to TimestampType, got ${df.schema("ts").dataType}")
    df.select(unix_micros(col("ts")).as("us")).orderBy("us")
      .collect().map(_.getLong(0)).toSeq
  }

  test("TIMESTAMP(NANOS) fixture (nanosAsLong long) arrives as exact TimestampType micros") {
    val dir = Files.createTempDirectory("tables-ts-nanos").toString
    writeNanosFixture(dir)
    // the raw read really is the legacy long path, not a silent decode
    assert(spark.read.parquet(s"$dir/events.parquet").schema("ts").dataType ==
      org.apache.spark.sql.types.LongType)
    assert(readMicros(dir) == micros.sorted)
  }

  test("TIMESTAMP(MICROS, NTZ) fixture arrives as exact TimestampType micros") {
    val dir = Files.createTempDirectory("tables-ts-ntz").toString
    writeNtzFixture(dir)
    assert(spark.read.parquet(s"$dir/events.parquet").schema("ts").dataType ==
      TimestampNTZType)
    assert(readMicros(dir) == micros.sorted)
  }

  test("NTZ relabel is exact under a non-UTC session timezone") {
    val dir = Files.createTempDirectory("tables-ts-ntz-tz").toString
    writeNtzFixture(dir) // written under UTC: stored micros == `micros`
    val tzKey = "spark.sql.session.timeZone"
    val saved = spark.conf.get(tzKey)
    try {
      spark.conf.set(tzKey, "America/New_York")
      // unix_micros is instant-based (timezone-free); a bare
      // NTZ->TZ cast here would shift every value by -5h/-4h
      assert(readMicros(dir) == micros.sorted)
    } finally spark.conf.set(tzKey, saved)
  }

  test("both encodings of the same instants normalize identically") {
    val nanosDir = Files.createTempDirectory("tables-ts-both-n").toString
    val ntzDir = Files.createTempDirectory("tables-ts-both-m").toString
    writeNanosFixture(nanosDir)
    writeNtzFixture(ntzDir)
    assert(readMicros(nanosDir) == readMicros(ntzDir))
  }
}
