package graft.writer

import org.apache.spark.sql.DataFrame

/** Write modes (SURVEY A24, /root/reference/src/writer/mod.rs:10-46). */
sealed trait WriteMode
object WriteMode {
  case object Append extends WriteMode
  case object Merge extends WriteMode

  def parse(s: String): WriteMode = s.toLowerCase match {
    case "append" => Append
    case "merge" | "upsert" => Merge
    case other => throw new IllegalArgumentException(s"unknown write mode '$other'")
  }
}

final case class WriteStats(rowsWritten: Long)

/** Sink abstraction (SURVEY A17): a writer consumes a DataFrame under a
  * write mode. Implementations must be distributed — no
  * collect-to-driver in any write path.
  */
trait DataWriter {
  def write(df: DataFrame, mode: WriteMode): WriteStats

  /** Idempotent truncate of the destination, if supported. */
  def truncate(): Unit = ()
}

/** Parquet sink — the test/local warehouse target. */
final class ParquetWriter(path: String) extends DataWriter {
  override def write(df: DataFrame, mode: WriteMode): WriteStats = {
    val saveMode = mode match {
      case WriteMode.Append => "append"
      // parquet has no keyed merge; Merge maps to overwrite for the
      // local-warehouse sink
      case WriteMode.Merge => "overwrite"
    }
    df.write.mode(saveMode).parquet(path)
    WriteStats(df.sparkSession.read.parquet(path).count())
  }
}
