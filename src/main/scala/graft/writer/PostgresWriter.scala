package graft.writer

import java.sql.{Connection, DriverManager, PreparedStatement}
import scala.collection.immutable.ListMap

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Postgres sink (SURVEY A18-A25) over JDBC.
  *
  * Distributed write path: every executor partition opens its own
  * connection and writes its rows in parameterized batches (default
  * 5000, the reference's post-optimization batch size,
  * /root/reference/src/writer/postgres.rs:163), inside a transaction
  * (A25). Merge mode dispatches on the server major version (A22):
  * 15+ → MERGE, 9.5+ → INSERT..ON CONFLICT, else error — mirroring
  * postgres.rs:514-535.
  *
  * DDL (auto-create with PRIMARY KEY) runs once on the driver; Spark's
  * own JDBC writer cannot emit PK clauses, hence the explicit path.
  */
final class PostgresWriter(
    url: String, // jdbc:postgresql://host:port/db
    user: String,
    password: String,
    table: String,
    primaryKey: Seq[String] = Seq.empty,
    batchSize: Int = 5000,
    autoCreate: Boolean = true,
    truncateFirst: Boolean = false) extends DataWriter with Serializable {

  private def connect(): Connection =
    DriverManager.getConnection(url, user, password)

  private def majorVersion(c: Connection): Int =
    c.getMetaData.getDatabaseMajorVersion

  /** Normalize a DataFrame for binding: nested/temporal columns become
    * strings (JSONB/text), so every bind is a simple setObject.
    */
  private def normalized(df: DataFrame): DataFrame =
    df.schema.fields.foldLeft(df) { (acc, f) =>
      f.dataType match {
        case _: StructType | _: ArrayType | _: MapType =>
          acc.withColumn(f.name, to_json(col(f.name)))
        case TimestampType | DateType =>
          acc.withColumn(f.name, col(f.name).cast(StringType))
        case _ => acc
      }
    }

  override def truncate(): Unit = {
    val c = connect()
    try {
      val st = c.createStatement()
      try st.execute(PgSql.truncateSql(table))
      catch {
        // idempotent: missing table (SQLSTATE 42P01) is fine
        case e: java.sql.SQLException if e.getSQLState == "42P01" => ()
      } finally st.close()
    } finally c.close()
  }

  override def write(df: DataFrame, mode: WriteMode): WriteStats = {
    val pgSchema = PgSql.schemaOfSpark(normalized(df).schema)
    val prepared = normalized(df)

    val c = connect()
    val version = try {
      if (truncateFirst) truncate()
      if (autoCreate) {
        val st = c.createStatement()
        try st.execute(PgSql.createTableSql(table, pgSchema, primaryKey))
        finally st.close()
      }
      majorVersion(c)
    } finally c.close()

    if (mode == WriteMode.Merge && primaryKey.isEmpty)
      throw new IllegalArgumentException("merge mode requires a primary key")
    if (mode == WriteMode.Merge && version < 9)
      throw new IllegalArgumentException(
        s"postgres $version does not support upsert (needs 9.5+)")

    val (tbl, pk, bs, u, usr, pw) = (table, primaryKey, batchSize, url, user, password)
    val md = mode
    val counter = df.sparkSession.sparkContext.longAccumulator("rowsWritten")

    prepared.foreachPartition { (rows: Iterator[Row]) =>
      if (rows.hasNext) {
        val conn = DriverManager.getConnection(u, usr, pw)
        conn.setAutoCommit(false)
        try {
          val buf = new scala.collection.mutable.ArrayBuffer[Row](bs)
          def flush(): Unit = if (buf.nonEmpty) {
            val sql = md match {
              case WriteMode.Append => PgSql.insertSql(tbl, pgSchema, buf.size)
              case WriteMode.Merge if version >= 15 =>
                PgSql.mergeSql(tbl, pgSchema, pk, buf.size)
              case WriteMode.Merge =>
                PgSql.upsertSql(tbl, pgSchema, pk, buf.size)
            }
            val st = conn.prepareStatement(sql)
            try {
              PostgresWriter.bindRows(st, buf, pgSchema)
              st.executeUpdate()
            } finally st.close()
            counter.add(buf.size.toLong)
            buf.clear()
          }
          rows.foreach { r =>
            buf += r
            if (buf.size >= bs) flush()
          }
          flush()
          conn.commit()
        } catch {
          case t: Throwable => conn.rollback(); throw t
        } finally conn.close()
      }
    }
    WriteStats(counter.value)
  }
}

object PostgresWriter {

  /** Bind rows column-major into a flattened multi-row placeholder
    * list, with the per-value coercions of postgres.rs:775-851.
    */
  private[writer] def bindRows(st: PreparedStatement, rows: Iterable[Row],
      schema: ListMap[String, PgSql.PgType]): Unit = {
    var i = 1
    rows.foreach { row =>
      schema.keysIterator.zipWithIndex.foreach { case (name, ix) =>
        val v = row.get(ix)
        val _ = name
        if (v == null) st.setObject(i, null) else st.setObject(i, v)
        i += 1
      }
    }
  }
}
