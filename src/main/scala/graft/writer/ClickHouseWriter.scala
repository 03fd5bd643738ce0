package graft.writer

import java.sql.{Connection, DriverManager, PreparedStatement}
import scala.collection.immutable.ListMap

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** ClickHouse sink over JDBC — the writer the reference plans
  * (/root/reference/README.md:121) built on this engine's
  * [[DataWriter]] factory seam, with the same distributed shape as
  * [[PostgresWriter]]: DDL once on the driver, then every executor
  * partition opens its own connection and lands its rows in
  * parameterized multi-row batches.
  *
  * Mode semantics follow ClickHouse's own model rather than
  * pretending it is Postgres: Append inserts into a `MergeTree`;
  * Merge inserts into a `ReplacingMergeTree` keyed by the primary
  * key and then issues one driver-side `OPTIMIZE TABLE .. FINAL` so
  * replaced keys compact away immediately (ClickHouse has no upsert
  * statement — replace-on-merge is its idiomatic equivalent).
  *
  * The sandbox has no ClickHouse JDBC driver jar, so like the
  * Postgres COPY path the class touches only `java.sql` interfaces;
  * a production classpath with `clickhouse-jdbc` present needs no
  * code change. The statement text itself is covered by
  * [[ChSqlSpec]] the way the reference tests its writers.
  */
final class ClickHouseWriter(
    url: String, // jdbc:clickhouse://host:port/db
    user: String,
    password: String,
    table: String,
    primaryKey: Seq[String] = Seq.empty,
    batchSize: Int = 5000,
    autoCreate: Boolean = true,
    schemaEvolution: Boolean = false) extends DataWriter with Serializable {

  private def connect(): Connection =
    DriverManager.getConnection(url, user, password)

  /** Same normalization contract as the Postgres path: nested and
    * temporal columns become strings so every bind is a setObject.
    */
  private def normalized(df: DataFrame): DataFrame = {
    val cols = df.schema.fields.toIndexedSeq.map { f =>
      f.dataType match {
        case _: StructType | _: ArrayType | _: MapType =>
          to_json(col(f.name)).as(f.name)
        case TimestampType | DateType =>
          col(f.name).cast(StringType).as(f.name)
        case BinaryType =>
          base64(col(f.name)).as(f.name)
        case _ => col(f.name)
      }
    }
    df.select(cols: _*)
  }

  override def truncate(): Unit = {
    val c = connect()
    try {
      val st = c.createStatement()
      try st.execute(ChSql.truncateSql(table)) finally st.close()
    } finally c.close()
  }

  override def write(df: DataFrame, mode: WriteMode): WriteStats = {
    if (mode == WriteMode.Merge && primaryKey.isEmpty)
      throw new IllegalArgumentException("merge mode requires a primary key")
    val prepared = normalized(df)
    val chSchema = ChSql.schemaOfSpark(prepared.schema)

    if (autoCreate) {
      val c = connect()
      try {
        val st = c.createStatement()
        try {
          st.execute(ChSql.createTableSql(table, chSchema, primaryKey))
          // schema evolution, the PostgresWriter contract in ClickHouse
          // dialect. ORDER BY (key) columns are excluded from the diff:
          // ClickHouse rejects Nullable key columns, and a key whose
          // TYPE drifts is a config error, not evolvable drift
          if (schemaEvolution) {
            val existing = ClickHouseWriter.readSchema(c, table)
              .filterNot { case (n, _) => primaryKey.contains(n) }
            val incoming = chSchema
              .filterNot { case (n, _) => primaryKey.contains(n) }
            ChSql.evolveSql(table, existing, incoming).foreach(st.execute)
          }
        } finally st.close()
      } finally c.close()
    }

    val (tbl, u, usr, pw, bs) = (table, url, user, password, batchSize)
    val counter = df.sparkSession.sparkContext.longAccumulator("rowsWritten")

    prepared.foreachPartition { (rows: Iterator[Row]) =>
      if (rows.hasNext) {
        val conn = DriverManager.getConnection(u, usr, pw)
        try {
          val buf = new scala.collection.mutable.ArrayBuffer[Row](bs)
          def flush(): Unit = if (buf.nonEmpty) {
            val st = conn.prepareStatement(ChSql.insertSql(tbl, chSchema, buf.size))
            try {
              ClickHouseWriter.bindRows(st, buf, chSchema)
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
        } finally conn.close()
      }
    }

    // one driver-side compaction lands the replace semantics; runs
    // after every partition committed its inserts
    if (mode == WriteMode.Merge) {
      val c = connect()
      try {
        val st = c.createStatement()
        try st.execute(ChSql.optimizeSql(table)) finally st.close()
      } finally c.close()
    }
    WriteStats(counter.value)
  }
}

object ClickHouseWriter {

  /** Live column→type read-back for the evolution diff (types this
    * writer never creates are dropped so the diff leaves them alone).
    */
  private[writer] def readSchema(c: Connection,
      table: String): ListMap[String, ChSql.ChType] = {
    val st = c.createStatement()
    try {
      val rs = st.executeQuery(ChSql.existingSchemaSql(table))
      var out = ListMap.empty[String, ChSql.ChType]
      while (rs.next())
        ChSql.ofChTypeName(rs.getString(2)).foreach(t =>
          out = out.updated(rs.getString(1), t))
      out
    } finally st.close()
  }

  /** Bind rows column-major, coercing to the destination lattice the
    * same way [[PostgresWriter.bindValue]] does, restricted to
    * ClickHouse's four-type surface: strings parse into numeric
    * destinations (unparseable → NULL), numbers/booleans stringify
    * into String destinations, a fractional number into an Int64
    * destination degrades to NULL rather than erroring the batch.
    */
  private[writer] def bindRows(st: PreparedStatement, rows: Iterable[Row],
      schema: ListMap[String, ChSql.ChType]): Unit = {
    var i = 1
    rows.foreach { row =>
      schema.valuesIterator.zipWithIndex.foreach { case (ct, ix) =>
        bindValue(st, i, row.get(ix), ct)
        i += 1
      }
    }
  }

  private[writer] def bindValue(st: PreparedStatement, i: Int, v: Any,
      ct: ChSql.ChType): Unit = (v, ct) match {
    case (null, _) => st.setObject(i, null)

    case (b: java.lang.Boolean, ChSql.ChBool) => st.setBoolean(i, b)
    case (b: java.lang.Boolean, ChSql.ChString) => st.setString(i, b.toString)
    case (b: java.lang.Boolean, ChSql.ChInt64) => st.setLong(i, if (b) 1L else 0L)
    case (b: java.lang.Boolean, ChSql.ChFloat64) =>
      st.setDouble(i, if (b) 1.0 else 0.0)

    case (n: Number, ChSql.ChInt64) =>
      if (PostgresWriter.isIntegral(n)) st.setLong(i, n.longValue())
      else st.setObject(i, null)
    case (n: Number, ChSql.ChFloat64) => st.setDouble(i, n.doubleValue())
    case (n: Number, ChSql.ChString) => st.setString(i, n.toString)
    case (_: Number, _) => st.setObject(i, null)

    case (s: String, ChSql.ChString) => st.setString(i, s)
    case (s: String, ChSql.ChInt64) =>
      s.toLongOption match {
        case Some(l) => st.setLong(i, l)
        case None => st.setObject(i, null)
      }
    case (s: String, ChSql.ChFloat64) =>
      s.toDoubleOption match {
        case Some(d) => st.setDouble(i, d)
        case None => st.setObject(i, null)
      }
    case (s: String, ChSql.ChBool) =>
      st.setBoolean(i, s.toLowerCase == "true" || s == "1")

    case (other, _) => st.setObject(i, other)
  }
}
