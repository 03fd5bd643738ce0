package graft.engine

import java.util.UUID

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.template.Templates

/** SQL execution over an ingested source (SURVEY A10-A16).
  *
  * The reference registers the fetched stream under a nanoid-unique
  * table name, rewrites the SQL's table identifier to that name, and
  * runs the module SQL (/root/reference/src/http/fetcher.rs:730-753).
  * Spark equivalent: unique temp view + `spark.sql`, with RAII-style
  * deregistration (datafusion_ext.rs:67-71) as try/finally.
  */
object Engine {

  private def uniqueName(base: String): String =
    // temp-view names only allow [A-Za-z0-9_]: a schema-qualified or
    // dashed dest table must not crash view registration
    s"${base.map(c => if (c.isLetterOrDigit || c == '_') c else '_')}_" +
      UUID.randomUUID().toString.replace("-", "").take(12)

  /** Register `df` under a unique name derived from `table`, rewrite
    * `table` → unique name in `sql`, run it, pass the result through
    * `use`, and always drop the temp view. The result must be consumed
    * inside `use` — after it the view is gone.
    */
  def withSqlOver[T](spark: SparkSession, df: DataFrame, table: String,
      sql: String)(use: DataFrame => T): T = {
    val unique = uniqueName(table)
    df.createOrReplaceTempView(unique)
    try use(spark.sql(Templates.rewriteIdentifier(sql, table, unique)))
    finally spark.catalog.dropTempView(unique)
  }

  /** One module run, mirroring the reference's per-module pipeline
    * stages 6+12 (SURVEY §3.1): source-name → dest-table rewrite, then
    * dest-table → unique view name, then execute.
    */
  def runModule[T](spark: SparkSession, sourceDf: DataFrame,
      sourceName: String, destTable: String, moduleSql: String)
      (use: DataFrame => T): T = {
    val sql = Templates.rewriteIdentifier(moduleSql, sourceName, destTable)
    withSqlOver(spark, sourceDf, destTable, sql)(use)
  }
}
