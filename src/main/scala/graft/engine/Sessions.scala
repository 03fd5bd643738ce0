package graft.engine

import org.apache.spark.sql.SparkSession

/** Central SparkSession factory — one place for the scale-oriented
  * session config shared by Verify, Bench, the CLI, and tests.
  */
object Sessions {

  /** Apply graft's standard config to any builder. */
  def configure(b: SparkSession.Builder, shufflePartitions: Int): SparkSession.Builder =
    b.config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // events.parquet stores ts as TIMESTAMP(NANOS), which Spark's
      // reader rejects by default; read as long and rebuild in Tables.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // native function registration (rolling_hash et al.)
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")

  def local(cpus: Int = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt): SparkSession = {
    val spark = configure(
      SparkSession.builder().master(s"local[$cpus]").appName("graft"),
      shufflePartitions = cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
