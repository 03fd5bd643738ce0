package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bucketing: pre-shuffling both sides of a recurring join into the
  * same bucket layout removes the Exchange from every subsequent join
  * — the 100 TB lever for fact⋈fact joins that AQE can't save.
  */
class BucketingSpec extends AnyFunSuite {

  private lazy val spark = graft.SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("bucketed fact-fact join plans without a shuffle exchange") {
    // default spark-warehouse dir (gitignored); warehouse.dir is static
    // disable broadcast so the join strategy depends on partitioning
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      graft.engine.Tables.table(spark, sf, "orders")
        .write.mode("overwrite")
        .bucketBy(8, "o_custkey").sortBy("o_custkey")
        .saveAsTable("orders_bkt")
      graft.engine.Tables.table(spark, sf, "customer")
        .withColumnRenamed("c_custkey", "o_custkey")
        .write.mode("overwrite")
        .bucketBy(8, "o_custkey").sortBy("o_custkey")
        .saveAsTable("customer_bkt")

      val joined = spark.table("orders_bkt")
        .join(spark.table("customer_bkt"), "o_custkey")
      val physical = joined.queryExecution.executedPlan.toString
      assert(!physical.contains("Exchange"),
        s"bucketed join still shuffles:\n$physical")
      // and it is still correct
      val expected = graft.engine.Tables.table(spark, sf, "orders").count()
      assert(joined.count() == expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS orders_bkt")
      spark.sql("DROP TABLE IF EXISTS customer_bkt")
    }
  }
}
