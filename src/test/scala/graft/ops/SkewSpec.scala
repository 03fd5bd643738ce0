package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Salting must be a pure plan transformation: identical results to
  * the unsalted forms.
  */
class SkewSpec extends AnyFunSuite {

  private lazy val spark = graft.SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("saltedJoin equals the plain inner join") {
    val orders = graft.engine.Tables.table(spark, sf, "orders")
      .withColumnRenamed("o_custkey", "c_custkey")
    val customer = graft.engine.Tables.table(spark, sf, "customer")
    val plain = orders.join(customer, Seq("c_custkey"), "inner")
      .select("o_orderkey", "c_name")
    val salted = Skew.saltedJoin(orders, customer, "c_custkey", salts = 8)
      .select("o_orderkey", "c_name")
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("saltedCount equals the plain groupBy count") {
    val li = graft.engine.Tables.table(spark, sf, "lineitem").repartition(8)
    val plain = li.groupBy(col("l_returnflag")).agg(count(lit(1)).as("n"))
    val salted = Skew.saltedCount(li, "l_returnflag", salts = 4)
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }
}
