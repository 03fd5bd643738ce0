package graft.ops

import org.scalatest.funsuite.AnyFunSuite

class IntegritySpec extends AnyFunSuite {

  private lazy val spark = graft.SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def audit = Integrity.audit(
    n => graft.engine.Tables.table(spark, sf, n))

  test("audit reports every check, zeros included, and the known dup keys") {
    val rs = audit.collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rs.size == 9, "passing checks must appear as explicit zero rows")
    assert(rs("customer_orphan_nation") == 0L)
    assert(rs("lineitem_orphan_orders") == 0L)
    assert(rs("orders_unique_key") == 0L)
    // the fixture's documented non-unique (l_orderkey, l_linenumber):
    // the audit's job is to surface it
    assert(rs("lineitem_unique_line") > 0L)
  }

  test("scalar range checks share one fact-table scan") {
    val plan = audit.queryExecution.executedPlan.toString
    val liScans = "lineitem\\.parquet".r.findAllIn(plan).size
    // one fused scalar scan + one narrow uniqueness scan + the
    // orphan check's fact side = 3, not one scan per check
    assert(liScans == 3, s"expected 3 lineitem scans, found $liScans:\n$plan")
  }
}
