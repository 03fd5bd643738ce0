package graft.queries

import org.scalatest.funsuite.AnyFunSuite

/** t1 smoke: every probe runs at sf0.001 and returns plausible rows.
  * Exact-value checking is the DuckDB oracle's job (tools/oracle_check.py
  * + the driver's t2 gate).
  */
class ProbesSpec extends AnyFunSuite {

  private lazy val spark = graft.SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("every declared query has an oracle or a documented reason not to") {
    val noOracle = Probes.queries.keySet -- Probes.oracle.keySet
    assert(noOracle == Set("b16_approx_distinct")) // sketches differ per engine
    // and no orphan oracles
    assert((Probes.oracle.keySet -- Probes.queries.keySet).isEmpty)
  }

  test("all probes execute and return rows at sf0.001") {
    val counts = Probes.queries.map { case (name, fn) =>
      name -> fn(spark, sf).count()
    }
    val expectEmpty = Set("b23_except") // nation keys ⊆ customer keys
    counts.foreach { case (name, n) =>
      if (expectEmpty(name)) assert(n == 0, s"$name expected empty")
      else assert(n > 0, s"$name returned no rows")
    }
  }

  test("approx_count_distinct within 5% of exact (SURVEY B16)") {
    val approx = Probes.queries("b16_approx_distinct")(spark, sf)
      .collect().head.getLong(0).toDouble
    val exact = Probes.queries("b13_count_distinct")(spark, sf)
      .collect().head.getLong(0).toDouble
    assert(math.abs(approx - exact) / exact < 0.05)
  }

  test("flagship entry returns the pricing summary") {
    val rows = graft.SparkEntry.entry(spark).collect()
    assert(rows.length > 0 && rows.length <= 6)
  }
}
