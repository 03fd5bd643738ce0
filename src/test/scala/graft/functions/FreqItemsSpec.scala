package graft.functions

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the Misra-Gries aggregator's pure core
  * (zero/reduce/merge run without Spark): the invariants every
  * downstream certification relies on must hold for ARBITRARY
  * streams, capacities, and partition splits, not just the fixture.
  */
class FreqItemsSpec extends AnyFunSuite {

  /** Fold a stream through the aggregator the way Spark would:
    * partition into chunks, reduce each, merge pairwise.
    */
  private def run(items: List[String], capacity: Int, chunks: Int) = {
    val agg = new Sketches.FreqItems(capacity)
    val bufs = items.grouped(math.max(1, math.ceil(items.size.toDouble / chunks).toInt))
      .map(_.foldLeft(agg.zero)(agg.reduce))
      .toList
    if (bufs.isEmpty) agg.zero else bufs.reduce(agg.merge)
  }

  test("MG invariants hold for arbitrary streams, capacities, and splits") {
    // skew-heavy alphabet: few hot items, long tail
    val itemGen = Gen.frequency(
      6 -> Gen.oneOf("a", "b", "c"),
      3 -> Gen.choose(0, 9).map(i => s"mid$i"),
      2 -> Gen.choose(0, 499).map(i => s"tail$i"))
    val prop = Prop.forAll(
      Gen.listOf(itemGen), Gen.choose(1, 64), Gen.choose(1, 8)) {
      (items: List[String], capacity: Int, chunks: Int) =>
        val (m, debt) = run(items, capacity, chunks)
        val truth = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
        val sizeOk = m.size <= capacity
        val debtOk = debt >= 0 &&
          debt <= (if (items.isEmpty) 0L else items.size.toLong / (capacity + 1) + 1)
        // every estimate is an underestimate, off by at most debt —
        // including absent items (estimate 0)
        val estOk = truth.forall { case (x, n) =>
          val est = m.getOrElse(x, 0L)
          est <= n && n - est <= debt
        }
        val noGhosts = m.keys.forall(truth.contains)
        sizeOk && debtOk && estOk && noGhosts
    }
    val result = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(result.passed, result.status.toString)
  }

  test("capacity at or above vocabulary means zero debt and exact counts") {
    val items = List.fill(50)("x") ++ List.fill(30)("y") ++ List.fill(7)("z")
    val (m, debt) = run(scala.util.Random.shuffle(items), capacity = 3, chunks = 4)
    assert(debt == 0L)
    assert(m.toMap == Map("x" -> 50L, "y" -> 30L, "z" -> 7L))
  }
}
