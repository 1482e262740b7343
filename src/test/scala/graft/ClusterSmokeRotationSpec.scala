package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.tools.ClusterSmoke

/** The cluster-smoke rotating panel must sample the registry WITHOUT
  * replacement across rounds (coverage keeps extending), draw only
  * hash-stable (oracle-backed) queries, and stay reproducible from the
  * round number alone. */
class ClusterSmokeRotationSpec extends AnyFunSuite {

  test("rotating picks are disjoint across rounds and from pre-r14 picks") {
    val picks = (14 to 20).map(r => r -> ClusterSmoke.rotating(r).toSet).toMap
    picks.foreach { case (r, p) =>
      assert(p.size == 5, s"round $r picked ${p.size}")
      assert((p & ClusterSmoke.COVERED_PRE_R14).isEmpty,
        s"round $r re-drew a pre-r14 query")
    }
    for (a <- 14 to 20; b <- (a + 1) to 20)
      assert((picks(a) & picks(b)).isEmpty,
        s"rounds $a and $b overlap: ${picks(a) & picks(b)}")
  }

  test("rotating picks are oracle-backed registry queries, deterministic") {
    val p = ClusterSmoke.rotating(14)
    assert(p == ClusterSmoke.rotating(14)) // no hidden state
    p.foreach { n =>
      assert(SparkEntry.queries.contains(n), s"$n not in registry")
      assert(SparkEntry.oracleSql.contains(n), s"$n has no oracle")
    }
  }

  test("no-oracle set derives from the registry") {
    assert(ClusterSmoke.noOracle ==
      SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet)
    // Since the r16 graduations (q44/q55/q162/q204/q303 moved to frozen
    // int64 quantizers / golden tables) every registry query is
    // oracle-backed; a query regressing to no-oracle should be loud.
    assert(ClusterSmoke.noOracle.isEmpty,
      s"unexpected no-oracle queries: ${ClusterSmoke.noOracle}")
  }
}
