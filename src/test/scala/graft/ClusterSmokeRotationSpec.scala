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
    assert(ClusterSmoke.noOracle.nonEmpty)
  }
}
