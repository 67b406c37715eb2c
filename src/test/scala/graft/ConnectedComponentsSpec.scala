package graft

import org.scalatest.funsuite.AnyFunSuite

/** ConnectedComponents.label on synthetic graph shapes the documents
  * corpus can't produce — in particular long CHAINS, where plain
  * min-label propagation needs diameter-many rounds but the
  * large-star/small-star rounds contract in O(log n) (the 300-node
  * chain below converges inside the 25-round cap ONLY under the star
  * algorithm), plus disconnected components, duplicate/self-loop
  * edges, and reversed orientation.
  */
class ConnectedComponentsSpec extends AnyFunSuite {
  import SparkTestBase._

  /** cutoff = 0 forces the distributed star rounds; the default
    * exercises the small-graph union-find fast path (these inputs are
    * all far below the 1M-edge cutoff).
    */
  private def labels(cutoff: Long)(edges: (Long, Long)*): Map[Long, Long] = {
    import spark.implicits._
    ConnectedComponents.label(edges.toDF("src", "dst"),
        smallCutoff = cutoff)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  for ((path, cutoff) <- Seq(("fast path", 1000000L), ("star rounds", 0L))) {
  test(s"a 10-node chain collapses to one component ($path)") {
    val chain = (0L until 9L).map(i => (i, i + 1))
    val got = labels(cutoff)(chain: _*)
    assert(got === (0L to 9L).map(_ -> 0L).toMap)
  }

  test(s"disconnected components keep distinct minimum labels ($path)") {
    val got = labels(cutoff)((1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L), (21L, 20L))
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 20L))
  }

  test(s"self-loops, duplicate edges, and orientation don't matter ($path)") {
    val got = labels(cutoff)((5L, 5L), (7L, 4L), (4L, 7L), (7L, 4L), (9L, 7L))
    assert(got === Map(5L -> 5L, 4L -> 4L, 7L -> 4L, 9L -> 4L))
  }
  }

  test("a 300-node chain converges within the O(log n) round cap (star rounds forced)") {
    // Diameter 299 >> maxIters 25: diameter-bound propagation CANNOT
    // finish this graph; path-halving star rounds must. cutoff = 0
    // keeps this the STAR algorithm's test — by default a 299-edge
    // graph would take the union-find fast path.
    val chain = (0L until 299L).map(i => (i, i + 1))
    val got = labels(0L)(chain: _*)
    assert(got.size === 300 && got.values.forall(_ == 0L))
  }

  test("a star converges in one round regardless of arm count (star rounds forced)") {
    val star = (1L to 30L).map(i => (0L, i))
    val got = labels(0L)(star: _*)
    assert(got.size === 31 && got.values.forall(_ == 0L))
  }
}
