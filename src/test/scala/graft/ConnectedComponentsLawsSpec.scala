package graft

import org.scalacheck.{Gen, Prop, Properties}

/** Property test for the large-star/small-star components operator:
  * on RANDOM edge sets, labels must equal a plain union-find ground
  * truth computed in test code — every node labeled with its
  * component's minimum id. Random graphs cover the shapes the fixed
  * specs can't enumerate (cycles, bridges, mixed star/chain hybrids,
  * duplicate and self-loop edges).
  */
object ConnectedComponentsLawsSpec
    extends Properties("ConnectedComponentsLaws") {
  import SparkTestBase._

  private def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x
      else { val r = find(p); parent(x) = r; r }
    }
    for ((a, b) <- edges) {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    nodes.map(n => n -> find(n)).toMap
  }

  private val genEdges: Gen[List[(Long, Long)]] = for {
    n <- Gen.choose(2, 30)
    m <- Gen.choose(1, 45)
    edges <- Gen.listOfN(m, for {
      a <- Gen.choose(0L, n.toLong)
      b <- Gen.choose(0L, n.toLong)
    } yield (a, b))
  } yield edges

  // Default path: these graphs are far below the 1M-edge cutoff, so
  // this exercises the single-task union-find fast path against the
  // independent in-test implementation.
  property("labels match union-find ground truth on random graphs") =
    Prop.forAllNoShrink(genEdges) { edges =>
      import spark.implicits._
      val got = ConnectedComponents
        .label(edges.toDF("src", "dst"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      got == unionFind(edges)
    }

  // smallCutoff = 0 forces the distributed star rounds on the same
  // random graphs — the 100 TB path keeps its own ground-truth check.
  property("star rounds match union-find ground truth on random graphs") =
    Prop.forAllNoShrink(genEdges) { edges =>
      import spark.implicits._
      val got = ConnectedComponents
        .label(edges.toDF("src", "dst"), smallCutoff = 0L)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      got == unionFind(edges)
    }
}
