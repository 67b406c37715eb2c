package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over an edge list, relationally — the
  * clustering stage of a near-dup pipeline (pairs → components →
  * survivor per component), but generic over any (long, long) edge set.
  *
  * Algorithm: min-label propagation. Every node starts labeled with
  * itself; each round replaces a node's label with the minimum label
  * across itself and its neighbors; at the fixpoint every node carries
  * the minimum node id of its component. One shuffle per round (the
  * groupBy on node), lineage cut by localCheckpoint so round i+1 plans
  * against materialized round-i output, not the whole history.
  *
  * Fixpoint detection: labels only ever DECREASE, so an unchanged
  * sum(label) proves no label moved — a scalar aggregate per round
  * instead of a next-vs-previous join.
  *
  * Scale (100 TB): rounds = component diameter. Near-dup graphs are
  * dense local clusters (LSH emits most intra-cluster pairs), so
  * diameter stays small; a degenerate long-chain graph would want the
  * large-star/small-star variant (halves path lengths each round →
  * O(log n) rounds, same join shape) — this propagation loop is where
  * that drops in.
  */
object ConnectedComponents {

  /** Label each node with the minimum node id reachable from it.
    *
    * @param edges    edge list; orientation does not matter (edges are
    *                 symmetrized internally); self-loops and duplicate
    *                 edges are harmless; isolated nodes simply don't
    *                 appear (callers union them back if needed).
    * @param src,dst  names of the two long-typed endpoint columns.
    * @param maxIters hard cap on propagation rounds (diameter bound).
    * @return (node: long, comp_id: long) — one row per distinct endpoint.
    */
  def label(edges: DataFrame, src: String = "src", dst: String = "dst",
      maxIters: Int = 20): DataFrame = {
    val sym = edges.select(col(src).as("src"), col(dst).as("dst"))
      .union(edges.select(col(dst).as("src"), col(src).as("dst")))
      .localCheckpoint(true) // reused every round — compute inputs once
    var comp = sym.select(col("src").as("node")).distinct()
      .withColumn("comp_id", col("node"))
      .localCheckpoint(true)
    def labelSum(df: DataFrame): Long =
      df.agg(sum("comp_id")).head.getLong(0)
    var prevSum = labelSum(comp)
    var converged = false
    var iters = 0
    while (!converged && iters < maxIters) {
      val prop = sym.join(comp, sym("src") === comp("node"))
        .select(col("dst").as("node"), col("comp_id"))
      val next = comp.union(prop)
        .groupBy("node").agg(min("comp_id").as("comp_id"))
        .localCheckpoint(true)
      val s = labelSum(next)
      converged = s == prevSum
      prevSum = s
      comp = next
      iters += 1
    }
    comp
  }
}
