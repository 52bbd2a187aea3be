package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over an undirected edge list — the dedup-completion
  * operator: near-dup detection emits PAIRS, but pairs are not transitively
  * closed (a~b, b~c without a~c), so keeper assignment needs each node's
  * component representative. Reference analog: musiF has no graph step (its
  * corpus is curated); this is part of the beyond-reference training-data
  * pipeline tier (SURVEY.md §6).
  *
  * Algorithm: iterative min-label propagation to a CONVERGENCE-CHECKED
  * fixpoint — every node's label ends as the component minimum, which is
  * unique and independent of partitioning or iteration order (the property
  * the DuckDB oracle's recursive-CTE closure reproduces exactly).
  *
  * Scale shape: the edge list is the near-dup graph — orders of magnitude
  * smaller than the corpus, with small, dense components (duplicate
  * clusters), so plain propagation converges in O(component diameter)
  * rounds ≈ a handful. Each round is one shuffle join + one aggregate;
  * `localCheckpoint` truncates the lineage so round N does not replay
  * rounds 1..N-1 (iterative DataFrame lineage is otherwise exponential to
  * plan). A web-scale graph with giant-diameter components would swap in
  * large-star/small-star contraction with the same keeper contract; the
  * iteration cap fails loudly rather than looping forever.
  */
object Components {

  /** @return (node, label) — label = min node id reachable from `node`;
    *         every node appearing in either edge column gets a row.
    */
  def minLabel(edges: DataFrame, a: String, b: String, maxIters: Int = 50): DataFrame = {
    // symmetrize once; checkpoint so each round scans a materialized edge
    // list instead of replaying the (possibly expensive) pair pipeline
    val sym = edges.select(col(a).as("src"), col(b).as("dst"))
      .unionByName(edges.select(col(b).as("src"), col(a).as("dst")))
      .localCheckpoint()
    var lbl = sym.select(col("src").as("node")).distinct()
      .withColumn("label", col("node"))
      .localCheckpoint()
    var iter = 0
    var converged = false
    while (!converged && iter < maxIters) {
      iter += 1
      // each node's best neighbor label this round
      val prop = sym.join(lbl.select(col("node").as("dst"), col("label").as("dlbl")), "dst")
        .groupBy(col("src").as("node")).agg(min(col("dlbl")).as("nlbl"))
      // carry an improved-this-round flag in the frame itself: convergence
      // is then one cheap max() over the already-materialized checkpoint
      // instead of a next⋈previous comparison join per round
      val next = lbl.join(prop, Seq("node"), "left")
        .select(col("node"),
          least(col("label"), coalesce(col("nlbl"), col("label"))).as("label"),
          (coalesce(col("nlbl"), col("label")) < col("label")).cast("int").as("__chg"))
        .localCheckpoint()
      converged = next.agg(coalesce(max(col("__chg")), lit(0))).head.getInt(0) == 0
      lbl = next.drop("__chg")
    }
    require(converged, s"component labels did not converge in $maxIters rounds " +
      "(giant-diameter component — use a star-contraction variant)")
    lbl
  }
}
