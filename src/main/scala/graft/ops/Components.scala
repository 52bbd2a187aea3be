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
  * Two algorithms, one contract (label = component-minimum node id,
  * partition-order independent — the property the DuckDB oracle's
  * recursive-CTE closure reproduces exactly):
  *
  *  - [[minLabel]]: iterative min-label propagation, O(diameter) rounds.
  *    The expected shape for dedup graphs — small, dense components
  *    (duplicate clusters) on an edge list orders of magnitude smaller
  *    than the corpus, converging in a handful of rounds. Rounds are run
  *    in FUSED PAIRS (two propagation joins per materialization +
  *    convergence action), and round 1 is folded into the seed (label =
  *    min(node, min direct neighbor) is one aggregate, no join), so the
  *    fixed per-round cost — `localCheckpoint` lineage truncation plus a
  *    blocking convergence read — is paid half as often.
  *  - [[starContract]]: alternating large-star/small-star contraction
  *    (Kiveris et al., "Connected Components in MapReduce and Beyond",
  *    SoCC'14 — public algorithm), O(log n) rounds REGARDLESS of
  *    component diameter. The 100-TB fallback for chain-shaped duplicate
  *    clusters (shingled spam, boilerplate chains) where propagation's
  *    O(diameter) loop would not terminate in bounded rounds.
  *
  * [[minLabel]] hitting its iteration cap automatically falls back to
  * [[starContract]] on the same edges instead of failing — the cap is a
  * shape detector, not an error.
  */
object Components {

  private def symmetrize(edges: DataFrame, a: String, b: String): DataFrame =
    edges.select(col(a).as("src"), col(b).as("dst"))
      .unionByName(edges.select(col(b).as("src"), col(a).as("dst")))

  /** @return (node, label) — label = min node id reachable from `node`;
    *         every node appearing in either edge column gets a row.
    */
  /** Iterative stages must be sized to the GRAPH, not the corpus: the
    * near-dup edge list is orders of magnitude smaller than the documents
    * table, and running each tiny propagation round at the session's
    * corpus-tuned shuffle width pays ~8 stages × width in task-launch
    * overhead per round (measured: 1.2s/round at width 32 on a 91k-edge
    * graph vs ~0.2s at width 1). The edge list is already materialized, so
    * its exact count is free — ~100k edges per partition, capped.
    */
  private def graphParts(nEdges: Long): Int =
    math.max(1L, math.min(2048L, nEdges / 100000L + 1L)).toInt

  /** Run `body` with the session's shuffle width pinned to `parts`,
    * restoring the previous value after. Only safe because every frame the
    * body returns is eagerly materialized (localCheckpoint) before the
    * restore — nothing lazy escapes with the narrowed width.
    *
    * SINGLE-PLANNER assumption: `spark.sql.shuffle.partitions` is a
    * session-global knob, so any query PLANNED concurrently on the same
    * SparkSession during `body` (a streaming micro-batch, a parallel test
    * suite sharing the session) silently plans at the narrowed width.
    * Callers running components concurrently with other planning on one
    * session should use `SparkSession.newSession()` for isolation — the
    * per-round frames here are deliberately tiny, so the narrowed width is
    * an optimization for THIS loop, not a safe ambient default.
    */
  private def withShuffleParts[T](df: DataFrame, parts: Int)(body: => T): T = {
    val conf = df.sparkSession.conf
    val prev = conf.get("spark.sql.shuffle.partitions")
    conf.set("spark.sql.shuffle.partitions", parts.toString)
    try body finally conf.set("spark.sql.shuffle.partitions", prev)
  }

  def minLabel(edges: DataFrame, a: String, b: String, maxIters: Int = 50): DataFrame = {
    // symmetrize once; checkpoint so each round scans a materialized edge
    // list instead of replaying the (possibly expensive) pair pipeline
    val sym0 = symmetrize(edges, a, b).localCheckpoint()
    val parts = graphParts(sym0.count())
    val sym = if (sym0.rdd.getNumPartitions > parts * 4)
      sym0.repartition(parts).localCheckpoint() else sym0
    withShuffleParts(sym, parts) { minLabelLoop(sym, edges, a, b, maxIters) }
  }

  private def minLabelLoop(sym: DataFrame, edges: DataFrame, a: String,
                           b: String, maxIters: Int): DataFrame = {
    // seed = round 1 folded into initialization: with labels initialized to
    // node ids, the first propagation round computes exactly
    // min(node, min direct neighbor) — one aggregate over sym, no join
    var lbl = sym.groupBy(col("src").as("node")).agg(min(col("dst")).as("__mn"))
      .select(col("node"), least(col("node"), col("__mn")).as("label"))
      .localCheckpoint()
    // one propagation step; extra columns on `l` (the carried round-start
    // label) pass through the left join untouched
    def step(l: DataFrame): DataFrame = {
      val prop = sym.join(l.select(col("node").as("dst"), col("label").as("dlbl")), "dst")
        .groupBy(col("src").as("node")).agg(min(col("dlbl")).as("nlbl"))
      l.join(prop, Seq("node"), "left")
        .select((col("node") +:
          least(col("label"), coalesce(col("nlbl"), col("label"))).as("label") +:
          l.columns.filterNot(c => c == "node" || c == "label").map(col).toSeq): _*)
    }
    val debug = sys.env.get("GRAFT_COMPONENTS_DEBUG").contains("1")
    var iter = 1 // the seed IS round 1
    var converged = false
    while (!converged && iter < maxIters) {
      iter += 2
      val t0 = if (debug) System.nanoTime() else 0L
      // two fused steps between materializations: labels only ever
      // decrease, so "no change across the fused pair" ⇔ both steps were
      // no-ops ⇔ fixpoint — the carried round-start label (`label0`) makes
      // convergence one cheap max() over the already-materialized
      // checkpoint instead of a next⋈previous comparison join
      val next = step(step(lbl.withColumn("label0", col("label"))))
        .select(col("node"), col("label"),
          (col("label") < col("label0")).cast("int").as("__chg"))
        .localCheckpoint()
      val t1 = if (debug) System.nanoTime() else 0L
      converged = next.agg(coalesce(max(col("__chg")), lit(0))).head.getInt(0) == 0
      if (debug) System.err.println(
        f"[components] fused round ending at $iter: checkpoint ${(t1 - t0) / 1e9}%.2fs " +
          f"converge-read ${(System.nanoTime() - t1) / 1e9}%.2fs converged=$converged")
      lbl = next.drop("__chg")
    }
    if (!converged) {
      // giant-diameter component: propagation's O(diameter) loop is the
      // wrong algorithm — swap to the O(log n) contraction, same contract
      System.err.println(s"[components] minLabel hit the $maxIters-round cap " +
        "(giant-diameter component) — falling back to large-star/small-star contraction")
      starContract(edges, a, b)
    } else lbl
  }

  /** Alternating large-star/small-star connected components. Each round is
    * two grouped aggregates + joins over the CURRENT edge set (which only
    * shrinks toward one star per component); convergence is an
    * order-independent edge-set signature reaching a fixed point, checked
    * on the already-materialized checkpoint. Converges in O(log n) rounds
    * on any graph shape — the web-scale path for components whose diameter
    * exceeds what propagation can walk.
    *
    *  - large-star: every node links its LARGER neighbors to the minimum
    *    of its closed neighborhood;
    *  - small-star: every node links its smaller-or-equal neighbors (and
    *    itself) to that minimum.
    *
    * At the fixpoint each component is a star centered on its minimum
    * node, so the edge list IS the (node → label) mapping.
    */
  def starContract(edges: DataFrame, a: String, b: String, maxRounds: Int = 60): DataFrame = {
    val nodes = edges.select(col(a).as("node"))
      .unionByName(edges.select(col(b).as("node")))
      .distinct().localCheckpoint()
    val e0 = edges.select(col(a).as("u"), col(b).as("v"))
      .filter(col("u") =!= col("v")).distinct().localCheckpoint()
    withShuffleParts(e0, graphParts(e0.count())) {
      starLoop(nodes, e0, maxRounds)
    }
  }

  private def starLoop(nodes: DataFrame, e0: DataFrame, maxRounds: Int): DataFrame = {
    var e = e0

    // min over the closed neighborhood of each node of `d` (d must hold
    // every direction that matters to the caller)
    def closedMin(d: DataFrame): DataFrame =
      d.groupBy(col("u")).agg(min(col("v")).as("__mnv"))
        .select(col("u"), least(col("u"), col("__mnv")).as("m"))

    def largeStar(d: DataFrame): DataFrame = {
      val nbrs = d.unionByName(d.select(col("v").as("u"), col("u").as("v")))
      nbrs.join(closedMin(nbrs), Seq("u"))
        .filter(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))
        .filter(col("u") =!= col("v"))
        .distinct()
    }

    def smallStar(d: DataFrame): DataFrame = {
      // canonical high→low orientation, then each node links its ≤-side
      // neighborhood (and itself) to the neighborhood minimum
      val c = d.select(greatest(col("u"), col("v")).as("u"),
          least(col("u"), col("v")).as("v"))
        .filter(col("u") =!= col("v"))
      val m = closedMin(c)
      c.join(m, Seq("u"))
        .select(col("v"), col("m"))
        .unionByName(m.select(col("u").as("v"), col("m")))
        .filter(col("v") =!= col("m"))
        .select(col("v").as("u"), col("m").as("v"))
        .distinct()
    }

    // order-independent edge-set signature: (count, XOR of per-edge hash).
    // XOR, not sum: the edge set is distinct, so XOR is a valid set
    // signature, and it cannot overflow under ANSI mode
    def signature(d: DataFrame): (Long, Long) = {
      val r = d.select(xxhash64(col("u"), col("v")).as("__h"))
        .agg(count(lit(1)), expr("bit_xor(__h)")).head
      (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
    }

    var sig = signature(e)
    var round = 0
    var done = sig._1 == 0L // no edges → all singletons
    while (!done && round < maxRounds) {
      // ONE (large ∘ small) application per materialization — deliberately
      // NOT fused like minLabel's step pairs: each star op references its
      // input ~4× (the symmetrized union feeds both the neighborhood join
      // and closedMin), so composing two rounds without a checkpoint
      // REPLICATES the inner round's subplan ~16× in the outer plan —
      // measured 21.5s vs 11.8s on the fixture graph. minLabel's step only
      // references its input twice, which is why fusing pays there.
      round += 1
      val next = smallStar(largeStar(e)).localCheckpoint()
      val s2 = signature(next)
      done = s2 == sig
      sig = s2
      e = next
    }
    require(done, s"star contraction did not converge in $maxRounds rounds — " +
      "not a graph-shape issue (contraction is O(log n) on any shape); " +
      "inspect the edge list for pathological input")
    // materialize inside the narrowed-shuffle scope (see withShuffleParts)
    nodes.join(e.select(col("u").as("node"), col("v").as("__lbl")), Seq("node"), "left")
      .select(col("node"), coalesce(col("__lbl"), col("node")).as("label"))
      .localCheckpoint()
  }
}
