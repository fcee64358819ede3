package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed graph analytics beyond connected components (which lives in
  * [[Dedup.connectedComponents]]): fixed-iteration PageRank in EXACT
  * scaled-integer arithmetic.
  *
  * Why integer: float PageRank sums contributions in shuffle arrival
  * order, so ranks drift between runs, partitionings, and engines — fine
  * for ranking, fatal for an oracle hash. Ranks here are longs in units
  * of 1e-9 ("nano-rank"): contributions are `r div outdeg`, damping is
  * `(17 * x) div 20` (= 0.85) over a `(3 * SCALE) div (20 * N)` base
  * (= 0.15/N), and long sums are order-independent — every engine that
  * replays the integer arithmetic gets the same bits. Truncation loses
  * < outdeg nano-units per edge per iteration: irrelevant to ranking,
  * priceless for replayability.
  *
  * Scale shape per iteration: one shuffle keyed by edge source (join
  * ranks to edges) and one by destination (contribution sum) — the
  * standard Pregel round as two hash exchanges; no driver-side state, no
  * per-node loops. Fixed iteration count keeps the plan static (AQE can
  * still re-plan each round's exchanges).
  */
object Graph {

  val Scale: Long = 1000000000L

  /** `iterations` rounds of damped PageRank over a directed edge list
    * (columns `src`, `dst`, both long). Every node must appear as a
    * source at least once (no dangling mass; symmetric edge lists satisfy
    * this by construction). Returns (node, rank) with rank in nano-units.
    */
  def pageRankInt(edges: DataFrame, iterations: Int): DataFrame = {
    require(iterations >= 1, "iterations must be >= 1")
    val e = edges.select(col("src").cast("long"), col("dst").cast("long"))
      .distinct()
    val outdeg = e.groupBy("src").agg(count(lit(1)).as("outdeg"))
    // The edge frame feeds EVERY iteration's src-keyed join: partition it
    // by src ONCE before checkpointing, so each round reuses the
    // partitioning instead of re-exchanging the (large) edge side per
    // iteration — only the node-sized rank frame moves. Deriving nodes
    // from the checkpointed frame keeps the upstream double-distinct from
    // recomputing under the node count, the seed ranks, and the final job
    // (measured on the supplier↔part graph at sf0.1: 12-15s -> see bench).
    val ed = e.join(outdeg, "src").repartition(col("src")).localCheckpoint()
    val nodes = ed.select(col("src").as("node"))
      .union(ed.select(col("dst").as("node"))).distinct().localCheckpoint()
    val n = nodes.count()
    val base = (3L * Scale) / (20L * n)
    var ranks = nodes.withColumn("rank", lit(Scale / n))
    for (_ <- 1 to iterations) {
      val contrib = ed.join(ranks.withColumnRenamed("node", "src"), "src")
        .select(col("dst").as("node"),
          expr("rank div outdeg").as("c"))
        .groupBy("node").agg(sum("c").as("contrib"))
      // left join: a node with no in-edges keeps only the base mass.
      // r17 perf: join from the CHECKPOINTED node frame, not
      // ranks.select("node") — the node set is invariant (the left join
      // preserves every node each round), and referencing `ranks` twice
      // per round doubled the unevaluated plan per iteration (round k
      // carried 2^k copies of the base subtree for Catalyst to analyze /
      // dedupe; plan growth is linear from `nodes`).
      ranks = nodes
        .join(contrib, Seq("node"), "left")
        .select(col("node"),
          (lit(base) +
            expr("(17 * coalesce(contrib, 0L)) div 20")).as("rank"))
    }
    ranks
  }

  /** EXACT triangle counting with per-node local clustering coefficients
    * — the degeneracy-ordered wedge-join algorithm (the standard
    * MapReduce/Spark formulation of node-iterator++): orient every
    * undirected edge from its lower to its higher endpoint under the
    * (degree, id) total order, enumerate wedges by self-joining the
    * oriented adjacency on the wedge CENTER, and close each wedge with
    * one directed hash lookup. Orientation caps out-degree at
    * O(sqrt(edges)) on any graph (the arboricity bound), so the wedge
    * frame — the algorithm's whole cost — is O(m^1.5) worst-case and
    * near-linear on sparse graphs, instead of sum(degree^2) for the naive
    * wedge join; a popular hub generates NO wedges because every edge
    * points INTO it.
    *
    * Input: undirected edges as (src, dst) longs, one row per edge in
    * either order (dedup + canonicalization happen inside). Returns
    * (node, degree, triangles, clustering) for nodes in >= 1 triangle,
    * clustering = round(2T / (d(d-1)), 6) — exact integers everywhere
    * else, so the output hash-replays on any engine.
    *
    * Scale shape: two hash shuffles (adjacency on the wedge center, the
    * wedge-closure equi-join) + one node-keyed count — no per-node
    * loops, no driver state, AQE free to re-plan the closure join.
    */
  def triangleStats(edges: DataFrame): DataFrame = {
    val canon = edges
      .select(least(col("src"), col("dst")).cast("long").as("a"),
        greatest(col("src"), col("dst")).cast("long").as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
    val deg = canon.select(col("a").as("n")).unionAll(canon.select(col("b").as("n")))
      .groupBy("n").agg(count(lit(1)).as("d"))
    // orient by (degree, id): u -> v iff (d_u, u) < (d_v, v)
    val oriented = canon
      .join(deg.select(col("n").as("a"), col("d").as("da")), "a")
      .join(deg.select(col("n").as("b"), col("d").as("db")), "b")
      .select(
        when(col("da") < col("db") ||
          (col("da") === col("db") && col("a") < col("b")), col("a"))
          .otherwise(col("b")).as("u"),
        when(col("da") < col("db") ||
          (col("da") === col("db") && col("a") < col("b")), col("b"))
          .otherwise(col("a")).as("v"),
        when(col("da") < col("db") ||
          (col("da") === col("db") && col("a") < col("b")), col("db"))
          .otherwise(col("da")).as("dv"))
    // wedges centered at u; order the two spokes by the SAME (deg, id)
    // orientation so the closing edge is a directed lookup
    val w = oriented.select(col("u"), col("v"), col("dv"))
    val wedges = w.as("x").join(w.as("y"),
        col("x.u") === col("y.u") &&
          (col("x.dv") < col("y.dv") ||
            (col("x.dv") === col("y.dv") && col("x.v") < col("y.v"))))
      .select(col("x.u").as("u"), col("x.v").as("v"), col("y.v").as("w"))
    val closed = wedges.join(
      oriented.select(col("u").as("v"), col("v").as("w")), Seq("v", "w"))
    val perNode = closed.select(explode(array(col("u"), col("v"), col("w"))).as("n"))
      .groupBy("n").agg(count(lit(1)).as("triangles"))
    perNode.join(deg, "n")
      .select(col("n").as("node"), col("d").as("degree"), col("triangles"),
        round(lit(2) * col("triangles") / (col("d") * (col("d") - 1)), 6)
          .as("clustering"))
  }
}
