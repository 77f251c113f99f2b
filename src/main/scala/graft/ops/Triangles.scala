package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Exact triangle counting over the part co-purchase graph (parts are
  * adjacent when some order contains both). Triangle density is the
  * standard cohesion metric for co-occurrence graphs — the "products
  * bought together form cliques?" question — and the operator is the
  * canonical example of a join whose naive form dies at scale.
  *
  * Scale design: the classic degree-ordered orientation (node rank =
  * (degree, id); every edge points low→high). Wedge generation joins
  * oriented out-edges with themselves on the source, so per-node work
  * is out-degree², and orientation bounds every out-degree by O(√m) —
  * the worst-case optimal bound — where the unoriented self-join is
  * max-degree² on hub nodes. The closing-edge probe is a semi-join on
  * the oriented edge set. Three shuffles total (degree agg, wedge
  * self-join, closing probe), all on integer keys; nothing touches the
  * driver.
  */
object Triangles {

  /** Distinct undirected co-purchase edges (a < b), from a per-order
    * self-join of lineitem. Per-order line counts are bounded (≤ 7 in
    * TPC-H-ish data, small in any order system), so the intra-order
    * pair expansion is linear in lineitem with a constant factor — not
    * a quadratic blow-up. */
  private[graft] def copurchaseEdges(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      // dedup (order, part) BEFORE the self-join: a part appearing on
      // two lines of one order would otherwise expand duplicate pair
      // rows that the post-join distinct then pays to shuffle away
      .distinct()
    val a = li.toDF("ok", "a")
    val b = li.toDF("ok", "b")
    a.join(b.hint("shuffle_hash"), Seq("ok"))
      .filter(col("a") < col("b"))
      .select("a", "b").distinct()
  }

  /** One-row report: nodes, edges, and the exact triangle count.
    *
    * Edge-iterator formulation: orient, build per-node sorted
    * out-neighbor arrays (payload Σd = m longs; each array bounded
    * O(√m) by the orientation), then per oriented edge (u,v) count
    * |N⁺(u) ∩ N⁺(v)| with codegen'd array_intersect and sum. Each
    * triangle {a<b<c by rank} is counted exactly once — at its (a,b)
    * edge, where c is a common out-neighbor. No wedge relation is ever
    * materialized (the wedge-join form shuffles Σd² rows — 30× the
    * edge count on this graph); the only per-edge payload is two
    * bounded arrays. The oriented edge set is localCheckpoint'd once
    * because three consumers read it — otherwise the scan+distinct+
    * degree subtree executes three times. */
  def triangleCount(spark: SparkSession, dir: String): DataFrame = {
    val edges = copurchaseEdges(spark, dir)
    // degree table over the undirected graph
    val deg = edges.select(col("a").as("node"))
      .unionAll(edges.select(col("b").as("node")))
      .groupBy("node").agg(count(lit(1)).as("deg"))
    // orient each edge from the (degree, id)-smaller endpoint to the
    // larger; the rank join is two joins against the bounded degree
    // table (it scales with |nodes|, but no broadcast hint — the
    // planner broadcasts while it fits)
    val da = deg.toDF("a", "deg_a")
    val db = deg.toDF("b", "deg_b")
    val oriented = edges.join(da, Seq("a")).join(db, Seq("b"))
      .select(
        when(struct(col("deg_a"), col("a")) < struct(col("deg_b"), col("b")),
          col("a")).otherwise(col("b")).as("src"),
        when(struct(col("deg_a"), col("a")) < struct(col("deg_b"), col("b")),
          col("b")).otherwise(col("a")).as("dst"))
      .localCheckpoint(true)
    graft.functions.GraftFunctions.register(spark)
    val adj = oriented.groupBy("src").agg(sort_array(collect_list("dst")).as("nbrs"))
    val nTri = oriented
      .join(adj.toDF("src", "u_nbrs"), Seq("src"))
      // dst may have no out-edges: left join + empty-array default.
      // sorted_intersect_count: the neighbor arrays are sorted by
      // construction (sort_array above), so the closing probe is an
      // allocation-free two-pointer merge — size(array_intersect(...))
      // built a hash set + result array per edge row and made the
      // probe GC-bound (4.8-15 s run-to-run swings on identical work)
      .join(adj.toDF("dst", "v_nbrs"), Seq("dst"), "left")
      .select(expr(
        "sorted_intersect_count(u_nbrs, coalesce(v_nbrs, cast(array() as array<bigint>)))").as("c"))
      .agg(sum("c").as("n"))
    // node/edge tallies read the CHECKPOINTED oriented set, not the
    // scan subtree — otherwise the co-purchase join runs two more times
    val nNodes = oriented.select(col("src").as("n"))
      .unionAll(oriented.select(col("dst").as("n")))
      .agg(countDistinct(col("n")).as("n"))
    val nEdges = oriented.agg(count(lit(1)).as("n"))
    nNodes.toDF("n_nodes").crossJoin(nEdges.toDF("n_edges"))
      .crossJoin(nTri.toDF("n_triangles"))
  }

  /** k-core decomposition (k = 3) of the REPEAT co-purchase graph
    * (parts adjacent when ≥ `minOrders` orders contain both — the
    * count threshold prunes one-off coincidences, the standard
    * sparsification before cohesion mining) by iterative peeling: drop
    * every node whose CURRENT degree is below k, remove its edges,
    * repeat to the fixpoint — the dense-substructure filter (spam
    * rings, core communities) that no single-pass degree cut can
    * compute, because removals cascade. Each round is two bounded
    * shuffles (degree agg + anti-join edge prune) over the SHRINKING
    * edge set; the driver reads one victim count per round and
    * localCheckpoint truncates the per-round lineage — same loop
    * discipline as connected components. Emits the surviving nodes
    * with their in-core degree. */
  def kCore(spark: SparkSession, dir: String, k: Int = 3,
      minOrders: Long = 2L): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .distinct()
    val a = li.toDF("ok", "a")
    val b = li.toDF("ok", "b")
    var edges = a.join(b.hint("shuffle_hash"), Seq("ok"))
      .filter(col("a") < col("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("n_orders"))
      .filter(col("n_orders") >= minOrders)
      .select(col("a").as("src"), col("b").as("dst"))
    edges = edges.unionAll(edges.select(col("dst").as("src"), col("src").as("dst")))
      .localCheckpoint(true)
    var converged = false
    var rounds = 0
    while (!converged && rounds < 40) {
      val deg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
      val victims = deg.filter(col("deg") < k).select("src")
      val nVictims = victims.limit(1).count()
      if (nVictims == 0) converged = true
      else {
        edges = edges
          .join(victims, Seq("src"), "left_anti")
          .join(victims.toDF("dst"), Seq("dst"), "left_anti")
          .select("src", "dst")
          .localCheckpoint(true)
      }
      rounds += 1
    }
    // an under-peeled edge set is silently WRONG (nodes below k keep
    // their neighbors' degrees inflated) — fail loudly like the CC loop
    if (!converged)
      throw new IllegalStateException(s"kCore did not converge in $rounds rounds")
    edges.groupBy(col("src").as("node"))
      .agg(count(lit(1)).as("core_degree"))
      .orderBy("node")
  }
}
