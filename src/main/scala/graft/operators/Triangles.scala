package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed triangle counting — the standard scalable formulation
  * (degree-ordered edge orientation + wedge join), not the naive
  * three-way self-join.
  *
  * Shape: orient every undirected edge from its lower-(degree, id)
  * endpoint to the higher one. The result is acyclic and its out-degrees
  * are O(√m)-bounded, so the wedge join (oriented ⋈ oriented on source)
  * generates Σ outdeg² candidate wedges — the minimum over all
  * orientations up to constants — instead of Σ deg² (which a hub node
  * makes quadratic: one celebrity part in every order would alone emit
  * |orders|² wedges unoriented). Each triangle then has EXACTLY one
  * wedge apex (the node with two out-edges), so a single equality
  * semi-join against the canonical edge set counts each triangle once —
  * no /3 correction, no OR-condition nested-loop join. Every step is an
  * equality join or a map-combinable aggregate; driver traffic is zero.
  */
object Triangles {

  /** Per-node triangle participation counts over an undirected graph
    * given as (aCol, bCol) pairs (duplicates and self-loops tolerated).
    * Returns (node, n_triangles), nodes in ≥1 triangle only.
    */
  def perNodeCounts(edges: DataFrame, aCol: String, bCol: String): DataFrame = {
    // canonical undirected edge set, persisted: consumed by the degree
    // aggregate, the orientation join, and the closing-edge semi-join
    val e = graft.CacheScope.persisted(
      edges.select(least(col(aCol), col(bCol)).as("u"),
          greatest(col(aCol), col(bCol)).as("v"))
        .filter(col("u") =!= col("v"))
        .distinct())
    val deg = e.select(col("u").as("n"))
      .unionAll(e.select(col("v").as("n")))
      .groupBy("n").agg(count(lit(1)).as("deg"))
    val fromU = col("du") < col("dv") ||
      (col("du") === col("dv") && col("u") < col("v"))
    val oriented = graft.CacheScope.persisted(
      e.join(deg.select(col("n").as("u"), col("deg").as("du")), "u")
        .join(deg.select(col("n").as("v"), col("deg").as("dv")), "v")
        .select(when(fromU, col("u")).otherwise(col("v")).as("s"),
          when(fromU, col("v")).otherwise(col("u")).as("t")))
    val wedges = oriented.as("x").join(oriented.as("y"),
        col("x.s") === col("y.s") && col("x.t") < col("y.t"))
      .select(col("x.s").as("a"), col("x.t").as("b"), col("y.t").as("c"))
    val tris = wedges.join(e,
      least(col("b"), col("c")) === col("u") &&
        greatest(col("b"), col("c")) === col("v"), "left_semi")
    tris.select(explode(array(col("a"), col("b"), col("c"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("n_triangles"))
  }

  /** Whole-graph edge / wedge / triangle counts in one pass — the
    * ingredients of the GLOBAL clustering coefficient (3·triangles /
    * wedges). Same degree-oriented machinery as [[perNodeCounts]], but
    * the wedge count comes from the DEGREE TABLE (Σ d·(d−1)/2 — a
    * node-sized aggregate, wedges are never enumerated for counting)
    * and only the oriented O(√m)-bounded wedge join runs row-wise for
    * the triangle closure test. Returns one row
    * (n_edges, n_wedges, n_triangles).
    */
  def globalCounts(edges: DataFrame, aCol: String, bCol: String): DataFrame = {
    val e = graft.CacheScope.persisted(
      edges.select(least(col(aCol), col(bCol)).as("u"),
          greatest(col(aCol), col(bCol)).as("v"))
        .filter(col("u") =!= col("v"))
        .distinct())
    val deg = graft.CacheScope.persisted(
      e.select(col("u").as("n"))
        .unionAll(e.select(col("v").as("n")))
        .groupBy("n").agg(count(lit(1)).as("deg")))
    val fromU = col("du") < col("dv") ||
      (col("du") === col("dv") && col("u") < col("v"))
    val oriented = graft.CacheScope.persisted(
      e.join(deg.select(col("n").as("u"), col("deg").as("du")), "u")
        .join(deg.select(col("n").as("v"), col("deg").as("dv")), "v")
        .select(when(fromU, col("u")).otherwise(col("v")).as("s"),
          when(fromU, col("v")).otherwise(col("u")).as("t")))
    val tris = oriented.as("x").join(oriented.as("y"),
        col("x.s") === col("y.s") && col("x.t") < col("y.t"))
      .select(col("x.t").as("b"), col("y.t").as("c"))
      .join(e, least(col("b"), col("c")) === col("u") &&
        greatest(col("b"), col("c")) === col("v"), "left_semi")
      .agg(count(lit(1)).as("n_triangles"))
    val we = deg.agg(
      coalesce(sum(expr("deg * (deg - 1) div 2")), lit(0L)).as("n_wedges"))
    e.agg(count(lit(1)).as("n_edges"))
      .crossJoin(broadcast(we))
      .crossJoin(broadcast(tris))
  }

  /** Common-neighbor link prediction (Liben-Nowell & Kleinberg 2003):
    * for every NON-adjacent pair two hops apart, the count of shared
    * neighbors — the classic "customers also bought" / collaborative
    * candidate generator. Unlike triangle counting, every wedge must be
    * enumerated (both endpoints matter, not just closure), so the hub
    * blowup is bounded EXPLICITLY: wedge centers with degree >
    * `maxDegree` are dropped before the self-join — the same hot-key
    * cap discipline as `MaxShingleDocFreq` (a center linked to
    * everything predicts nothing anyway; its wedges are pure noise and
    * at 100 TB pure cost). Everything else is equality joins and
    * map-combinable counts; the adjacency never leaves row form.
    * Returns (u, v, common_neighbors), u < v, non-adjacent pairs only.
    */
  def commonNeighbors(edges: DataFrame, aCol: String, bCol: String,
      maxDegree: Int): DataFrame = {
    val e = graft.CacheScope.persisted(
      edges.select(least(col(aCol), col(bCol)).as("u"),
          greatest(col(aCol), col(bCol)).as("v"))
        .filter(col("u") =!= col("v"))
        .distinct())
    // degree via a MAP-COMBINABLE groupBy-count, then hubs anti-joined
    // out with a broadcast BEFORE any center-keyed exchange: the r6
    // window formulation hash-shuffled a hub's entire adjacency into one
    // partition just to count-and-drop it — at extreme skew that single
    // partition IS the job. Here the hub's rows only ever meet as
    // partial counts, and the broadcast anti-join drops them map-side.
    // The hub set is bounded by 2·|E|/maxDegree ids (each hub owns >
    // maxDegree edge slots), which is what makes the broadcast sound.
    val adjRaw = e.select(col("u").as("c"), col("v").as("n"))
      .unionAll(e.select(col("v").as("c"), col("u").as("n")))
    val hubs = adjRaw.groupBy("c").agg(count(lit(1)).as("deg"))
      .filter(col("deg") > maxDegree)
      .select("c")
    val adj = graft.CacheScope.persisted(
      adjRaw.join(broadcast(hubs), Seq("c"), "left_anti"))
    val wedges = adj.as("x").join(adj.as("y"),
        col("x.c") === col("y.c") && col("x.n") < col("y.n"))
      .select(col("x.n").as("u"), col("y.n").as("v"))
    wedges.groupBy("u", "v").agg(count(lit(1)).as("common_neighbors"))
      .join(e, Seq("u", "v"), "left_anti")
  }
}
