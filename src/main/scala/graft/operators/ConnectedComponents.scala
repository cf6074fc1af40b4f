package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components over a pair list — the step that
  * turns near-duplicate PAIRS (MinHash/SimHash/Jaccard output) into
  * duplicate CLUSTERS so a curation pipeline can keep one canonical
  * document per cluster.
  *
  * Implements the alternating large-star / small-star algorithm
  * (Kiveris et al., "Connected Components in MapReduce and Beyond",
  * SoCC'14): each round is two self-join + min-aggregation passes that
  * monotonically re-point edges at smaller node ids until every edge is
  * a (node → component-min) star edge. Both passes are plain
  * groupBy-min + equality joins — no per-node neighbor lists are ever
  * collected, so a hot node with millions of neighbors stays a
  * hash-aggregate, not an OOM. Rounds converge in O(log n) (in
  * practice 2–4 for dedup graphs, whose components are small), which is
  * why this — and not driver-side union-find or a single giant window —
  * is the 100 TB shape.
  *
  * Determinism: every step is a min over node ids; the result depends
  * only on the input edge set, never on partitioning or visit order.
  *
  * Checkpoint storage budget (shared by every iterative operator here —
  * PageRank, ShortestPaths, KCore, LabelPropagation): AT MOST TWO round
  * snapshots plus the initial canon are pinned at any moment — the
  * previous round is freed via [[graft.CacheScope.freeLocalCheckpoint]]
  * as soon as the next round's checkpoint has materialized (plain
  * `Dataset.unpersist` is a silent no-op on checkpoint blocks). So
  * peak storage is 2 × |edges| + |canon| REGARDLESS of round count —
  * at graph scale the difference between an iteration that fits and
  * one that evicts the rest of the query; O(rounds × |edges|) is the
  * failure mode this design rules out. Pinned by CacheScopeSpec's
  * bounded-snapshot test.
  */
object ConnectedComponents {

  /** Component assignment for every node appearing in `pairs`.
    *
    * @param pairs two-column DataFrame of undirected edges (self-loops
    *              and duplicate/reversed pairs are fine)
    * @return DataFrame(id, component) — `component` is the MINIMUM node
    *         id reachable from `id`; one row per distinct node
    */
  def components(pairs: DataFrame, aCol: String, bCol: String,
      maxIters: Int = 25): DataFrame = {
    val spark = pairs.sparkSession
    import spark.implicits._

    // localCheckpoint both materializes each round AND truncates the
    // logical plan — without it the lineage of an iterative join
    // doubles per round and plan processing alone OOMs the driver long
    // before the data does. On a real cluster with lossy executors,
    // set a checkpoint dir and swap in checkpoint().
    // materialize the (possibly expensive) upstream pair pipeline once —
    // both the node set and the edge set derive from it
    // lazy: the initial star-forest test below is the first action over
    // this plan, and it touches every partition — so the (possibly
    // expensive) upstream pair pipeline materializes inside that job
    // instead of paying its own up-front one. nodes reads the cached
    // blocks afterwards.
    val canon = pairs
      .select(greatest(col(aCol), col(bCol)).cast("bigint").as("u"),
        least(col(aCol), col(bCol)).cast("bigint").as("v"))
      .localCheckpoint(false)
    // node set comes from the RAW pairs: a node whose only edge is a
    // self-loop is still a (singleton) component. Consumed exactly once
    // (the final left join), and canon is already checkpointed — so no
    // materialization job here; it recomputes from canon's blocks.
    val nodes = canon.select(explode(array($"u", $"v")).as("id")).distinct()
    // LAZY checkpoint: the star-test action below materializes the
    // blocks AND truncates lineage in the same job — an eager
    // checkpoint would pay a separate materialization job per round,
    // and at bench scale the per-job fixed cost IS the operator's cost
    // (the data is small; a round is ~5 short stages either way)
    // ckpt = lazy localCheckpoint with the recorded output partitioning
    // ERASED (graftbridge.eraseScanPartitioning): the distinct's
    // hashpartitioning survives onto the checkpoint scan, where a Spark
    // canonicalization gap (un-normalized RDDScanExec.outputPartitioning
    // under self-union attribute dedup) otherwise defeats ReuseExchange
    // and re-plans the round's shared subtrees once PER CONSUMER — the
    // round job measured 3× the map stages it needs. See the bridge doc.
    def ckpt(df: DataFrame): DataFrame =
      org.apache.spark.sql.graftbridge.eraseScanPartitioning(
        df.localCheckpoint(false))
    var edges = ckpt(canon
      .filter($"u" =!= $"v")
      .distinct())

    // convergence check: the paper's own termination condition — the
    // edge set is a DISJOINT STAR FOREST (Kiveris et al. §3: alternating
    // star converges exactly when every component is a star on its
    // minimum). With edges canonical (u > v) and distinct, that holds
    // iff no node both SOURCES an edge and does anything else: center c
    // only ever appears as v; leaf u appears as u exactly once. So one
    // explode to (endpoint, is_source) rows and one map-combinable
    // aggregate per node decides it — a violation is n_src > 1 (two
    // outgoing edges) or n_src = 1 with any other incidence (a chain).
    // Versus the previous round-over-round fingerprint equality, this
    // detects the fixpoint THE ROUND IT IS REACHED instead of paying a
    // full extra confirmation round (the whole two-star pipeline — at
    // the bench's ~60 ms/stage dispatch floor, an entire round of pure
    // scheduling) to observe that nothing changed. The test action also
    // doubles as the job that materializes the round's lazy checkpoint.
    // counted with ONE full-scan aggregate action, not isEmpty: isEmpty
    // plans a limit, and limit execution probes partitions
    // incrementally (a 1-task job, then 4× scale-ups) — several short
    // jobs per round where a single 3-stage count job does, and each
    // probe job materializes only the partitions it touched, leaving
    // the lazy checkpoint below half-saved for the next consumer to
    // finish. The violation count is a map-combinable aggregate over
    // the grouped incidence rows; its action materializes EVERY
    // partition of the round's checkpoint in the same job.
    def isStarForest(df: DataFrame): Boolean =
      df.select(explode(array(
          struct($"u".as("id"), lit(1).as("s")),
          struct($"v".as("id"), lit(0).as("s")))).as("x"))
        .groupBy($"x.id".as("id"))
        .agg(sum($"x.s").as("n_src"), count(lit(1)).as("deg"))
        .agg(count(when($"n_src" > 1 || ($"n_src" === 1 && $"deg" > 1),
          1)).as("viol"))
        .head().getLong(0) == 0L

    // round 0's test also materializes the initial checkpoint; an input
    // that is already a star forest (e.g. pair-only dup clusters) runs
    // ZERO rounds
    var converged = isStarForest(edges)
    var iter = 0
    while (!converged && iter < maxIters) {
      // large-star: for every node, point all LARGER neighbors at the
      // minimum of its neighborhood (incl. itself)
      val nbrs = edges.select($"u", $"v")
        .union(edges.select($"v".as("u"), $"u".as("v")))
      val mins = nbrs.groupBy($"u").agg(min($"v").as("mn"))
        .select($"u", least($"mn", $"u").as("m"))
      // NOT deduplicated: every consumer is duplicate-insensitive (the
      // small-star min, and `next`'s own distinct) — the dedup shuffle
      // here bought nothing but bounded intermediate size, and the dup
      // factor is neighborhood overlap, not data scale; the round's one
      // distinct (on `next`) is what persists between rounds
      //
      // shuffle_hash hints on the min tables, for two reasons at once:
      // (1) SCALE — mins/sMins are NODE-sized (one row per node of the
      // graph), so letting the planner broadcast them just because the
      // fixture-scale checkpoint stats look small plans an executor
      // OOM at graph scale; a min table is never a broadcastable dim.
      // (2) STAGES — with broadcast joins the probe sides (nbrs, large)
      // have no exchange, so each appearance RE-RUNS the union map from
      // the checkpoint (measured: six 16-task recompute stages per
      // round); with shuffle joins the aggregate and the probe consume
      // the SAME exchange (ReuseExchange), one map pass each. Hash, not
      // merge: both sides are already hash-partitioned on u and a
      // groupBy-min build side needs no sort.
      val large = nbrs.join(mins.hint("shuffle_hash"), "u")
        .filter($"v" > $"u")
        .select(greatest($"v", $"m").as("u"), least($"v", $"m").as("v"))
        .filter($"u" =!= $"v")
      // small-star: for every node, point all smaller-or-equal
      // neighbors (and itself) at the minimum of that set
      val sMins = large.groupBy($"u").agg(min($"v").as("m"))
      val nextPlan = large.join(sMins.hint("shuffle_hash"), "u")
        .select($"v".as("u"), $"m".as("v"))
        .union(sMins.select($"u", $"m".as("v")))
        .filter($"u" =!= $"v")
        .select(greatest($"u", $"v").as("u"), least($"u", $"v").as("v"))
        .distinct()
      if (sys.env.contains("SPARK_GRAFT_EXPLAIN_CC") && iter == 0)
        // scalastyle:off println
        println(nextPlan.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
        // scalastyle:on println
      val next = ckpt(nextPlan)
      // converged the moment the new edge set IS a star forest (the
      // fixpoint — a star forest maps to itself under both stars, so no
      // confirmation round is needed). The test action doubles as the
      // round's ONLY job: it materializes the lazy checkpoint above as
      // a side effect.
      converged = isStarForest(next)
      // free the PREVIOUS round's snapshot for real: Dataset.unpersist
      // is a no-op on localCheckpoint blocks (pinned on the RDD,
      // invisible to the CacheManager), so without this every round's
      // edge snapshot stays in executor storage until the harness
      // drain — O(rounds × |edges|) pinned blocks at graph scale.
      // `next` is materialized by the star-test job above, so the
      // old blocks are provably dead. The INITIAL canon stays pinned:
      // `nodes` re-reads it for the final join. (`edges` is never the
      // canon Dataset itself — round 0 already filtered+distinct'd
      // into its own checkpoint — so this free can run unconditionally
      // without touching the blocks `nodes` still needs.)
      graft.CacheScope.freeLocalCheckpoint(edges)
      edges = next
      iter += 1
    }
    // LOUD on exhaustion: past maxIters the edge set is an intermediate
    // re-pointing, and the starMap below would hand nodes of ONE true
    // component DIFFERENT ids with no signal — silently wrong cluster
    // assignments poison every downstream canonical-doc choice.
    // Alternating star converges in O(log) rounds (2–4 on dedup
    // graphs); hitting 25 means a pathological input, and the fix is
    // an explicit higher maxIters, not a quietly partial answer.
    if (!converged) throw new IllegalStateException(
      s"connected components did not converge within $maxIters rounds; " +
        "raise maxIters — returning the partial fixpoint would assign " +
        "different component ids to nodes of the same component")

    // at fixpoint every edge is (node, component-min); nodes that ended
    // up as roots appear only on the v side → they map to themselves
    val starMap = edges.groupBy($"u".as("id")).agg(min($"v").as("component"))
    val out = nodes.join(starMap, Seq("id"), "left")
      .select($"id", coalesce($"component", $"id").as("component"))
    out
  }
}
