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
    // lazy: the initial edge fingerprint below is the first action over
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
    // LAZY checkpoint: the fingerprint action below materializes the
    // blocks AND truncates lineage in the same job — an eager
    // checkpoint would pay a separate materialization job per round,
    // and at bench scale the per-job fixed cost IS the operator's cost
    // (the data is small; a round is ~5 short stages either way)
    var edges = canon
      .filter($"u" =!= $"v")
      .distinct()
      .localCheckpoint(false)

    // convergence check: an order-independent fingerprint of the edge
    // set — (count, bit_xor of a per-edge 64-bit hash) — compared to
    // the prior round. The exact alternative (two full `except`
    // anti-joins per round) costs two extra shuffles of the whole edge
    // set every iteration; the fingerprint is ONE scan of the
    // already-checkpointed partitions and a 1-row aggregate. Edges are
    // distinct, so xor is a sound (multiset-free) set fingerprint;
    // a missed change needs a 64-bit xor collision AND an identical
    // count in the same round (~2⁻⁶⁴ — far below any hardware error
    // rate). xor/count cannot overflow, so this stays ANSI-safe at any
    // scale, unlike sum(id).
    def fingerprint(df: DataFrame): (Long, Long) = {
      val r = df.agg(count(lit(1)),
        expr("bit_xor(xxhash64(u, v))")).head()
      (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
    }
    var prevFp = fingerprint(edges)

    var converged = false
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
      val large = nbrs.join(mins, "u")
        .filter($"v" > $"u")
        .select(greatest($"v", $"m").as("u"), least($"v", $"m").as("v"))
        .filter($"u" =!= $"v")
      // small-star: for every node, point all smaller-or-equal
      // neighbors (and itself) at the minimum of that set
      val sMins = large.groupBy($"u").agg(min($"v").as("m"))
      val next = large.join(sMins, "u")
        .select($"v".as("u"), $"m".as("v"))
        .union(sMins.select($"u", $"m".as("v")))
        .filter($"u" =!= $"v")
        .select(greatest($"u", $"v").as("u"), least($"u", $"v").as("v"))
        .distinct()
        .localCheckpoint(false)
      // converged when the (canonical, deduped) edge set is unchanged —
      // detected by fingerprint equality against the prior round (see
      // above); the algorithm monotonically re-points edges at smaller
      // ids, so the first unchanged round IS the fixpoint. The
      // fingerprint action doubles as the round's ONLY job: it
      // materializes the lazy checkpoint above as a side effect.
      val nextFp = fingerprint(next)
      // free the PREVIOUS round's snapshot for real: Dataset.unpersist
      // is a no-op on localCheckpoint blocks (pinned on the RDD,
      // invisible to the CacheManager), so without this every round's
      // edge snapshot stays in executor storage until the harness
      // drain — O(rounds × |edges|) pinned blocks at graph scale.
      // `next` is materialized by the fingerprint job above, so the
      // old blocks are provably dead. The INITIAL canon stays pinned:
      // `nodes` re-reads it for the final join. (`edges` is never the
      // canon Dataset itself — round 0 already filtered+distinct'd
      // into its own checkpoint — so this free can run unconditionally
      // without touching the blocks `nodes` still needs.)
      graft.CacheScope.freeLocalCheckpoint(edges)
      edges = next
      converged = nextFp == prevFp
      prevFp = nextFp
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
