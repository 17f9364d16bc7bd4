"""Iterative graph computation on DataFrames.

Complements operators/dedup.py's connected-components (used for
near-dup cluster resolution) with the other canonical iterative shape:
PageRank. The loop lives in the driver as plan construction only -- each
iteration is a join + aggregate over the edge list, the data never
leaves the cluster, and the edge list is computed once and cached.
The oracle unrolls the same three iterations as chained CTEs, with every
cross-row sum routed through decimal so both engines produce identical
doubles (float addition order is partition-dependent otherwise).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from ..io.readers import read_parquet_table as t
from ..operators import planhook
from ..operators.partitioning import stage_loop_edges
from . import register

_DAMP = 0.85

# rounds-to-fixpoint of the last execution of each iterative entry, for
# the scale probes (tools/scaleup_graph_probe.py): the 100 TB cost of an
# iterative plan is rounds x per-round shuffle, so round GROWTH vs graph
# depth is the number that must stay sub-linear (log for CC with pointer
# doubling; peel-depth for k-core, inherent to peeling).
LAST_ROUNDS: dict[str, int] = {}


def _pair_edges_sql(threshold: int = 3) -> str:
    """Undirected co-occurrence edges (basket pairs in >=threshold
    orders), emitted in both directions."""
    return f"""
    pairs AS (
      SELECT a.l_partkey AS src, b.l_partkey AS dst
      FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) a
      JOIN (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2 HAVING COUNT(*) >= {threshold}
    ),
    edges AS (
      SELECT src, dst FROM pairs
      UNION ALL
      SELECT dst AS src, src AS dst FROM pairs
    ),
    nodes AS (SELECT DISTINCT src AS node FROM edges),
    deg AS (SELECT src, COUNT(*) AS outdeg FROM edges GROUP BY src),
    n AS (SELECT COUNT(*) AS n_nodes FROM nodes)
    """


def _iter_sql(prev: str, out: str) -> str:
    """One unrolled PageRank iteration: decimal-exact contribution sum."""
    # bare numeric literals parse as DECIMAL in DuckDB; cast to DOUBLE so
    # both engines run the identical IEEE expression
    return f"""
    {out} AS (
      SELECT nodes.node,
             CAST({(1 - _DAMP)!r} AS DOUBLE) / n.n_nodes
               + CAST({_DAMP!r} AS DOUBLE)
                 * COALESCE(CAST(s.contrib AS DOUBLE), 0.0) AS rank
      FROM nodes CROSS JOIN n
      LEFT JOIN (
        SELECT e.dst AS node,
               SUM(CAST(p.rank / d.outdeg AS DECIMAL(38,18))) AS contrib
        FROM edges e
        JOIN {prev} p ON e.src = p.node
        JOIN deg d ON e.src = d.src
        GROUP BY e.dst
      ) s ON s.node = nodes.node
    )
    """


def _copurchase_edges(spark: SparkSession, sf_dir: str, threshold: int) -> DataFrame:
    """Undirected co-purchase edge list (both directions), mirroring
    ``_pair_edges_sql``: part pairs sharing >= threshold orders.

    r14 shape (guide §2.3 "aggregate before you shuffle"): ONE shuffle
    builds per-order baskets (``collect_set`` dedups map-side, so the
    exchange carries at most one (order, part) per pair instead of two
    full distinct-then-self-join legs), ordered pairs are generated
    map-side from the sorted basket array, and the pair count is a
    second partially-aggregated shuffle.  Replaces distinct + self-join
    + count (3 exchanges, basket rows shuffled twice).  Row-identical
    (exceptAll both ways = 0 at sf0.1).  Per-order work is O(c^2) in
    basket size c -- exactly what the pair definition requires and the
    same bound the self-join had; a single pathological giant basket
    lands in one task either way (both plans key by order)."""
    li = t(spark, sf_dir, "lineitem")
    baskets = (
        li.select("l_orderkey", "l_partkey")
        .groupBy("l_orderkey")
        .agg(F.sort_array(F.collect_set("l_partkey")).alias("parts"))
    )
    pairs = (
        baskets.select(
            F.explode(
                F.flatten(
                    F.transform(
                        F.col("parts"),
                        lambda x, i: F.transform(
                            F.slice(F.col("parts"), i + 2, F.size("parts")),
                            lambda y: F.struct(x.alias("src"), y.alias("dst")),
                        ),
                    )
                )
            ).alias("p")
        )
        .select("p.src", "p.dst")
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= threshold)
        .select("src", "dst")
    )
    return pairs.unionByName(
        pairs.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )


_BFS_MAX_HOPS = 4


@register(
    "graph_bfs_hops",
    eager_build=True,
    oracle=f"""
    WITH RECURSIVE {_pair_edges_sql(threshold=2)},
    root AS (SELECT src AS node FROM deg ORDER BY outdeg DESC, src LIMIT 1),
    r(node, hop) AS (
      SELECT node, 0 FROM root
      UNION
      SELECT e.dst, r.hop + 1
      FROM r JOIN edges e ON e.src = r.node
      WHERE r.hop < {_BFS_MAX_HOPS}
    ),
    dist AS (SELECT node, MIN(hop) AS hops FROM r GROUP BY node)
    SELECT CAST(hops AS BIGINT) AS hops, CAST(COUNT(*) AS BIGINT) AS n_nodes
    FROM dist GROUP BY hops
    """,
)
def graph_bfs_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hop-limited BFS from the highest-degree node of the co-purchase
    graph (>=2 shared orders); returns node counts per shortest-hop
    distance 0..4.

    The distributed shape for single/multi-source shortest paths on a
    DataFrame engine: the frontier is expanded one hop per round via an
    equi-join against the edge list, and a left-anti join against the
    visited set keeps each round's work proportional to the NEW
    frontier, not the whole reachable set -- at 100x the data, total work
    is O(edges touched), same as sequential BFS. The root is chosen
    in-plan (argmax degree, min-id tie-break) -- no driver collect. The
    oracle states the same fixpoint as a hop-bounded recursive CTE over
    identical edges.

    NOTE -- building this plan EXECUTES the traversal (like
    mad_per_group_approx's sketch collect): each round is materialized
    via ``localCheckpoint`` exactly as `cluster_labels`
    (operators/dedup.py:280) does. This is a measured necessity, not
    convenience: a fully lazy 4-hop unroll references every round's
    frame twice (anti-join + union), and the resulting subtree
    duplication is exponential in depth -- AQE's ReusedExchange does NOT
    collapse the distinct/anti-join exchanges across unroll depths
    (measured at sf0.01: lazy 14.5s, edges-only checkpoint 18.9s,
    per-round checkpoint ~2s). Iterative traversals on DataFrame
    engines need per-round materialization; plan-only consumers should
    skip this entry (it is the catalog's one traversal-at-build entry
    alongside mad_per_group_approx's documented build-time action).
    """
    # r14: src-partitioned staging -- the src-keyed per-round consumers
    # (joins/aggregates on edges.src) reuse the preserved partitioning
    # exchange-free.  r15: staged via stage_loop_edges (default: CACHE,
    # which plan-preserves the hash(src) partitioning; the r14
    # localCheckpoint did not -- its LogicalRDD reported
    # UnknownPartitioning in the committed dumps).
    edges = stage_loop_edges(_copurchase_edges(spark, sf_dir, threshold=2), "src")
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    root = (
        deg.orderBy(F.col("outdeg").desc(), F.col("src").asc())
        .limit(1)
        .select(F.col("src").alias("node"))
    )
    visited = root.select("node", F.lit(0).alias("hops")).localCheckpoint()
    frontier = visited.select("node")
    for h in range(1, _BFS_MAX_HOPS + 1):
        step = (
            frontier.join(edges, frontier.node == edges.src)
            .select(F.col("dst").alias("node"))
            .distinct()
            .join(visited, "node", "left_anti")
            .select("node", F.lit(h).alias("hops"))
        )
        planhook.emit("graph_bfs_hops_round", step)
        nxt = step.localCheckpoint()
        # r14: the visited set is a LAZY union -- every child is already
        # a checkpointed LogicalRDD, so referencing it per round costs a
        # linear union scan, never subtree recompute; the old per-round
        # re-checkpoint of the whole union was one extra materialization
        # job per hop (the exponential-duplication hazard the per-round
        # checkpoint exists for lives in nxt, which stays checkpointed)
        visited = visited.unionByName(nxt)
        frontier = nxt.select("node")
    edges.unpersist()
    return visited.groupBy(F.col("hops").cast("bigint").alias("hops")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_nodes")
    )


@register(
    "pagerank_parts_3iter",
    eager_build=True,
    oracle=f"""
    WITH {_pair_edges_sql()},
    r0 AS (SELECT node, CAST(1.0 AS DOUBLE) / n.n_nodes AS rank
           FROM nodes CROSS JOIN n),
    {_iter_sql('r0', 'r1')},
    {_iter_sql('r1', 'r2')},
    {_iter_sql('r2', 'r3')}
    SELECT node AS part, round(rank, 12) AS rank FROM r3
    """,
)
def pagerank_parts_3iter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank (3 iterations, d=0.85) on the part co-occurrence graph.
    The iterative pattern for DataFrame engines: edge list built once and
    cached, each iteration joins current ranks to edges and re-aggregates
    -- lineage grows linearly, so production loops checkpoint every ~10
    rounds to cut it. Contribution sums are decimal-exact, making the
    float trajectory identical across engines and partitionings."""
    # shared single-shuffle basket builder (r14): was an inline
    # distinct + self-join duplicate of _copurchase_edges at threshold=3
    edges = _copurchase_edges(spark, sf_dir, threshold=3)
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    # r14 (guide §2.4): outdeg is round-invariant, so it is folded onto
    # the cached edge relation ONCE instead of re-joined inside every
    # iteration -- each round is now exactly one join (ranks onto the
    # weighted edges), not two.  The per-edge rank/outdeg decimal
    # arithmetic is unchanged, so the trajectory stays bit-identical.
    ewd = edges.join(deg, "src").cache()
    nodes = ewd.select(F.col("src").alias("node")).distinct().cache()
    n_nodes = nodes.count()  # scalar: sizes the teleport term, O(1) result

    ranks = nodes.select("node", (F.lit(1.0) / n_nodes).alias("rank"))
    for _ in range(3):
        contrib = (
            ewd.join(ranks, ewd.src == ranks.node)
            .groupBy("dst")
            .agg(
                F.sum((F.col("rank") / F.col("outdeg")).cast("decimal(38,18)"))
                .cast("double")
                .alias("contrib")
            )
        )
        ranks = nodes.join(
            contrib, nodes.node == contrib.dst, "left_outer"
        ).select(
            "node",
            (
                F.lit((1 - _DAMP) / n_nodes)
                + F.lit(_DAMP) * F.coalesce(F.col("contrib"), F.lit(0.0))
            ).alias("rank"),
        )
    return ranks.select(F.col("node").alias("part"), F.round("rank", 12).alias("rank"))


def _ppr_iter_sql(prev: str, out: str) -> str:
    """One unrolled PERSONALIZED PageRank iteration: teleport mass goes
    to the seed only (is_seed carried on the rank relation), contrib
    sums decimal-exact like ``_iter_sql``."""
    return f"""
    {out} AS (
      SELECT p.node,
             CAST({(1 - _DAMP)!r} AS DOUBLE) * p.is_seed
               + CAST({_DAMP!r} AS DOUBLE)
                 * COALESCE(CAST(s.contrib AS DOUBLE), 0.0) AS rank,
             p.is_seed
      FROM {prev} p
      LEFT JOIN (
        SELECT e.dst AS node,
               SUM(CAST(pp.rank / d.outdeg AS DECIMAL(38,18))) AS contrib
        FROM edges e
        JOIN {prev} pp ON e.src = pp.node
        JOIN deg d ON e.src = d.src
        GROUP BY e.dst
      ) s ON s.node = p.node
    )
    """


@register(
    "ppr_parts_3iter",
    oracle=f"""
    WITH {_pair_edges_sql(threshold=2)},
    seed AS (SELECT src AS node FROM deg ORDER BY outdeg DESC, src LIMIT 1),
    p0 AS (
      SELECT nodes.node,
             CASE WHEN nodes.node = seed.node
                  THEN CAST(1.0 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END AS rank,
             CASE WHEN nodes.node = seed.node THEN 1 ELSE 0 END AS is_seed
      FROM nodes CROSS JOIN seed
    ),
    {_ppr_iter_sql('p0', 'p1')},
    {_ppr_iter_sql('p1', 'p2')},
    {_ppr_iter_sql('p2', 'p3')}
    SELECT node AS part, round(rank, 12) AS rank FROM p3 WHERE rank > 0
    """,
)
def ppr_parts_3iter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PERSONALIZED PageRank (3 iterations, d=0.85, restart at the
    hub part): the graph-retrieval twin of ``pagerank_parts_3iter`` --
    teleport mass returns to ONE seed instead of spreading uniformly,
    so the stationary mass measures proximity TO THE SEED (the
    'similar items via random walk' primitive behind co-purchase
    recommendation and GraphSAGE-style neighborhood sampling).  The
    seed is chosen in-plan (argmax degree, min-id tie-break,
    broadcast 1-row join -- no driver collect), carried as an is_seed
    flag on the narrow rank relation; each iteration is the same
    edges-join + decimal-exact contribution aggregate as global
    PageRank (one shuffle per round over the edge relation), and the
    zero-mass tail is dropped at publish (rank > 0: nodes beyond 3
    hops of the seed -- keeps the result proportional to the seed's
    neighborhood at any graph size, exactly what a retrieval consumer
    wants).  Lazy 3-round unroll like pagerank (the rank relation is
    referenced once per round -- linear lineage, no localCheckpoint
    needed, plan-only consumers stay safe).  Floats publish at 12
    digits (the pagerank discipline).

    The graph is the >=2-shared-orders co-purchase graph (denser than
    global pagerank's threshold-3 one: probed, the threshold-3 graph
    collapses to 4 nodes at sf0.1 and a seed neighborhood of 2 -- a
    degenerate retrieval surface; at threshold 2 the seed's 3-hop
    support is 12/255/200 nodes across the three SFs).

    Reference parity: no graph operators in the reference
    (DAG1:1-322); module docstring covers the family.
    """
    edges = _copurchase_edges(spark, sf_dir, threshold=2)
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    # r14: outdeg folded onto the cached edge relation once (the
    # pagerank_parts_3iter rationale) -- one join per round, not two
    ewd = edges.join(deg, "src").cache()
    nodes = ewd.select(F.col("src").alias("node")).distinct()
    seed = (
        deg.orderBy(F.col("outdeg").desc(), F.col("src").asc())
        .limit(1)
        .select(F.col("src").alias("seed_node"))
    )
    # base carries (node, is_seed) and is the LEFT side of every
    # round's rebuild, so the previous ranks relation is referenced
    # exactly ONCE per iteration (inside contrib) -- linear lineage;
    # joining prev ranks on both sides would duplicate the subtree
    # 2^rounds times (the lazy-unroll trap graph_bfs_hops documents)
    base = (
        nodes.crossJoin(F.broadcast(seed))
        .select(
            "node",
            F.when(F.col("node") == F.col("seed_node"), F.lit(1))
            .otherwise(F.lit(0))
            .alias("is_seed"),
        )
        .cache()
    )
    ranks = base.select(
        "node", F.col("is_seed").cast("double").alias("rank"), "is_seed"
    )
    for _ in range(3):
        contrib = (
            ewd.join(ranks.select("node", "rank"), ewd.src == F.col("node"))
            .groupBy("dst")
            .agg(
                F.sum((F.col("rank") / F.col("outdeg")).cast("decimal(38,18)"))
                .cast("double")
                .alias("contrib")
            )
        )
        ranks = base.join(contrib, base.node == contrib.dst, "left_outer").select(
            "node",
            (
                F.lit(1 - _DAMP) * F.col("is_seed")
                + F.lit(_DAMP) * F.coalesce(F.col("contrib"), F.lit(0.0))
            ).alias("rank"),
            "is_seed",
        )
    return (
        ranks.filter(F.col("rank") > 0)
        .select(F.col("node").alias("part"), F.round("rank", 12).alias("rank"))
    )


_PPR_SEEDS = 3


def _ppr_ms_iter_sql(prev: str, out: str) -> str:
    """One unrolled MULTI-SEED personalized-PageRank iteration: the
    rank relation is keyed (seed_id, node); contrib groups by
    (seed_id, dst) so ONE pass over the edge join serves every seed."""
    return f"""
    {out} AS (
      SELECT p.seed_id, p.node,
             CAST({(1 - _DAMP)!r} AS DOUBLE) * p.is_seed
               + CAST({_DAMP!r} AS DOUBLE)
                 * COALESCE(CAST(s.contrib AS DOUBLE), 0.0) AS rank,
             p.is_seed
      FROM {prev} p
      LEFT JOIN (
        SELECT pp.seed_id, e.dst AS node,
               SUM(CAST(pp.rank / d.outdeg AS DECIMAL(38,18))) AS contrib
        FROM edges e
        JOIN {prev} pp ON e.src = pp.node
        JOIN deg d ON e.src = d.src
        GROUP BY pp.seed_id, e.dst
      ) s ON s.seed_id = p.seed_id AND s.node = p.node
    )
    """


@register(
    "ppr_multiseed",
    oracle=f"""
    WITH {_pair_edges_sql(threshold=2)},
    seeds AS (
      SELECT src AS seed_node,
             ROW_NUMBER() OVER (ORDER BY outdeg DESC, src) AS seed_id
      FROM deg ORDER BY outdeg DESC, src LIMIT {_PPR_SEEDS}
    ),
    p0 AS (
      SELECT s.seed_id, nodes.node,
             CASE WHEN nodes.node = s.seed_node
                  THEN CAST(1.0 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END AS rank,
             CASE WHEN nodes.node = s.seed_node THEN 1 ELSE 0 END AS is_seed
      FROM nodes CROSS JOIN seeds s
    ),
    {_ppr_ms_iter_sql('p0', 'p1')},
    {_ppr_ms_iter_sql('p1', 'p2')},
    {_ppr_ms_iter_sql('p2', 'p3')}
    SELECT CAST(seed_id AS BIGINT) AS seed_id, node AS part,
           round(rank, 12) AS rank
    FROM p3 WHERE rank > 0
    """,
)
def ppr_multiseed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BATCHED personalized PageRank (r10 verdict ask #3): K=3 seeds
    served by ONE value iteration -- real retrieval workloads restart
    at many query nodes per pass, and the whole point of the batch is
    that the per-round edge shuffle AMORTIZES: the rank relation is
    keyed (seed_id, node), the contribution aggregate groups by
    (seed_id, dst), so each round is still exactly one join against
    the edge list + one shuffle, independent of K (K multiplies rows
    within the shuffle, never the number of passes -- at 1000 seeds on
    a 100 TB graph this is 1000x fewer edge scans than serial PPR).

    Seeds are the top-K degree parts chosen in-plan (TakeOrdered
    limit-K -- a distributed top-k, no global sort -- then seed_id by
    row_number over the already-3-row relation; deterministic because
    the ordering is total: degree desc, id asc).  Everything else
    mirrors ``ppr_parts_3iter``: broadcast seed join onto the node
    base, base is the LEFT side of every rebuild so prev ranks are
    referenced ONCE per round (linear lazy lineage), decimal-exact
    contribution sums, teleport mass to each seed's own row, zero-mass
    tail dropped at publish (each seed's output stays proportional to
    ITS neighborhood).  Floats publish at 12 digits.

    Reference parity: no graph operators in the reference
    (DAG1:1-322); module docstring covers the family.
    """
    from pyspark.sql import Window

    edges = _copurchase_edges(spark, sf_dir, threshold=2)
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    # r14: outdeg folded onto the cached edge relation once (the
    # pagerank_parts_3iter rationale) -- one join per round, not two
    ewd = edges.join(deg, "src").cache()
    nodes = ewd.select(F.col("src").alias("node")).distinct()
    wseed = Window.orderBy(F.col("outdeg").desc(), F.col("src").asc())
    seeds = (
        deg.orderBy(F.col("outdeg").desc(), F.col("src").asc())
        .limit(_PPR_SEEDS)
        .select(
            F.col("src").alias("seed_node"),
            F.row_number().over(wseed).cast("bigint").alias("seed_id"),
        )
    )
    base = (
        nodes.crossJoin(F.broadcast(seeds))
        .select(
            "seed_id",
            "node",
            F.when(F.col("node") == F.col("seed_node"), F.lit(1))
            .otherwise(F.lit(0))
            .alias("is_seed"),
        )
        .cache()
    )
    ranks = base.select(
        "seed_id", "node", F.col("is_seed").cast("double").alias("rank"), "is_seed"
    )
    for _ in range(3):
        contrib = (
            ewd.join(
                ranks.select(
                    F.col("seed_id").alias("sid"), F.col("node").alias("rn"), "rank"
                ),
                ewd.src == F.col("rn"),
            )
            .groupBy("sid", "dst")
            .agg(
                F.sum((F.col("rank") / F.col("outdeg")).cast("decimal(38,18)"))
                .cast("double")
                .alias("contrib")
            )
        )
        ranks = base.join(
            contrib,
            (base.seed_id == contrib.sid) & (base.node == contrib.dst),
            "left_outer",
        ).select(
            base.seed_id,
            base.node,
            (
                F.lit(1 - _DAMP) * base.is_seed
                + F.lit(_DAMP) * F.coalesce(contrib.contrib, F.lit(0.0))
            ).alias("rank"),
            base.is_seed,
        )
    return ranks.filter(F.col("rank") > 0).select(
        "seed_id",
        F.col("node").alias("part"),
        F.round("rank", 12).alias("rank"),
    )


_CC_MAX_ROUNDS = 50


@register(
    "graph_connected_components",
    eager_build=True,
    oracle=f"""
    WITH RECURSIVE {_pair_edges_sql(threshold=2)},
    reach(node, comp) AS (
      SELECT node, node FROM nodes
      UNION
      SELECT e.dst, r.comp
      FROM reach r JOIN edges e ON e.src = r.node
      WHERE r.comp < e.dst
    ),
    labeled AS (SELECT node, MIN(comp) AS comp FROM reach GROUP BY node)
    SELECT CAST(comp AS BIGINT) AS component_id,
           CAST(COUNT(*) AS BIGINT) AS n_nodes
    FROM labeled GROUP BY comp
    """,
)
def graph_connected_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components of the co-purchase graph (>=2 shared orders):
    min-label propagation to fixpoint, reported as one row per component
    (component_id = the component's smallest part key, plus node count).

    The distributed shape: each round every node takes the min of its
    own label and its neighbors' labels (one equi-join + one groupBy-min
    over the edges), then a POINTER-DOUBLING step chases one level of
    label indirection (labels self-joined on comp = node: comp'' =
    min(comp', L'(comp'))), so the distance a minimum can travel DOUBLES
    per round and the loop converges in O(log diameter) rounds, not
    O(diameter) -- plain propagation needs ~D rounds on a diameter-D
    graph, which at 100 TB (where each round is a full O(edges) shuffle
    plus a materialization) is the difference between ~6 rounds and
    ~60 on a deep graph; docs/SCALEUP.md's graph-depth probe measures
    exactly this on chain-of-cliques replicas.  Doubling preserves the
    fixpoint: every label value is the id of a node in the same
    component (true initially, preserved by both steps since mins of
    same-component ids stay in-component), values only decrease, and
    the fixpoint of both systems is the component minimum.  Convergence
    is detected with a monotone potential -- the SUM of all labels
    strictly decreases until fixpoint -- so each round adds exactly one
    scalar aggregate action, never a full comparison join.  Like
    ``graph_bfs_hops`` above, each round is materialized via
    ``localCheckpoint`` (a lazy unroll duplicates the join subtree
    exponentially) -- building this plan EXECUTES the propagation; the
    safety cap (50, _CC_MAX_ROUNDS) now covers diameters up to ~2^50
    and exhaustion raises loudly.  At 100 TB this is label-propagation
    CC with path doubling on a DataFrame engine; the label relation is
    (node, comp) -- narrow -- and the edge list is computed once and
    reused checkpointed.  Rounds-to-fixpoint is recorded in
    ``LAST_ROUNDS`` for the scale probes.

    The oracle states the same fixpoint as a recursive transitive-
    closure CTE pruned to min-labels (comp < dst: only a component's
    smaller labels ever propagate, and the GROUP BY min picks the
    component minimum -- identical to the propagation fixpoint).

    Reference parity: the reference has no graph operators at all
    (its DAGs are linear pandas flows, DAG1:1-322); this extends the
    engine the way production dedup pipelines need (cluster id
    assignment at corpus scale).
    """
    edges = _copurchase_edges(spark, sf_dir, threshold=2).localCheckpoint()
    nodes = edges.select(F.col("src").alias("node")).distinct()
    rounds = [0]

    def bump() -> None:
        rounds[0] += 1

    # the propagation loop itself lives in _min_label_components (ONE
    # implementation, shared with kcore_parts' chain resolution): min-
    # label + pointer doubling, decimal monotone-potential convergence,
    # per-round localCheckpoint, loud cap exhaustion
    labels = _min_label_components(nodes, edges, bump, cap=_CC_MAX_ROUNDS)
    LAST_ROUNDS["graph_connected_components"] = rounds[0]
    return labels.groupBy(F.col("comp").cast("bigint").alias("component_id")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_nodes")
    )


_KCORE_K = 2
_KCORE_ORACLE_ROUNDS = 12  # > max peel rounds probed at sf0.01 (3) and sf0.1 (5)
_KCORE_MACRO_CAP = 40  # smooth+peel macro rounds; ~log n suffice (rake/compress)
_KCORE_COMPRESS_AFTER = 6  # rakes before chain contraction engages: both test
# fixtures peel to fixpoint in 3-5 rakes (never pay contraction); a pendant
# chain still raking at 6 is depth-bound and gets collapsed in O(log) rounds
_CHAIN_CC_CAP = 60  # pointer-doubled chain resolution: covers chains to ~2^60


def _mg_degrees(edges: DataFrame) -> DataFrame:
    """Multigraph degrees from a one-row-per-edge list (eid, u, v):
    self-loops count twice and parallel edges separately, exactly the
    degree the peel semantics needs -- one union + one aggregate."""
    return (
        edges.select(F.col("u").alias("node"))
        .unionByName(edges.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("d"))
    )


def _min_label_components(
    nodes: DataFrame, both: DataFrame, bump, cap: int = _CHAIN_CC_CAP
) -> DataFrame:
    """Min-label connected components with pointer doubling: each round
    every node takes the min of its own and its neighbors' labels, then
    chases one level of label indirection (comp'' = min(comp',
    L'(comp'))), so the distance a minimum can travel DOUBLES per round
    -- O(log diameter) rounds to fixpoint.  THE single implementation:
    ``graph_connected_components`` is a thin wrapper over it, and
    ``kcore_parts`` calls it as the chain-resolution subroutine of the
    compress step.  ``nodes`` is (node); ``both`` is the directed edge
    list (src, dst), both directions present; returns (node, comp) with
    comp = the component's minimum node id.  Convergence is the
    monotone-potential discipline (decimal SUM of labels strictly
    decreases until fixpoint -- decimal(38,0) so wrapped bigint sums can
    never fake convergence); each round is localCheckpoint-materialized
    (iterative-loop discipline, see graph_bfs_hops).  ``bump()`` fires
    once per round that CHANGED labels -- the LAST_ROUNDS convention
    every iterative entry shares, so depth-probe round counts compare
    like with like.  Cap exhaustion raises rather than returning
    partially-propagated labels.

    r14 round-body optimization (guide §2.4, measured cur 4.4s -> lean
    2.8s warm at sf0.1, labels bit-identical, same round count):

    - SELF-LOOPS fold the own-label min into the neighbor-min: with a
      (node, node) edge per node unioned into the edge list, the
      groupBy(dst).min(comp) already covers every node's own label, so
      the separate labels-side left_outer join + ``least`` disappears
      -- one equi-join per round instead of two.  The self-loop union
      adds O(nodes) rows to the checkpointed edge list, negligible
      against O(edges).
    - The convergence potential rides the SAME job as the round's
      ``localCheckpoint`` via ``observe`` (the checkpoint materializes
      every row anyway; the old separate ``agg().collect()`` was one
      extra job per round).
    - The edge list is hash-repartitioned by ``src`` and CACHED (r15):
      ``InMemoryTableScanExec`` preserves ``outputPartitioning``, so
      each round's join shuffles only the (node, comp) labels relation,
      never the edges (at 100 TB the edge relation dominates: this is
      the difference between shuffling O(edges) once and once per
      round).  r14 used repartition+localCheckpoint here, but the
      committed plans/r14 dumps showed the checkpointed ``LogicalRDD``
      reports ``UnknownPartitioning(0)`` -- the claimed exchange
      elision did not exist as implemented; the cache is the pattern
      that provably plan-preserves it (pagerank's ``ewd``; loop-body
      dump in plans/r15/).  The cache is unpersisted before return --
      per-call staging inside the query, never cross-run state."""
    selfloops = nodes.select(
        F.col("node").alias("src"), F.col("node").alias("dst")
    )
    e = stage_loop_edges(both.unionByName(selfloops), "src")
    pot_expr = F.sum(F.col("comp").cast("decimal(38,0)")).alias("pot")
    obs0 = Observation()
    # r14: initial labels derive from e's MATERIALIZED self-loops (one
    # narrow scan of the cached edges) instead of re-running the nodes
    # aggregate a second time -- requires ``both`` to be loop-free
    # (src != dst on every row), which both callers' edge builders
    # guarantee (strict src<dst pair enumeration, both directions)
    labels = (
        e.filter(F.col("src") == F.col("dst"))
        .select(F.col("src").alias("node"), F.col("src").alias("comp"))
        .observe(obs0, pot_expr)
        .localCheckpoint()
    )
    potential = obs0.get["pot"]
    try:
        for _ in range(cap):
            stepped = (
                e.join(labels, e.src == labels.node)
                .groupBy(F.col("dst").alias("node"))
                .agg(F.min("comp").alias("comp"))
            )
            lookup = stepped.select(
                F.col("node").alias("ptr_node"), F.col("comp").alias("ptr_comp")
            )
            obs = Observation()
            nxt = stepped.join(
                lookup, stepped.comp == lookup.ptr_node, "left_outer"
            ).select("node", F.least("comp", "ptr_comp").alias("comp"))
            planhook.emit("min_label_components_round", nxt)
            labels = nxt.observe(obs, pot_expr).localCheckpoint()
            new_potential = obs.get["pot"]
            if new_potential == potential:
                return labels
            bump()
            potential = new_potential
        raise RuntimeError(
            "_min_label_components: potential still decreasing after "
            f"{cap} rounds -- component diameter exceeds the cap; raise it "
            "rather than accept unconverged labels"
        )
    finally:
        # kcore_parts calls this per compress step: the per-call edge
        # cache must not accumulate across calls (async: no extra job)
        e.unpersist()


@register(
    "kcore_parts",
    eager_build=True,
    oracle=f"""
    WITH RECURSIVE {_pair_edges_sql(threshold=2)},
    live(rnd, src, dst) AS (
      SELECT 0, src, dst FROM edges
      UNION ALL
      SELECT rnd + 1, src, dst FROM (
        SELECT rnd, src, dst,
               COUNT(*) OVER (PARTITION BY src) AS dsrc,
               COUNT(*) OVER (PARTITION BY dst) AS ddst
        FROM live
      ) WHERE rnd < {_KCORE_ORACLE_ROUNDS}
          AND dsrc >= {_KCORE_K} AND ddst >= {_KCORE_K}
    )
    SELECT CAST(src AS BIGINT) AS part_key,
           CAST(COUNT(*) AS BIGINT) AS core_degree
    FROM live WHERE rnd = {_KCORE_ORACLE_ROUNDS}
    GROUP BY src
    """,
)
def kcore_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-core (k=2, _KCORE_K) of the co-purchase graph (>=2 shared
    orders), computed by SMOOTH-AND-PEEL so the round count tracks
    O(log peel-depth), not the peel depth itself (r9 verdict ask #1:
    layer-by-layer peeling measured rounds = depth 1:1 -- 63 rounds on
    a depth-63 pendant path -- and a deep-peeling 100 TB graph pays
    depth x full-shuffle).  Output is unchanged: each surviving node
    with its in-core degree.

    Why plain peeling is depth-bound: for k=2 the deep case is a long
    pendant CHAIN of degree-2 nodes -- each peel round only exposes the
    next node, and ANY algorithm whose information travels one hop per
    round (including the h-index/coreness value iteration, which
    propagates the h=1 truth inward one node per round on a chain)
    needs L rounds on a length-L chain.  Beating depth requires
    long-range jumps, i.e. pointer doubling -- the rake/compress shape
    of parallel tree contraction.

    Each macro-round here is:
      RAKE -- one peel round: drop nodes of multigraph degree < 2
        (self-loops x2, parallel edges separately) and their incident
        edges.  A rake that finds nothing dead means min degree >= k
        everywhere -- the current multigraph IS the k-core, stop.
      COMPRESS -- engaged only after _KCORE_COMPRESS_AFTER consecutive
        rakes (real corpora peel out in 3-5 rakes and never pay for
        it; a deep pendant chain stalls the rake at 1-2 nodes/round
        and lands here): resolve the maximal chains of the remaining
        degree-2 nodes with the pointer-doubled min-label subroutine
        (``_min_label_components``, O(log chain-length) rounds --
        isolated degree-2 nodes bypass it as trivial chains), and
        contract each chain to ONE super-edge between its two anchor
        endpoints (topological smoothing).  A chain with NO anchor is a
        pure degree-2 cycle: it is its own 2-core component -- emitted
        directly with core_degree 2.  Contracted interior nodes are
        SUSPENDED on their super-edge (a (node, eid) side table, eids
        remapped when a super-edge is itself later contracted), because
        for k=2 an interior node survives iff its super-edge survives,
        with core degree exactly 2.
    Correctness:
    smoothing is a homeomorphism -- anchor degrees are preserved edge-
    for-edge, so the contracted multigraph's peel trajectory maps 1:1
    onto the original's, and a super-edge is in the contracted core iff
    its chain (all interior degrees exactly 2, ends on the surviving
    anchors) is in the original 2-core.  Rake halves the non-core
    excess per macro-round on tree-shaped overhangs (after compress, a
    pendant tree has no degree-2 nodes, so over half its nodes are
    leaves), giving O(log n) macro-rounds and O(log^2) total rounds --
    the depth probe (tools/scaleup_graph_probe.py) measures rounds on
    depth-15 vs depth-63 pendant paths, where plain peeling measured
    15 vs 63.

    The oracle is unchanged -- it states the peel FIXPOINT (recursive
    CTE, 12 rounds, identity past fixpoint), which is algorithm-
    independent: smoothing computes the same 2-core.

    The contraction acceleration is k=2-specific (smoothing preserves
    min-degree-2 exactly); for general k the scalable shape is the
    h-index value iteration -- implemented as ``coreness_hindex`` below,
    which also cross-checks this entry (coreness >= 2 iff in the 2-core).
    """
    und = _copurchase_edges(spark, sf_dir, threshold=2).filter(
        F.col("src") < F.col("dst")
    )
    # edge ids are only needed once contraction engages (suspension
    # bookkeeping); pure-rake rounds -- the entire life of the loop on
    # real corpora -- carry the narrow (u, v) relation only
    edges = und.select(
        F.col("src").alias("u"), F.col("dst").alias("v")
    ).localCheckpoint()
    susp = spark.createDataFrame([], schema="node bigint, eid string")
    done = spark.createDataFrame([], schema="part_key bigint, core_degree bigint")
    rounds = [0]

    def bump() -> None:
        rounds[0] += 1

    rakes = 0
    for _ in range(_KCORE_MACRO_CAP):
        # RAKE: one peel round over multigraph degrees.  No broadcast
        # hint on the dead set -- O(nodes) in early rounds; AQE
        # broadcasts at runtime once it actually shrinks.  A rake
        # finding nothing dead means min degree >= k everywhere: the
        # current multigraph IS the k-core -- stop WITHOUT contracting
        # any remaining degree-2 chains (they are core chains;
        # contraction is pure acceleration, never needed at fixpoint).
        # r14: the emptiness probes ride each checkpoint's own job via
        # ``observe`` (the _min_label_components idiom) instead of a
        # separate limit(1).count() job per round
        obs_dead = Observation()
        dead = (
            _mg_degrees(edges)
            .filter(F.col("d") < _KCORE_K)
            .select("node")
            .observe(obs_dead, F.count(F.lit(1)).alias("n"))
            .localCheckpoint()
        )
        if obs_dead.get["n"] == 0:
            LAST_ROUNDS["kcore_parts"] = rounds[0]
            break
        bump()
        rakes += 1
        rake = edges.join(
            dead.select(F.col("node").alias("u")), "u", "left_anti"
        ).join(dead.select(F.col("node").alias("v")), "v", "left_anti")
        planhook.emit("kcore_rake_round", rake)
        edges = rake.localCheckpoint()
        # COMPRESS: engaged only once raking alone has gone on for a
        # few rounds (_KCORE_COMPRESS_AFTER) -- real corpora peel to
        # fixpoint in 3-5 rakes and never pay the contraction
        # machinery; a deep pendant chain stalls the rake (1-2 nodes
        # per round) and is collapsed here in O(log chain) rounds.
        if rakes < _KCORE_COMPRESS_AFTER:
            continue
        obs_d2 = Observation()
        d2 = (
            _mg_degrees(edges)
            .filter(F.col("d") == _KCORE_K)
            .select("node")
            .observe(obs_d2, F.count(F.lit(1)).alias("n"))
            .localCheckpoint()
        )
        if obs_d2.get["n"] == 0:
            continue
        bump()  # the contraction rewrite is one materialized round
        if "eid" not in edges.columns:  # first contraction: attach ids
            edges = edges.select(
                F.concat_ws(":", F.lit("o"), "u", "v").alias("eid"), "u", "v"
            )
        d2u = d2.select(F.col("node").alias("u"), F.lit(True).alias("u2"))
        d2v = d2.select(F.col("node").alias("v"), F.lit(True).alias("v2"))
        ann = (
            edges.join(d2u, "u", "left_outer")
            .join(d2v, "v", "left_outer")
            .select(
                "eid",
                "u",
                "v",
                F.coalesce("u2", F.lit(False)).alias("u2"),
                F.coalesce("v2", F.lit(False)).alias("v2"),
            )
            .localCheckpoint()
        )
        chain_edges = ann.filter(F.col("u2") & F.col("v2"))
        # pointer doubling only over nodes actually ON a d2-d2 chain;
        # an isolated degree-2 node (both neighbors anchors) is its own
        # trivial chain and needs no rounds at all
        obs_cn = Observation()
        chain_nodes = (
            chain_edges.select(F.col("u").alias("node"))
            .unionByName(chain_edges.select(F.col("v").alias("node")))
            .distinct()
            .observe(obs_cn, F.count(F.lit(1)).alias("n"))
            .localCheckpoint()
        )
        if obs_cn.get["n"] > 0:
            ce = chain_edges.select(
                F.col("u").alias("src"), F.col("v").alias("dst")
            )
            chained = _min_label_components(
                chain_nodes,
                ce.unionByName(
                    ce.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
                ),
                bump,
            )
            labels = (
                d2.join(chain_nodes, "node", "left_anti")
                .select("node", F.col("node").alias("comp"))
                .unionByName(chained)
                .localCheckpoint()
            )
        else:
            labels = d2.select("node", F.col("node").alias("comp")).localCheckpoint()
        anchor_rows = ann.filter(F.col("u2") != F.col("v2")).select(
            "eid",
            F.when(F.col("u2"), F.col("u")).otherwise(F.col("v")).alias("d2node"),
            F.when(F.col("u2"), F.col("v")).otherwise(F.col("u")).alias("anchor"),
        )
        ar = anchor_rows.join(labels, anchor_rows.d2node == labels.node).select(
            "eid", "comp", "anchor"
        )
        # every path-shaped chain has EXACTLY two anchor-incident
        # edges (each chain endpoint has one non-chain neighbor);
        # min/max over those two rows names the super-edge endpoints
        # (equal anchors => a self-loop, degree contribution 2)
        sup = ar.groupBy("comp").agg(
            F.min("anchor").alias("u"), F.max("anchor").alias("v")
        )
        super_eid = F.concat(F.lit("c:"), F.col("comp").cast("string"))
        new_edges = sup.select(super_eid.alias("eid"), "u", "v")
        # zero anchor rows => pure degree-2 cycle: a 2-core
        # component in its own right, every node core_degree 2
        cyc_comps = (
            labels.select("comp")
            .distinct()
            .join(sup.select("comp"), "comp", "left_anti")
            .localCheckpoint()
        )
        two = F.lit(2).cast("bigint")
        done = done.unionByName(
            labels.join(cyc_comps, "comp", "leftsemi").select(
                F.col("node").cast("bigint").alias("part_key"),
                two.alias("core_degree"),
            )
        )
        # map every removed edge (>= one endpoint in D2) to its chain
        removed = chain_edges.select("eid", F.col("u").alias("d2node")).unionByName(
            anchor_rows.select("eid", "d2node")
        )
        rem_comp = (
            removed.join(labels, removed.d2node == labels.node)
            .select("eid", "comp")
            .localCheckpoint()
        )
        # suspensions follow their edge: into the new super-edge, or
        # straight to the survivor set if the chain closed a cycle
        cyc_eids = rem_comp.join(cyc_comps, "comp", "leftsemi").select("eid")
        done = done.unionByName(
            susp.join(cyc_eids, "eid", "leftsemi").select(
                F.col("node").cast("bigint").alias("part_key"),
                two.alias("core_degree"),
            )
        )
        to_super = rem_comp.join(cyc_comps, "comp", "left_anti").select(
            F.col("eid").alias("old_eid"),
            F.concat(F.lit("c:"), F.col("comp").cast("string")).alias("new_eid"),
        )
        susp = (
            susp.join(rem_comp.select("eid"), "eid", "left_anti")
            .unionByName(
                susp.join(to_super, susp.eid == to_super.old_eid).select(
                    "node", F.col("new_eid").alias("eid")
                )
            )
            .unionByName(
                labels.join(cyc_comps, "comp", "left_anti").select(
                    "node", super_eid.alias("eid")
                )
            )
            .localCheckpoint()
        )
        edges = (
            ann.filter(~F.col("u2") & ~F.col("v2"))
            .select("eid", "u", "v")
            .unionByName(new_edges)
            .localCheckpoint()
        )
        # keep the accumulator's plan flat too (iterative-loop
        # discipline): it gains ~2 union branches per contraction
        done = done.localCheckpoint()
    else:
        raise RuntimeError(
            f"kcore_parts: smooth-and-peel did not reach fixpoint within "
            f"{_KCORE_MACRO_CAP} macro-rounds -- raise _KCORE_MACRO_CAP "
            f"rather than accept a partially-peeled core"
        )
    surviving = _mg_degrees(edges).select(
        F.col("node").cast("bigint").alias("part_key"),
        F.col("d").cast("bigint").alias("core_degree"),
    )
    if "eid" not in edges.columns:  # contraction never engaged
        return surviving.unionByName(done)
    susp_surv = susp.join(edges.select("eid"), "eid", "leftsemi").select(
        F.col("node").cast("bigint").alias("part_key"),
        F.lit(2).cast("bigint").alias("core_degree"),
    )
    return surviving.unionByName(susp_surv).unionByName(done)


_HIX_ORACLE_ROUNDS = 24  # > measured changing-rounds at sf0.001 (20),
# sf0.01 (9), sf0.1 (4) -- the sf0.001 co-purchase graph is the sparsest
# and chainiest, so value deltas travel the furthest there
_HIX_CAP = 100


def _hix_round_sql(prev: str, out: str) -> str:
    """One unrolled HISTOGRAM h-index round (r10 verdict ask #1):
    h'(v) = max over distinct neighbor-estimate values c of
    LEAST(c, #neighbors with estimate >= c) -- the suffix-count argmax.
    Equivalent to the sorted-position formula (for t in the half-open
    interval between consecutive distinct values, the >=t count is
    constant, so the optimum lands on a distinct value), but the inner
    relation has ONE ROW PER (node, distinct value) instead of one per
    edge, and every estimate is <= H0 (see the entry docstring), so the
    per-node partition is degeneracy-bounded, never degree-bounded.

    AS MATERIALIZED is load-bearing: DuckDB inlines single-reference
    CTEs, and this round's 3-level nested subquery inflates the inlined
    plan ~3.5x per round (measured: 14 plain rounds hung for 15+ min;
    14 materialized rounds run in 0.5 s at sf0.01)."""
    return f"""
    {out} AS MATERIALIZED (
      SELECT node, MAX(LEAST(nh, s)) AS h FROM (
        SELECT node, nh, SUM(cnt) OVER (
                 PARTITION BY node ORDER BY nh DESC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s
        FROM (
          SELECT e.src AS node, p.h AS nh, COUNT(*) AS cnt
          FROM edges e JOIN {prev} p ON p.node = e.dst
          GROUP BY 1, 2
        )
      ) GROUP BY node
    )
    """


_HIX_ORACLE = (
    "WITH "
    + _pair_edges_sql(threshold=2)
    + """,
    ddist AS (SELECT outdeg AS d, COUNT(*) AS nd FROM deg GROUP BY 1),
    h0cap AS (
      SELECT MAX(LEAST(d, s)) AS h0 FROM (
        SELECT d, SUM(nd) OVER (
                 ORDER BY d DESC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s
        FROM ddist
      )
    ),
    h0 AS (SELECT src AS node, CAST(LEAST(outdeg, h0cap.h0) AS BIGINT) AS h
           FROM deg CROSS JOIN h0cap)"""
    + "".join(
        ",\n" + _hix_round_sql(f"h{i}", f"h{i + 1}")
        for i in range(_HIX_ORACLE_ROUNDS)
    )
    + f"""
    SELECT CAST(node AS BIGINT) AS part_key, CAST(h AS BIGINT) AS coreness
    FROM h{_HIX_ORACLE_ROUNDS}"""
)


@register("coreness_hindex", eager_build=True, oracle=_HIX_ORACLE)
def coreness_hindex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full coreness decomposition of the co-purchase graph by the
    distributed H-INDEX value iteration (Lu, Zhou, Zhang & Stanley,
    "The H-index of a network node and its relation to degree and
    coreness", Nat. Commun. 7:10168, 2016): start every node at its
    degree, then repeatedly replace each node's estimate with the
    h-index of its neighbors' estimates (the largest h such that at
    least h neighbors currently have estimate >= h).  The sequence is
    pointwise non-increasing and converges EXACTLY to coreness -- the
    largest k such that the node is in the k-core -- so one run yields
    every k-core at once (filter coreness >= k), unlike the per-k peel.

    This is the r9 verdict's named general-k algorithm, in the r10
    verdict's SKEW-SAFE histogram formulation: each round is one
    edge-list join + one hash-aggregate ``groupBy(node, estimate)``
    (distributed, map-side combine absorbs any hub's fan-in) + one
    per-node suffix-sum argmax over the DISTINCT estimate values.  Two
    facts bound that per-node partition by the graph's DEGENERACY, not
    by degree:

    1. Estimates start at h0(v) = LEAST(degree(v), H0), where H0 is the
       h-index of the DEGREE SEQUENCE (max h such that >= h nodes have
       degree >= h).  H0 >= degeneracy: a k-core contains >= k+1 nodes
       of original degree >= k, so max coreness k* <= H0.  Hence
       coreness <= h0 <= degree pointwise; the h-operator T is monotone,
       so T^n(coreness)=coreness <= T^n(h0) <= T^n(degree) -> coreness
       (Lu et al.), and the sandwich forces T^n(h0) -> coreness too.
       T(h0) <= h0 (a node's h-index is at most its neighbor count and
       at most the max neighbor estimate <= H0), so the trajectory is
       still pointwise non-increasing from round one.
    2. Every estimate is therefore <= H0 forever, so a node sees at
       most H0+1 distinct neighbor-estimate values: the argmax window
       partition holds <= H0+1 rows even for a 1e8-degree hub (which
       previously sorted its full adjacency in ONE task per round).

    H0 itself is computed the same way (groupBy(degree).count + a
    suffix sum over the distinct-degree histogram -- one row per
    distinct degree value, a sketch-sized single-partition window) and
    collected as one scalar.

    Work per round stays O(edges) for the join; on real corpora it
    converges in a handful of rounds (measured under the capped start:
    9 changing rounds at sf0.01, 4 at sf0.1 -- the cap can only shorten
    the trajectory, pointwise T^n(h0) <= T^n(degree), and here matches
    the uncapped counts because the fixture's degrees sit mostly at or
    below H0) -- bounded by VALUE deltas, not layer count.  On adversarial chains information still travels one hop
    per round -- which is why ``kcore_parts`` (k=2) uses pointer-doubled
    smoothing for the depth probe; this entry is the general-k
    complement and cross-checks it: {coreness >= 2} = the 2-core node
    set (pinned in tests/test_graph_entries invariants).

    Convergence detection is the house monotone-potential discipline:
    SUM(h) (decimal, overflow-proof) strictly decreases until fixpoint,
    one scalar action per round; rounds land in ``LAST_ROUNDS``.  Each
    round is localCheckpoint-materialized (iterative-loop discipline,
    see graph_bfs_hops).  The histogram argmax MAX(LEAST(value,
    suffix_count)) is a pure function of the neighbor-estimate multiset
    -- no tie order exists to diverge across engines.

    The oracle unrolls 24 rounds (> the measured fixpoint at EVERY
    shipped fixture -- 20 changing rounds at sf0.001, 9 at sf0.01, 4 at
    sf0.1; the sparsest graph is the chainiest) of the
    identical operator as chained CTEs -- past the fixpoint the operator
    is the identity, and a regenerated fixture needing more rounds
    would diverge LOUDLY rather than silently agree.

    Reference parity: no graph operators in the reference (DAG1:1-322);
    module docstring covers why the engine carries the family.
    """
    from pyspark.sql import Window

    # r14: the _min_label_components round-body treatment applied here
    # (guide §2.4): (a) the edge list is hash-repartitioned by ``dst``
    # -- the per-round join key -- and CACHED (r15: InMemoryTableScan
    # preserves outputPartitioning; the r14 localCheckpoint reported
    # UnknownPartitioning in the committed dumps, so rounds were still
    # re-shuffling the edges), so rounds shuffle only the narrow
    # (node, h) relation, never the edges;
    # (b) the monotone convergence potential rides each round's own
    # localCheckpoint job via ``observe`` instead of a separate
    # agg().collect() action per round.  Estimates bit-identical, same
    # round count.
    edges = stage_loop_edges(_copurchase_edges(spark, sf_dir, threshold=2), "dst")
    deg = (
        edges.groupBy(F.col("src").alias("node"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("d"))
        .localCheckpoint()
    )
    wg = Window.orderBy(F.col("d").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    h0cap = (
        deg.groupBy("d")
        .agg(F.count(F.lit(1)).cast("bigint").alias("nd"))
        .select(F.least(F.col("d"), F.sum("nd").over(wg)).alias("cand"))
        .agg(F.max("cand").alias("h0"))
        .collect()[0][0]
    )
    pot_expr = F.sum(F.col("h").cast("decimal(38,0)")).alias("pot")
    obs0 = Observation()
    h = (
        deg.select(
            "node", F.least(F.col("d"), F.lit(int(h0cap))).cast("bigint").alias("h")
        )
        .observe(obs0, pot_expr)
        .localCheckpoint()
    )
    potential = obs0.get["pot"]
    w = Window.partitionBy("node").orderBy(F.col("nh").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    try:
        for rnd in range(_HIX_CAP):
            cnt = (
                edges.join(h, edges.dst == h.node)
                .select(F.col("src").alias("node"), F.col("h").alias("nh"))
                .groupBy("node", "nh")
                .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
            )
            obs = Observation()
            stepped = (
                cnt.withColumn("s", F.sum("cnt").over(w))
                .groupBy("node")
                .agg(F.max(F.least(F.col("nh"), F.col("s"))).alias("h"))
            )
            planhook.emit("coreness_hindex_round", stepped)
            h = stepped.observe(obs, pot_expr).localCheckpoint()
            new_potential = obs.get["pot"]
            if new_potential == potential:
                LAST_ROUNDS["coreness_hindex"] = rnd
                break
            potential = new_potential
        else:
            raise RuntimeError(
                f"coreness_hindex: h-iteration still decreasing after "
                f"{_HIX_CAP} rounds -- raise _HIX_CAP rather than publish "
                f"unconverged coreness"
            )
    finally:
        edges.unpersist()
    return h.select(
        F.col("node").cast("bigint").alias("part_key"),
        F.col("h").cast("bigint").alias("coreness"),
    )


@register(
    "graph_modularity_brands",
    eager_build=True,
    oracle=f"""
    WITH {_pair_edges_sql(threshold=2)},
    lab AS (SELECT p_partkey AS node, p_brand AS brand FROM part),
    t AS (SELECT COUNT(*) AS t_dir FROM edges),
    intra AS (
      SELECT la.brand, COUNT(*) AS intra_deg
      FROM edges e
      JOIN lab la ON la.node = e.src
      JOIN lab lb ON lb.node = e.dst
      WHERE la.brand = lb.brand GROUP BY la.brand
    ),
    degs AS (
      SELECT l.brand, COUNT(*) AS degree_sum
      FROM edges e JOIN lab l ON l.node = e.src GROUP BY l.brand
    )
    SELECT d.brand,
           CAST(COALESCE(i.intra_deg, 0) AS BIGINT) AS intra_deg,
           CAST(d.degree_sum AS BIGINT) AS degree_sum,
           CAST(CAST(COALESCE(i.intra_deg, 0) AS DECIMAL(38,0)) * t.t_dir
                - CAST(d.degree_sum AS DECIMAL(38,0)) * d.degree_sum
                AS BIGINT) AS contrib_num,
           CAST(t.t_dir AS BIGINT) AS t_dir
    FROM degs d LEFT JOIN intra i ON i.brand = d.brand CROSS JOIN t
    """,
)
def graph_modularity_brands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newman modularity of the brand partition of the co-purchase
    graph, exactly: does a brand's parts co-occur in baskets more than
    a degree-preserving random graph predicts?  Per brand c the entry
    emits the integer numerator ``intra_c * T - d_c^2`` (T = directed
    edge count); global Q = SUM(contrib_num) / T^2 -- every quantity a
    pure bigint, so the oracle match is exact with no float anywhere.
    Modularity is THE partition-quality objective (Louvain/Leiden
    maximize it); stated here over an attribute partition, which keeps
    the statistic non-degenerate (a connected-component partition has
    all edges intra by construction -- probed, Q collapses).

    Plan shape: the checkpointed edge list joins the (node, brand)
    labeling twice -- left to AQE, which broadcasts the labeling when
    it is small (it is, at fixture scale) and shuffles when it is not
    (the labeling is O(parts), i.e. scales with SF, so a FORCED
    broadcast hint would OOM the driver at 100 TB) -- then two
    O(brands) aggregates and a broadcast scalar T.  The heavy relation
    is the edge list, touched once.

    Reference parity: no graph operators in the reference (DAG1:1-322,
    linear pandas flows); see the module docstring.
    """
    # r15: src-partitioned CACHE shared by both edge consumers (deg's
    # groupBy(src) and intra's src-label join) -- InMemoryTableScan
    # preserves the hash(src) partitioning, so neither re-shuffles the
    # edges (the r14 localCheckpoint reported UnknownPartitioning and a
    # fresh Exchange in this entry's own committed r14 dump); the lazy
    # cache also drops the eager checkpoint-materialization job.  The
    # returned lazy result reads the cache (the pagerank-ewd pattern),
    # so no unpersist here; the bench clears caches between entries.
    edges = stage_loop_edges(_copurchase_edges(spark, sf_dir, threshold=2), "src")
    lab = t(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("node"), F.col("p_brand").alias("brand")
    )
    la = lab.select(F.col("node").alias("src"), F.col("brand").alias("brand_a"))
    lb = lab.select(F.col("node").alias("dst"), F.col("brand").alias("brand_b"))
    # r14 (guide §2.3/§2.4): the labeling covers every node (edge
    # endpoints are part keys), so degree_sum per brand folds from the
    # O(nodes) degree relation against the labeling, and t_dir folds
    # from deg -- the old plan fed the full two-label-join edge
    # relation to a SECOND aggregate consumer (degs) and ran a third
    # edge scan for t_dir; both now cost O(nodes).  intra keeps the
    # two-label-join shape -- it genuinely needs both endpoint brands
    # per edge, and an aggregate-first rewrite (per-(src, brand) counts
    # then attach brand_a) measured a consistent ~0.2 s SLOWER at sf0.1
    # (the added exchange outweighs the saved broadcast-side join
    # locally) -- examined and rejected.
    # No broadcast hint anywhere (unchanged rationale): (node, brand)
    # is O(parts) and scales with SF, so a forced broadcast OOMs the
    # driver at 100 TB -- AQE broadcasts at runtime when the labeling
    # is actually small.  Verified row-identical vs the old plan.
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).cast("bigint").alias("d"))
    tdir = deg.agg(
        F.coalesce(F.sum("d"), F.lit(0)).cast("bigint").alias("t_dir")
    )
    degs = (
        deg.join(la, "src")
        .groupBy(F.col("brand_a").alias("brand"))
        .agg(F.sum("d").cast("bigint").alias("degree_sum"))
    )
    intra = (
        edges.join(la, "src")
        .join(lb, "dst")
        .filter(F.col("brand_a") == F.col("brand_b"))
        .groupBy(F.col("brand_a").alias("brand"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("intra_deg"))
    )
    return (
        degs.join(intra, "brand", "left_outer")
        .crossJoin(F.broadcast(tdir))
        .select(
            "brand",
            F.coalesce("intra_deg", F.lit(0)).cast("bigint").alias("intra_deg"),
            "degree_sum",
            # products route through decimal(38,0) (house overflow
            # discipline: bigint*bigint wraps silently in non-ANSI Spark
            # while the oracle errors loudly); the published value must
            # still fit bigint, i.e. intra*T < 2^63 -- documented bound
            (
                F.coalesce("intra_deg", F.lit(0)).cast("decimal(38,0)") * F.col("t_dir")
                - F.col("degree_sum").cast("decimal(38,0)") * F.col("degree_sum")
            )
            .cast("bigint")
            .alias("contrib_num"),
            "t_dir",
        )
    )


_NJ_VIA_DEGREE_CAP = 64


@register(
    "graph_neighbor_jaccard",
    oracle=f"""
    WITH {_pair_edges_sql(threshold=2)},
    degs AS (SELECT src AS node, COUNT(*) AS d FROM edges GROUP BY src),
    viaok AS (SELECT node FROM degs WHERE d <= {_NJ_VIA_DEGREE_CAP}),
    common AS (
      SELECT e1.src AS a, e2.src AS b, COUNT(*) AS cn
      FROM edges e1
      JOIN viaok v ON v.node = e1.dst
      JOIN edges e2 ON e1.dst = e2.dst AND e1.src < e2.src
      GROUP BY 1, 2
    )
    SELECT CAST(c.a AS BIGINT) AS node_a, CAST(c.b AS BIGINT) AS node_b,
           CAST(c.cn AS BIGINT) AS common_neighbors,
           CAST(da.d + db.d - c.cn AS BIGINT) AS union_neighbors,
           CAST(c.cn AS DOUBLE) / (da.d + db.d - c.cn) AS jaccard
    FROM common c
    JOIN degs da ON da.node = c.a
    JOIN degs db ON db.node = c.b
    """,
)
def graph_neighbor_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link prediction by neighborhood overlap: for node pairs sharing
    a common neighbor in the co-purchase graph, the Jaccard of their
    neighbor sets -- |N(a) n N(b)| / |N(a) u N(b)|, the classic
    structural-similarity score behind 'users who bought X also
    bought Y' candidate generation and friend-of-friend recommendation.
    Common-neighbor counting is a WEDGE join (edges self-joined on the
    shared endpoint) -- the same relation the triangle entry counts,
    here grouped per pair instead of closed; degrees join in from an
    O(nodes) aggregate and the jaccard is exact ints plus ONE division
    (IEEE-identical across engines).

    Scale control: wedge fan-out is quadratic in the SHARED endpoint's
    degree, so intermediaries with degree > 64 (_NJ_VIA_DEGREE_CAP) are
    excluded from wedge enumeration -- the standard hub exclusion in
    similarity joins (a 100k-degree hub contributes C(100k, 2) wedges
    and zero discrimination: everyone shares it). On the real graph the
    cap is inert (max degree 6 at sf0.1); on the 10x key-shifted
    replica -- whose shared part keys inflate co-occurrence ~335x into
    artificial hubs (the documented market_basket artifact) -- it is
    what keeps the probe bounded. Same hazard discipline as
    `copurchase_triangles`' degree orientation and
    `market_basket_pairs`' basket cap. Distinct from
    `item_item_cosine_topk` (co-occurrence counts from baskets) --
    this scores GRAPH-structural overlap at 2 hops.
    """
    # r14 wedge shape (guide §2.3 "aggregate before you shuffle", same
    # pattern as market_basket_pairs/_copurchase_edges): ONE groupBy(via)
    # yields each intermediary's sorted neighbor array AND its degree
    # (the undirected graph has indegree == outdegree, so size(nbrs) is
    # exactly the old out-degree gate); wedge pairs explode map-side
    # from the capped array instead of a via-keyed edge self-join (two
    # exchanges of the edge list, wedge rows shuffled raw).  Rows
    # verified identical; the degree cap bounds per-via fan-out at
    # C(cap, 2) exactly as before.
    edges = _copurchase_edges(spark, sf_dir, threshold=2)
    grouped = edges.groupBy(F.col("dst").alias("via")).agg(
        F.sort_array(F.collect_set("src")).alias("nbrs")
    )
    degs = grouped.select(
        F.col("via").alias("node"), F.size("nbrs").cast("long").alias("d")
    )
    pair_structs = F.flatten(
        F.transform(
            "nbrs",
            lambda x, i: F.transform(
                F.slice(F.col("nbrs"), i + F.lit(2), F.size("nbrs")),
                lambda y: F.struct(x.alias("a"), y.alias("b")),
            ),
        )
    )
    common = (
        grouped.filter(F.size("nbrs") <= _NJ_VIA_DEGREE_CAP)
        .select(F.explode(pair_structs).alias("p"))
        .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .agg(F.count(F.lit(1)).alias("cn"))
    )
    da = degs.select(F.col("node").alias("a"), F.col("d").alias("da"))
    db = degs.select(F.col("node").alias("b"), F.col("d").alias("db"))
    return (
        common.join(da, "a")
        .join(db, "b")
        .select(
            F.col("a").cast("bigint").alias("node_a"),
            F.col("b").cast("bigint").alias("node_b"),
            F.col("cn").cast("bigint").alias("common_neighbors"),
            (F.col("da") + F.col("db") - F.col("cn"))
            .cast("bigint")
            .alias("union_neighbors"),
            (
                F.col("cn").cast("double")
                / (F.col("da") + F.col("db") - F.col("cn")).cast("double")
            ).alias("jaccard"),
        )
    )


_HITS_ROUNDS = 2


@register(
    "hits_bipartite_2iter",
    oracle=f"""
    WITH e AS (
      SELECT DISTINCT o.o_custkey AS c, l.l_partkey AS p
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    ),
    a1 AS (SELECT p, CAST(COUNT(*) AS HUGEINT) AS a FROM e GROUP BY p),
    h1 AS (
      SELECT e.c, SUM(a1.a) AS h FROM e JOIN a1 ON a1.p = e.p GROUP BY e.c
    ),
    a2 AS (
      SELECT e.p, SUM(h1.h) AS a FROM e JOIN h1 ON h1.c = e.c GROUP BY e.p
    ),
    h2 AS (
      SELECT e.c, SUM(a2.a) AS h FROM e JOIN a2 ON a2.p = e.p GROUP BY e.c
    )
    SELECT 'authority' AS side, CAST(p AS BIGINT) AS node,
           CAST(a AS BIGINT) AS score FROM a2
    UNION ALL
    SELECT 'hub' AS side, CAST(c AS BIGINT) AS node,
           CAST(h AS BIGINT) AS score FROM h2
    """,
)
def hits_bipartite_2iter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS (Kleinberg 1999) on the bipartite purchase graph -- the
    MUTUAL-RECURSION value iteration the catalog's other iterative
    families don't cover (pagerank/PPR: one relation; h-index: one
    relation; HITS: two relations updating each other).  Edges are
    distinct (customer, part) purchase pairs; hubs are customers,
    authorities are parts: a(p) = sum of its buyers' hub scores,
    h(c) = sum of its parts' authority scores, two rounds unrolled.

    INTEGER-EXACT by design: scores start at 1, so every update is a
    pure integer path count (a1 = part degree; h1(c) = number of
    (c -> p -> c') co-purchase wedges rooted at c; a2, h2 = length-3/4
    path counts) -- the classic unnormalized HITS iterate, whose ranking
    equals the normalized one's (normalization is a positive scalar per
    round).  Cross-row sums ride decimal(38,0) (engine) / HUGEINT
    (oracle): no floats anywhere, bit-exactness is free -- the same
    trade the r10 PCA rewrite measured its way to, here with zero
    snapping because the inputs are already integers.  Growth bound:
    score <= (max degree)^4 ~ 1e12 at this fixture -- published as
    BIGINT (DuckDB's DECIMAL(38) lands in pandas as float64, which the
    driver gate hashes differently; the HUGEINT->BIGINT oracle cast
    fails LOUDLY on overflow, so a fixture ever outgrowing int64 breaks
    the gate instead of silently rounding).  At a 1e6-max-degree
    100 TB graph scores reach ~1e24: the internal decimal(38,0) sums
    stay exact and the publish cast is where a deployment would widen.

    Distributed shape per half-round: one equi-join of the edge list
    against the O(nodes) score relation + one hash aggregate -- the
    same amortized message-passing shuffle as ppr_multiseed, and the
    edge relation is reused across all four half-rounds (cached once).
    No windows, no driver state beyond plan construction; lazy 2-round
    unroll with linear lineage (each score relation referenced once).

    Reference parity: no graph operators in the reference (DAG1:1-322);
    module docstring covers why the engine carries the family.
    """
    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    orders = t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    e = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select(F.col("o_custkey").alias("c"), F.col("l_partkey").alias("p"))
        .distinct()
        .cache()
    )
    dec = "decimal(38,0)"
    a = e.groupBy("p").agg(F.count(F.lit(1)).cast(dec).alias("a"))
    for _ in range(_HITS_ROUNDS - 1):
        h = (
            e.join(a, "p")
            .groupBy("c")
            .agg(F.sum("a").cast(dec).alias("h"))
        )
        a = (
            e.join(h, "c")
            .groupBy("p")
            .agg(F.sum("h").cast(dec).alias("a"))
        )
    h = e.join(a, "p").groupBy("c").agg(F.sum("a").cast(dec).alias("h"))
    return (
        a.select(
            F.lit("authority").alias("side"),
            F.col("p").cast("bigint").alias("node"),
            F.col("a").cast("bigint").alias("score"),
        )
        .unionByName(
            h.select(
                F.lit("hub").alias("side"),
                F.col("c").cast("bigint").alias("node"),
                F.col("h").cast("bigint").alias("score"),
            )
        )
    )


@register(
    "degree_assortativity",
    oracle=f"""
    WITH {_pair_edges_sql(threshold=2)},
    xy AS (
      SELECT du.outdeg AS x, dv.outdeg AS y
      FROM edges e
      JOIN deg du ON du.src = e.src
      JOIN deg dv ON dv.src = e.dst
    ),
    s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS m,
             CAST(SUM(x) AS BIGINT) AS sx,
             CAST(SUM(x * y) AS BIGINT) AS sxy,
             CAST(SUM(x * x) AS BIGINT) AS sx2
      FROM xy
    )
    SELECT m AS m_edges, sx AS sum_deg, sxy AS sum_xy, sx2 AS sum_deg_sq,
           CAST(floor(
             CAST(m * sxy - sx * sx AS DOUBLE)
               / CAST(NULLIF(m * sx2 - sx * sx, 0) AS DOUBLE)
               * 1000000000.0 + 0.5) AS BIGINT) AS assort_nano
    FROM s
    """,
)
def degree_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DEGREE ASSORTATIVITY (Newman 2002) of the co-purchase graph: the
    Pearson correlation of endpoint degrees over directed edges --
    positive = hubs attach to hubs (social-network mixing), negative =
    hubs attach to leaves (hub-and-spoke).  The one-number diagnostic
    that tells a pipeline operator whether the skew mitigations the
    graph family carries (degree caps, degeneracy-bounded rounds) will
    be load-bearing on THIS corpus.

    Exactness: both marginals are identical on a both-directions edge
    list (sum over src degrees == sum over dst degrees), so
    r = (M*Sxy - Sx^2) / (M*Sx2 - Sx^2) with every S an exact integer
    sum of integer degrees.  The engine aggregates in BIGINT under ANSI
    mode and DuckDB in BIGINT-cast HUGEINT -- overflow anywhere is a
    LOUD error on both sides, never a silent wrap.  The final ratio is
    one int64->double cast per operand (exact below 2^53 -- five orders
    of headroom at this fixture) + one correctly-rounded division,
    published nano-snapped (rule 7) next to the exact integer sums, so
    the gate pins the full-precision numerators too.  Degenerate
    regular graphs (zero variance) publish NULL via NULLIF.

    Scale shape (r14): m, SUM(x), SUM(x^2) are MOMENTS of the degree
    sequence folded from the O(nodes) degree relation with no edge
    join; only SUM(x*y) touches edges -- one broadcast-or-shuffle join
    of the edge list against the degree relation, a src-keyed partial
    aggregate, and an O(nodes) fold.  One single-row output, no
    windows, no driver state -- the cheapest entry in the graph family
    at any scale.

    Reference parity: no graph operators in the reference (DAG1:1-322);
    module docstring covers the family.
    """
    edges = _copurchase_edges(spark, sf_dir, threshold=2)
    deg = edges.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).cast("bigint").alias("d")
    )
    # r14 (guide §2.3/§2.4): node v appears as the src of exactly d(v)
    # directed edges, so three of the four sums are MOMENTS of the
    # degree sequence -- m = SUM(d), SUM(x) = SUM(d^2), SUM(x^2) =
    # SUM(d^3) -- computable from the O(nodes) degree relation with NO
    # edge join at all.  Only SUM(x*y) needs edge structure, and one
    # edges|><|deg join + a src-keyed re-aggregate gives the per-node
    # neighbor-degree sum sy(v); SUM(x*y) = SUM(d(v) * sy(v)) folds on
    # the O(nodes) relation.  One O(edges) join instead of two.  The
    # d^3 / d*sy per-term products route through decimal(38,0) (house
    # overflow discipline -- the old per-term d*d envelope widened to
    # d^3); every sum is the same exact integer as the edge-level
    # formulation, verified bit-identical.
    dec = "decimal(38,0)"
    mom = deg.agg(
        # coalesce(0): the old edge-level m was a COUNT, i.e. 0 (not
        # NULL) on an empty graph
        F.coalesce(F.sum("d"), F.lit(0)).cast("bigint").alias("m"),
        F.sum(F.col("d").cast(dec) * F.col("d")).cast("bigint").alias("sx"),
        F.sum(F.col("d").cast(dec) * F.col("d") * F.col("d"))
        .cast("bigint")
        .alias("sx2"),
    )
    dv = deg.select(F.col("node").alias("v"), F.col("d").alias("y"))
    sy = (
        edges.join(dv, edges.dst == dv.v)
        .groupBy("src")
        .agg(F.sum("y").alias("sy"))
    )
    sxy = (
        sy.join(deg, sy.src == deg.node)
        .agg(
            F.sum(F.col("d").cast(dec) * F.col("sy")).cast("bigint").alias("sxy")
        )
    )
    s = mom.crossJoin(F.broadcast(sxy))
    num = F.col("m") * F.col("sxy") - F.col("sx") * F.col("sx")
    den = F.col("m") * F.col("sx2") - F.col("sx") * F.col("sx")
    return s.select(
        F.col("m").alias("m_edges"),
        F.col("sx").alias("sum_deg"),
        F.col("sxy").alias("sum_xy"),
        F.col("sx2").alias("sum_deg_sq"),
        F.floor(
            num.cast("double")
            / F.nullif(den, F.lit(0)).cast("double")
            * F.lit(1000000000.0)
            + F.lit(0.5)
        )
        .cast("bigint")
        .alias("assort_nano"),
    )


_LPA_ROUNDS = 3
_LPA_PACK = 4294967296  # 2^32: packs (count, label) into one BIGINT


def _lpa_round_sql(prev: str, out: str) -> str:
    """One unrolled synchronous label-propagation round, fully
    deterministic: new_label(v) = the most frequent label among v's
    neighbors, ties broken by MIN label.  The argmax is computed as
    MAX(cnt * 2^32 + (2^32-1 - label)) over the per-(node, label)
    histogram -- a single packed-BIGINT hash aggregate both engines run
    bit-identically (no window, no sort, no engine-specific arg_max
    semantics).  AS MATERIALIZED per the house CTE-chain rule (see
    _hix_round_sql)."""
    return f"""
    {out} AS MATERIALIZED (
      SELECT node,
             {_LPA_PACK - 1} - (MAX(cnt * {_LPA_PACK}
               + ({_LPA_PACK - 1} - label)) % {_LPA_PACK}) AS label
      FROM (
        SELECT e.src AS node, p.label AS label, COUNT(*) AS cnt
        FROM edges e JOIN {prev} p ON p.node = e.dst
        GROUP BY 1, 2
      ) GROUP BY node
    )
    """


@register(
    "lpa_communities_3iter",
    eager_build=True,
    oracle=(
        "WITH "
        + _pair_edges_sql(threshold=2)
        + """,
    l0 AS (SELECT node, CAST(node AS BIGINT) AS label FROM nodes)"""
        + "".join(
            ",\n" + _lpa_round_sql(f"l{i}", f"l{i + 1}")
            for i in range(_LPA_ROUNDS)
        )
        + f"""
    SELECT CAST(node AS BIGINT) AS part_key,
           CAST(label AS BIGINT) AS community
    FROM l{_LPA_ROUNDS}"""
    ),
)
def lpa_communities_3iter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synchronous LABEL PROPAGATION communities (Raghavan et al. 2007)
    on the co-purchase graph, 3 unrolled rounds -- the linear-time
    community detector that complements ``graph_modularity_brands``
    (which SCORES a given partition) and connected components (which
    finds the degenerate all-connected partition): labels start at node
    ids and each round every node adopts its neighbors' most frequent
    label.  Classic LPA breaks ties randomly; this entry makes every
    round a pure function of the edge multiset by breaking ties toward
    the MIN label, so the 3-round trajectory is deterministic and
    cross-engine bit-exact.

    SKEW-SAFE by the same design as the r11 ``coreness_hindex`` round:
    the per-(node, label) histogram is a distributed hash aggregate
    (map-side combine absorbs hub fan-in), and the per-node argmax is
    ANOTHER hash aggregate over a packed BIGINT (count * 2^32 +
    (2^32-1 - label), exact while count < 2^31 and label < 2^32 --
    ANSI overflow is loud past that, and a deployment with >4e9
    distinct part keys would widen the pack) -- no per-node window, no
    single-task hub sort anywhere.  Fixed rounds make the output
    well-defined independent of convergence (sync LPA can 2-cycle on
    bipartite cores; a fixed unroll publishes the same relation both
    engines compute, the pagerank/PCA contract).

    Per round: one edge join + two hash aggregates, O(edges) work,
    lazy-safe linear lineage with per-round localCheckpoint.

    Reference parity: no graph operators in the reference (DAG1:1-322);
    module docstring covers the family.
    """
    # r14: dst-partitioned edge staging (the coreness_hindex treatment)
    # -- each round's join shuffles only the narrow labels relation,
    # never the edges.  r15: staged via CACHE, which plan-preserves the
    # hash(dst) partitioning (the r14 localCheckpoint did not -- its
    # LogicalRDD reported UnknownPartitioning in the committed dumps).
    edges = stage_loop_edges(_copurchase_edges(spark, sf_dir, threshold=2), "dst")
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .select("node", F.col("node").cast("bigint").alias("label"))
        .localCheckpoint()
    )
    pack = F.lit(_LPA_PACK)
    packmax = F.lit(_LPA_PACK - 1)
    for _ in range(_LPA_ROUNDS):
        hist = (
            edges.join(labels, edges.dst == labels.node)
            .select(F.col("src").alias("n"), "label")
            .groupBy("n", "label")
            .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
        )
        stepped = hist.groupBy(F.col("n").alias("node")).agg(
            (
                packmax
                - F.max(F.col("cnt") * pack + (packmax - F.col("label")))
                % pack
            ).alias("label")
        )
        planhook.emit("lpa_communities_round", stepped)
        labels = stepped.localCheckpoint()
    edges.unpersist()
    return labels.select(
        F.col("node").cast("bigint").alias("part_key"),
        F.col("label").cast("bigint").alias("community"),
    )


@register(
    "edge_triangle_support",
    oracle=f"""
    WITH {_pair_edges_sql(threshold=2)},
    degs AS (SELECT src AS node, COUNT(*) AS d FROM edges GROUP BY src),
    viaok AS (SELECT node FROM degs WHERE d <= {_NJ_VIA_DEGREE_CAP}),
    common AS (
      SELECT e1.src AS a, e2.src AS b, COUNT(*) AS cn
      FROM edges e1
      JOIN viaok v ON v.node = e1.dst
      JOIN edges e2 ON e1.dst = e2.dst AND e1.src < e2.src
      GROUP BY 1, 2
    )
    SELECT CAST(c.a AS BIGINT) AS node_a, CAST(c.b AS BIGINT) AS node_b,
           CAST(c.cn AS BIGINT) AS support
    FROM common c
    JOIN pairs p ON p.src = c.a AND p.dst = c.b
    """,
)
def edge_triangle_support(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRIANGLE SUPPORT per edge -- the k-truss building block: for each
    co-purchase EDGE (u, v), the number of triangles it participates in
    (= |N(u) n N(v)|).  The k-truss (edges with support >= k-2, applied
    iteratively) is the standard community-core refinement of the
    k-core, and one support pass is its unit of work; support also
    drives edge-level denoising in co-occurrence graphs (an edge with
    zero triangles is structurally unsupported syndication).

    Plan: the SAME capped wedge join as ``graph_neighbor_jaccard``
    (common-neighbor counting with the degree-64 via-hub exclusion --
    identical skew discipline, see that entry's docstring for the cap's
    measured 10x/100x behavior), then a SEMI join of the counted pair
    against the half-edge relation: pairs that are not edges drop out,
    pairs that are edges publish their count.  Edges in zero triangles
    are absent by construction (count relations have no zero rows);
    consumers treat absence as support 0, the truss-peel convention.

    Exactness: pure integer counts end to end -- nothing to snap.

    Reference parity: no graph operators in the reference (DAG1:1-322);
    module docstring covers the family.
    """
    edges = _copurchase_edges(spark, sf_dir, threshold=2)
    half = edges.filter(F.col("src") < F.col("dst")).select(
        F.col("src").alias("a"), F.col("dst").alias("b")
    )
    degs = edges.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).alias("d")
    )
    viaok = degs.filter(F.col("d") <= _NJ_VIA_DEGREE_CAP).select(
        F.col("node").alias("via")
    )
    e1 = edges.select(F.col("src").alias("a"), F.col("dst").alias("via"))
    e2 = edges.select(F.col("src").alias("b"), F.col("dst").alias("via"))
    return (
        e1.join(viaok, "via")
        .join(e2, "via")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("support"))
        .join(half, ["a", "b"], "leftsemi")
        .select(
            F.col("a").cast("bigint").alias("node_a"),
            F.col("b").cast("bigint").alias("node_b"),
            "support",
        )
    )


_TRUSS_ORACLE_ROUNDS = 4  # > measured peel rounds at every fixture (1 at
# sf0.001/sf0.01/sf0.1 -- probed in DuckDB before pinning, the r11 rule)
_TRUSS_CAP = 30


def _truss_round_sql(prev: str, r: int) -> str:
    """One unrolled 3-truss peel round: count triangles on the current
    half-edge set, attribute each to its 3 edges, keep supported edges.
    AS MATERIALIZED per the house CTE-chain rule (_hix_round_sql)."""
    return f"""
    t{r} AS MATERIALIZED (
      SELECT ab.a AS x, ab.b AS y, bc.b AS z
      FROM {prev} ab
      JOIN {prev} bc ON bc.a = ab.b
      JOIN {prev} ac ON ac.a = ab.a AND ac.b = bc.b
    ),
    s{r} AS MATERIALIZED (
      SELECT a, b, COUNT(*) AS support FROM (
        SELECT x AS a, y AS b FROM t{r}
        UNION ALL SELECT y AS a, z AS b FROM t{r}
        UNION ALL SELECT x AS a, z AS b FROM t{r}
      ) GROUP BY a, b
    ),
    e{r} AS MATERIALIZED (
      SELECT p.a, p.b FROM {prev} p JOIN s{r} s ON s.a = p.a AND s.b = p.b
    )
    """


@register(
    "truss_edges_k3",
    eager_build=True,
    oracle=(
        "WITH "
        + _pair_edges_sql(threshold=2)
        + ",\n    e0 AS (SELECT src AS a, dst AS b FROM pairs)"
        + "".join(
            ",\n" + _truss_round_sql(f"e{i}", i + 1)
            for i in range(_TRUSS_ORACLE_ROUNDS)
        )
        + f"""
    SELECT CAST(a AS BIGINT) AS node_a, CAST(b AS BIGINT) AS node_b,
           CAST(support AS BIGINT) AS support
    FROM s{_TRUSS_ORACLE_ROUNDS}"""
    ),
)
def truss_edges_k3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 3-TRUSS of the co-purchase graph (Cohen 2008): the maximal
    edge set in which EVERY edge participates in >= 1 triangle -- the
    standard community-core refinement one level above the raw support
    pass (``edge_triangle_support`` is one round of this peel; the k=3
    truss iterates it to a fixpoint, since removing an unsupported edge
    can orphan its neighbors' triangles).  k = 3 is the fixture-honest
    choice: the 4-truss is EMPTY at sf0.01/sf0.1 (probed in DuckDB
    before pinning -- the r9 graph_neighbor_jaccard lesson).

    ITERATIVE EDGE-SET REFINEMENT -- a loop shape the catalog's other
    iterative entries don't cover (CC/coreness/LPA refine NODE values;
    this refines the EDGE relation itself).  Per round: triangles are
    enumerated DEGREE-ORIENTED exactly like ``copurchase_triangles``
    (each edge points lower-(degree, id)-rank to higher, so wedge
    fan-out per key is O(sqrt(edges)) regardless of hub degree --
    the truss needs exact support, so a via-degree CAP would be
    wrong; orientation is the exactness-preserving skew control),
    each triangle is attributed to its 3 edges (explode + hash
    aggregate), and edges with zero support drop out by semi-join.
    The edge count is the strictly-decreasing potential; the loop
    stops at fixpoint (measured: 1 changing round at every shipped
    fixture; rounds land in ``LAST_ROUNDS``), and publishes the
    support relation COMPUTED ON the fixpoint edge set.  The oracle
    unrolls {_TRUSS_ORACLE_ROUNDS} rounds past the measured fixpoint
    as AS MATERIALIZED CTEs -- past the fixpoint the operator is the
    identity, a deeper-peeling regenerated fixture diverges loudly.

    Exactness: pure integer counts end to end.

    Reference parity: no graph operators in the reference (DAG1:1-322);
    module docstring covers the family.
    """
    e = (
        _copurchase_edges(spark, sf_dir, threshold=2)
        .filter(F.col("src") < F.col("dst"))
        .select(F.col("src").alias("a"), F.col("dst").alias("b"))
        .localCheckpoint()
    )
    n_edges = e.count()
    support = None
    for rnd in range(_TRUSS_CAP):
        deg = (
            e.select(F.explode(F.array("a", "b")).alias("p"))
            .groupBy("p")
            .agg(F.count(F.lit(1)).alias("deg"))
        )
        ranked = e.join(
            deg.select(F.col("p").alias("a"), F.col("deg").alias("deg_a")), "a"
        ).join(deg.select(F.col("p").alias("b"), F.col("deg").alias("deg_b")), "b")
        rank_a = F.struct(F.col("deg_a").alias("deg"), F.col("a").alias("id"))
        rank_b = F.struct(F.col("deg_b").alias("deg"), F.col("b").alias("id"))
        a_first = rank_a < rank_b
        directed = ranked.select(
            F.when(a_first, F.col("a")).otherwise(F.col("b")).alias("u"),
            F.when(a_first, F.col("b")).otherwise(F.col("a")).alias("v"),
            F.when(a_first, rank_b).otherwise(rank_a).alias("rank_v"),
        )
        lo = directed.select("u", F.col("v").alias("w1"), F.col("rank_v").alias("rk1"))
        hi = directed.select("u", F.col("v").alias("w2"), F.col("rank_v").alias("rk2"))
        closing = directed.select(F.col("u").alias("w1"), F.col("v").alias("w2"))
        tri = (
            lo.join(hi, "u")
            .filter(F.col("rk1") < F.col("rk2"))
            .join(closing, ["w1", "w2"])
            .select(F.array_sort(F.array("u", "w1", "w2")).alias("t"))
            .select(
                F.element_at("t", 1).alias("x"),
                F.element_at("t", 2).alias("y"),
                F.element_at("t", 3).alias("z"),
            )
        )
        edge_refs = tri.select(
            F.explode(
                F.array(
                    F.struct(F.col("x").alias("a"), F.col("y").alias("b")),
                    F.struct(F.col("y").alias("a"), F.col("z").alias("b")),
                    F.struct(F.col("x").alias("a"), F.col("z").alias("b")),
                )
            ).alias("e")
        ).select("e.a", "e.b")
        support = (
            edge_refs.groupBy("a", "b")
            .agg(F.count(F.lit(1)).cast("bigint").alias("support"))
            .localCheckpoint()
        )
        step = e.join(support, ["a", "b"], "leftsemi")
        planhook.emit("truss_peel_round", step)
        e_next = step.localCheckpoint()
        n_next = e_next.count()
        if n_next == n_edges:
            LAST_ROUNDS["truss_edges_k3"] = rnd
            break
        e, n_edges = e_next, n_next
    else:
        raise RuntimeError(
            f"truss_edges_k3: edge peel still shrinking after {_TRUSS_CAP} "
            "rounds -- raise _TRUSS_CAP rather than publish a partial truss"
        )
    return support.select(
        F.col("a").cast("bigint").alias("node_a"),
        F.col("b").cast("bigint").alias("node_b"),
        "support",
    )


_HC_HOPS = 4
_HC_SEEDS = 3


@register(
    "harmonic_centrality_sample",
    eager_build=True,
    oracle=f"""
    WITH RECURSIVE {_pair_edges_sql(threshold=2)},
    seeds AS (
      SELECT src AS seed FROM deg ORDER BY outdeg DESC, src LIMIT {_HC_SEEDS}
    ),
    r(seed, node, hop) AS (
      SELECT seed, seed, 0 FROM seeds
      UNION
      SELECT r.seed, e.dst, r.hop + 1
      FROM r JOIN edges e ON e.src = r.node
      WHERE r.hop < {_HC_HOPS}
    ),
    dist AS (SELECT seed, node, MIN(hop) AS hop FROM r GROUP BY 1, 2)
    SELECT node,
           CAST(COUNT(*) AS BIGINT) AS n_seeds_reached,
           round(CAST(SUM(CAST(1.0 / hop AS DECIMAL(38,18))) AS DOUBLE), 6)
             AS harmonic
    FROM dist WHERE hop > 0
    GROUP BY node
    """,
)
def harmonic_centrality_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sampled harmonic centrality (Boldi & Vigna 2014's robust
    replacement for closeness -- sums 1/d so disconnection contributes 0
    instead of poisoning the mean) on the co-purchase graph: a
    MULTI-SOURCE hop-limited BFS from the K=3 highest-degree seeds, then
    per node harmonic(v) = sum over reached seeds of 1/d(seed, v). The
    standard centrality estimator at graph scale: exact all-pairs is
    O(V*E), a K-seed sample is K BFS sweeps that here share EVERY
    per-round join by carrying seed through the frontier relation
    (frontier keyed (seed, node)), exactly the amortization
    ``ppr_multiseed`` proves for PPR -- one edges-join per ROUND, not per
    seed-round.

    The per-round anti-join against the visited set keeps each seed's
    work proportional to its NEW frontier, so the batch costs the same
    shuffles as ONE BFS on the union frontier. Seeds chosen in-plan
    (top-K degree, min-id tie-break; deterministic). Per-round
    ``localCheckpoint`` is the measured necessity documented on
    ``graph_bfs_hops`` (lazy unrolls duplicate anti-join subtrees
    exponentially). The 1/hop sum is decimal-routed so up-to-K-term
    float addition is order-insensitive and engine-exact.

    Reference parity: no reference counterpart (no graph analytics at
    all; SURVEY.md section 2) -- centrality sampling is 100 TB
    graph-curation machinery (influencer/hub scoring for sampling
    weights).
    """
    # r14: src-partitioned staging -- the src-keyed per-round consumers
    # (joins/aggregates on edges.src) reuse the preserved partitioning
    # exchange-free.  r15: staged via CACHE, which plan-preserves the
    # hash(src) partitioning (the r14 localCheckpoint did not -- its
    # LogicalRDD reported UnknownPartitioning in the committed dumps).
    edges = stage_loop_edges(_copurchase_edges(spark, sf_dir, threshold=2), "src")
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    seeds = (
        deg.orderBy(F.col("outdeg").desc(), F.col("src").asc())
        .limit(_HC_SEEDS)
        .select(F.col("src").alias("seed"))
    )
    visited = seeds.select(
        "seed", F.col("seed").alias("node"), F.lit(0).alias("hop")
    ).localCheckpoint()
    frontier = visited.select("seed", "node")
    for h in range(1, _HC_HOPS + 1):
        step = (
            frontier.join(edges, frontier.node == edges.src)
            .select("seed", F.col("dst").alias("node"))
            .distinct()
            .join(visited, ["seed", "node"], "left_anti")
            .select("seed", "node", F.lit(h).alias("hop"))
        )
        planhook.emit("harmonic_centrality_round", step)
        nxt = step.localCheckpoint()
        # r14: lazy visited union -- the graph_bfs_hops rationale (every
        # child checkpointed; one materialization job per hop removed)
        visited = visited.unionByName(nxt)
        frontier = nxt.select("seed", "node")
    edges.unpersist()
    return (
        visited.filter(F.col("hop") > 0)
        .groupBy("node")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_seeds_reached"),
            F.round(
                F.sum((F.lit(1.0) / F.col("hop")).cast("decimal(38,18)")).cast(
                    "double"
                ),
                6,
            ).alias("harmonic"),
        )
    )


_SCC_PROB = 0.2
_SCC_CAP = 8  # closure doubling rounds; reaches paths of length 2^8


@register(
    "scc_event_types",
    eager_build=True,
    oracle=f"""
    WITH RECURSIVE seq AS (
      SELECT event_type AS a,
             LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS b
      FROM events
    ), pairs AS (
      SELECT a, b, COUNT(*) AS n_ab FROM seq WHERE b IS NOT NULL GROUP BY 1, 2
    ), totals AS (
      SELECT a, SUM(n_ab) AS n_a FROM pairs GROUP BY 1
    ), edges AS (
      SELECT p.a AS src, p.b AS dst FROM pairs p JOIN totals t USING (a)
      WHERE CAST(p.n_ab AS DOUBLE) / t.n_a >= {_SCC_PROB!r}
    ),
    nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
    r(src, dst) AS (
      SELECT src, dst FROM edges
      UNION
      SELECT r.src, e.dst FROM r JOIN edges e ON r.dst = e.src
    ),
    mutual AS (
      SELECT a.src AS node, a.dst AS other
      FROM r a JOIN r b ON a.src = b.dst AND a.dst = b.src
    ),
    labels AS (
      SELECT n.node, LEAST(n.node, COALESCE(MIN(m.other), n.node)) AS scc
      FROM nodes n LEFT JOIN mutual m ON m.node = n.node GROUP BY n.node
    )
    SELECT node, scc,
           CAST(COUNT(*) OVER (PARTITION BY scc) AS BIGINT) AS scc_size
    FROM labels
    """,
)
def scc_event_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strongly connected components of the user-journey DIGRAPH: nodes
    are event types, directed edges are the Markov transitions
    (`markov_event_transitions`) with P(b|a) >= 0.2 -- the recurrence
    structure of the behavior model (which states form a recurrent
    class vs. transient/absorbing states; the precondition for the
    stationary-distribution reading of PageRank-style scores).

    Direction matters here, so the undirected min-label trick
    (``graph_connected_components``) does not apply; SCC needs mutual
    reachability. The shape: (1) the data-sized work is ONE user_id
    window shuffle + the O(types^2) transition aggregate -- the node
    domain is the event taxonomy, bounded by construction regardless of
    input rows; (2) reachability closure on that dimension-sized digraph
    via pointer-doubled pair doubling (r := r UNION r JOIN r, log2(path
    length) rounds, fixpoint detected by pair-count potential -- the
    bounded-scalar collect contract of the CC/k-core family); (3) scc
    label = min mutually-reachable node (self included). At 100 TB the
    closure never touches raw rows -- same post-aggregation design as
    ``hilbert_layout_spans``. For SCC on a data-sized node domain
    (user-user graphs) the published approach is iterative
    forward-backward coloring (Fleischer et al. 2000); this entry is
    deliberately the taxonomy-graph case the reference's analytics
    actually need.

    Oracle: recursive-CTE transitive closure, identical edge rule.
    """
    ev = t(spark, sf_dir, "events")
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("a"), F.lead("event_type").over(w).alias("b")
    ).filter(F.col("b").isNotNull())
    pairs = seq.groupBy("a", "b").agg(F.count(F.lit(1)).alias("n_ab"))
    totals = pairs.groupBy("a").agg(F.sum("n_ab").alias("n_a"))
    edges = (
        pairs.join(F.broadcast(totals), "a")
        .filter(F.col("n_ab").cast("double") / F.col("n_a") >= _SCC_PROB)
        .select(F.col("a").alias("src"), F.col("b").alias("dst"))
        .localCheckpoint()
    )
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    r = edges
    n_pairs = r.count()
    for rnd in range(1, _SCC_CAP + 1):
        r2 = r.select(F.col("src").alias("mid"), F.col("dst").alias("dst2"))
        # r14: the pair-count potential rides the round's own
        # localCheckpoint job via observe (the _min_label_components
        # idiom) instead of a separate count() job per round
        obs = Observation()
        step = (
            r.join(r2, r.dst == r2.mid)
            .select("src", F.col("dst2").alias("dst"))
            .unionByName(r)
            .distinct()
        )
        planhook.emit("scc_closure_round", step)
        grown = step.observe(obs, F.count(F.lit(1)).alias("n")).localCheckpoint()
        n_next = obs.get["n"]
        if n_next == n_pairs:
            LAST_ROUNDS["scc_event_types"] = rnd
            break
        r, n_pairs = grown, n_next
    else:
        raise RuntimeError(
            f"scc_event_types: closure still growing after {_SCC_CAP} doubling "
            "rounds -- raise _SCC_CAP rather than publish a partial closure"
        )
    back = r.select(F.col("src").alias("b_src"), F.col("dst").alias("b_dst"))
    mutual = r.join(
        back, (r.src == back.b_dst) & (r.dst == back.b_src)
    ).select(F.col("src").alias("node"), F.col("dst").alias("other"))
    labels = (
        nodes.join(mutual, "node", "left_outer")
        .groupBy("node")
        .agg(
            F.least(
                F.col("node"), F.coalesce(F.min("other"), F.col("node"))
            ).alias("scc")
        )
    )
    sizes = labels.groupBy("scc").agg(F.count(F.lit(1)).cast("bigint").alias("scc_size"))
    return labels.join(F.broadcast(sizes), "scc").select("node", "scc", "scc_size")


_DSG_ORACLE_ROUNDS = 24  # >= log_1.5(nodes) for every oracle-checked SF
_DSG_CAP = 48  # Spark-side guard only; peel provably empties in log rounds

# The two caps differ INTENTIONALLY: the oracle's unrolled CTE depth costs
# planner time, so it carries only as many rounds as any oracle-checked
# fixture can need, while the Spark loop keeps a loud-failure margin.  The
# peel removes >= 1/3 of nodes per round, so 24 oracle rounds WORST-CASE
# cover any graph up to 1.5^24 ~ 16.8k nodes; the oracle-checked fixtures
# (sf<=0.1 co-purchase at threshold 2, <= ~3k nodes) sit well inside that
# and MEASURE <= 6 rounds (`last_rounds` stamped per bench run).  If a
# fixture ever grew past this bound, Spark (cap 48) would still succeed
# while the oracle computed best over a truncated trajectory and could
# silently disagree (r11 advice #4) -- this assert pins the documented
# bound at import time, and the per-bench `last_rounds` stamp catches a
# fixture whose MEASURED peel depth creeps toward either cap.
_DSG_ORACLE_MAX_NODES = 16_000  # worst-case-guaranteed oracle coverage
assert 1.5**_DSG_ORACLE_ROUNDS > _DSG_ORACLE_MAX_NODES, (
    "_DSG_ORACLE_ROUNDS no longer covers the documented max oracle-checked "
    "node count; raise the oracle round count alongside the fixture"
)


def _dsg_round_sql(r: int) -> str:
    """One unrolled greedy-peel round: induced edges, exact-integer
    stats, and the removal rule 2*n*deg(v) <= 3*D (deg <= (1+eps)*avg
    with eps = 1/2, cross-multiplied so the peel never touches a
    float). AS MATERIALIZED per the _hix_round_sql lesson."""
    return f"""
    e{r} AS MATERIALIZED (
      SELECT e.src, e.dst FROM edges e
      JOIN s{r} a ON a.node = e.src
      JOIN s{r} b ON b.node = e.dst
    ),
    st{r} AS MATERIALIZED (
      SELECT (SELECT COUNT(*) FROM s{r}) AS n,
             (SELECT COUNT(*) FROM e{r}) AS dd
    ),
    dg{r} AS MATERIALIZED (
      SELECT a.node, COUNT(e.src) AS deg
      FROM s{r} a LEFT JOIN e{r} e ON e.src = a.node
      GROUP BY a.node
    ),
    s{r + 1} AS MATERIALIZED (
      SELECT d.node FROM dg{r} d CROSS JOIN st{r} st
      WHERE 2 * st.n * d.deg > 3 * st.dd
    )
    """


_DSG_ORACLE = (
    "WITH "
    + _pair_edges_sql(threshold=2)
    + ",\n    s0 AS (SELECT node FROM nodes)"
    + "".join("," + _dsg_round_sql(r) for r in range(_DSG_ORACLE_ROUNDS))
    + f""",
    allstats AS (
      {" UNION ALL ".join(f"SELECT {r} AS r, n, dd FROM st{r}" for r in range(_DSG_ORACLE_ROUNDS))}
    ),
    best AS (
      SELECT r, n, dd FROM allstats WHERE n > 0
      ORDER BY CAST(dd AS DOUBLE) / (2 * n) DESC, r ASC LIMIT 1
    ),
    allsets AS (
      {" UNION ALL ".join(f"SELECT {r} AS r, node FROM s{r}" for r in range(_DSG_ORACLE_ROUNDS))}
    )
    SELECT CAST(a.node AS BIGINT) AS part_key,
           CAST(b.n AS BIGINT) AS n_nodes,
           CAST(b.dd / 2 AS BIGINT) AS n_edges,
           CAST(b.dd AS DOUBLE) / (2 * b.n) AS density
    FROM allsets a JOIN best b ON a.r = b.r
    """
)


@register("densest_subgraph_peel", eager_build=True, oracle=_DSG_ORACLE)
def densest_subgraph_peel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Densest subgraph, 2(1+eps)-approx by distributed greedy peel
    (Bahmani, Kumar & Vassilvitskii, "Densest subgraph in streaming and
    MapReduce", VLDB 2012; eps = 1/2): repeatedly delete EVERY node
    whose degree is <= (1+eps) times the current average, remembering
    the densest intermediate set. Each round removes >= eps/(1+eps) =
    1/3 of the surviving nodes, so the peel provably empties within
    log_1.5(|V|) rounds -- unlike the exact k-core peel, the round count
    CANNOT degenerate to the peel depth. (On the near-uniform fixture
    co-purchase graphs the argmax lands on round 0 -- the whole graph is
    its own densest set and the trajectory is strictly
    density-decreasing; the entry's value there is the CERTIFIED
    2(1+eps) bound. On a graph with a planted dense community the peel
    strips the sparse periphery first and the argmax moves inward --
    pinned by the planted-clique unit test.)

    Scale shape per round: one node-count + one edge-count scalar (the
    bounded fixpoint-potential collects of the CC family), one
    left-join degree aggregate, and two semi-joins to induce the
    surviving edge set -- all keyed shuffles, no windows, no skew
    surface (a hub's degree row is one aggregate cell; map-side combine
    absorbs the fan-in). The removal test is cross-multiplied to exact
    integers (2*n*deg <= 3*D), so Spark and the unrolled-CTE oracle
    peel IDENTICAL sets with no float boundary anywhere; the published
    density is one double division of exact integers. Per-round
    ``localCheckpoint`` per the graph_bfs_hops measurement; loud
    RuntimeError if the cap is ever hit (impossible below ~1.5^48
    nodes, but never publish a partial peel silently).
    """
    # r15: src-partitioned CACHE -- round 1's degree aggregate and src
    # semi-join consume the preserved hash(src) partitioning
    # exchange-free (the r14 localCheckpoint reported
    # UnknownPartitioning in the committed dumps; InMemoryTableScan is
    # the pattern that plan-preserves it).  greedy_densest_subgraph
    # runs the peel eagerly and its result references only checkpointed
    # survivor sets, so the cache is released right after.
    edges = stage_loop_edges(_copurchase_edges(spark, sf_dir, threshold=2), "src")
    out = greedy_densest_subgraph(edges, rounds_key="densest_subgraph_peel")
    edges.unpersist()
    return out


def greedy_densest_subgraph(
    edges: DataFrame, rounds_key: str | None = None
) -> DataFrame:
    """Bahmani-peel core over a bidirectional ``(src, dst)`` edge
    DataFrame (see ``densest_subgraph_peel`` for the algorithm and the
    scale contract). Exposed separately so tests can drive it on
    synthetic graphs (planted-clique behavior)."""
    # r14 round-body optimization (guide §2.4), results bit-identical:
    # - survivors derive from e's OWN degree aggregate: a node of s with
    #   zero surviving edges has deg 0 and fails the cross-multiplied
    #   test (2n*0 > 3D is false for D >= 0), so the old s-side
    #   left_outer join existed only to manufacture rows the filter
    #   drops anyway -- one partially-aggregated shuffle per round, no
    #   join.  (dd == 0 edge case: old removed every node via deg 0,
    #   new yields an empty aggregate -- same empty s.)
    # - n rides each round's s-checkpoint job via ``observe`` (the
    #   _min_label_components idiom); dd IS the cache-materializing
    #   count of the round's surviving edges (one action either way).
    # - e re-stages hash-partitioned by src via CACHE, so the next
    #   round's degree aggregate and src semi-join are exchange-free
    #   (r15: InMemoryTableScan preserves output partitioning; the r14
    #   localCheckpoint did not -- UnknownPartitioning in the committed
    #   dumps); only the dst semi-join re-shuffles the surviving edges.
    #   Each round's cache is unpersisted once the next round's is
    #   materialized (the caller owns the round-0 ``edges`` staging).
    obs0 = Observation()
    s = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .observe(obs0, F.count(F.lit(1)).alias("n"))
        .localCheckpoint()
    )
    e = edges
    prev_e = None  # rounds' caches; round-0 edges belongs to the caller
    n, dd = obs0.get["n"], e.count()
    best = None  # (density, node_set, n, dd)
    for rnd in range(_DSG_CAP):
        if n == 0:
            if rounds_key is not None:
                LAST_ROUNDS[rounds_key] = rnd
            break
        dens = dd / (2 * n)
        if best is None or dens > best[0]:
            best = (dens, s, n, dd)
        deg = e.groupBy(F.col("src").alias("node")).agg(
            F.count(F.lit(1)).alias("deg")
        )
        obs_s = Observation()
        s = (
            deg.filter(2 * F.lit(n) * F.col("deg") > 3 * F.lit(dd))
            .select("node")
            .observe(obs_s, F.count(F.lit(1)).alias("n"))
            .localCheckpoint()
        )
        e_next = e.join(
            s.select(F.col("node").alias("src")), "src", "leftsemi"
        ).join(s.select(F.col("node").alias("dst")), "dst", "leftsemi")
        planhook.emit("densest_subgraph_round", e_next)
        e_next = stage_loop_edges(e_next, "src")
        n, dd = obs_s.get["n"], e_next.count()
        if prev_e is not None:
            prev_e.unpersist()
        prev_e, e = e_next, e_next
    else:
        raise RuntimeError(
            f"densest_subgraph_peel: set non-empty after {_DSG_CAP} rounds -- "
            "the 1/3-per-round removal guarantee was violated; investigate "
            "rather than publish a partial peel"
        )
    if prev_e is not None:
        # the surviving-set frames in ``best`` are checkpointed; the last
        # round's edge cache is no longer referenced by anything returned
        prev_e.unpersist()
    if best is None:
        # n == 0 at round 0: no nodes at all (empty edge DataFrame).
        # Density is undefined on the empty graph; fail loudly instead of
        # unpacking None (r11 advice #1) -- the function is exported for
        # tests on synthetic graphs, so an empty input is reachable.
        raise ValueError("greedy_densest_subgraph: empty edge set (no nodes)")
    dens, sbest, nb, ddb = best
    return sbest.select(
        F.col("node").cast("bigint").alias("part_key"),
        F.lit(nb).cast("bigint").alias("n_nodes"),
        F.lit(ddb // 2).cast("bigint").alias("n_edges"),
        F.lit(dens).cast("double").alias("density"),
    )


_MIS_ROUNDS = 24  # comfortably above the O(log n) expected round count


def _mis_round_sql(r: int) -> str:
    """One unrolled Luby round: select every active node whose priority
    beats all ACTIVE neighbors' (strict <; NULL min = isolated node,
    always selected), then deactivate winners and their neighborhoods.
    AS MATERIALIZED per the _hix_round_sql lesson."""
    return f"""
    eact{r} AS MATERIALIZED (
      SELECT e.src, e.dst FROM edges e
      JOIN act{r} a ON a.node = e.src
      JOIN act{r} b ON b.node = e.dst
    ),
    cand{r} AS MATERIALIZED (
      SELECT a.node FROM act{r} a
      JOIN pri p ON p.node = a.node
      LEFT JOIN (
        SELECT e.src AS node, MIN(p2.pri) AS minp
        FROM eact{r} e JOIN pri p2 ON p2.node = e.dst
        GROUP BY e.src
      ) nb ON nb.node = a.node
      WHERE nb.minp IS NULL OR p.pri < nb.minp
    ),
    act{r + 1} AS MATERIALIZED (
      SELECT a.node FROM act{r} a
      WHERE a.node NOT IN (SELECT node FROM cand{r})
        AND a.node NOT IN (
          SELECT e.dst FROM eact{r} e JOIN cand{r} c ON c.node = e.src
        )
    )
    """


_MIS_ORACLE = (
    "WITH "
    + _pair_edges_sql(threshold=2)
    + """,
    pri AS (SELECT node, md5(CAST(node AS VARCHAR)) AS pri FROM nodes),
    act0 AS (SELECT node FROM nodes)"""
    + "".join("," + _mis_round_sql(r) for r in range(_MIS_ROUNDS))
    + f"""
    SELECT CAST(node AS BIGINT) AS part_key, CAST(r AS BIGINT) AS mis_round
    FROM ({" UNION ALL ".join(f"SELECT node, {r} AS r FROM cand{r}" for r in range(_MIS_ROUNDS))})
    """
)


@register("mis_parts_luby", eager_build=True, oracle=_MIS_ORACLE)
def mis_parts_luby(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal independent set of the co-purchase graph by Luby-style
    parallel rounds (Luby 1986, the deterministic-priority variant):
    every round, each ACTIVE node whose priority beats all its active
    neighbors' joins the MIS, and winners' closed neighborhoods
    deactivate -- the canonical symmetry-breaking primitive behind
    distributed coloring, scheduling, and correlation-clustering
    pivots; as a data-curation tool it picks a maximal NON-ADJACENT
    representative set (every excluded node is adjacent to a kept one:
    a diversity cover of the co-purchase space).

    Priorities are md5(node) -- deterministic, engine-identical strings,
    so both engines break every tie identically (a collision would
    merely drop both contenders that round on BOTH engines; selection
    stays consistent because the comparison is strict). Random-priority
    Luby halves the expected active edge count per round, so rounds are
    O(log E) w.h.p. -- measured via LAST_ROUNDS like the CC family.

    Scale shape per round: one active-induced edge semi-join pair, one
    neighbor-min aggregate (map-side combine; a hub is one aggregate
    cell), one anti-join pair for deactivation -- all keyed shuffles, no
    windows, no per-node sorts. Per-round localCheckpoint per the
    graph_bfs_hops measurement; loud RuntimeError if the active set
    survives the cap (never publish a partial MIS).
    """
    # r14 round-body optimization (guide §2.4), MIS bit-identical:
    # - a node's priority is md5(node) -- a PURE FUNCTION of the id the
    #   edge row already carries -- so the per-round pri equi-join in
    #   the neighbor-min aggregate is replaced by computing md5(dst)
    #   inline on the active edge stream (one join per round gone);
    # - the active-induced edge set feeds BOTH the neighbor-min and the
    #   kill set; it is staged src-partitioned so its two semi-joins run
    #   once per round, not twice (r15: staged via CACHE, which
    #   plan-preserves hash(src) for the neighbor-min groupBy and the
    #   kill semi-join -- the r14 localCheckpoint did not -- AND is lazy,
    #   so the separate eager eact-materialization job per round is gone:
    #   the cache fills inside cand's own checkpoint job);
    # - the active-set emptiness probe rides each round's own
    #   localCheckpoint job via ``observe`` instead of an isEmpty() job.
    # r15: src-partitioned CACHE for the loop-invariant edges -- the
    # src-keyed per-round consumers reuse the preserved partitioning
    # exchange-free (see _min_label_components on why localCheckpoint
    # could not deliver this)
    edges = stage_loop_edges(_copurchase_edges(spark, sf_dir, threshold=2), "src")
    nodes = edges.select(F.col("src").alias("node")).distinct()
    obs0 = Observation()
    pri = (
        nodes.select("node", F.md5(F.col("node").cast("string")).alias("pri"))
        .observe(obs0, F.count(F.lit(1)).alias("n"))
        .localCheckpoint()
    )
    act, n_act = pri, obs0.get["n"]
    mis_parts = []
    try:
        for rnd in range(_MIS_ROUNDS):
            if n_act == 0:
                LAST_ROUNDS["mis_parts_luby"] = rnd
                break
            eact = stage_loop_edges(
                edges.join(
                    act.select(F.col("node").alias("src")), "src", "leftsemi"
                ).join(
                    act.select(F.col("node").alias("dst")), "dst", "leftsemi"
                ),
                "src",
            )
            nbmin = (
                eact.select(
                    "src", F.md5(F.col("dst").cast("string")).alias("npri")
                )
                .groupBy("src")
                .agg(F.min("npri").alias("minp"))
                .withColumnRenamed("src", "node")
            )
            step = (
                act.join(nbmin, "node", "left_outer")
                .filter(F.col("minp").isNull() | (F.col("pri") < F.col("minp")))
                .select("node")
            )
            planhook.emit("mis_parts_luby_round", step)
            cand = step.localCheckpoint()
            mis_parts.append(cand.select("node", F.lit(rnd).alias("r")))
            killed = cand.unionByName(
                eact.join(
                    cand.select(F.col("node").alias("src")), "src", "leftsemi"
                )
                .select(F.col("dst").alias("node"))
                .distinct()
            )
            obs = Observation()
            act = (
                act.join(killed, "node", "left_anti")
                .observe(obs, F.count(F.lit(1)).alias("n"))
                .localCheckpoint()
            )
            n_act = obs.get["n"]
            # both eact consumers (cand's checkpoint, act's checkpoint)
            # have executed -- release this round's cache
            eact.unpersist()
        else:
            raise RuntimeError(
                f"mis_parts_luby: active set non-empty after {_MIS_ROUNDS} "
                "rounds -- raise _MIS_ROUNDS (and the oracle unroll) rather "
                "than publish a partial MIS"
            )
    finally:
        edges.unpersist()
    out = mis_parts[0]
    for p in mis_parts[1:]:
        out = out.unionByName(p)
    return out.select(
        F.col("node").cast("bigint").alias("part_key"),
        F.col("r").cast("bigint").alias("mis_round"),
    )


_WALK_STEPS = 3


def _walk_hash_sql(start_expr: str, step: int) -> str:
    """Portable int(md5(start || ':step')[0:6], 16) -- the walk's
    deterministic 'coin' (extensions._hex_to_int_sql idiom)."""
    h = f"md5(CAST({start_expr} AS VARCHAR) || ':{step}')"
    parts = [
        f"(strpos('0123456789abcdef', substr({h}, {1 + i}, 1)) - 1) * {16 ** (5 - i)}"
        for i in range(6)
    ]
    return "(" + " + ".join(parts) + ")"


_WALK_ORACLE = (
    "WITH "
    + _pair_edges_sql(threshold=2)
    + """,
    nb AS (SELECT src, dst,
                  ROW_NUMBER() OVER (PARTITION BY src ORDER BY dst) AS rk
           FROM edges),
    w0 AS (SELECT node AS start, node AS cur FROM nodes)"""
    + "".join(
        f""",
    w{s} AS (
      SELECT w.start, n.dst AS cur
      FROM w{s - 1} w
      JOIN deg d ON d.src = w.cur
      JOIN nb n ON n.src = w.cur
       AND n.rk = 1 + {_walk_hash_sql('w.start', s)} % d.outdeg
    )"""
        for s in range(1, _WALK_STEPS + 1)
    )
    + f"""
    SELECT CAST(start AS BIGINT) AS start_key, CAST(step AS BIGINT) AS step,
           CAST(cur AS BIGINT) AS node
    FROM ({" UNION ALL ".join(f"SELECT start, {s} AS step, cur FROM w{s}" for s in range(_WALK_STEPS + 1))})
    """
)


@register("random_walks_hash3", eager_build=True, oracle=_WALK_ORACLE)
def random_walks_hash3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DeepWalk-style walk corpus (Perozzi et al. 2014): one 3-step
    walk from EVERY node of the co-purchase graph, each step choosing
    the k-th neighbor (neighbors ranked by id) with
    k = md5(start, step) mod degree -- the derandomized coin that makes
    the walk corpus REPRODUCIBLE and oracle-checkable, exactly the
    property production embedding pipelines need for regression
    testing (a true RNG corpus can't be diffed across runs). Output:
    (start_key, step, node) rows, 4 per start -- the sentences a
    skipgram embedding trains on (`skipgram_cooccurrence` is the
    consumer shape).

    Scale shape: each step is ONE equi-join of the walk frontier
    against the SORTED ADJACENCY ARRAY (walks never fan out -- exactly
    one row per (start, step)), so a T-step corpus costs T keyed
    shuffles over |V| rows regardless of walk count per node.  r14: the
    ranked-edge formulation cost TWO joins per step (degree lookup +
    (cur, k)=(src, rk) rank equi-join) plus a per-node row_number
    window; grouping each node's neighbors once into a sorted array
    (one partially-aggregated shuffle, checkpointed partitioned by src)
    makes each step prev JOIN adj + element_at(nbrs, k) -- rows
    verified identical.  The k-th-neighbor-by-id semantics is the
    array's sort order; a hub's array is one aggregation-buffer row
    exactly like the old window partition (degrees here are
    threshold-bounded; for hub-heavy graphs cap/sample the neighbor
    list first -- the graph_neighbor_jaccard hub discipline). The md5
    coin is engine-identical by construction (`_hex_to_int_sql` nibble
    idiom).
    """
    adj = (
        _copurchase_edges(spark, sf_dir, threshold=2)
        .groupBy("src")
        .agg(
            F.sort_array(F.collect_list("dst")).alias("nbrs"),
            F.count(F.lit(1)).alias("outdeg"),
        )
        .repartition("src")
        .localCheckpoint()
    )
    walks = [adj.select(F.col("src").alias("start"), F.col("src").alias("cur"))]
    for s in range(1, _WALK_STEPS + 1):
        coin = (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.col("start").cast("string"), F.lit(f":{s}"))),
                    1,
                    6,
                ),
                16,
                10,
            ).cast("long")
            % F.col("outdeg")
            + 1
        )
        prev = walks[-1]
        stepped = prev.join(adj, prev.cur == adj.src).select(
            "start", F.element_at("nbrs", coin.cast("int")).alias("cur")
        )
        walks.append(stepped)
    out = None
    for s, w in enumerate(walks):
        tagged = w.select("start", F.lit(s).alias("step"), F.col("cur"))
        out = tagged if out is None else out.unionByName(tagged)
    return out.select(
        F.col("start").cast("bigint").alias("start_key"),
        F.col("step").cast("bigint").alias("step"),
        F.col("cur").cast("bigint").alias("node"),
    )
