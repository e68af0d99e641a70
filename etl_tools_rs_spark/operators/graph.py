"""Bounded-iteration graph analytics on edge DataFrames.

The reference engine has no graph operators; this module extends the
surface the way a training-data pipeline needs it: link-analysis scores
(PageRank) over entity graphs extracted from relational data — e.g.
ranking sources/suppliers/pages by reference structure to weight or
filter corpus mixtures.

Scale notes (100 TB posture):
- One shuffle per iteration (the contribution ``groupBy(dst)``); the
  node and degree frames are built once and reused.
- Iterations are BOUNDED (caller-fixed, default 3) and each round ends
  in ``localCheckpoint`` so the lineage never grows with the iteration
  count — the classic iterative-Spark failure mode (exponential plan
  re-execution) is designed out.
- Checkpoints are DISK_ONLY (r7 — same hardening dedup.py's
  connected_components got in r6): the default MEMORY_AND_DISK level
  parks every round's frame as deserialized on-heap blocks in
  eviction-protected storage memory, starving the per-round joins and
  aggregations of execution memory exactly when the graph is big. The
  iterative frames here are read back O(1)-O(iterations) times each —
  the access pattern where paying a (page-cache-backed) disk read to
  keep the whole execution budget is the right trade; superseded
  rounds' blocks are freed by the ContextCleaner.
- No driver collects: the node count joins back as a broadcast 1-row
  aggregate.

Cross-engine determinism (same policy as queries.py): every per-row
division is floor-scaled (``FLOOR(10^s·x)/10^s`` — no half-way
boundary), and the per-destination contribution sum runs over exact
DECIMAL(38,s) values, so addition order across partitions can never
leak into the result. An oracle engine unrolling the same iterations in
SQL reproduces the scores bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel


def _fl(c: Column, scale: int) -> Column:
    p10 = float(10**scale)
    return F.floor(F.lit(p10) * c) / F.lit(p10)


def _cp(df: DataFrame) -> DataFrame:
    """Lineage cut for iterative frames: lazy DISK_ONLY localCheckpoint
    (see module docstring — storage memory must stay free for the
    per-round shuffles, not retained round snapshots)."""
    return df.localCheckpoint(eager=False, storageLevel=StorageLevel.DISK_ONLY)


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 3,
    damping: float = 0.85,
    scale: int = 9,
    checkpoint: bool = True,
    broadcast_ranks: bool = False,
) -> DataFrame:
    """Power-iteration PageRank over a directed edge list.

    ``rank_{k+1}(v) = (1-d)/N + d · Σ_{u→v} rank_k(u)/outdeg(u)``

    Dangling nodes (no out-edges) keep receiving the teleport term but
    redistribute nothing — the standard "mass-dropping" variant, chosen
    because it stays a pure per-edge map + per-destination sum (the
    redistribution variant needs an extra global aggregate per round).
    Ranks therefore sum to < 1 when dangling nodes exist; relative
    ordering — the thing pipelines consume — is unaffected.

    Returns ``(node, rank double)`` for every node on either side of an
    edge. Deterministic: floor-scaled divisions, exact-decimal
    contribution sums (see module docstring). ``checkpoint=False`` keeps
    the full lineage visible (plan inspection / tiny graphs); leave it
    on for real runs — without it iteration k replays all k-1 prior
    rounds.

    ``broadcast_ranks=True`` ships the rank table (node-count-sized, 2
    narrow columns) to executors each round instead of shuffling the
    edge list into a sort-merge join — edges then NEVER move after the
    initial degree join, and each iteration costs one map-side-combined
    contribution shuffle bounded by the node count. The right choice
    whenever ranks fit the broadcast budget (~100M nodes ≈ 2 GB is the
    practical ceiling); leave False for billion-node graphs.
    """
    if iterations < 1:
        raise ValueError(f"iterations must be >= 1, got {iterations!r}")
    if not (0.0 < damping < 1.0):
        raise ValueError(f"damping must be in (0,1), got {damping!r}")

    if checkpoint:
        # nodes / degrees / the iteration loop all branch off the edge
        # list — materialize it ONCE or every branch replays the
        # caller's (often join-heavy) edge derivation
        edges = _cp(edges)
    nodes = (
        edges.select(F.col(src).alias("node"))
        .union(edges.select(F.col(dst).alias("node")))
        .distinct()
    )
    if checkpoint:
        # reused by the teleport count, the rank init, and every round's
        # left join — node-count-sized
        nodes = _cp(nodes)
    n_total = nodes.agg(F.count(F.lit(1)).cast("double").alias("_n"))
    deg = edges.groupBy(F.col(src).alias("_src")).agg(
        F.count(F.lit(1)).cast("double").alias("_outdeg")
    )
    edges_deg = edges.select(
        F.col(src).alias("_src"), F.col(dst).alias("_dst")
    ).join(deg, "_src")
    if checkpoint:
        # built once, reused every round — avoid re-reading the edge source
        edges_deg = _cp(edges_deg)

    ranks = nodes.crossJoin(F.broadcast(n_total)).select(
        "node", _fl(F.lit(1.0) / F.col("_n"), scale).alias("rank")
    )
    dec_t = f"decimal(38,{scale})"
    for _ in range(iterations):
        rank_side = F.broadcast(ranks) if broadcast_ranks else ranks
        contrib = (
            edges_deg.join(rank_side, edges_deg["_src"] == rank_side["node"])
            .select(
                "_dst",
                _fl(F.col("rank") / F.col("_outdeg"), scale)
                .cast(dec_t)
                .alias("_c"),
            )
            .groupBy("_dst")
            .agg(F.sum("_c").alias("_csum"))
        )
        contrib_side = F.broadcast(contrib) if broadcast_ranks else contrib
        ranks = (
            nodes.join(contrib_side, nodes["node"] == contrib_side["_dst"], "left")
            .crossJoin(F.broadcast(n_total))
            .select(
                "node",
                _fl(
                    F.lit(1.0 - damping) / F.col("_n")
                    + F.lit(damping)
                    * F.coalesce(F.col("_csum").cast("double"), F.lit(0.0)),
                    scale,
                ).alias("rank"),
            )
        )
        if checkpoint:
            ranks = _cp(ranks)  # cut lineage each round
    return ranks


def degree_stats(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Per-node in/out degree from an edge list — the cheap structural
    profile (hub/authority/orphan detection) run before any iterative
    algorithm. One aggregate per direction + a full-outer merge on the
    node key; output is node-count-sized."""
    out_d = edges.groupBy(F.col(src).alias("node")).agg(
        F.count(F.lit(1)).cast("bigint").alias("out_degree")
    )
    in_d = edges.groupBy(F.col(dst).alias("node")).agg(
        F.count(F.lit(1)).cast("bigint").alias("in_degree")
    )
    return out_d.join(in_d, "node", "full_outer").select(
        "node",
        F.coalesce("out_degree", F.lit(0).cast("bigint")).alias("out_degree"),
        F.coalesce("in_degree", F.lit(0).cast("bigint")).alias("in_degree"),
    )


def cooccurrence_pairs(
    df: DataFrame,
    group_col: str,
    item_col: str,
    min_count: int = 2,
    max_group_size: int | None = 1000,
) -> DataFrame:
    """Bipartite projection: item pairs co-occurring in at least
    ``min_count`` groups (users/sessions/baskets) — the
    related-items / co-click / co-citation primitive. Returns
    ``(item_a, item_b, n_groups bigint)`` with ``item_a < item_b``.

    The within-group self-join is quadratic in group degree, so
    ``max_group_size`` DROPS groups larger than the cap before pairing
    (reference practice for co-occurrence at scale: a user who touched
    100k items contributes ~5·10⁹ pairs and near-zero signal per pair;
    the cap is the documented contract, not a silent truncation — count
    dropped groups via ``degree_stats`` if you need the audit).
    Membership is deduped first (a group counts a pair once). One
    shuffle to dedup membership, one for the group-size filter join,
    one equi-join on the group key, one pair aggregate — all
    map-side-combined.
    """
    if min_count < 1:
        raise ValueError(f"min_count must be >= 1, got {min_count!r}")
    # hash-partition the membership on the group key up front — the
    # self-join's attribute re-aliasing keeps Catalyst from statically
    # eliding the downstream exchanges, but g-clustered inputs measured
    # ~25% faster end-to-end (better-distributed distinct + join stages)
    m = (
        df.select(F.col(group_col).alias("_g"), F.col(item_col).alias("_i"))
        .repartition("_g")
        .distinct()
    )
    if max_group_size is not None:
        sizes = m.groupBy("_g").agg(F.count(F.lit(1)).alias("_sz"))
        m = m.join(
            sizes.filter(F.col("_sz") <= max_group_size).select("_g"), "_g"
        )
    a = m.select("_g", F.col("_i").alias("item_a"))
    b = m.select("_g", F.col("_i").alias("item_b"))
    return (
        a.join(b, "_g")
        .filter(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_groups"))
        .filter(F.col("n_groups") >= min_count)
    )


def triangle_count(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    checkpoint: bool = True,
) -> DataFrame:
    """Per-node triangle counts + local clustering coefficient — the
    structural cohesion profile (community density, spam-farm detection)
    over an undirected graph given as an edge list (direction and
    duplicate edges ignored; self-loops dropped).

    Degree-ordered orientation (the MapReduce-era trick that makes
    triangle enumeration feasible at scale): canonicalize each edge once,
    then orient it from the (degree, id)-SMALLER endpoint to the larger.
    Every wedge is then generated at its lowest-degree apex, so the
    quadratic wedge self-join is bounded by Σ out_deg² with out-degree
    ≤ O(√m) — a star node of degree 10⁶ generates ZERO wedges at its
    center instead of 5·10¹¹. Closure is one equi-join of wedges against
    the canonical edge set (wedge endpoints are already ordered, so the
    probe is a plain two-column key — no least/greatest recompute).

    Shuffles: canonical-dedup, degree agg, the wedge self-join on the
    apex, the closure join, and the per-node roll-up — all equi-joins /
    map-side-combined aggregates. Output: ``(node, degree bigint,
    triangles bigint, clustering_coeff double)``; the coefficient is
    ``2T/(d(d−1))`` (NULL when degree < 2) — a single IEEE int/int
    division, engine-exact.

    The canonical edge set, the degree frame, and the oriented edges are
    each referenced 2-3 times downstream; without lineage truncation
    Catalyst re-executes the whole upstream subtree per reference
    (measured: ~7× the edge-build work, 140 exchanges on a derived
    graph). ``checkpoint=True`` (default) ``localCheckpoint``s the three
    shared frames — all edge/node-sized, never corpus-sized.
    """
    e = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("x"),
            F.greatest(F.col(src), F.col(dst)).alias("y"),
        )
        .filter(F.col("x") != F.col("y"))
        .distinct()
    )
    if checkpoint:
        e = _cp(e)
    deg = (
        e.select(F.col("x").alias("node"))
        .unionAll(e.select(F.col("y").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("bigint").alias("degree"))
    )
    if checkpoint:
        deg = _cp(deg)
    dx = deg.select(F.col("node").alias("x"), F.col("degree").alias("_dx"))
    dy = deg.select(F.col("node").alias("y"), F.col("degree").alias("_dy"))
    ed = e.join(dx, "x").join(dy, "y")
    fwd = (F.col("_dx") < F.col("_dy")) | (
        (F.col("_dx") == F.col("_dy")) & (F.col("x") < F.col("y"))
    )
    o = ed.select(
        F.when(fwd, F.col("x")).otherwise(F.col("y")).alias("s"),
        F.when(fwd, F.col("y")).otherwise(F.col("x")).alias("t"),
    )
    if checkpoint:
        o = _cp(o)
    o1 = o.select(F.col("s"), F.col("t").alias("u"))
    o2 = o.select(F.col("s"), F.col("t").alias("w"))
    wedges = o1.join(o2, "s").filter(F.col("u") < F.col("w"))
    tri = wedges.join(
        e, (wedges["u"] == e["x"]) & (wedges["w"] == e["y"])
    ).select("s", "u", "w")
    per_node = (
        tri.select(F.col("s").alias("node"))
        .unionAll(tri.select(F.col("u").alias("node")))
        .unionAll(tri.select(F.col("w").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("bigint").alias("triangles"))
    )
    return deg.join(per_node, "node", "left").select(
        "node",
        "degree",
        F.coalesce("triangles", F.lit(0).cast("bigint")).alias("triangles"),
        F.when(
            F.col("degree") >= 2,
            (F.lit(2) * F.coalesce("triangles", F.lit(0))).cast("double")
            / (F.col("degree") * (F.col("degree") - 1)),
        ).alias("clustering_coeff"),
    )
