"""Iterative graph analytics: fixed-point PageRank over a derived edge set.

The reference has no graph surface; a training-data pipeline meets graphs
constantly (hyperlink authority for crawl prioritization a la PageRank,
influence/centrality over interaction graphs, dedup components — the latter
already lives in :mod:`operators.dedup`). This module adds the canonical
iterative-join workload, designed for Spark's execution model:

* **Per iteration: one equi-join + one partial-combined aggregate.** Ranks
  join edges on ``src`` (both sides shuffle-hash on the key; at 100 TB the
  edge table can be bucketed on ``src`` so the join side of every iteration
  is co-located and only the inflow aggregate shuffles), then inflow sums
  per ``dst`` with map-side combine — 8-byte keys and longs on the wire,
  never payloads.
* **Lineage truncation.** Each iteration's rank table is
  ``localCheckpoint``-ed; without it the plan doubles per iteration and the
  optimizer re-derives the whole chain (the classic iterative-Spark trap).
* **Fixed-point integer arithmetic = bit-reproducible.** Ranks are scaled
  BIGINTs (1.0 == ``scale``); contributions use integer division and the
  damping factor is an integer percent. Every operation is exact and
  order-insensitive, so the result is identical under retries, AQE
  re-planning, any partitioning, and across engines (the DuckDB oracle
  replays it bit-for-bit) — floating-point PageRank cannot promise any of
  that because double summation order changes the low bits. The floor
  losses are bounded by ``out_degree / scale`` per node per iteration
  (~1e-6 relative at the default scale), far below any ranking-relevant
  difference.

Dangling nodes (no out-edges) leak their damped mass, the common
simplification (their redistribution term is a global constant that does
not change relative order). Reference scope: none — engine completion
beyond `aryeung0/strava_vector_search` (see SURVEY §2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DAMPING_PCT = 85  # 0.85 as an integer percent
SCALE = 1_000_000  # rank fixed-point scale: 1.0 == 1e6


# auto-broadcast ceiling for the rank table: ~1M (node, long) rows is a
# few tens of MB per broadcast — two broadcasts per iteration must stay
# comfortably inside a modest driver heap; larger graphs take the shuffle
# join (pre-bucket the edge table there)
BROADCAST_NODES_THRESHOLD = 1_000_000


def prepare_pagerank_graph(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> tuple[DataFrame, DataFrame, int]:
    """Seed-independent PageRank prep: ``(edeg, base_nodes, n_nodes)``.

    ``edeg`` = degree-attached edge list, ``base_nodes`` = the distinct
    node set, both lazily checkpointed; ``n_nodes`` = the node count
    (the broadcast-vs-shuffle decision input). Split out of
    :func:`_pagerank_core` (r12 optimization) so callers that run
    SEVERAL pagerank variants over the SAME edge set (g_pagerank and
    g_ppr share the symmetric trade graph) can build this once per
    session and pass it via ``prepared=`` — the prep is three checkpoint
    plannings plus a count job per call, re-paid per gate per bench rep
    when not shared.
    """
    # checkpoint the edge projection: deg, edeg and nodes each read it (the
    # union in nodes twice), so an un-checkpointed upstream derivation
    # (join + distinct in g_pagerank) would recompute ~6x
    e = edges.select(
        F.col(src).alias("_src"), F.col(dst).alias("_dst")
    ).localCheckpoint(eager=False)
    deg = e.groupBy("_src").agg(F.count(F.lit(1)).alias("_deg"))
    # edges-with-degree and the node set are reused every iteration:
    # materialize once, keep lineage flat
    edeg = e.join(deg, "_src").localCheckpoint(eager=False)
    base_nodes = (
        e.select(F.col("_src").alias("node"))
        .union(e.select(F.col("_dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    return edeg, base_nodes, base_nodes.count()


def _pagerank_core(
    edges: DataFrame,
    seeds: DataFrame | None,
    src: str,
    dst: str,
    seed_col: str,
    iterations: int,
    damping_pct: int,
    scale: int,
    broadcast_ranks: bool | None,
    prepared: tuple[DataFrame, DataFrame, int] | None = None,
) -> DataFrame:
    """Shared fixed-point PageRank loop (one definition — the global and
    personalized variants differ ONLY in where the restart mass lands, so
    the join/aggregate/checkpoint discipline can never drift between
    them). ``seeds is None`` = every node restarts (global PageRank);
    otherwise only seed nodes do (random walk with restart). Returns
    ``(node, is_seed, rank_fp)``. ``prepared`` (from
    :func:`prepare_pagerank_graph`) skips the seed-independent prep.
    """
    if prepared is None:
        if edges is None:
            raise ValueError(
                "pagerank: pass either an edge DataFrame or prepared= "
                "(from prepare_pagerank_graph); got neither"
            )
        prepared = prepare_pagerank_graph(edges, src, dst)
    edeg, base_nodes, n_nodes = prepared
    if seeds is None:
        nodes = base_nodes.withColumn("is_seed", F.lit(1))
    else:
        sd = (
            seeds.select(F.col(seed_col).alias("node"))
            .distinct()
            .withColumn("_sflag", F.lit(1))
        )
        nodes = base_nodes.join(sd, "node", "left").select(
            "node", F.coalesce(F.col("_sflag"), F.lit(0)).alias("is_seed")
        )
    nodes = nodes.localCheckpoint(eager=False)
    if broadcast_ranks is None:
        # node count comes from the prep (base_nodes and nodes have the
        # same node set) — no extra count job per variant
        broadcast_ranks = n_nodes <= BROADCAST_NODES_THRESHOLD

    def _maybe_bcast(df: DataFrame) -> DataFrame:
        return F.broadcast(df) if broadcast_ranks else df

    base = (100 - damping_pct) * scale // 100
    ranks = nodes.withColumn(
        "rank_fp",
        F.when(F.col("is_seed") == 1, F.lit(scale))
        .otherwise(F.lit(0))
        .cast("bigint"),
    )
    for _ in range(iterations):
        r = _maybe_bcast(
            ranks.select(
                F.col("node").alias("_src"), F.col("rank_fp").alias("_r")
            )
        )
        contrib = edeg.join(r, "_src").select(
            F.col("_dst").alias("node"),
            F.expr("_r div _deg").alias("_c"),
        )
        inflow = contrib.groupBy("node").agg(F.sum("_c").alias("_inflow"))
        ranks = (
            nodes.join(_maybe_bcast(inflow), "node", "left")
            .select(
                "node",
                "is_seed",
                (
                    F.when(F.col("is_seed") == 1, F.lit(base)).otherwise(
                        F.lit(0)
                    )
                    + F.expr(
                        f"({damping_pct} * coalesce(_inflow, 0L)) div 100"
                    )
                )
                .cast("bigint")
                .alias("rank_fp"),
            )
            .localCheckpoint(eager=False)
        )
    return ranks


def pagerank_fixedpoint(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 5,
    damping_pct: int = DAMPING_PCT,
    scale: int = SCALE,
    broadcast_ranks: bool | None = None,
    prepared: tuple[DataFrame, DataFrame, int] | None = None,
) -> DataFrame:
    """Damped PageRank over a directed edge list, exact fixed-point form.

    Returns ``(node, rank_fp)`` where ``rank_fp`` is the scaled-integer
    rank after ``iterations`` rounds of

        rank' = (100 - d)·scale/100  +  d · Σ_in (rank_src div deg_src) / 100

    with every division an integer floor — see module docstring for why.
    Multi-edges count toward both degree and inflow (weight = multiplicity).

    Degrees are attached to the edge list ONCE (``edeg``), so an iteration
    is a single join + one aggregate. ``broadcast_ranks``: when the node
    set is modest (below ``BROADCAST_NODES_THRESHOLD`` in auto mode — a
    handful of bytes per node in the executor heap), the rank table
    broadcasts and the big edge side is never shuffled by the join; the
    only per-iteration shuffle is the map-side-combined inflow aggregate
    (8-byte keys). Above the threshold it falls back to a shuffle join —
    at billion-node scale, pre-bucketing ``edeg`` on ``_src`` restores
    co-location there too.
    """
    return _pagerank_core(
        edges, None, src, dst, "node", iterations, damping_pct, scale,
        broadcast_ranks, prepared,
    ).select("node", "rank_fp")


def top_ranked(ranks: DataFrame, k: int = 20, scale: int = SCALE) -> DataFrame:
    """Top-k nodes by rank, ties broken by node id; rank as a 6-dp double
    (exact: the fixed-point value divided by the scale)."""
    return (
        ranks.select(
            "node",
            F.round(F.col("rank_fp").cast("double") / F.lit(float(scale)), 6).alias(
                "rank"
            ),
        )
        .orderBy(F.col("rank").desc(), F.col("node").asc())
        .limit(k)
    )


def neighborhood_jaccard_pairs(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_src_degree: int | None = 1000,
) -> DataFrame:
    """Top item pairs by Jaccard overlap of their neighbor sets — the
    collaborative-filtering "items bought by the same customers" kernel,
    as the inverted-index join (never all item pairs): each ``src``
    (customer) emits its ``dst`` (item) pairs, so candidate generation is
    bounded by per-src degree, and only pairs sharing ≥1 neighbor exist.

    ``max_src_degree`` drops promiscuous sources before pairing (a src
    touching everything contributes degree² pairs and no signal — the
    stop-shingle guard from the text-dedup operators applied to graphs);
    dropped sources still count toward neighbor-set sizes, so the Jaccard
    denominators stay honest. Returns (i1, i2, inter, n1, n2, jaccard).
    """
    e = edges.select(F.col(src).alias("_s"), F.col(dst).alias("_d")).distinct()
    e = e.localCheckpoint(eager=False)
    sizes = e.groupBy("_d").agg(F.count(F.lit(1)).alias("_n"))
    pair_src = e
    if max_src_degree is not None:
        deg = e.groupBy("_s").agg(F.count(F.lit(1)).alias("_sd"))
        pair_src = e.join(
            deg.filter(F.col("_sd") <= max_src_degree).select("_s"), "_s"
        )
    a = pair_src.select(F.col("_s"), F.col("_d").alias("i1"))
    b = pair_src.select(F.col("_s"), F.col("_d").alias("i2"))
    inter = (
        a.join(b, "_s")
        .filter(F.col("i1") < F.col("i2"))
        .groupBy("i1", "i2")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    return (
        inter.join(
            sizes.select(F.col("_d").alias("i1"), F.col("_n").alias("n1")),
            "i1",
        )
        .join(
            sizes.select(F.col("_d").alias("i2"), F.col("_n").alias("n2")),
            "i2",
        )
        .select(
            "i1",
            "i2",
            "inter",
            "n1",
            "n2",
            F.round(
                F.col("inter").cast("double")
                / (F.col("n1") + F.col("n2") - F.col("inter")),
                6,
            ).alias("jaccard"),
        )
    )


def personalized_pagerank_fixedpoint(
    edges: DataFrame,
    seeds: DataFrame,
    src: str = "src",
    dst: str = "dst",
    seed_col: str = "node",
    iterations: int = 4,
    damping_pct: int = DAMPING_PCT,
    scale: int = SCALE,
    broadcast_ranks: bool | None = None,
    prepared: tuple[DataFrame, DataFrame, int] | None = None,
) -> DataFrame:
    """Personalized PageRank: the restart mass lands ONLY on ``seeds``
    (rank' = (1-d)·e_S + d·A·rank), so rank measures proximity to the seed
    set — the random-walk-with-restart recommender / local-community
    kernel, vs global authority in :func:`pagerank_fixedpoint`.

    Same execution shape and same exact fixed-point integer contract as
    the global variant — literally the same loop (``_pagerank_core``),
    parameterized only by where the restart base applies. Seeds init at
    ``scale``, non-seeds at 0; per iteration seeds add the full restart
    base ``(100-d)·scale/100`` and non-seeds get damped inflow only.
    Dangling leakage as in the global variant.

    Returns ``(node, is_seed, rank_fp)``.
    """
    return _pagerank_core(
        edges, seeds, src, dst, seed_col, iterations, damping_pct, scale,
        broadcast_ranks, prepared,
    )
