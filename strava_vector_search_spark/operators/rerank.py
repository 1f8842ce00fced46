"""Diversity reranking — maximal marginal relevance (MMR, Carbonell &
Goldstein 1998) over a bounded candidate set. The reference serves raw
top-k (``02:300-320``); a retrieval layer that feeds RAG prompts or
training-data selection wants the top-k DEDIVERSIFIED: each pick trades
query relevance against similarity to what's already picked,

    mmr(c) = lam * sim(c, q) - (1 - lam) * max_{p in picked} sim(c, p).

Scale shape: MMR is inherently sequential in k but only over the CANDIDATE
set (top-n_cand from any search operator — brute force, IVF, SRP, PQ), so
the cluster-side pattern is candidate generation at corpus scale, then one
``applyInPandas`` group per query for the greedy loop: thousands of queries
rerank in parallel, each group O(n_cand^2) small. No driver collect.

Determinism (oracle contract): relevance and pairwise similarities round to
6 dp, the running mmr rounds to 6 dp, ties break by id ascending — matched
bit-for-bit by a DuckDB recursive-CTE twin (ORACLES['vs_mmr_rerank']), so
this is an EXACT gate, not a property gate.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def mmr_select(ids, rel, V, k: int, lam: float):
    """Greedy MMR over one candidate group. ``V`` is the (n, d) float64
    vector matrix aligned with ``ids``/``rel``. Returns positional indices
    in selection order."""
    import pandas as pd

    n = len(ids)
    k = min(k, n)
    sims = np.round(V @ V.T, 6)
    rel = np.round(np.asarray(rel, dtype=np.float64), 6)
    remaining = np.ones(n, dtype=bool)
    picked: list[int] = []
    scores: list[float] = []
    for step in range(k):
        idx = np.flatnonzero(remaining)
        if not picked:
            mmr = rel[idx]
        else:
            max_sim = sims[np.ix_(idx, picked)].max(axis=1)
            mmr = np.round(lam * rel[idx] - (1.0 - lam) * max_sim, 6)
        tbl = pd.DataFrame({"m": mmr, "id": np.asarray(ids)[idx], "i": idx})
        best = tbl.sort_values(
            ["m", "id"], ascending=[False, True], kind="mergesort"
        ).iloc[0]
        pick = int(best["i"])
        picked.append(pick)
        scores.append(float(best["m"]))
        remaining[pick] = False
    return picked, scores


def mmr_rerank(
    candidates: DataFrame,
    k: int = 10,
    lam: float = 0.5,
    query_col: str = "query_id",
    id_col: str = "vec_id",
    rel_col: str = "similarity",
    vector_col: str = "embedding",
) -> DataFrame:
    """(query_id, step, id, rel, mmr) — top-``k`` diversified picks per
    query. One applyInPandas group per query id; candidate frames are the
    output of any top-n_cand search, so groups are small by construction."""
    import pandas as pd

    id_type = candidates.schema[id_col].dataType.simpleString()
    q_type = candidates.schema[query_col].dataType.simpleString()

    def _group(pdf: pd.DataFrame) -> pd.DataFrame:
        V = np.stack(pdf[vector_col].to_numpy()).astype(np.float64)
        ids = pdf[id_col].to_numpy()
        picked, scores = mmr_select(ids, pdf[rel_col].to_numpy(), V, k, lam)
        return pd.DataFrame(
            {
                query_col: [pdf[query_col].iloc[0]] * len(picked),
                "step": np.arange(1, len(picked) + 1),
                id_col: ids[picked],
                "rel": np.round(
                    pdf[rel_col].to_numpy()[picked].astype(np.float64), 6
                ),
                "mmr": scores,
            }
        )

    out_schema = (
        f"{query_col} {q_type}, step int, {id_col} {id_type},"
        " rel double, mmr double"
    )
    return candidates.groupBy(query_col).applyInPandas(_group, out_schema)
