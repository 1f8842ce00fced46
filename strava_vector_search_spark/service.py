"""Search-service layer: the Spark-first equivalent of Snowflake Cortex
Search (reference ``01_method1_cortex_search.sql:163-219``).

The reference declares a managed service over a table (searchable column +
filterable ATTRIBUTES + freshness lag) and queries it with a JSON request
``{query, columns, filter, limit}`` whose ``filter`` is a mini-DSL
(``@eq/@gte/@lte/@and/@or``; notebook Q2/Q3 nest them). Here:

* :func:`compile_filter` — recursive descent DSL → a Catalyst ``Column``
  predicate. Declarative output means Catalyst pushes the compiled filter
  all the way into the parquet scan (attribute filters prune row groups at
  100 TB exactly like the reference's "use metadata filters first" advice,
  02:406).
* :class:`SearchService` — ``build()`` materializes the index (select the
  declared columns, embed the search column, write a narrow embeddings
  parquet partitioned for pruning); ``search(request)`` compiles the DSL,
  runs the EP1 pipeline (filter → cosine → top-k), and returns rows shaped
  like the reference's flattened JSON results (one row per hit + rank +
  similarity), so the reference's post-processing SQL has a 1:1 target.

Freshness (TARGET_LAG, 01:173) is handled by streaming.refresh.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from functools import reduce
from operator import and_, or_

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from strava_vector_search_spark.functions.embed import (
    DEFAULT_DIM,
    hash_embed_text,
    hash_embedding_table,
)
from strava_vector_search_spark.operators.ann import default_ivf_cells
from strava_vector_search_spark.operators.search import brute_force_topk


class FilterDSLError(ValueError):
    pass


_COMPARISONS = {
    "@eq": lambda c, v: c == F.lit(v),
    "@ne": lambda c, v: c != F.lit(v),
    "@gte": lambda c, v: c >= F.lit(v),
    "@lte": lambda c, v: c <= F.lit(v),
    "@gt": lambda c, v: c > F.lit(v),
    "@lt": lambda c, v: c < F.lit(v),
    "@contains": lambda c, v: c.contains(v),
    "@in": lambda c, v: c.isin(*v),
}


def compile_filter(node: dict, attributes: set[str] | None = None) -> Column:
    """Compile one DSL node to a Column predicate.

    Grammar (reference 01:214, nb Q1-Q3 + @ne/@gt/@lt/@contains/@in as the
    natural completions Cortex also documents):
      node := {"@and": [node…]} | {"@or": [node…]} | {"@not": node}
            | {op: {attr: value}}           op ∈ _COMPARISONS
    Only declared ``attributes`` are filterable (01:170-171); anything else
    raises — mirroring the service rejecting non-ATTRIBUTE filters.
    """
    if not isinstance(node, dict) or len(node) != 1:
        raise FilterDSLError(f"filter node must be a single-key object: {node!r}")
    op, body = next(iter(node.items()))
    if op == "@and" or op == "@or":
        if not isinstance(body, list) or not body:
            raise FilterDSLError(f"{op} expects a non-empty list")
        parts = [compile_filter(n, attributes) for n in body]
        return reduce(and_ if op == "@and" else or_, parts)
    if op == "@not":
        return ~compile_filter(body, attributes)
    if op in _COMPARISONS:
        if not isinstance(body, dict) or len(body) != 1:
            raise FilterDSLError(f"{op} expects {{attribute: value}}")
        attr, value = next(iter(body.items()))
        if attributes is not None and attr not in attributes:
            raise FilterDSLError(f"attribute {attr!r} is not filterable (declared: {sorted(attributes)})")
        return _COMPARISONS[op](F.col(attr), value)
    raise FilterDSLError(f"unknown operator {op!r}")


@dataclass
class SearchService:
    """A declared search service over a corpus (reference 01:168-186).

    Parameters mirror the CREATE SERVICE clauses: ``search_col`` ↔ ON,
    ``attributes`` ↔ ATTRIBUTES, ``columns`` ↔ the defining query's
    projection, ``index_path`` ↔ the service's managed index storage.
    """

    spark: SparkSession
    corpus: DataFrame
    id_col: str = "doc_id"
    search_col: str = "text"
    attributes: tuple[str, ...] = ()
    columns: tuple[str, ...] = ()
    dim: int = DEFAULT_DIM
    index_path: str | None = None
    # the index is L2-normalized at write (build() uses the normalizing
    # embedder), so query scoring uses the dot-product fast path; set False
    # when attaching un-normalized external embeddings
    assume_normalized: bool = True
    embeddings: DataFrame | None = field(default=None, repr=False)
    # materialized IVF serving layout (build_ivf / search_batch)
    ivf_path: str | None = field(default=None, repr=False)
    ivf_cluster_col: str = "cluster"
    # persisted IVF+PQ artifact (attach_pq_index / search_approx)
    pq_index: tuple | None = field(default=None, repr=False)

    def build(self) -> "SearchService":
        """Materialize the index: embed the search column into a narrow
        (id, embedding) table. With ``index_path`` set, persists as parquet
        (the 100 TB layout: embeddings separate from payloads; re-read with
        only 4*dim+8 bytes per row scanned at query time)."""
        emb = hash_embedding_table(self.corpus, self.id_col, self.search_col, self.dim)
        if self.index_path:
            emb.write.mode("overwrite").parquet(self.index_path)
            emb = self.spark.read.parquet(self.index_path)
        self.embeddings = emb
        return self

    def attach_embeddings(self, emb: DataFrame, vec_id_col: str = "vec_id") -> "SearchService":
        """Use precomputed embeddings (e.g. the testdata embeddings table or
        a model-embedded corpus) instead of building."""
        if vec_id_col != self.id_col:
            emb = emb.withColumnRenamed(vec_id_col, self.id_col)
        self.embeddings = emb
        return self

    # -- materialized IVF serving layout -------------------------------

    def build_ivf(
        self,
        ivf_path: str,
        cluster_col: str | None = None,
        n_clusters: int | None = None,
        seed: int = 42,
        fit_fraction: float = 1.0,
        max_iter: int | None = None,
    ) -> "SearchService":
        """Materialize the cluster-partitioned IVF serving layout for
        :meth:`search_batch`: the built/attached embeddings joined with
        the declared ATTRIBUTES (so batch filters evaluate on the pruned
        scan without a corpus join-back), coarse-quantized either by an
        existing ``cluster_col`` attribute (deterministic — the
        oracle-replayable lane) or by a seeded KMeans fit (the learned
        production quantizer; the fit input is repartitioned to a FIXED
        literal width so the kmeans|| init sees the same partitioning on
        any machine — defaultParallelism varies by core count and MLlib's
        init is partitioning-sensitive), written via
        operators/ann.write_ivf_index + write_ivf_centroids. One build
        serves every later batch; incremental freshness is
        ann.append_to_ivf_index / streaming.ivf_stream territory.

        ``n_clusters=None`` derives the cell count from corpus size via
        :func:`default_ivf_cells` (~sqrt(N), the production IVF sizing) —
        a fixed small k caps partition pruning at nprobe/k of the corpus
        regardless of N, which is the 100 TB scale-killer.

        ``fit_fraction < 1`` is the production TWO-PHASE build: Lloyd's
        iterations run over a deterministic hash sample (xxhash64 of the
        id — same rows on any cluster), then the FULL corpus is assigned
        to the fitted centroids in one map-side pass
        (operators/ann.assign_to_centroids — zero shuffle of the
        embedding table). Nobody runs 20 Lloyd's passes over 100 TB;
        the coarse quantizer trains on a sample and only the O(N·k·d)
        assignment touches everything. ``max_iter`` caps the fit's
        iterations (None = MLlib's 20) — at high k the refinement
        passes buy assignment quality, never correctness."""
        import os

        from strava_vector_search_spark.operators.ann import (
            compute_centroids,
            kmeans_assign,
            write_ivf_index,
        )

        if self.embeddings is None:
            raise RuntimeError(
                "service not built: call build() or attach_embeddings()"
            )
        emb = self.embeddings
        if self.attributes:
            emb = emb.join(
                self.corpus.select(self.id_col, *self.attributes),
                self.id_col,
            )
        if cluster_col is None:
            if "cluster" in emb.columns:
                raise ValueError(
                    "build_ivf: the corpus already has a 'cluster' column "
                    "— pass cluster_col='cluster' to use it as the coarse "
                    "quantizer, or rename it (kmeans_assign would collide)"
                )
            if n_clusters is None:
                n_clusters = default_ivf_cells(emb.count())
            if not (0 < fit_fraction <= 1):
                raise ValueError(
                    f"build_ivf: fit_fraction must be in (0, 1], got "
                    f"{fit_fraction}"
                )
            fit_in = emb
            if fit_fraction < 1.0:
                fit_in = emb.filter(
                    F.pmod(F.xxhash64(F.col(self.id_col)), F.lit(10000))
                    < int(fit_fraction * 10000)
                )
            fitted = kmeans_assign(
                fit_in.repartition(32, self.id_col).sortWithinPartitions(
                    self.id_col
                ),
                num_clusters=n_clusters,
                seed=seed,
                max_iter=max_iter,
            )
            if fit_fraction < 1.0:
                from strava_vector_search_spark.operators.ann import (
                    assign_to_centroids,
                )

                fit_cents = compute_centroids(
                    fitted, "cluster"
                ).localCheckpoint(eager=False)
                emb = assign_to_centroids(
                    emb,
                    fit_cents,
                    vector_col="embedding",
                    cluster_col="cluster",
                    id_col=self.id_col,
                )
            else:
                emb = fitted
            cluster_col = "cluster"
        elif n_clusters is not None:
            raise ValueError(
                "build_ivf: n_clusters only applies to the learned "
                "(cluster_col=None) lane — an existing cluster column "
                "fixes the cell count"
            )
        write_ivf_index(emb, ivf_path, cluster_col=cluster_col)
        # centroids INSIDE the index dir (underscore-prefixed — parquet
        # partition discovery ignores it), not ann.write_ivf_centroids'
        # sibling `<path>_centroids`: the service layout is one
        # self-contained directory, so atomic-rename generation protocols
        # (_cached_layout) move the whole artifact in one rename
        compute_centroids(emb, cluster_col).select(
            "cluster", "centroid"
        ).write.mode("overwrite").parquet(
            os.path.join(ivf_path, "_centroids")
        )
        self.ivf_path = ivf_path
        self.ivf_cluster_col = cluster_col
        return self

    def _parse_batch_requests(
        self, requests: list[dict], k_default: int
    ) -> tuple[list[tuple], list[Column], bool]:
        """Shared batch-request front end of :meth:`search_batch` and
        :meth:`search_approx_batch`: returns (rows, compiled,
        any_unfiltered) where rows is [(request_id, query_vec, limit,
        filter_id)], compiled holds one predicate per DISTINCT filter
        body (requests sharing a filter share an id — expression growth
        is bounded by distinct filters, not batch size), and filter_id
        -1 marks unfiltered requests. Text queries embed in ONE table
        job, not one 1-row collect per request (a 10^4-request batch
        would otherwise run 10^4 driver-side Spark jobs before the scan
        even starts)."""
        attrs = set(self.attributes) if self.attributes else None
        parsed: list[tuple[list[float] | None, dict]] = []
        texts: list[tuple[int, str]] = []
        for i, req in enumerate(requests):
            if isinstance(req, str):
                req = json.loads(req)
            if "query_vec" in req:
                qv = [float(x) for x in req["query_vec"]]
            elif "query" in req:
                qv = None
                texts.append((i, req["query"]))
            else:
                raise FilterDSLError(
                    "request needs 'query' or 'query_vec'"
                )
            parsed.append((qv, req))
        embedded: dict[int, list[float]] = {}
        if texts:
            tdf = self.spark.createDataFrame(
                texts, "request_id int, t string"
            )
            embedded = {
                r["request_id"]: [float(x) for x in r["embedding"]]
                for r in hash_embedding_table(
                    tdf, "request_id", "t", self.dim
                ).collect()
            }
            missing = sorted(i for i, _ in texts if i not in embedded)
            if missing:
                raise ValueError(
                    f"requests {missing} embed to empty/zero vectors "
                    "(no [a-z0-9] tokens or all token weights are 0); "
                    "cannot rank by cosine similarity"
                )
        rows = []
        filter_ids: dict[str, int] = {}
        compiled: list[Column] = []
        any_unfiltered = False
        for i, (qv, req) in enumerate(parsed):
            if qv is None:
                qv = embedded[i]
            flt = req.get("filter")
            if flt:
                key = json.dumps(flt, sort_keys=True)
                fid = filter_ids.get(key)
                if fid is None:
                    fid = len(compiled)
                    filter_ids[key] = fid
                    compiled.append(compile_filter(flt, attrs))
            else:
                fid = -1
                any_unfiltered = True
            rows.append((i, qv, int(req.get("limit", k_default)), fid))
        return rows, compiled, any_unfiltered

    def search_batch(
        self,
        requests: list[dict],
        nprobe: int = 2,
        k_default: int = 10,
    ) -> DataFrame:
        """Serve MANY JSON requests in ONE pruned scan of the
        MATERIALIZED IVF layout — the production cache-refresh shape
        (the reference's "batch multiple user queries together",
        02:421): the union of all requests' probed clusters lands in the
        scan as PartitionFilters (unprobed clusters never READ), each
        request's DSL filter compiles into the scored stream BEFORE its
        rank window (filter-then-rank, same evaluation order as
        :meth:`search`), and per-request limits cut the ranked stream.
        Returns (request_id, id, attribute columns, cluster, similarity,
        rank). vs :func:`search_many`: that is the exact full-scan batch;
        this reads only the probed fraction of the index — the scale
        path once the corpus dwarfs the query batch."""
        import os

        from strava_vector_search_spark.operators.ann import (
            ivf_batch_topk_indexed,
        )

        if self.ivf_path is None:
            raise RuntimeError(
                "no IVF layout: call build_ivf() before search_batch()"
            )
        if not requests:
            raise ValueError("search_batch: empty request list")
        cents = self.spark.read.parquet(
            os.path.join(self.ivf_path, "_centroids")
        )
        # Per-request limit and filter identity ride the broadcast
        # queries table as DATA columns instead of compiling into the
        # expression tree: the old shape OR-reduced one predicate per
        # request for the DSL filters AND one per request for the limit
        # cut, so a production cache-refresh batch of 10^4 requests grew
        # a 10^4-term expression and blew up Catalyst analysis time.
        # Now the limit cut is ONE column comparison (rank <= _limit,
        # _limit joined in with the query vector) and the filter union
        # is bounded by the number of DISTINCT filter bodies in the
        # batch — requests sharing a filter share one compiled branch
        # (batch workloads repeat a handful of filter shapes; a batch
        # of thousands of all-distinct filters is thousands of
        # independent queries, not a batch).
        rows, compiled, any_unfiltered = self._parse_batch_requests(
            requests, k_default
        )
        queries_df = self.spark.createDataFrame(
            rows,
            "request_id int, query_vec array<double>, "
            "_limit int, _filter_id int",
        )
        pre = None
        if compiled:
            preds = [
                (F.col("_filter_id") == F.lit(j)) & c
                for j, c in enumerate(compiled)
            ]
            if any_unfiltered:
                preds.insert(0, F.col("_filter_id") == F.lit(-1))
            pre = reduce(or_, preds)
        ranked = ivf_batch_topk_indexed(
            self.spark,
            self.ivf_path,
            queries_df,
            k=max(r[2] for r in rows),
            nprobe=nprobe,
            cluster_col=self.ivf_cluster_col,
            id_col=self.id_col,
            centroids=cents,
            query_id_col="request_id",
            pre_rank_filter=pre,
        )
        return ranked.filter(F.col("rank") <= F.col("_limit")).drop(
            "_limit", "_filter_id"
        )

    # -- compressed (IVF+PQ) approximate serving ------------------------

    def attach_pq_index(self, path: str) -> "SearchService":
        """Attach a persisted IVF+PQ artifact (operators/pq
        .write_pq_index) as the service's APPROXIMATE serving index —
        the reference's "1M+ documents: consider approximate search"
        (02:438-442) at the service layer: a fresh serving session
        LOADS codebooks + the 96-byte code table, it never retrains.
        The artifact's id column must match the service's; the coarse
        centroid table must be present (search_approx probes it)."""
        from strava_vector_search_spark.operators import pq as PQ

        books, codes, cents, meta = PQ.load_pq_index(self.spark, path)
        if meta["id_col"] != self.id_col:
            raise ValueError(
                f"attach_pq_index: artifact id_col {meta['id_col']!r} != "
                f"service id_col {self.id_col!r}"
            )
        if cents is None or meta["cluster_col"] is None:
            raise ValueError(
                "attach_pq_index: artifact has no coarse quantizer "
                "(centroids/cluster_col) — search_approx needs IVF+PQ, "
                "not plain PQ"
            )
        if meta["m"] * meta["sub"] != self.dim:
            raise ValueError(
                f"attach_pq_index: artifact encodes dim "
                f"{meta['m'] * meta['sub']} (m={meta['m']} x sub="
                f"{meta['sub']}) but the service dim is {self.dim} — "
                "the artifact must be built over the same (and "
                "identically normalized) embedding table it will serve"
            )
        self.pq_index = (
            books,
            codes.localCheckpoint(eager=False),
            cents.localCheckpoint(eager=False),
            meta,
        )
        return self

    def search_approx(
        self, request: dict | str, nprobe: int = 4, n_cand: int = 200
    ) -> DataFrame:
        """Serve one JSON request through the COMPRESSED index: metadata
        filters first (02:406 — the DSL predicate runs on the narrow
        corpus scan and semi-joins the code table, so filtered-out rows
        never enter ADC and never consume candidate slots), probe the
        loaded coarse centroids, ADC-scan the surviving probed codes,
        exact-rescore ``n_cand`` candidates against the stored
        embeddings, and return :meth:`search`'s wire shape (requested
        columns + similarity + rank). The approximation is candidate
        recall only — shared hits carry similarities identical to
        :meth:`search`'s (same scorer on the same stored vectors)."""
        from strava_vector_search_spark.operators import pq as PQ
        from strava_vector_search_spark.operators.search import (
            brute_force_topk,
        )

        if isinstance(request, str):
            request = json.loads(request)
        if self.pq_index is None:
            raise RuntimeError(
                "no PQ index: call attach_pq_index() before "
                "search_approx()"
            )
        if self.embeddings is None:
            raise RuntimeError(
                "service not built: call build() or attach_embeddings()"
            )
        books, codes, cents, meta = self.pq_index
        if "query_vec" in request:
            qv = [float(x) for x in request["query_vec"]]
        elif "query" in request:
            qv = [
                float(x)
                for x in hash_embed_text(
                    self.spark, request["query"], self.dim
                )
            ]
        else:
            raise FilterDSLError("request needs 'query' or 'query_vec'")
        limit = int(request.get("limit", 10))
        cols = list(
            request.get("columns", self.columns or self.corpus.columns)
        )
        if request.get("filter"):
            attrs = set(self.attributes) if self.attributes else None
            pred = compile_filter(request["filter"], attrs)
            keep_ids = self.corpus.filter(pred).select(self.id_col)
            # semi-join, planner-chosen strategy: the qualifying-id side
            # can be any size, so no forced broadcast
            codes = codes.join(keep_ids, self.id_col, "left_semi")
        probed = PQ.probe_clusters(cents, qv, nprobe)
        cand_codes = codes.join(
            F.broadcast(probed),
            codes[meta["cluster_col"]] == probed["cluster"],
            "left_semi",
        )
        # residual-stamped artifact (IVFADC): ADC needs each probed
        # cell's q·centroid offset — a bounded nprobe-row collect
        centroid_vecs = None
        if meta.get("residual"):
            centroid_vecs = {
                int(r["cluster"]): r["centroid"]
                for r in cents.join(
                    F.broadcast(probed), "cluster", "left_semi"
                ).collect()
            }
        cand = PQ.pq_candidates(
            cand_codes,
            books,
            qv,
            n_cand=n_cand,
            id_col=self.id_col,
            centroid_vecs=centroid_vecs,
            cluster_col=meta["cluster_col"],
        )
        pruned = self.embeddings.join(
            F.broadcast(cand.select(self.id_col)),
            self.id_col,
            "left_semi",
        )
        top = brute_force_topk(
            pruned,
            qv,
            k=limit,
            id_col=self.id_col,
            assume_normalized=self.assume_normalized,
        )
        base = top.join(self.corpus, self.id_col)
        rank_w = F.row_number().over(
            Window.orderBy(F.desc("similarity"), F.asc(self.id_col))
        ).cast("bigint")
        out_cols = [self.id_col] if self.id_col not in cols else []
        return base.select(
            *out_cols, *cols, "similarity"
        ).withColumn("rank", rank_w)

    def search_approx_batch(
        self,
        requests: list[dict],
        nprobe: int = 4,
        n_cand: int = 200,
        k_default: int = 10,
    ) -> DataFrame:
        """Serve MANY JSON requests through the COMPRESSED index in one
        ADC pass per DISTINCT filter — the batched twin of
        :meth:`search_approx`, completing the serving matrix
        (search = single exact, search_batch = batch pruned-exact,
        search_approx = single compressed, this = batch compressed: the
        cache-refresh shape once the corpus outgrows even the pruned
        full-vector scan). Request-for-request it returns EXACTLY what
        sequential :meth:`search_approx` calls return (pinned in
        pytest): per-request filters run on the narrow corpus scan and
        semi-join the code table BEFORE ADC, so filtered-out rows never
        consume candidate slots; each request's candidates come only
        from ITS probed clusters (the mask rides inside the Arrow
        kernel); the exact rescore scores only (request, candidate)
        pairs, never another request's finds.

        One ADC scan serves every request that shares a filter body —
        expression and job growth are bounded by DISTINCT filters (the
        :meth:`search_batch` contract), and requests are grouped, so a
        10^4-request refresh with a handful of filter shapes costs a
        handful of passes over the 96 B/row code table. Returns
        (request_id, id, corpus columns, similarity, rank)."""
        from strava_vector_search_spark.functions.vector import (
            similarity,
        )
        from strava_vector_search_spark.operators import pq as PQ

        if self.pq_index is None:
            raise RuntimeError(
                "no PQ index: call attach_pq_index() before "
                "search_approx_batch()"
            )
        if self.embeddings is None:
            raise RuntimeError(
                "service not built: call build() or attach_embeddings()"
            )
        if not requests:
            raise ValueError("search_approx_batch: empty request list")
        books, codes, cents, meta = self.pq_index
        rows, compiled, _any_unfiltered = self._parse_batch_requests(
            requests, k_default
        )
        cand_parts = []
        for fid in sorted({r[3] for r in rows}):
            group = [r for r in rows if r[3] == fid]
            gcodes = codes
            if fid >= 0:
                keep_ids = self.corpus.filter(compiled[fid]).select(
                    self.id_col
                )
                gcodes = codes.join(keep_ids, self.id_col, "left_semi")
            gq = self.spark.createDataFrame(
                [(i, qv) for i, qv, _l, _f in group],
                "query_id bigint, query_vec array<double>",
            )
            from strava_vector_search_spark.operators.ann import (
                rank_probed_clusters,
            )

            probed: dict[int, set] = {i: set() for i, *_ in group}
            for r in rank_probed_clusters(cents, gq, nprobe).collect():
                probed[r["query_id"]].add(r["cluster"])
            union = sorted({c for cs in probed.values() for c in cs})
            # residual-stamped artifact (IVFADC): the batch kernel adds
            # the (Q × cells) q·centroid matrix — union-bounded collect
            centroid_vecs = None
            if meta.get("residual"):
                centroid_vecs = {
                    int(r["cluster"]): r["centroid"]
                    for r in cents.filter(
                        F.col("cluster").isin(union)
                    ).collect()
                }
            cand_parts.append(
                PQ.pq_candidates_batch(
                    gcodes.filter(
                        F.col(meta["cluster_col"]).isin(union)
                    ),
                    books,
                    [(i, qv) for i, qv, _l, _f in group],
                    probed,
                    n_cand=n_cand,
                    id_col=self.id_col,
                    cluster_col=meta["cluster_col"],
                    centroid_vecs=centroid_vecs,
                )
            )
        cand = reduce(lambda a, b: a.unionByName(b), cand_parts).select(
            F.col("query_id").cast("int").alias("request_id"),
            self.id_col,
        )
        limits_df = self.spark.createDataFrame(
            [(i, l) for i, _qv, l, _f in rows],
            "request_id int, _limit int",
        )
        qvec_df = self.spark.createDataFrame(
            [(i, qv) for i, qv, _l, _f in rows],
            "request_id int, _qv array<double>",
        )
        scored = (
            self.embeddings.join(F.broadcast(cand), self.id_col)
            .join(F.broadcast(qvec_df), "request_id")
            .withColumn(
                "similarity",
                similarity(
                    F.col("embedding"),
                    F.col("_qv"),
                    self.assume_normalized,
                ),
            )
        )
        w = Window.partitionBy("request_id").orderBy(
            F.desc("similarity"), F.asc(self.id_col)
        )
        ranked = (
            scored.withColumn(
                "rank", F.row_number().over(w).cast("bigint")
            )
            .join(F.broadcast(limits_df), "request_id")
            .filter(F.col("rank") <= F.col("_limit"))
            .drop("_qv", "_limit", "embedding")
        )
        cols = list(self.columns or self.corpus.columns)
        out_cols = [self.id_col] if self.id_col not in cols else []
        return ranked.join(self.corpus, self.id_col).select(
            "request_id", *out_cols, *cols, "similarity", "rank"
        )

    # -- query serve ---------------------------------------------------

    def search_json(self, request: dict | str) -> str:
        """The reference's wire shape verbatim: ``{"results": [...]}`` JSON
        (what SEARCH_PREVIEW returns and the caller FLATTENs, 01:207-219).
        Timestamps/bytes are stringified; floats kept as numbers."""
        rows = [r.asDict(recursive=True) for r in self.search(request).collect()]
        return json.dumps({"results": rows}, default=str)

    def search(self, request: dict | str) -> DataFrame:
        """Serve one JSON request {query|query_vec, columns, filter, limit}.

        Returns one row per hit: requested columns + similarity + rank —
        the flattened shape the reference builds with
        PARSE_JSON → ['results'] → FLATTEN (01:200-219).
        """
        if isinstance(request, str):
            request = json.loads(request)
        if self.embeddings is None:
            raise RuntimeError("service not built: call build() or attach_embeddings()")

        if "query_vec" in request:
            qv = [float(x) for x in request["query_vec"]]
        elif "query" in request:
            qv = [float(x) for x in hash_embed_text(self.spark, request["query"], self.dim)]
        else:
            raise FilterDSLError("request needs 'query' or 'query_vec'")

        limit = int(request.get("limit", 10))
        cols = list(request.get("columns", self.columns or self.corpus.columns))

        pred = None
        if request.get("filter"):
            attrs = set(self.attributes) if self.attributes else None
            pred = compile_filter(request["filter"], attrs)

        emb = self.embeddings
        base = self.corpus.join(emb, self.id_col)
        top = brute_force_topk(
            base,
            qv,
            k=limit,
            id_col=self.id_col,
            predicate=pred,
            assume_normalized=self.assume_normalized,
        )
        rank_w = F.row_number().over(
            Window.orderBy(F.desc("similarity"), F.asc(self.id_col))
        ).cast("bigint")
        out_cols = [self.id_col] if self.id_col not in cols else []
        return top.select(*out_cols, *cols, "similarity").withColumn("rank", rank_w)


# ---------------------------------------------------------------------------
# Catalog / introspection — SHOW/DESC CORTEX SEARCH SERVICES parity
# (01:190-193, 04:26,65-67). Spark tables go through spark.catalog; declared
# search services live in this process-level registry.

_REGISTRY: dict[str, SearchService] = {}


def register_service(name: str, svc: SearchService) -> SearchService:
    _REGISTRY[name] = svc
    return svc


def drop_service(name: str) -> bool:
    """DROP CORTEX SEARCH SERVICE equivalent (04:22-26)."""
    return _REGISTRY.pop(name, None) is not None


def show_services() -> list[dict]:
    """SHOW CORTEX SEARCH SERVICES (01:190)."""
    return [
        {"name": name, "search_col": s.search_col, "built": s.embeddings is not None}
        for name, s in sorted(_REGISTRY.items())
    ]


def describe_service(name: str) -> dict:
    """DESC CORTEX SEARCH SERVICE (01:193)."""
    s = _REGISTRY[name]
    return {
        "name": name,
        "id_col": s.id_col,
        "search_col": s.search_col,
        "attributes": list(s.attributes),
        "columns": list(s.columns),
        "dim": s.dim,
        "index_path": s.index_path,
        "built": s.embeddings is not None,
        "indexed_rows": s.embeddings.count() if s.embeddings is not None else 0,
    }


def build_request(
    query: str,
    columns: list[str] | None = None,
    filter_dsl: dict | None = None,
    limit: int = 10,
) -> str:
    """Compose the JSON request string the service consumes — the notebook's
    CONCAT-of-session-variables pattern (nb:156-161, F4/F15) done safely
    with json.dumps instead of string splicing."""
    req: dict = {"query": query, "limit": limit}
    if columns:
        req["columns"] = columns
    if filter_dsl:
        req["filter"] = filter_dsl
    return json.dumps(req)


# ---------------------------------------------------------------------------
# App-layer result caching + pre-warm — the reference's serving-side advice
# ("cache frequent query results app-side, TTL 5-10 min" 02:416-417, 02:435;
# "pre-warm" 02:424). Spark serves batch/interactive; these cover the
# interactive path.


class ResultCache:
    """TTL + LRU cache of COLLECTED search results, keyed by the canonical
    JSON of the request. Collected rows (not DataFrames) are cached — a
    cached lazy plan would re-execute on every use."""

    def __init__(self, max_entries: int = 256, ttl_seconds: float = 300.0, clock=None):
        import time as _time

        self.max_entries = max_entries
        self.ttl_seconds = ttl_seconds
        self._clock = clock or _time.monotonic
        self._data: dict[str, tuple[float, list]] = {}
        self.hits = 0
        self.misses = 0

    @staticmethod
    def key(request: dict | str) -> str:
        if isinstance(request, str):
            request = json.loads(request)
        return json.dumps(request, sort_keys=True)

    def get(self, request: dict | str):
        k = self.key(request)
        entry = self._data.get(k)
        if entry is None or self._clock() - entry[0] > self.ttl_seconds:
            if entry is not None:
                del self._data[k]
            self.misses += 1
            return None
        # LRU touch: move to the end
        self._data[k] = self._data.pop(k)
        self.hits += 1
        return entry[1]

    def put(self, request: dict | str, rows: list) -> None:
        k = self.key(request)
        self._data.pop(k, None)
        self._data[k] = (self._clock(), rows)
        while len(self._data) > self.max_entries:
            self._data.pop(next(iter(self._data)))  # evict oldest-used


def warm(svc: SearchService) -> SearchService:
    """Pre-warm (02:424): pin corpus + index in executor memory and
    materialize both, so first-query latency excludes the cold scan."""
    svc.corpus = svc.corpus.cache()
    svc.corpus.count()
    if svc.embeddings is not None:
        svc.embeddings = svc.embeddings.cache()
        svc.embeddings.count()
    return svc


def cached_search(
    svc: SearchService, request: dict | str, cache: ResultCache
) -> list:
    """search() with the app-layer cache in front: returns collected rows."""
    got = cache.get(request)
    if got is not None:
        return got
    rows = svc.search(request).collect()
    cache.put(request, rows)
    return rows


def search_many(
    svc: SearchService, requests: list[dict], k_default: int = 10
) -> DataFrame:
    """Serve MANY requests in ONE Spark job — the reference's 'batch
    multiple user queries together' (02:421) at the service layer.

    All query vectors ship as one broadcast table against a single corpus
    scan (operators.search.batch_topk); per-request filters are compiled
    into the scored stream as (request_id AND predicate) disjunctions so
    rows are only scored for the requests whose filters they pass. Returns
    (request_id, id, similarity, rank) — join back for payload columns.
    """
    from strava_vector_search_spark.functions.embed import hash_embed_text
    from strava_vector_search_spark.functions.vector import similarity as _similarity

    if svc.embeddings is None:
        raise RuntimeError("service not built: call build() or attach_embeddings()")

    rows = []
    max_k = k_default
    for i, req in enumerate(requests):
        if "query_vec" in req:
            qv = [float(x) for x in req["query_vec"]]
        else:
            qv = [float(x) for x in hash_embed_text(svc.spark, req["query"], svc.dim)]
        rows.append((i, qv))
        max_k = max(max_k, int(req.get("limit", k_default)))
    queries_df = svc.spark.createDataFrame(
        rows, "request_id int, query_vec array<double>"
    )

    # per-request predicates compile into ONE disjunction applied BEFORE
    # scoring/ranking (filter-then-rank, the reference's evaluation order —
    # a filtered-out row must not consume a rank slot)
    attrs = set(svc.attributes) if svc.attributes else None
    pre = []
    limits = []
    for i, req in enumerate(requests):
        c = F.col("request_id") == i
        if req.get("filter"):
            c = c & compile_filter(req["filter"], attrs)
        pre.append(c)
        limits.append(int(req.get("limit", k_default)))
    keep = pre[0]
    for c in pre[1:]:
        keep = keep | c

    base = svc.corpus.join(svc.embeddings, svc.id_col)
    candidates = base.join(F.broadcast(queries_df), how="cross").filter(keep)
    scored = candidates.withColumn(
        "similarity",
        _similarity(
            F.col("embedding"), F.col("query_vec"), svc.assume_normalized
        ),
    )
    w = Window.partitionBy("request_id").orderBy(
        F.desc("similarity"), F.asc(svc.id_col)
    )
    ranked = scored.withColumn(
        "rank", F.row_number().over(w).cast("bigint")
    ).drop("query_vec", "embedding")

    limit_conds = [
        (F.col("request_id") == i) & (F.col("rank") <= lim)
        for i, lim in enumerate(limits)
    ]
    lim_keep = limit_conds[0]
    for c in limit_conds[1:]:
        lim_keep = lim_keep | c
    return ranked.filter(lim_keep)
