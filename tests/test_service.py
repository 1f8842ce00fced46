from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from strava_vector_search_spark.service import (
    FilterDSLError,
    SearchService,
    compile_filter,
)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [
            (1, "interval run workout speed training", "run", "hard", 5000),
            (2, "easy recovery jog gentle pace", "run", "easy", 4000),
            (3, "endurance ride moderate cycling", "ride", "moderate", 40000),
            (4, "hill repeats very hard climbing ride", "ride", "very hard", 30000),
            (5, "hill repeats very hard climbing ride", "ride", "very_hard", 30000),
            (6, "swimming technique drills", "swim", "easy", 1500),
        ],
        "doc_id int, text string, sport_type string, difficulty string, distance_meters int",
    )


@pytest.fixture(scope="module")
def svc(spark, docs):
    return SearchService(
        spark,
        docs,
        id_col="doc_id",
        search_col="text",
        attributes=("sport_type", "difficulty", "distance_meters"),
        dim=32,
    ).build()


class TestFilterDSL:
    def test_eq(self, docs):
        got = docs.filter(compile_filter({"@eq": {"sport_type": "run"}})).count()
        assert got == 2

    def test_range_and(self, docs):
        f = {
            "@and": [
                {"@gte": {"distance_meters": 4500}},
                {"@lte": {"distance_meters": 30000}},
            ]
        }
        rows = docs.filter(compile_filter(f)).collect()
        assert sorted(r["doc_id"] for r in rows) == [1, 4, 5]

    def test_nested_and_or_spelling_wrinkle(self, docs):
        # the reference's 'very hard'/'very_hard' inconsistency (SURVEY §1.3):
        # queries must OR both spellings to survive it (nb:513-515)
        f = {
            "@and": [
                {"@eq": {"sport_type": "ride"}},
                {
                    "@or": [
                        {"@eq": {"difficulty": "very hard"}},
                        {"@eq": {"difficulty": "very_hard"}},
                    ]
                },
            ]
        }
        rows = docs.filter(compile_filter(f)).collect()
        assert sorted(r["doc_id"] for r in rows) == [4, 5]

    def test_not_and_in(self, docs):
        f = {"@not": {"@in": {"sport_type": ["run", "ride"]}}}
        rows = docs.filter(compile_filter(f)).collect()
        assert [r["doc_id"] for r in rows] == [6]

    def test_undeclared_attribute_rejected(self):
        with pytest.raises(FilterDSLError, match="not filterable"):
            compile_filter({"@eq": {"text": "x"}}, attributes={"sport_type"})

    def test_malformed_nodes_rejected(self):
        for bad in (
            {"@unknown": {"a": 1}},
            {"@and": []},
            {"@eq": {"a": 1, "b": 2}},
            {},
            "not a dict",
        ):
            with pytest.raises(FilterDSLError):
                compile_filter(bad)  # type: ignore[arg-type]


class TestSearchService:
    def test_text_query_returns_ranked_hits(self, svc):
        out = svc.search(
            {"query": "interval run workout speed training", "limit": 3}
        ).collect()
        assert len(out) == 3
        assert out[0]["doc_id"] == 1  # exact text match ranks first
        assert [r["rank"] for r in out] == [1, 2, 3]
        assert out[0]["similarity"] == pytest.approx(1.0, abs=1e-4)

    def test_filtered_search_excludes_nonmatching(self, svc):
        out = svc.search(
            {
                "query": "hard workout",
                "filter": {"@eq": {"sport_type": "ride"}},
                "columns": ["sport_type", "difficulty"],
                "limit": 10,
            }
        ).collect()
        assert 0 < len(out) <= 3
        assert all(r["sport_type"] == "ride" for r in out)

    def test_json_string_request(self, svc):
        out = svc.search(
            '{"query": "swimming drills", "limit": 1, "columns": ["sport_type"]}'
        ).collect()
        assert len(out) == 1
        assert out[0]["sport_type"] == "swim"

    def test_unbuilt_service_raises(self, spark, docs):
        s = SearchService(spark, docs, id_col="doc_id", search_col="text")
        with pytest.raises(RuntimeError, match="not built"):
            s.search({"query": "x"})

    def test_index_persistence(self, spark, docs, tmp_path):
        path = str(tmp_path / "emb_index")
        s = SearchService(
            spark, docs, id_col="doc_id", search_col="text", dim=16, index_path=path
        ).build()
        assert s.embeddings is not None
        reread = spark.read.parquet(path)
        assert reread.count() == docs.count()
        assert dict(reread.dtypes)["embedding"] == "array<float>"


def test_search_json_wire_shape(svc):
    import json

    out = json.loads(
        svc.search_json({"query": "swimming technique drills", "limit": 2,
                         "columns": ["sport_type"]})
    )
    assert set(out) == {"results"}
    assert len(out["results"]) == 2
    hit = out["results"][0]
    assert hit["sport_type"] == "swim"
    assert hit["rank"] == 1 and isinstance(hit["similarity"], float)


def test_search_many_single_job_batching(spark, svc):
    from strava_vector_search_spark.service import search_many

    requests = [
        {"query": "interval run workout speed training", "limit": 2},
        {
            "query": "hard climbing",
            "filter": {"@eq": {"sport_type": "ride"}},
            "limit": 3,
        },
    ]
    out = search_many(svc, requests)
    by_req = {}
    for r in out.collect():
        by_req.setdefault(r["request_id"], []).append(r)
    assert len(by_req[0]) == 2
    # request 0's top hit is the exact text match
    top0 = min(by_req[0], key=lambda r: r["rank"])
    assert top0["doc_id"] == 1
    # request 1's hits all satisfy its own filter
    assert all(r["sport_type"] == "ride" for r in by_req[1])
    assert len(by_req[1]) <= 3


def test_search_many_filter_before_rank(spark, svc):
    # the filtered request must fill its limit from FILTERED docs even when
    # unfiltered docs dominate the global ranking (filter-then-rank order)
    from strava_vector_search_spark.service import search_many

    out = search_many(
        svc,
        [
            {
                "query": "interval run workout speed training",
                "filter": {"@eq": {"sport_type": "ride"}},
                "limit": 3,
            }
        ],
    ).collect()
    # 3 ride docs exist; despite run docs scoring higher globally, all 3
    # slots must be rides with ranks 1..3
    assert len(out) == 3
    assert all(r["sport_type"] == "ride" for r in out)
    assert sorted(r["rank"] for r in out) == [1, 2, 3]


class TestSearchBatchIVF:
    """search_batch over the materialized IVF layout: with nprobe covering
    EVERY cluster the IVF batch path loses nothing, so each request's
    slice must equal the brute-force search() result value-for-value
    (batch == N sequential searches); smaller nprobe stays
    batch-invariant (one batch == singleton batches unioned)."""

    @pytest.fixture(scope="class")
    def ivf_svc(self, spark, docs, tmp_path_factory):
        svc = SearchService(
            spark,
            docs,
            id_col="doc_id",
            search_col="text",
            attributes=("sport_type", "difficulty", "distance_meters"),
            dim=32,
            # hash embeddings are unit vectors, but route BOTH paths
            # through full cosine so search() and the IVF scorer share
            # one similarity expression exactly
            assume_normalized=False,
        ).build()
        path = str(tmp_path_factory.mktemp("svcivf") / "idx")
        return svc.build_ivf(path, cluster_col="sport_type")

    REQUESTS = [
        {"query": "hard workout", "limit": 3},
        {
            "query": "recovery ride",
            "filter": {"@gte": {"distance_meters": 4000}},
            "limit": 2,
        },
        {
            "query": "drills",
            "filter": {"@eq": {"sport_type": "swim"}},
            "limit": 5,
        },
    ]

    @staticmethod
    def _rows(df):
        return [
            (r["doc_id"], r["similarity"], r["rank"])
            for r in df.orderBy("rank").collect()
        ]

    def test_batch_equals_sequential_search_at_full_probe(self, ivf_svc):
        batch = ivf_svc.search_batch(self.REQUESTS, nprobe=3)
        for i, req in enumerate(self.REQUESTS):
            got = self._rows(batch.filter(F.col("request_id") == i))
            want = self._rows(ivf_svc.search(req))
            assert got == want, f"request {i}"

    def test_batch_invariance_under_pruning(self, ivf_svc):
        batch = ivf_svc.search_batch(self.REQUESTS, nprobe=1)
        for i, req in enumerate(self.REQUESTS):
            got = self._rows(batch.filter(F.col("request_id") == i))
            want = self._rows(ivf_svc.search_batch([req], nprobe=1))
            assert got == want, f"request {i}"

    def test_search_batch_without_layout_raises(self, spark, docs):
        svc = SearchService(
            spark, docs, id_col="doc_id", search_col="text", dim=32
        ).build()
        with pytest.raises(RuntimeError, match="build_ivf"):
            svc.search_batch([{"query": "x"}])

    def test_build_ivf_two_phase_fit_matches_full_probe_search(
        self, spark, tmp_path
    ):
        """fit_fraction < 1 (the production sample-fit + map-side
        assign build): every row lands in a fitted cell, the centroid
        artifact matches the cell set, and full-probe search_batch
        equals the brute-force search() on the same corpus."""
        import os

        docs = spark.createDataFrame(
            [
                (i, f"alpha{i % 13} beta{i % 5} gamma{i % 3}", "x")
                for i in range(1, 500)
            ],
            "doc_id int, text string, kind string",
        )
        svc = SearchService(
            spark,
            docs,
            id_col="doc_id",
            search_col="text",
            dim=32,
            assume_normalized=False,
        ).build()
        path = str(tmp_path / "idx2p")
        svc.build_ivf(
            path, n_clusters=8, seed=5, fit_fraction=0.3, max_iter=5
        )
        part = spark.read.parquet(path)
        cents = spark.read.parquet(os.path.join(path, "_centroids"))
        cell_set = {r["cluster"] for r in cents.select("cluster").collect()}
        assert part.count() == svc.embeddings.count()
        assert {
            r["cluster"] for r in part.select("cluster").distinct().collect()
        } <= cell_set
        assert len(cell_set) <= 8
        req = {"query": "alpha3 beta2", "limit": 5}
        got = [
            (r["doc_id"], r["similarity"], r["rank"])
            for r in svc.search_batch([req], nprobe=len(cell_set))
            .orderBy("rank")
            .collect()
        ]
        want = [
            (r["doc_id"], r["similarity"], r["rank"])
            for r in svc.search(req).orderBy("rank").collect()
        ]
        assert got == want

    def test_production_batch_size_bounded_plan(self, ivf_svc):
        """1,000 requests through one search_batch: the expression tree
        must grow with DISTINCT filter bodies (3 here), not requests —
        the old shape OR-reduced one predicate per request for both the
        DSL filters and the limit cut, so Catalyst analysis time blew up
        linearly in batch size. Pins (a) no per-request predicate in the
        optimized plan, (b) value parity with sequential search() on a
        sample, (c) per-request limits still honored."""
        import time

        from strava_vector_search_spark.functions.embed import (
            hash_embed_text,
        )

        filters = [
            None,
            {"@eq": {"sport_type": "run"}},
            {"@gte": {"distance_meters": 4000}},
            {"@and": [
                {"@eq": {"sport_type": "ride"}},
                {"@lte": {"distance_meters": 35000}},
            ]},
        ]
        texts = ["hard workout", "recovery ride", "drills", "hill climb"]
        vecs = [hash_embed_text(ivf_svc.spark, t, dim=32) for t in texts]
        reqs = []
        for i in range(1000):
            req = {"query_vec": vecs[i % 4], "limit": 1 + i % 4}
            if filters[i % 4]:
                req["filter"] = filters[i % 4]
            reqs.append(req)
        t0 = time.monotonic()
        batch = ivf_svc.search_batch(reqs, nprobe=3)
        plan = batch._jdf.queryExecution().optimizedPlan().toString()
        analysis_sec = time.monotonic() - t0
        # structural: the limit cut and filter routing are data-joined,
        # not compiled per request — the old shape mentioned request_id
        # in >=2000 predicate terms ((request_id = i) per filter and per
        # limit cut); now it appears only as join/window attribute refs
        # (a handful), and the filter union has one branch per DISTINCT
        # filter body (3 + the unfiltered branch), not per request
        assert plan.count("request_id") < 100, plan.count("request_id")
        assert plan.count("_filter_id") < 40, plan.count("_filter_id")
        # and analysis stays interactive (the per-request OR chain took
        # minutes at this size; generous bound for loaded CI machines)
        assert analysis_sec < 60, f"plan analysis took {analysis_sec:.1f}s"
        out = batch.collect()
        by_req = {}
        for r in out:
            by_req.setdefault(r["request_id"], []).append(r)
        # per-request limits honored
        for i, rows in by_req.items():
            assert len(rows) <= 1 + i % 4
        # value parity with the sequential path on a sample (nprobe=3
        # covers every cluster, so the batch path loses nothing)
        for i in (0, 1, 2, 3, 997, 998, 999):
            got = sorted(
                (r["doc_id"], r["similarity"], r["rank"])
                for r in by_req.get(i, [])
            )
            want = sorted(
                (r["doc_id"], r["similarity"], r["rank"])
                for r in ivf_svc.search(reqs[i]).collect()
            )
            assert got == want, f"request {i}"


class TestSearchApproxPQ:
    def test_requires_attached_index_and_build(self, spark, docs):
        svc = SearchService(
            spark, docs, id_col="doc_id", search_col="text", dim=32
        ).build()
        with pytest.raises(RuntimeError, match="attach_pq_index"):
            svc.search_approx({"query": "x"})

    def test_refuses_plain_pq_artifact(self, spark, docs, tmp_path):
        """search_approx needs the coarse quantizer — a plain PQ artifact
        (no centroids/cluster) is refused at attach, not at query time."""
        from strava_vector_search_spark.functions.embed import (
            hash_embedding_table,
        )
        from strava_vector_search_spark.operators import pq as PQ

        emb = hash_embedding_table(docs, "doc_id", "text", dim=32)
        books = PQ.train_codebooks(emb, m=8, id_col="doc_id")
        codes = PQ.encode_pq(emb, books, id_col="doc_id")
        path = str(tmp_path / "plainpq")
        PQ.write_pq_index(codes, books, path, id_col="doc_id")
        svc = SearchService(
            spark, docs, id_col="doc_id", search_col="text", dim=32
        ).build()
        with pytest.raises(ValueError, match="coarse quantizer"):
            svc.attach_pq_index(path)

    @pytest.fixture(scope="class")
    def pq_svc(self, spark, tmp_path_factory):
        """Service with a working IVF+PQ artifact attached: 200 docs,
        4 learned coarse cells, m=8 codes over dim-32 hash embeddings."""
        from strava_vector_search_spark.operators import pq as PQ
        from strava_vector_search_spark.operators.ann import (
            compute_centroids,
            kmeans_assign,
        )

        corpus = spark.createDataFrame(
            [
                (
                    i,
                    f"theta{i % 19} iota{i % 7} kappa{i % 4}",
                    "run" if i % 2 else "ride",
                    1000 * (i % 9),
                )
                for i in range(1, 201)
            ],
            "doc_id int, text string, sport_type string, "
            "distance_meters int",
        )
        svc = SearchService(
            spark,
            corpus,
            id_col="doc_id",
            search_col="text",
            attributes=("sport_type", "distance_meters"),
            dim=32,
            assume_normalized=False,
        ).build()
        emb = kmeans_assign(svc.embeddings, num_clusters=4, seed=3)
        books = PQ.train_codebooks(emb, m=8, id_col="doc_id")
        codes = PQ.encode_pq(
            emb, books, id_col="doc_id", keep_cols=("cluster",)
        )
        path = str(tmp_path_factory.mktemp("pq") / "idx")
        PQ.write_pq_index(
            codes, books, path, id_col="doc_id", cluster_col="cluster",
            centroids=compute_centroids(emb, "cluster"),
        )
        return svc.attach_pq_index(path)

    APPROX_REQS = [
        {"query": "theta3 iota2", "limit": 4},
        {
            "query": "kappa1",
            "filter": {"@eq": {"sport_type": "run"}},
            "limit": 3,
        },
        {
            "query": "iota5 kappa2",
            "filter": {"@gte": {"distance_meters": 4000}},
            "limit": 5,
        },
        # shares request 1's filter body — must reuse its ADC pass
        {
            "query": "theta7",
            "filter": {"@eq": {"sport_type": "run"}},
            "limit": 2,
        },
    ]

    def test_approx_batch_equals_sequential_approx(self, pq_svc):
        """Request-for-request parity: one search_approx_batch call ==
        N sequential search_approx calls (same probe rule, same ADC
        candidates, same exact rescore) across filtered, unfiltered,
        and filter-sharing requests."""
        batch = pq_svc.search_approx_batch(
            self.APPROX_REQS, nprobe=2, n_cand=20
        ).collect()
        by_req = {}
        for r in batch:
            by_req.setdefault(r["request_id"], []).append(
                (r["doc_id"], r["similarity"], r["rank"])
            )
        for i, req in enumerate(self.APPROX_REQS):
            got = sorted(by_req.get(i, []))
            want = sorted(
                (r["doc_id"], r["similarity"], r["rank"])
                for r in pq_svc.search_approx(
                    req, nprobe=2, n_cand=20
                ).collect()
            )
            assert got == want, f"request {i}"

    def test_approx_batch_requires_artifact(self, spark, docs):
        svc = SearchService(
            spark, docs, id_col="doc_id", search_col="text", dim=32
        ).build()
        with pytest.raises(RuntimeError, match="attach_pq_index"):
            svc.search_approx_batch([{"query": "x"}])

    def test_id_col_mismatch_refused(self, spark, docs, tmp_path):
        from strava_vector_search_spark.functions.embed import (
            hash_embedding_table,
        )
        from strava_vector_search_spark.operators import pq as PQ
        from strava_vector_search_spark.operators.ann import (
            compute_centroids,
            kmeans_assign,
        )

        emb = kmeans_assign(
            hash_embedding_table(docs, "doc_id", "text", dim=32),
            num_clusters=2,
            seed=1,
        )
        books = PQ.train_codebooks(emb, m=8, id_col="doc_id")
        codes = PQ.encode_pq(
            emb, books, id_col="doc_id", keep_cols=("cluster",)
        )
        path = str(tmp_path / "pqidx")
        PQ.write_pq_index(
            codes, books, path, id_col="doc_id", cluster_col="cluster",
            centroids=compute_centroids(emb, "cluster"),
        )
        svc = SearchService(
            spark,
            docs.withColumnRenamed("doc_id", "item_id"),
            id_col="item_id",
            search_col="text",
            dim=32,
        ).build()
        with pytest.raises(ValueError, match="id_col"):
            svc.attach_pq_index(path)
