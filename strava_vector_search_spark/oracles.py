"""DuckDB oracle SQL twins for every entry in
:mod:`strava_vector_search_spark.queries`.

Tables ``region nation customer supplier part orders lineitem events
documents embeddings`` are pre-registered views over the same parquet files
the Spark queries read. Column aliases match the Spark output exactly (the
driver sorts columns by name before hashing values).

Cosine parity: ``list_cosine_similarity`` on ``DOUBLE[]`` matches the Spark
fold-based expression bit-for-bit after ROUND(…, 6) (verified empirically at
sf0.01 — 0 mismatches across 500 vectors, both for the builtin and for the
explicit dot/norm formulation).
"""

from __future__ import annotations

# the corpus-with-vectors join used by all vector-search oracles
_CORPUS = """
  corpus AS (
    SELECT d.*, e.embedding::DOUBLE[] AS emb
    FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
    WHERE e.embedding IS NOT NULL
  )
"""


def _qvec(vec_id: int) -> str:
    return f"(SELECT embedding::DOUBLE[] FROM embeddings WHERE vec_id = {vec_id})"


def _sim(vec_id: int, emb: str = "emb") -> str:
    return f"ROUND(list_cosine_similarity({emb}, {_qvec(vec_id)}), 6)"


ORACLES: dict[str, str] = {}

ORACLES["vs_topk_filtered"] = f"""
WITH {_CORPUS}
SELECT doc_id, lang, source,
       ROUND(n_chars / 1000.0, 3) AS kchars,
       LEFT(text, 80) AS text_preview,
       {_sim(0)} AS similarity
FROM corpus
WHERE lang IN ('en','de') AND n_chars BETWEEN 100 AND 450 AND doc_id <> 0
ORDER BY similarity DESC, doc_id ASC
LIMIT 10
"""

ORACLES["vs_topk_threshold_decision"] = f"""
WITH {_CORPUS},
topk AS (
  SELECT doc_id, lang, {_sim(1)} AS similarity
  FROM corpus WHERE doc_id <> 1
  ORDER BY similarity DESC, doc_id ASC
  LIMIT 25
)
SELECT doc_id, lang, similarity,
       CASE WHEN similarity > 0.80 THEN 'CACHE HIT - Excellent Match'
            WHEN similarity > 0.70 THEN 'CACHE HIT - Good Match'
            ELSE 'CACHE MISS - Generate New' END AS cache_decision
FROM topk WHERE similarity > 0.0
"""

ORACLES["vs_similarity_histogram"] = f"""
WITH {_CORPUS},
scored AS (SELECT {_sim(2)} AS s FROM corpus)
SELECT CASE WHEN s >= 0.90 THEN '0.90+ (Excellent)'
            WHEN s >= 0.80 THEN '0.80-0.89 (Likely hit)'
            WHEN s >= 0.70 THEN '0.70-0.79 (Consider)'
            WHEN s >= 0.50 THEN '0.50-0.69 (Weak)'
            ELSE '< 0.50 (Miss)' END AS similarity_range,
       COUNT(*) AS n_docs
FROM scored
GROUP BY 1
ORDER BY n_docs DESC, similarity_range ASC
"""

ORACLES["vs_topk_join_back"] = f"""
WITH {_CORPUS},
topk AS (
  SELECT doc_id, {_sim(3)} AS similarity
  FROM corpus WHERE doc_id <> 3
  ORDER BY similarity DESC, doc_id ASC
  LIMIT 3
)
SELECT t.doc_id, d.lang, d.n_chars,
       LEFT(d.text, 120) AS text_preview, t.similarity
FROM topk t JOIN documents d ON t.doc_id = d.doc_id
"""

ORACLES["vs_batch_topk"] = f"""
WITH {_CORPUS},
queries AS (
  SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
  FROM embeddings WHERE vec_id < 5
),
scored AS (
  SELECT q.query_id, c.doc_id, c.lang,
         ROUND(list_cosine_similarity(c.emb, q.qv), 6) AS similarity
  FROM corpus c CROSS JOIN queries q
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (
      PARTITION BY query_id ORDER BY similarity DESC, doc_id ASC) AS rank
  FROM scored
)
SELECT query_id, doc_id, lang, similarity, rank
FROM ranked WHERE rank <= 3
"""

ORACLES["a1_distribution_report"] = """
SELECT lang, source, COUNT(*) AS n_docs, ROUND(AVG(n_chars), 0) AS avg_chars
FROM documents
GROUP BY lang, source
ORDER BY lang, source
"""

ORACLES["a2_global_count"] = "SELECT COUNT(*) AS n_rows FROM documents"

ORACLES["a3_count_col_nulls"] = """
SELECT COUNT(*) AS n_total,
       COUNT(NULLIF(event_type, 'click')) AS n_nonclick,
       ROUND(100.0 * COUNT(NULLIF(event_type, 'click')) / COUNT(*), 1)
         AS pct_nonclick
FROM events
"""

ORACLES["a4_conditional_agg"] = """
SELECT COUNT(*) AS n_rows,
       SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS n_returned,
       ROUND(100.0 * SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
             / COUNT(*), 1) AS pct_returned
FROM lineitem
"""

ORACLES["a5_histogram_case_bucketing"] = """
SELECT CASE WHEN n_chars >= 450 THEN '450+'
            WHEN n_chars >= 300 THEN '300-449'
            WHEN n_chars >= 150 THEN '150-299'
            ELSE '< 150' END AS length_range,
       COUNT(*) AS n_docs
FROM documents
GROUP BY 1
ORDER BY n_docs DESC, length_range ASC
"""

ORACLES["p_predicates_projection"] = """
SELECT doc_id, lang, source,
       LEFT(text, 50) AS preview,
       ROUND(n_chars / 100.0, 2) AS hecto_chars,
       NULLIF(lang, 'en') AS lang_non_en,
       TRY_CAST(substr(source, 4, 5) AS INTEGER) AS source_num,
       n_chars::BIGINT AS n_chars_long
FROM documents
WHERE (lang = 'en'
       OR (source IN ('src1','src2','src3') AND n_chars BETWEEN 150 AND 400))
  AND text IS NOT NULL
ORDER BY lang, source, doc_id
"""

ORACLES["j3_explode_tokens"] = """
SELECT token, COUNT(*) AS n
FROM (
  SELECT unnest(string_split_regex(lower(text), '[^a-z0-9]+')) AS token
  FROM documents
)
WHERE token <> ''
GROUP BY token
ORDER BY n DESC, token ASC
LIMIT 20
"""

ORACLES["f_json_extract"] = """
SELECT event_type, COUNT(*) AS n,
       ROUND(AVG(k), 4) AS avg_k, MIN(k) AS min_k, MAX(k) AS max_k
FROM (
  SELECT event_type, TRY_CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
  FROM events
)
WHERE k IS NOT NULL
GROUP BY event_type
ORDER BY event_type
"""

ORACLES["q1_pricing_summary"] = """
SELECT l_returnflag, l_linestatus,
       ROUND(SUM(l_quantity::DECIMAL(18,6))::DOUBLE, 2) AS sum_qty,
       ROUND(SUM(l_extendedprice::DECIMAL(18,6))::DOUBLE, 2) AS sum_base_price,
       ROUND(SUM(l_extendedprice::DECIMAL(18,6)
                 * (1::DECIMAL(18,6) - l_discount::DECIMAL(18,6)))::DOUBLE, 2)
         AS sum_disc_price,
       ROUND(SUM(l_quantity::DECIMAL(18,6))::DOUBLE / COUNT(l_quantity), 4)
         AS avg_qty,
       ROUND(SUM(l_extendedprice::DECIMAL(18,6))::DOUBLE
             / COUNT(l_extendedprice), 4) AS avg_price,
       ROUND(SUM(l_discount::DECIMAL(18,6))::DOUBLE / COUNT(l_discount), 4)
         AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""

ORACLES["q3_shipping_priority"] = """
SELECT o_orderkey, o_orderdate,
       ROUND(SUM(l_extendedprice::DECIMAL(18,6)
                 * (1::DECIMAL(18,6) - l_discount::DECIMAL(18,6)))::DOUBLE, 2)
         AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1995-03-15'
  AND l_shipdate > TIMESTAMP '1995-03-15'
GROUP BY o_orderkey, o_orderdate
ORDER BY revenue DESC, o_orderkey ASC
LIMIT 10
"""

ORACLES["q5_broadcast_dims"] = """
SELECT n_name,
       ROUND(SUM(l_extendedprice::DECIMAL(18,6)
                 * (1::DECIMAL(18,6) - l_discount::DECIMAL(18,6)))::DOUBLE, 2)
         AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
GROUP BY n_name
ORDER BY revenue DESC, n_name ASC
"""
