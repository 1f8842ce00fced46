"""strava_vector_search_spark — a PySpark-native analytics + vector-search engine.

Re-implements, Spark-first, the full query surface of the reference repo
``aryeung0/strava_vector_search`` (a Snowflake semantic-search-as-cache demo):

* document ingest with typed CSV load semantics (reference
  ``01_method1_cortex_search.sql:111-142``),
* brute-force filtered cosine top-k ("method 2",
  ``02_method2_manual_vector_embedding.sql:206-227``),
* a search-service API with a JSON filter DSL ("method 1",
  ``01_method1_cortex_search.sql:200-219``),
* the surrounding analytics (distribution reports, pct-embedded checks,
  similarity histograms, cache-decision labelling),
* plus the LLM-data-pipeline extensions (dedup, ANN, text analysis,
  multimodal plumbing) designed for 100 TB scale.

Design stance: DataFrame/SQL-declarative everywhere so Catalyst handles
predicate pushdown, column pruning, partial aggregation and top-k
(``TakeOrderedAndProject``); Python UDFs only where semantics demand
(embedding models, multimodal decode) and then always Arrow-batched.
"""

__version__ = "0.1.0"

from strava_vector_search_spark.session import get_spark  # noqa: F401
