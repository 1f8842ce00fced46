"""RAG orchestration glue — the notebook's Q4/Q5 flows
(``03_cortex_search_demo_notebook.ipynb`` nb:338-445 "search then modify via
LLM", nb:453-640 "two searches then coach recommendation").

This is API-layer composition, not engine (SURVEY §3 EP3): search →
format prompt → ``complete(model, prompt)`` → result. The LLM is a
pluggable callable (the reference's ``SNOWFLAKE.CORTEX.COMPLETE``,
nb:382-385); tests inject a deterministic stub. Prompt values are passed
as plain Python strings — never spliced into SQL (the notebook's manual
``.replace("'", "''")`` escaping, nb:377-379, is unnecessary by design).
"""

from __future__ import annotations

from collections.abc import Callable

from strava_vector_search_spark.service import SearchService

CompleteFn = Callable[[str, str], str]  # (model, prompt) -> completion


def stub_complete(model: str, prompt: str) -> str:
    """Deterministic test stub for the LLM call."""
    return f"[{model}] {len(prompt)} chars: {prompt[:80]}"


def search_and_modify(
    svc: SearchService,
    query: str,
    modification: str,
    complete: CompleteFn = stub_complete,
    model: str = "stub-model",
    text_col: str = "text",
) -> dict:
    """Q4 flow (nb:338-445): top-1 search, then ask the LLM to modify the
    hit per the user's request. Empty-result guard mirrors nb:491-493."""
    hits = svc.search({"query": query, "limit": 1}).collect()
    if not hits:
        return {"error": "no cached workout found", "query": query}
    hit = hits[0].asDict()
    prompt = (
        f"Here is a workout:\n{hit.get(text_col, '')}\n\n"
        f"Modify it as follows: {modification}\nReturn the modified workout."
    )
    return {
        "base_id": hit[svc.id_col],
        "similarity": hit["similarity"],
        "completion": complete(model, prompt),
    }


def recommend_harder(
    svc: SearchService,
    completed_query: str,
    candidate_filter: dict | None = None,
    k: int = 3,
    complete: CompleteFn = stub_complete,
    model: str = "stub-model",
    text_col: str = "text",
) -> dict:
    """Q5 flow (nb:453-640): find the workout the athlete completed, search
    harder candidates, ask the LLM to recommend one of them."""
    done = svc.search({"query": completed_query, "limit": 1}).collect()
    if not done:
        return {"error": "completed workout not found", "query": completed_query}
    base = done[0].asDict()

    req: dict = {"query": completed_query, "limit": k + 1}
    if candidate_filter:
        req["filter"] = candidate_filter
    cands = [
        r.asDict()
        for r in svc.search(req).collect()
        if r[svc.id_col] != base[svc.id_col]
    ][:k]
    if not cands:
        return {"error": "no harder candidates found", "base_id": base[svc.id_col]}

    options = "\n\n".join(
        f"Option {i + 1}:\n{c.get(text_col, '')}" for i, c in enumerate(cands)
    )
    prompt = (
        f"The athlete completed:\n{base.get(text_col, '')}\n\n"
        f"Recommend ONE of these harder options and explain why:\n{options}"
    )
    return {
        "base_id": base[svc.id_col],
        "candidate_ids": [c[svc.id_col] for c in cands],
        "completion": complete(model, prompt),
    }
