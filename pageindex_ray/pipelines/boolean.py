"""Boolean retrieval: Lucene-style must / should / must_not composition.

Reference analogue: the reference's retrieval story is LLM node selection
over the tree (/root/reference/README.md:176-208); the deterministic engine
form of "select nodes satisfying constraints, ranked by relevance" is
boolean-filtered BM25 — the posting-list algebra every fulltext index ships:

    candidates = docs containing ALL must terms and NO must_not term
    score      = BM25 sum over (must + should) terms, identical float64
                 accumulation order as plain search
    result     = top-k of candidates under (score desc, doc_id asc)

Implementation lives on ``SearchEngine.boolean_search`` /
``boolean_search_batch`` (driver path) and ``RangeScorer.boolean_many``
(distributed path, engaged exactly like plain scoring): membership masks are
sorted-array searchsorted probes against the already-decoded posting ids, so
the filter costs no extra shard traffic beyond the term fetch itself.

This module holds the pure classification rule shared by the driver-gate
entry (__ray_entry__) and its DuckDB SQL twin, so both sides derive the
same (must, should, must_not) split from a query string.
"""

from __future__ import annotations


def classify_tokens(tokens: list[str]) -> tuple[list[str], list[str], list[str]]:
    """Deterministic (must, should, must_not) split of a query's SORTED
    DISTINCT token list — the driver-gate rule, mirrored term-for-term by
    the SQL twin's window-function classification:

      nt >= 4:  must = first 2 tokens, must_not = last token, rest should
      nt == 3:  must = first token,    must_not = last token, middle should
      nt == 2:  must = first token,    should = second
      nt <= 1:  must = everything
    """
    toks = sorted(set(tokens))
    nt = len(toks)
    n_must = 2 if nt >= 4 else 1
    must = toks[:n_must]
    if nt >= 3:
        return must, toks[n_must:-1], toks[-1:]
    return must, toks[n_must:], []
