"""Configurable multi-level hierarchy rollup over scored turns.

Round 3 scored at a FIXED ladder — turn / ``segment_span``-turn segment /
conversation (search.py ``_grouped_topk``). The reference's output is an
arbitrarily nested tree (``list_to_tree``,
/root/reference/pageindex/utils.py:354-400): a node's relevance is the sum
of its subtree, and drill-down picks the best child at each level. This
module generalizes the rollup to a caller-supplied ``spans`` spec: for each
top-k conversation, recursively select the best ``spans[0]``-turn segment,
then the best ``spans[1]``-turn segment INSIDE it, ..., then the best turn
inside the innermost segment — the tree drill-down as one vectorized pass.

Determinism contract (same as every scoring surface): per-doc scores arrive
accumulated in ascending-term order; group sums accumulate in ascending doc
order (``np.add.reduceat`` over the doc-sorted run); ties break on the
smallest key (conv_id asc / seg_start asc / turn_idx asc). The same function
runs on the driver (whole corpus) and inside each RangeScorer (its
conv-aligned slice) — ranges never split a conversation, so per-range
partials are complete conv rows and the driver merge is a plain top-k.
"""

from __future__ import annotations

import numpy as np


def validate_spans(spans) -> tuple[int, ...]:
    spans = tuple(int(s) for s in spans)
    if not spans:
        raise ValueError("spans must name at least one segment level")
    if any(s <= 0 for s in spans):
        raise ValueError(f"spans must be positive, got {spans}")
    for a, b in zip(spans, spans[1:]):
        if a % b != 0 or b >= a:
            raise ValueError(
                f"each span must strictly divide its parent (got {spans}): "
                "floor-aligned child segments must nest inside one parent segment"
            )
    return spans


def empty_tree(n_levels: int) -> dict:
    out = {"conv_id": np.empty(0, dtype=object), "conv_score": np.empty(0, np.float64)}
    for i in range(n_levels):
        out[f"l{i + 1}_start"] = np.empty(0, np.int64)
        out[f"l{i + 1}_score"] = np.empty(0, np.float64)
    out["turn_idx"] = np.empty(0, np.int64)
    out["turn_score"] = np.empty(0, np.float64)
    return out


def tree_rollup(docs, scores, bases, names_at, spans, k: int, agg: str = "sum") -> dict:
    """docs: ascending absolute doc ids of scored turns; scores aligned.
    bases: ascending conv base doc ids covering every doc; names_at(rows) ->
    conv_id object array for the given base rows. Returns column arrays for
    the top-k conversations (conv score ``agg`` over matching turns, ties
    conv_id asc) with the best-segment drill-down per level and the best
    turn; all groups aggregate ONLY matching turns (SQL-twin semantics)."""
    spans = validate_spans(spans)
    docs = np.asarray(docs, dtype=np.int64)
    scores = np.asarray(scores, dtype=np.float64)
    if not len(docs):
        return empty_tree(len(spans))
    red = np.maximum.reduceat if agg == "max" else np.add.reduceat

    conv_rows = np.searchsorted(bases, docs, side="right") - 1
    grp_rows, starts = np.unique(conv_rows, return_index=True)
    conv_scores = red(scores, starts)
    names = names_at(grp_rows)
    order = np.lexsort((names, -conv_scores))[: int(k)]

    n_out = len(order)
    out = empty_tree(len(spans))
    out["conv_id"] = names[order]
    out["conv_score"] = conv_scores[order]
    for key in out:
        if key not in ("conv_id", "conv_score"):
            out[key] = np.zeros(n_out, dtype=out[key].dtype)

    ends = np.append(starts[1:], len(docs))
    for oi, g in enumerate(order):
        s, e = starts[g], ends[g]
        turn = docs[s:e] - bases[grp_rows[g]]
        val = scores[s:e]
        win_lo, win_hi = 0, np.iinfo(np.int64).max
        for li, span in enumerate(spans):
            m = (turn >= win_lo) & (turn < win_hi)
            t_m, v_m = turn[m], val[m]
            seg = (t_m // span) * span
            # turns ascending within the conv => seg groups contiguous
            seg_u, seg_starts = np.unique(seg, return_index=True)
            seg_scores = red(v_m, seg_starts)
            best = np.lexsort((seg_u, -seg_scores))[0]
            out[f"l{li + 1}_start"][oi] = seg_u[best]
            out[f"l{li + 1}_score"][oi] = seg_scores[best]
            win_lo, win_hi = int(seg_u[best]), int(seg_u[best]) + span
        m = (turn >= win_lo) & (turn < win_hi)
        t_m, v_m = turn[m], val[m]
        best = np.lexsort((t_m, -v_m))[0]
        out["turn_idx"][oi] = t_m[best]
        out["turn_score"][oi] = v_m[best]
    return out


def merge_tree_partials(partials: list[dict], k: int) -> dict | None:
    """Concatenate complete per-range conv rows and take the global top-k
    under the identical (conv_score desc, conv_id asc) tie-break."""
    live = [p for p in partials if p is not None and len(p["conv_id"])]
    if not live:
        return None
    cat = {key: np.concatenate([p[key] for p in live]) for key in live[0]}
    order = np.lexsort((cat["conv_id"], -cat["conv_score"]))[: int(k)]
    return {key: v[order] for key, v in cat.items()}
