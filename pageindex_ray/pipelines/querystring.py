"""Query-string language: one string composing the whole retrieval surface.

Reference analogue: the reference exposes ONE natural-language query door
and lets the LLM decompose it against the tree
(/root/reference/README.md:176-208); the deterministic engine form is
Lucene's query-string syntax — a single user-facing string that compiles
onto the primitives this engine already serves (boolean algebra, exact
phrase via the positional sidecar, prefix / fuzzy dictionary expansion):

    +term      MUST        (doc must contain it; term also scores)
    -term      MUST_NOT    (doc must not contain it; never scores)
    term       SHOULD      (scores; pure-SHOULD queries need >= 1 match)
    "a b"      phrase      (doc must contain the exact phrase; the
                            phrase's terms join the scoring set)
    -"a b"     NOT phrase  (doc must not contain the phrase; terms
                            do NOT score)
    pre*       prefix      (expands to the <= max_expansions highest-df
                            dictionary terms, added as SHOULD)
    term~      fuzzy       (edit-distance <= 1 expansion, added as SHOULD)

Scoring is the plain BM25 sum over the scoring-term set (must + should +
positive-phrase terms + expansions, deduplicated), identical accumulation
and (score desc, doc_id asc) tie-break as every other scored path — so a
DuckDB twin can reproduce results bit-for-bit.

This module is engine-free on purpose: ``parse_query_string`` is the ONE
grammar shared by ``SearchEngine.query_string(_batch)`` and the driver
gate's SQL-twin generator, so both sides compile the same string to the
same clause structure.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

_PART_RE = re.compile(r'[+-]?"[^"]*"(?:~\d+)?|\S+')


@dataclass(frozen=True)
class ParsedQuery:
    must: tuple[str, ...]
    should: tuple[str, ...]
    must_not: tuple[str, ...]
    phrases: tuple[tuple[str, ...], ...]
    not_phrases: tuple[tuple[str, ...], ...]
    prefixes: tuple[str, ...]
    fuzzies: tuple[str, ...]
    # "a b"~N sloppy phrases (Lucene phrase slop): (tokens, slop) pairs —
    # the doc must contain the tokens IN ORDER with <= slop extras
    # interleaved (pipelines/positions.py span_near semantics); tokens score
    near_phrases: tuple[tuple[tuple[str, ...], int], ...] = ()

    def score_literals(self) -> tuple[str, ...]:
        """The non-expanded scoring terms: must + should + positive-phrase
        tokens, sorted distinct (not_phrases never score)."""
        lits = set(self.must) | set(self.should)
        for ph in self.phrases:
            lits |= set(ph)
        for ph, _ in self.near_phrases:
            lits |= set(ph)
        return tuple(sorted(lits))


def parse_query_string(qs: str, tokenize) -> ParsedQuery:
    """Compile a query string to its clause structure. Raw terms are run
    through the index's tokenizer (a raw term may normalize to several
    tokens — all land in that clause). Raises on malformed input rather
    than guessing: stray quotes, +/- on expansion clauses, and expansion
    patterns that normalize to anything but one token are errors."""
    must: set[str] = set()
    should: set[str] = set()
    must_not: set[str] = set()
    phrases: dict[tuple[str, ...], None] = {}
    not_phrases: dict[tuple[str, ...], None] = {}
    prefixes: dict[str, None] = {}
    fuzzies: dict[str, None] = {}
    near_phrases: dict[tuple[tuple[str, ...], int], None] = {}
    for raw in _PART_RE.findall(qs):
        sign = ""
        if raw[0] in "+-" and len(raw) > 1:
            sign, raw = raw[0], raw[1:]
        m_near = re.fullmatch(r'"([^"]*)"~(\d+)', raw)
        if m_near:
            if sign:
                raise ValueError(
                    "+/- modifiers are not supported on sloppy-phrase clauses"
                )
            toks = tuple(tokenize(m_near.group(1)))
            if not toks:
                continue
            near_phrases[(toks, int(m_near.group(2)))] = None
            continue
        if raw.startswith('"') and raw.endswith('"') and len(raw) >= 2:
            toks = tuple(tokenize(raw[1:-1]))
            if not toks:
                continue
            (not_phrases if sign == "-" else phrases)[toks] = None
        elif '"' in raw:
            raise ValueError(f"unbalanced quote in query string near {raw!r}")
        elif raw.endswith("*") and len(raw) > 1:
            if sign:
                raise ValueError("+/- modifiers are not supported on prefix clauses")
            body = tokenize(raw[:-1])
            if len(body) != 1:
                raise ValueError(
                    f"prefix pattern {raw!r} must normalize to exactly one token"
                )
            prefixes[body[0]] = None
        elif raw.endswith("~") and len(raw) > 1:
            if sign:
                raise ValueError("+/- modifiers are not supported on fuzzy clauses")
            body = tokenize(raw[:-1])
            if len(body) != 1:
                raise ValueError(
                    f"fuzzy pattern {raw!r} must normalize to exactly one token"
                )
            fuzzies[body[0]] = None
        else:
            toks = tokenize(raw)
            target = {"+": must, "-": must_not}.get(sign, should)
            target.update(toks)
    return ParsedQuery(
        must=tuple(sorted(must)),
        should=tuple(sorted(should)),
        must_not=tuple(sorted(must_not)),
        phrases=tuple(phrases),
        not_phrases=tuple(not_phrases),
        prefixes=tuple(prefixes),
        fuzzies=tuple(fuzzies),
        near_phrases=tuple(near_phrases),
    )


def derive_query_strings(
    queries: list[tuple[int, str]],
    phrases: list[tuple[int, str]],
    tokenize,
) -> list[tuple[int, str]]:
    """Deterministic mixed query-string set for the driver gate: cycles
    four shapes over the fixed query texts (sorted distinct tokens t*,
    corpus-derived phrase p cycled by query id; p0/plast/pn = the phrase's
    first/last token and length):

        qid % 4 == 0:  +t0 t1 -tlast       (t1/-tlast only when enough tokens)
        qid % 4 == 1:  t0 "p"              (phrase docs, ranked)
        qid % 4 == 2:  t0 pre(t0)* -"p"
        qid % 4 == 3:  t0 "p0 plast"~(pn-2)  (sloppy phrase; falls back to
                                              shape 0 when p has < 3 tokens)

    Token-less queries are skipped — same rule everywhere."""
    ph = [text for _, text in phrases]
    out: list[tuple[int, str]] = []
    for qid, text in queries:
        toks = sorted(set(tokenize(text)))
        if not toks:
            continue
        p = ph[qid % len(ph)] if ph else None
        v = qid % 4
        p_toks = list(tokenize(p)) if p is not None else []
        if v == 3 and len(p_toks) >= 3:
            qs = f'{toks[0]} "{p_toks[0]} {p_toks[-1]}"~{len(p_toks) - 2}'
        elif v == 1 and p is not None:
            qs = f'{toks[0]} "{p}"'
        elif v == 2 and p is not None:
            qs = f'{toks[0]} {toks[0][:4]}* -"{p}"'
        else:
            if len(toks) >= 3:
                qs = f"+{toks[0]} {toks[1]} -{toks[-1]}"
            elif len(toks) == 2:
                qs = f"+{toks[0]} {toks[1]}"
            else:
                qs = f"+{toks[0]}"
        out.append((qid, qs))
    return out
