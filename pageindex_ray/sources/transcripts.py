"""Deterministic synthetic transcript corpus (the engine's input table).

BASELINE.json ``input_hint`` fixes the schema:
    conv_id:string, turn_idx:int32, role:string, text:string,
    tool:string, ts:timestamp[us]

This plays the role the ``docs/*.pdf`` corpus plays for the reference
(/root/reference/docs/ + results-original/ golden outputs): a fixed, seeded
input whose golden query results (oracle/bm25.py) are the conformance corpus.
Generation is pure numpy from a fixed seed — no external data — and the
written Parquet is row-shuffled so the engine's explicit ordering by
``(conv_id, turn_idx)`` is load-bearing (the reference depends on positional
page order the same way, SURVEY.md §2.7 O1).

Vocabulary is Zipfian (s≈1.1, ~5000 terms) so hot-term skew in the posting
shuffle is actually exercised; the first ranks are real English stopwords so
language-ID heuristics have signal.
"""

from __future__ import annotations

import os
import tempfile

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SEED = 42
VOCAB_SIZE = 5000
ZIPF_S = 1.1

# Most-frequent ranks are real stopwords (shared with functions/text.py langid).
_STOPWORDS = (
    "the of and to a in is it you that he was for on are with as his they be "
    "at one have this from or had by word but what some we can out other were "
    "all there when up use your how said an each she"
).split()


def build_vocab() -> list[str]:
    vocab = list(_STOPWORDS)
    i = 0
    while len(vocab) < VOCAB_SIZE:
        vocab.append(f"w{i:04d}")
        i += 1
    return vocab[:VOCAB_SIZE]


def _zipf_probs(n: int, s: float = ZIPF_S) -> np.ndarray:
    ranks = np.arange(1, n + 1, dtype=np.float64)
    p = 1.0 / (ranks + 2.7) ** s
    return p / p.sum()


def synth_transcripts(n_turns: int, seed: int = SEED) -> pa.Table:
    """Deterministic transcripts table with exactly ``input_hint``'s schema."""
    rng = np.random.default_rng(seed)
    vocab = np.asarray(build_vocab(), dtype=object)
    probs = _zipf_probs(len(vocab))

    # Conversation lengths 2..40 (FIXTURES.md F1) until we cover n_turns.
    lens = []
    total = 0
    while total < n_turns:
        ln = int(rng.integers(2, 41))
        lens.append(ln)
        total += ln
    conv_lens = np.asarray(lens, dtype=np.int64)
    n_convs = len(conv_lens)
    n_rows = int(conv_lens.sum())

    conv_ids = np.repeat(
        np.asarray([f"conv-{i:06d}" for i in range(n_convs)], dtype=object), conv_lens
    )
    turn_idx = np.concatenate([np.arange(ln, dtype=np.int32) for ln in conv_lens])

    # Roles: user/assistant alternating, ~8% of assistant turns become tool turns.
    role = np.where(turn_idx % 2 == 0, "user", "assistant").astype(object)
    tool_mask = (rng.random(n_rows) < 0.08) & (role == "assistant")
    role[tool_mask] = "tool"
    tool_names = np.asarray([f"tool-{i:02d}" for i in range(20)], dtype=object)
    tool = np.full(n_rows, None, dtype=object)
    tool[tool_mask] = tool_names[rng.integers(0, 20, int(tool_mask.sum()))]

    # Turn token lengths 5..200, lognormal-skewed; ~0.5% empty-text rows.
    tok_lens = np.clip(rng.lognormal(3.2, 0.7, n_rows).astype(np.int64), 5, 200)
    tok_lens[rng.random(n_rows) < 0.005] = 0

    offsets = np.concatenate([[0], np.cumsum(tok_lens)])
    flat = vocab[rng.choice(len(vocab), int(offsets[-1]), p=probs)]
    # join per row with the Arrow C kernel (a Python " ".join loop over
    # millions of rows dominated generation time at bench scales)
    import pyarrow.compute as pc

    if offsets[-1] < (1 << 31):
        lists = pa.ListArray.from_arrays(
            pa.array(offsets.astype(np.int32), type=pa.int32()),
            pa.array(flat, type=pa.string()),
        )
    else:
        lists = pa.LargeListArray.from_arrays(
            pa.array(offsets, type=pa.int64()),
            pa.array(flat, type=pa.large_string()),
        )
    text = pc.binary_join(lists, " ")

    # Timestamps: base epoch + monotone increments within conversation; order
    # authority is turn_idx, not ts (FIXTURES.md F1).
    base = np.int64(1_700_000_000_000_000)  # us
    incr = rng.integers(1_000_000, 120_000_000, n_rows).astype(np.int64)
    conv_start = rng.integers(0, 365 * 24 * 3600, n_convs).astype(np.int64) * 1_000_000
    ts = base + np.repeat(conv_start, conv_lens) + np.concatenate(
        [np.cumsum(incr[s : s + ln]) for s, ln in zip(np.concatenate([[0], np.cumsum(conv_lens)])[:-1], conv_lens)]
    )

    table = pa.table(
        {
            "conv_id": pa.array(conv_ids, type=pa.string()),
            "turn_idx": pa.array(turn_idx, type=pa.int32()),
            "role": pa.array(role, type=pa.string()),
            "text": text.cast(pa.string()),
            "tool": pa.array(tool, type=pa.string()),
            "ts": pa.array(ts, type=pa.timestamp("us")),
        }
    )
    # Row-shuffle so nothing downstream can rely on file order.
    perm = rng.permutation(n_rows)
    return table.take(pa.array(perm))


def synth_queries(n: int = 50, seed: int = SEED + 1) -> pa.Table:
    """Fixed query set (FIXTURES.md F3): 1-3 term queries mixing hot terms,
    mid/rare terms, absent terms and mixed-case/punctuated forms."""
    rng = np.random.default_rng(seed)
    vocab = build_vocab()
    hot = vocab[:10]
    mid = vocab[10:200]
    rare = vocab[1000:]
    texts: list[str] = []
    for i in range(n):
        kind = i % 5
        if kind == 0:  # single hot term
            texts.append(hot[int(rng.integers(0, len(hot)))])
        elif kind == 1:  # two mid terms
            a, b = rng.choice(len(mid), 2, replace=False)
            texts.append(f"{mid[int(a)]} {mid[int(b)]}")
        elif kind == 2:  # rare + mid
            texts.append(f"{rare[int(rng.integers(0, len(rare)))]} {mid[int(rng.integers(0, len(mid)))]}")
        elif kind == 3:  # mixed-case / punctuated (normalization check)
            w = mid[int(rng.integers(0, len(mid)))]
            texts.append(f"{w.upper()}, {hot[int(rng.integers(0, len(hot)))].capitalize()}!")
        else:  # absent term (expect empty) or 3-term
            if i % 10 == 4:
                texts.append("zzzabsentterm")
            else:
                idx = rng.choice(len(mid), 3, replace=False)
                texts.append(" ".join(mid[int(j)] for j in idx))
    return pa.table(
        {
            "query_id": pa.array(np.arange(n, dtype=np.int64)),
            "text": pa.array(texts, type=pa.string()),
        }
    )


# ---------------------------------------------------------------------------
# Cached on-disk corpus, keyed by scale-factor directory name. The driver's
# oracle SQL reads these same files via read_parquet('<path>'), so paths are
# deterministic functions of the sf name.
# ---------------------------------------------------------------------------

DATA_ROOT = "/tmp/pageindex_ray_data"

# turns per scale (FIXTURES.md F1: tiny/small/bench)
SCALE_TURNS = {
    "sf0.001": 2_000,
    "sf0.01": 20_000,
    "sf0.1": 200_000,
    "sf1": 2_000_000,
    "sf4": 8_000_000,  # scaling-efficiency runs: big enough that per-stage
    # fixed overheads (~seconds) are noise against per-core work
}

# Shard count per scale: real 100 TB inputs arrive as MANY files; a single
# monolithic parquet with huge row groups caps read parallelism at the
# row-group count and serializes every downstream map stage. Small scales
# stay single-file (the driver's oracle SQL reads them by literal path).
SCALE_SHARDS = {"sf0.001": 1, "sf0.01": 1, "sf0.1": 8, "sf1": 32, "sf4": 64}
ROW_GROUP_SIZE = 32_768


def _sf_name(sf_dir: str) -> str:
    name = os.path.basename(os.path.normpath(sf_dir))
    if name not in SCALE_TURNS:
        raise ValueError(f"unknown scale dir {sf_dir!r}; expected one of {sorted(SCALE_TURNS)}")
    return name


def transcripts_path(sf_dir: str) -> str:
    """Single parquet file (1 shard) or a directory of part files."""
    name = _sf_name(sf_dir)
    if SCALE_SHARDS[name] == 1:
        return os.path.join(DATA_ROOT, name, "transcripts.parquet")
    return os.path.join(DATA_ROOT, name, "transcripts")


def queries_path(sf_dir: str) -> str:
    return os.path.join(DATA_ROOT, _sf_name(sf_dir), "queries.parquet")


def _atomic_write(table: pa.Table, path: str) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=os.path.dirname(path), suffix=".tmp")
    os.close(fd)
    try:
        pq.write_table(table, tmp, row_group_size=ROW_GROUP_SIZE)
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)


def ensure_corpus(sf_dir: str) -> tuple[str, str]:
    """Idempotently materialize (transcripts, queries) parquet for a scale dir."""
    name = _sf_name(sf_dir)
    tpath, qpath = transcripts_path(sf_dir), queries_path(sf_dir)
    shards = SCALE_SHARDS[name]
    if not os.path.exists(tpath):
        table = synth_transcripts(SCALE_TURNS[name])
        if shards == 1:
            _atomic_write(table, tpath)
        else:
            import shutil

            tmp_dir = tpath + ".tmp"
            if os.path.isdir(tmp_dir):
                shutil.rmtree(tmp_dir)
            os.makedirs(tmp_dir)
            per = (table.num_rows + shards - 1) // shards
            for i in range(shards):
                pq.write_table(
                    table.slice(i * per, per),
                    os.path.join(tmp_dir, f"part-{i:03d}.parquet"),
                    row_group_size=ROW_GROUP_SIZE,
                )
            os.replace(tmp_dir, tpath)
    if not os.path.exists(qpath):
        _atomic_write(synth_queries(), qpath)
    return tpath, qpath
