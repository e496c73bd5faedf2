"""Unit tests: shared tokenizer, varint/delta codec (FIXTURES.md F4)."""

import duckdb
import numpy as np
import pytest

from pageindex_ray.stages.codec import (
    decode_posting_blocks,
    encode_posting_blocks,
    varint_decode,
    varint_encode,
)
from pageindex_ray.tokenizer import SQL_TOKENIZE, tokenize, tokenize_batch


def test_tokenize_basic():
    assert tokenize("Hello, World foo-bar") == ["hello", "world", "foo", "bar"]
    assert tokenize("") == []
    assert tokenize("  ...  ") == []
    assert tokenize("A1b2 C3") == ["a1b2", "c3"]


def test_tokenize_matches_duckdb():
    """The engine tokenizer and the oracle-SQL tokenizer must agree exactly."""
    samples = [
        "Hello, World foo-bar",
        "the quick BROWN fox!! 42 times",
        "",
        "...",
        "MiXeD CaSe with-hyphens and_underscores 0x1f",
    ]
    con = duckdb.connect()
    for s in samples:
        sql = f"select {SQL_TOKENIZE.format(col='?')}"
        got = con.execute(sql, [s]).fetchone()[0]
        assert got == tokenize(s), s


def test_tokenize_batch_flattening():
    flat, lens = tokenize_batch(["a b", "", "C d e"])
    assert list(flat) == ["a", "b", "c", "d", "e"]
    assert list(lens) == [2, 0, 3]


@pytest.mark.parametrize("n", [0, 1, 127, 128, 129, 10_000])
def test_varint_roundtrip(n):
    rng = np.random.default_rng(n + 7)
    vals = rng.integers(0, 2**32, n, dtype=np.uint64)
    # include boundary values
    if n >= 4:
        vals[0], vals[1], vals[2], vals[3] = 0, 127, 128, 2**63 - 1
    assert np.array_equal(varint_decode(varint_encode(vals), n), vals)


@pytest.mark.parametrize("n", [1, 127, 128, 129, 5000])
def test_posting_blocks_roundtrip(n):
    rng = np.random.default_rng(n)
    gaps = rng.integers(1, 2**20, n, dtype=np.int64)
    doc_ids = np.cumsum(gaps)
    tfs = rng.integers(1, 50, n, dtype=np.int64)
    dls = rng.integers(1, 200, n, dtype=np.int64)
    k1, b, avgdl = 1.5, 0.75, 40.0
    blocks = encode_posting_blocks(doc_ids, tfs, dls, k1, b, avgdl, block_size=128)
    rids, rtfs, rdls = decode_posting_blocks(blocks)
    assert np.array_equal(rids, doc_ids)
    assert np.array_equal(rtfs, tfs)
    assert np.array_equal(rdls, dls)
    # per-block invariants: first_doc_id matches head; max_factor bounds members
    tf_f, dl_f = tfs.astype(float), dls.astype(float)
    factors = tf_f * (k1 + 1) / (tf_f + k1 * (1 - b + b * dl_f / avgdl))
    pos = 0
    for blk in blocks:
        c = blk["count"]
        assert blk["first_doc_id"] == doc_ids[pos]
        assert blk["max_factor"] >= factors[pos : pos + c].max() - 1e-12
        pos += c
    assert pos == n


def test_mulmod_p61_exact_vs_python_ints():
    """The split-multiply mod (2^61-1) must equal exact Python-int
    arithmetic for arbitrary uint64 inputs (the universal-hash family
    guarantee the MinHash docstring claims)."""
    import numpy as np

    from pageindex_ray.functions.hashes import _MERSENNE, _mod_p61, _mulmod_p61

    rng = np.random.default_rng(123)
    a = rng.integers(0, _MERSENNE, 500, dtype=np.uint64)
    x64 = rng.integers(0, np.iinfo(np.uint64).max, 500, dtype=np.uint64)
    x = _mod_p61(x64)
    got = _mulmod_p61(a, x)
    for i in range(500):
        assert int(got[i]) == (int(a[i]) * int(x[i])) % _MERSENNE


def test_minhash_signature_batch_matches_single():
    """signature_batch's segmented-min vectorization must equal per-doc
    signature() exactly, including empty and short documents."""
    import numpy as np

    from pageindex_ray.functions.hashes import MinHasher

    h = MinHasher(num_perm=32)
    texts = ["alpha beta gamma delta", "", "one two", "alpha beta gamma delta epsilon zeta", "x"]
    batch = h.signature_batch(texts)
    for i, t in enumerate(texts):
        assert np.array_equal(batch[i], h.signature(t)), i


def test_shingle_hash_order_sensitivity():
    """Window hashes must distinguish token order and k-window content."""
    from pageindex_ray.functions.hashes import shingle_hashes

    a = set(shingle_hashes("the quick brown fox jumps").tolist())
    b = set(shingle_hashes("quick the brown fox jumps").tolist())
    assert a != b
    c = set(shingle_hashes("the quick brown fox jumps").tolist())
    assert a == c


def test_partition_consolidation_matches_per_row():
    """The vectorized zero-copy partition consolidation must decode to the
    same postings as the per-row reference consolidation."""
    import numpy as np
    import pyarrow as pa

    from pageindex_ray.stages.codec import (
        consolidate_blocks,
        consolidate_partition_table,
        decode_consolidated,
        encode_posting_blocks,
    )
    from pageindex_ray.stages.postings import POSTINGS_SCHEMA

    rng = np.random.default_rng(42)
    rows = []
    for t in ("alpha", "beta", "gamma"):
        n = int(rng.integers(1, 400))
        ids = np.sort(rng.choice(10_000, size=n, replace=False)).astype(np.int64)
        tfs = rng.integers(1, 9, n).astype(np.int64)
        dls = rng.integers(5, 200, n).astype(np.int64)
        blocks = encode_posting_blocks(ids, tfs, dls, 1.5, 0.75, 60.0, block_size=128)
        rows.append({"term": t, "df": n, "cf": int(tfs.sum()), "blocks": blocks})
    table = pa.Table.from_pylist(rows, schema=POSTINGS_SCHEMA)

    vec = consolidate_partition_table(table)
    for row in table.to_pylist():
        ref = consolidate_blocks(row["blocks"])
        got = vec[row["term"]]
        for a, b in zip(decode_consolidated(ref), decode_consolidated(got)):
            assert np.array_equal(a, b), row["term"]
        assert got["df"] == row["df"] and got["cf"] == row["cf"]
        assert np.array_equal(got["max_factors"], ref["max_factors"])


def test_bpe_encoder_matches_reference_semantics():
    """The committed merge-table encoder must implement classic BPE: apply
    the lowest-rank adjacent merge repeatedly; counts are consistent between
    the scalar path and the batched unique-piece path."""
    from pageindex_ray.functions.bpe import BPE, train_bpe

    merges = train_bpe(["low lower lowest low low", "new newer newest new"], n_merges=50)
    bpe = BPE(merges)
    # training on this corpus must fully merge its most frequent word
    assert bpe.encode("low") == ("low",)
    # an UNSEEN piece still encodes (partial merges), never errors
    toks = bpe.encode("slowest")
    assert "".join(toks) == "slowest"
    assert 1 <= len(toks) <= len("slowest")

    texts = ["low lower, LOWEST!", "", None, "new new new", "42 low7"]
    counts = bpe.count_batch(texts)
    import re

    from pageindex_ray.functions.bpe import PIECE_RE

    want = [
        sum(len(bpe.encode(p)) for p in PIECE_RE.findall(t or "")) for t in texts
    ]
    assert counts.tolist() == want
    assert counts[1] == 0 and counts[2] == 0


def test_bpe_committed_table_deterministic():
    """Regenerating the committed artifact from its documented source must
    reproduce it byte-for-byte (no seed, lexicographic tie-break)."""
    import pyarrow.parquet as pq

    from pageindex_ray.functions.bpe import _MERGES_PATH, load_merges, train_bpe

    texts = pq.read_table(
        "/root/testdata/sf0.001/documents.parquet", columns=["text"]
    ).column("text").to_pylist()
    assert train_bpe(texts, n_merges=1000) == load_merges(_MERGES_PATH)


def test_arrow_flat_tokens_fast_path_identity():
    """The ASCII byte-LUT tokenize fast path (round 5 emit hot-path) must be
    byte-identical to the regex kernel path on every admissible input, and
    must transparently fall back on non-ASCII text and LUT-less specs."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from pageindex_ray.tokenizer import TokenizerSpec, get_tokenizer

    def generic(spec, arr):
        lists = spec.arrow_token_lists(arr)
        flat = lists.flatten()
        parents = lists.value_parent_indices().to_numpy()
        ne = pc.not_equal(flat, "")
        return flat.filter(ne).to_pylist(), parents[
            ne.to_numpy(zero_copy_only=False)
        ].tolist()

    spec = get_tokenizer("alnum-lower-v1")
    assert spec._byte_lut is not None
    cases = [
        ["Hello, World! 123", "", None, "  ", "a", "MiXeD-case_42", "t\tt\nn\rr"],
        [".lead", "trail.", "..", "0", "a" * 300 + "!b"],
        [], [None, None], ["", ""],
        ["café latte", "ascii only"],  # non-ASCII -> whole-batch fallback
    ]
    for texts in cases:
        arr = pa.array(texts, type=pa.string())
        flat, parents = spec.arrow_flat_tokens(arr)
        gflat, gparents = generic(spec, arr)
        assert flat.to_pylist() == gflat, texts
        assert list(parents) == gparents, texts
        assert parents.dtype == np.int64

    # sliced (nonzero offset) arrays
    sl = pa.array(["skip me", "Take One", "two 2"]).slice(1, 2)
    flat, parents = spec.arrow_flat_tokens(sl)
    assert flat.to_pylist() == ["take", "one", "two", "2"]
    assert list(parents) == [0, 0, 1, 1]

    # whitespace (non-lowercasing, negated-class) spec gets a LUT too
    ws = TokenizerSpec(
        name="ws-test", token_pattern=r"[^ \t\n\r]+",
        split_pattern=r"[ \t\n\r]+", lowercase=False,
    )
    assert ws._byte_lut is not None
    arr = pa.array(["Keep.Case  two", "\tx\n", ""])
    flat, parents = ws.arrow_flat_tokens(arr)
    assert flat.to_pylist() == ["Keep.Case", "two", "x"]
    assert list(parents) == [0, 0, 1]

    # a spec whose pattern is richer than a char class has NO LUT and still
    # works through the regex path
    rich = TokenizerSpec(
        name="rich-test", token_pattern=r"[a-z]+(?:'[a-z]+)?",
        split_pattern=r"[^a-z']+", lowercase=True,
    )
    assert rich._byte_lut is None  # token pattern has a group -> no LUT
    flat, parents = rich.arrow_flat_tokens(pa.array(["don't stop"]))
    assert "don't" in flat.to_pylist()
