"""Property-based tests (hypothesis) for the codec, tokenizer, and BPE —
the kernels every other component's exactness rests on."""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=200, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=(1 << 63) - 1), min_size=0, max_size=300)
)
def test_varint_roundtrip(values):
    from pageindex_ray.stages.codec import varint_decode, varint_encode

    arr = np.asarray(values, dtype=np.uint64)
    assert varint_decode(varint_encode(arr), len(arr)).tolist() == values


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=1 << 40),  # doc gap
            st.integers(min_value=1, max_value=500),      # tf
            st.integers(min_value=1, max_value=100_000),  # dl
        ),
        min_size=1,
        max_size=400,
    ),
    st.integers(min_value=1, max_value=64),  # block size
)
def test_posting_block_roundtrip(postings, block_size):
    from pageindex_ray.stages.codec import (
        consolidate_blocks,
        decode_consolidated,
        decode_posting_blocks,
        encode_posting_blocks,
    )

    gaps = np.asarray([p[0] for p in postings], dtype=np.int64)
    doc_ids = np.cumsum(gaps + 1) - 1  # strictly ascending
    tfs = np.asarray([p[1] for p in postings], dtype=np.int64)
    dls = np.asarray([p[2] for p in postings], dtype=np.int64)
    blocks = encode_posting_blocks(doc_ids, tfs, dls, 1.5, 0.75, 42.0, block_size=block_size)
    i2, t2, d2 = decode_posting_blocks(blocks)
    assert i2.tolist() == doc_ids.tolist()
    assert t2.tolist() == tfs.tolist()
    assert d2.tolist() == dls.tolist()
    i3, t3, d3 = decode_consolidated(consolidate_blocks(blocks))
    assert i3.tolist() == doc_ids.tolist()
    assert t3.tolist() == tfs.tolist()
    assert d3.tolist() == dls.tolist()


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=300))
def test_tokenizer_matches_batch_and_counts(text):
    from pageindex_ray.functions.text import token_counts
    from pageindex_ray.tokenizer import token_count, tokenize, tokenize_batch

    toks = tokenize(text)
    assert all(t and t == t.lower() for t in toks)
    flat, lengths = tokenize_batch([text, text])
    assert lengths.tolist() == [len(toks), len(toks)]
    assert flat.tolist() == toks + toks
    # Arrow regex-count kernel == Python findall count (the docmap doc_len
    # contract) for any unicode input
    arrow_n = token_counts(pa.array([text], type=pa.string()))[0].as_py()
    assert arrow_n == token_count(text)


@settings(max_examples=100, deadline=None)
@given(st.text(alphabet=st.characters(codec="ascii"), max_size=120))
def test_bpe_partitions_pieces(text):
    """BPE tokens always concatenate back to the piece, and counts are
    positive for non-empty pieces (unseen input never errors)."""
    from pageindex_ray.functions.bpe import BPE, PIECE_RE

    bpe = BPE()
    for piece in PIECE_RE.findall(text):
        toks = bpe.encode(piece)
        assert "".join(toks) == piece
        assert 1 <= len(toks) <= len(piece)
    counts = bpe.count_batch([text])
    assert counts[0] == sum(len(bpe.encode(p)) for p in PIECE_RE.findall(text))


@settings(max_examples=120, deadline=None)
@given(
    st.lists(  # (conv index 0..5, turn 0..40, score) per scored turn;
        # scores are dyadic rationals (n/1024) so float64 sums are EXACT
        # under any association — np.add.reduceat's pairwise grouping and
        # the reference's sequential sum then agree bit-for-bit (real BM25
        # scores are only 1e-9-close across groupings, which the
        # engine-vs-oracle tests cover; this test pins the structure)
        st.tuples(
            st.integers(min_value=0, max_value=5),
            st.integers(min_value=0, max_value=40),
            st.integers(min_value=1, max_value=10240),
        ),
        min_size=1,
        max_size=120,
        unique_by=lambda x: (x[0], x[1]),
    ),
    st.sampled_from([(16, 4), (8,), (16, 8, 2), (32, 4)]),
    st.integers(min_value=1, max_value=6),
    st.sampled_from(["sum", "max"]),
)
def test_tree_rollup_matches_bruteforce(turns, spans, k, agg):
    """state/rollup.tree_rollup vs an O(n^2) dict-based reference: same
    top-k convs, same nested winning segments, same winning turn, under
    the (score desc, smallest-key asc) tie-break at every level."""
    from pageindex_ray.state.rollup import tree_rollup

    CONV_SPAN = 64  # each conv owns 64 doc ids
    names_tbl = np.asarray([f"c{i}" for i in range(6)], dtype=object)
    bases = np.arange(6, dtype=np.int64) * CONV_SPAN
    docs = np.asarray(sorted(c * CONV_SPAN + t for c, t, _ in turns), dtype=np.int64)
    by_doc = {c * CONV_SPAN + t: s / 1024.0 for c, t, s in turns}
    scores = np.asarray([by_doc[d] for d in docs], dtype=np.float64)

    out = tree_rollup(docs, scores, bases, lambda i: names_tbl[i], spans, k, agg)

    # brute force
    red = max if agg == "max" else sum
    per_conv: dict[int, list[tuple[int, float]]] = {}
    for c, t, _ in turns:
        per_conv.setdefault(c, []).append((t, by_doc[c * CONV_SPAN + t]))
    def agg_of(items):
        vals = [s for _, s in sorted(items)]  # ascending turn = doc order
        return red(vals)
    ranked = sorted(per_conv, key=lambda c: (-agg_of(per_conv[c]), f"c{c}"))[:k]
    assert list(out["conv_id"]) == [f"c{c}" for c in ranked]
    for row, c in enumerate(ranked):
        assert out["conv_score"][row] == agg_of(per_conv[c])
        lo, hi = 0, 1 << 60
        for li, span in enumerate(spans):
            segs: dict[int, list[tuple[int, float]]] = {}
            for t, s in per_conv[c]:
                if lo <= t < hi:
                    segs.setdefault((t // span) * span, []).append((t, s))
            best = sorted(segs, key=lambda g: (-agg_of(segs[g]), g))[0]
            assert out[f"l{li + 1}_start"][row] == best, (c, li, spans)
            assert out[f"l{li + 1}_score"][row] == agg_of(segs[best])
            lo, hi = best, best + span
        cand = sorted(
            ((t, s) for t, s in per_conv[c] if lo <= t < hi),
            key=lambda ts: (-ts[1], ts[0]),
        )[0]
        assert out["turn_idx"][row] == cand[0]
        assert out["turn_score"][row] == cand[1]
