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
