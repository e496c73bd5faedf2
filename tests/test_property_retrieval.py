"""Property tests for the round-3 retrieval kernels (pure, Ray-free)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


_word = st.text(alphabet="abcdef", min_size=1, max_size=8)


@settings(max_examples=300, deadline=None)
@given(_word, _word)
def test_scalar_lev1_matches_dp(a, b):
    from pageindex_ray.state.shards import PostingShard

    # PostingShard is a Ray actor class; the static method lives on the
    # wrapped class
    lev1 = PostingShard.__ray_metadata__.modified_class._lev1
    assert lev1(a, b) == (_lev(a, b) <= 1)


@settings(max_examples=100, deadline=None)
@given(st.lists(_word, min_size=1, max_size=60, unique=True), _word)
def test_vectorized_edit1_matches_dp(vocab, q):
    """The length-bucketed lcp/lcs shortcut == full DP on arbitrary ASCII
    vocabularies (the exact kernel expand_edit1 runs per shard)."""
    want = sorted(t for t in vocab if _lev(t, q) <= 1)
    got = set()
    M = len(q)
    qb = np.frombuffer(q.encode(), dtype=np.uint8)
    by_len = {}
    for t in vocab:
        by_len.setdefault(len(t), []).append(t)
    for L, ts in by_len.items():
        if abs(L - M) > 1:
            continue
        mat = np.frombuffer("".join(ts).encode(), dtype=np.uint8).reshape(len(ts), L)
        if L == M:
            sel = (mat != qb).sum(axis=1) <= 1
        elif L == M + 1:
            lcp = np.cumprod(mat[:, :M] == qb, axis=1).sum(axis=1)
            lcs = np.cumprod((mat[:, 1:] == qb)[:, ::-1], axis=1).sum(axis=1)
            sel = (lcp + lcs) >= M
        else:
            lcp = np.cumprod(mat == qb[:L], axis=1).sum(axis=1)
            lcs = np.cumprod((mat == qb[1:])[:, ::-1], axis=1).sum(axis=1)
            sel = (lcp + lcs) >= L
        got.update(ts[i] for i in np.flatnonzero(sel))
    assert sorted(got) == want


@settings(max_examples=200, deadline=None)
@given(
    st.lists(st.integers(0, 200), max_size=50),
    st.lists(st.integers(0, 200), max_size=50),
)
def test_membership_mask_matches_isin(sorted_ids, candidates):
    from pageindex_ray.pipelines.attrs import membership_mask

    s = np.unique(np.asarray(sorted_ids, dtype=np.int64))
    c = np.asarray(sorted(set(candidates)), dtype=np.int64)
    got = membership_mask(s, c)
    want = np.isin(c, s)
    assert (got == want).all()


@settings(max_examples=100, deadline=None)
@given(
    st.lists(st.integers(0, 100), min_size=1, max_size=40),
    st.integers(0, 120),
    st.integers(0, 120),
)
def test_attr_slice_clip_is_exact(ids, lo, hi):
    """AttrStore's [lo, hi) searchsorted clip == a plain filter."""
    if lo > hi:
        lo, hi = hi, lo
    s = np.unique(np.asarray(ids, dtype=np.int64))
    a = np.searchsorted(s, lo, side="left")
    b = np.searchsorted(s, hi, side="left")
    assert s[a:b].tolist() == [x for x in s.tolist() if lo <= x < hi]
