"""Property-based tests (hypothesis) for the pure kernels."""

import string

from hypothesis import example, given, settings
from hypothesis import strategies as st

from deepkg_ray.functions.hashing import MinHasher, word_shingles
from deepkg_ray.functions.numeric import round6
from deepkg_ray.functions.textnorm import md5_keep_mask, normalize_text
from deepkg_ray.stages.dedup import exact_jaccard
from deepkg_ray.stages.selparse import (add_bracket, check_well_form,
                                          clean_text, convert_bracket,
                                          match_sublist, parse_sel)

text_st = st.text(alphabet=st.characters(max_codepoint=0x2FFF), max_size=200)
words_st = st.lists(st.text(alphabet=string.ascii_lowercase, min_size=1,
                            max_size=6), max_size=30)


@given(text_st)
@example("İ")   # U+0130: str.lower() expands it to 'i̇' (2 chars) — the
# round-1 regression that broke the span-offset invariant
@example("ΑΣ Σ ß ﬁ")
@settings(max_examples=200, deadline=None)
def test_normalize_always_length_preserving(s):
    assert len(normalize_text(s)) == len(s)


@given(text_st)
@settings(max_examples=200, deadline=None)
def test_normalize_idempotent(s):
    n = normalize_text(s)
    assert normalize_text(n) == n


@given(text_st)
@settings(max_examples=300, deadline=None)
def test_parse_sel_never_raises(s):
    records, counters = parse_sel(s, text=s, spot_set={"a"}, asoc_set={"b"})
    assert isinstance(records, list)
    # repaired expressions are always well-formed
    fixed = add_bracket(clean_text(convert_bracket(s)))
    assert check_well_form(fixed)


@given(st.lists(st.integers(0, 5), max_size=20), st.lists(st.integers(0, 5),
                                                          min_size=1, max_size=4))
@settings(max_examples=200, deadline=None)
def test_match_sublist_against_naive(hay, needle):
    got = match_sublist(hay, needle)
    naive = [(i, i + len(needle) - 1) for i in range(len(hay) - len(needle) + 1)
             if hay[i:i + len(needle)] == needle]
    assert got == naive


@given(words_st, words_st)
@settings(max_examples=100, deadline=None)
def test_minhash_estimates_track_jaccard(a_words, b_words):
    a, b = " ".join(a_words), " ".join(b_words)
    mh = MinHasher(n_perm=128)
    sa, sb = mh.signatures([a, b])
    est = float((sa == sb).mean())
    true = exact_jaccard(a, b)
    # identical inputs estimate exactly; otherwise within a loose bound
    if a == b:
        assert est == 1.0
    else:
        assert abs(est - true) < 0.35


@given(st.lists(st.text(alphabet=string.ascii_lowercase, min_size=1,
                        max_size=12), min_size=1, max_size=50, unique=True),
       st.integers(0, 100))
@settings(max_examples=50, deadline=None)
def test_md5_mask_monotone_in_pct(keys, pct):
    m_lo = md5_keep_mask(keys, pct)
    m_hi = md5_keep_mask(keys, min(100, pct + 10))
    # keep set grows monotonically with pct
    assert all((not lo) or hi for lo, hi in zip(m_lo, m_hi))


@given(st.floats(min_value=-1e6, max_value=1e6, allow_nan=False))
@settings(max_examples=200, deadline=None)
def test_round6_stable(x):
    r = float(round6(x))
    assert abs(r - x) <= 5e-7 + 1e-12 * abs(x)
    assert float(round6(r)) == r


@given(words_st)
@settings(max_examples=100, deadline=None)
def test_shingles_count(ws):
    t = " ".join(ws)
    sh = word_shingles(t, 3)
    n = len(t.split())
    assert len(sh) == (max(1, n - 2) if n else 0)
