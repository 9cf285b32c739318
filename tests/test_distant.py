"""AutoNER distant-supervision labeler (stages/distant.py) vs the
reference semantics (AutoNER/src/annotation.h + string_match.h):
Σδ² DP parity against brute force, case-variant inserts, stopword
cleaning, Unknown-spill boundaries, and the .ck round-trip."""

import itertools
import os

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

from deepkg_ray.stages import distant
from deepkg_ray.stages.distant import (FILTERED_TYPE, DistantLabeler,
                                       TrieKB, label_tokens, segment_dp,
                                       to_ck_lines)


def brute_force_best(tokens, kb, weight=1.0):
    """Max Σδ² over all segmentations by enumeration (small n only)."""
    n = len(tokens)
    best = [-1.0] * (n + 1)
    best[0] = 0.0
    for i in range(n):
        if best[i] < 0:
            continue
        # O step
        best[i + 1] = max(best[i + 1], best[i])
        u = 0
        for j in range(i, n):
            u = kb.child(u, tokens[j])
            if u < 0:
                break
            d = j - i + 1
            if kb.is_entity(u):
                best[j + 1] = max(best[j + 1], best[i] + d * d)
            elif kb.is_filtered(u):
                best[j + 1] = max(best[j + 1], best[i] + weight * d * d)
    return best[n]


def seg_score(tokens, segs, kb, weight=1.0):
    s = 0.0
    for l, r, ty in segs:
        if ty == "":
            continue
        d = r - l
        s += d * d if ty != FILTERED_TYPE else weight * d * d
    return s


def test_dp_overlapping_matches_prefers_longer():
    # "a b c": core has "a b" and "b c" (overlap) and "c" — DP must pick
    # the segmentation maximizing Σδ²: either {a b}(4)+{c}(1)=5 or
    # {a}(O)+{b c}(4)=4 → picks "a b"+"c"
    kb = TrieKB([("T1", "a b"), ("T2", "b c"), ("T3", "c")], [])
    segs = segment_dp(["a", "b", "c"], kb)
    assert ( [s for s in segs if s[2]] ==
             [(0, 2, "T1"), (2, 3, "T3")] )


def test_dp_longer_single_beats_two_short():
    # {a b c}(9) beats {a b}(4)+{c}(1)
    kb = TrieKB([("L", "a b c"), ("S1", "a b"), ("S2", "c")], [])
    segs = segment_dp(["a", "b", "c"], kb)
    assert [s for s in segs if s[2]] == [(0, 3, "L")]


def test_dp_equals_brute_force_random():
    rng = np.random.default_rng(7)
    vocab = ["a", "b", "c", "d"]
    surf_pool = ["a", "b c", "c d", "a b", "d", "b c d"]
    for trial in range(60):
        k = rng.integers(1, len(surf_pool) + 1)
        picks = list(rng.choice(surf_pool, size=k, replace=False))
        core = [(f"T{i}", s) for i, s in enumerate(picks[: (k + 1) // 2])]
        full = picks[(k + 1) // 2:]
        kb = TrieKB(core, full)
        toks = [vocab[i] for i in rng.integers(0, len(vocab), size=8)]
        segs = segment_dp(toks, kb)
        # valid segmentation, optimal score
        assert [l for l, r, _ in segs] == [0] + [r for _, r, _ in segs][:-1]
        assert seg_score(toks, segs, kb) == brute_force_best(toks, kb)


def test_weight_discounts_filtered():
    # full-dict "a b" (weight·4) vs core "b" (1): weight 0.2 → 0.8 < 1+0
    kb = TrieKB([("T", "b")], ["a b"])
    lo = segment_dp(["a", "b"], kb, weight=0.2)
    assert [s for s in lo if s[2]] == [(1, 2, "T")]
    hi = segment_dp(["a", "b"], kb, weight=1.0)
    assert [s for s in hi if s[2]] == [(0, 2, FILTERED_TYPE)]


def test_case_variants_and_stopwords():
    # plain type inserts raw + UPPER + lower; PER-typed skips lower
    kb = TrieKB([("DRUG", "Aspirin"), ("PER", "Smith")], [])
    assert kb.is_entity(kb.child(0, "ASPIRIN"))
    assert kb.is_entity(kb.child(0, "aspirin"))
    assert kb.is_entity(kb.child(0, "SMITH"))
    assert kb.child(0, "smith") == -1          # noLowercases for PER
    # stopword cleaning removes lower/UPPER/Capitalized unigram nodes
    kb2 = TrieKB([("ORG", "The")], [], stopwords=("the",))
    for form in ("the", "THE", "The"):
        u = kb2.child(0, form)
        assert u == -1 or not kb2.is_entity(u)


def test_multi_type_comma_join_sorted():
    kb = TrieKB([("PRODUCT", "x"), ("DISEASE", "x")], [])
    assert kb.types_str(kb.child(0, "x")) == "DISEASE,PRODUCT"


def test_filtered_spill_and_labels():
    # tokens: f0 FULL f1 CORE f2 ; FULL match at 1 → positions 1..2 Unknown
    kb = TrieKB([("ORG", "core")], ["dang"])
    rows = label_tokens(["f0", "dang", "f1", "core", "f2"], kb)
    assert rows[0] == ("f0", "I", "None", 1)
    assert rows[1] == ("dang", "O", "None", 0)     # Unknown
    assert rows[2] == ("f1", "O", "None", 0)       # spill one past end
    assert rows[3] == ("core", "I", "ORG", 1)
    assert rows[4] == ("f2", "I", "None", 1)


def test_entity_rebreaks_after_filtered_spill():
    # FULL match immediately followed by a core entity: the entity's
    # break overwrites the spilled Unknown at its start position
    # (annotation.h getBoundary processes segments left to right)
    kb = TrieKB([("ORG", "core")], ["dang"])
    rows = label_tokens(["dang", "core"], kb)
    assert rows[0] == ("dang", "O", "None", 0)
    assert rows[1] == ("core", "I", "ORG", 1)


def test_bigram_entity_connect_label():
    kb = TrieKB([("LOC", "new york")], [])
    rows = label_tokens(["in", "new", "york", "now"], kb)
    assert rows[1] == ("new", "I", "LOC", 1)
    assert rows[2] == ("york", "O", "LOC", 1)      # Connect
    assert rows[3] == ("now", "I", "None", 1)


def test_labeler_roundtrip_through_ck(tmp_path, sf_dir, ray_session):
    """DistantLabeler rows → .ck text → read_ck_corpus rows: identical."""
    import ray.data as rd
    from deepkg_ray import synth
    from deepkg_ray.sources.readers import read_ck_corpus
    sents_p, core_p, full_p = synth.distant_paths(sf_dir)
    sents = pq.read_table(sents_p).slice(0, 40)
    lab = DistantLabeler(core_p, full_p)(sents)
    df = lab.to_pandas()
    one_doc = df[df.doc_idx == 0].sort_values(["sent_idx", "token_idx"])
    ck = tmp_path / "out.ck"
    ck.write_text("-DOCSTART-\n" + to_ck_lines(one_doc))
    back = read_ck_corpus(str(ck)).to_pandas()
    # strip the <s>/<eof> sentinels the .ck format adds
    back = back[~back["token"].isin(["<s>", "<eof>"])]
    # sentence numbering differs (reader counts blank-line breaks) but the
    # per-sentence token streams must match exactly
    got = list(zip(back["token"], back["boundary"], back["types"],
                   back["safe"]))
    want = list(zip(one_doc["token"], one_doc["boundary"], one_doc["types"],
                    one_doc["safe"]))
    assert got == want
