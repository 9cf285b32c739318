"""Unit tests for the per-batch kernels (no Ray execution needed)."""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from deepkg_ray.functions.textnorm import add_text_norm, normalize_text
from deepkg_ray.stages.mention import DictionaryMentionDetector, compile_alias_regex
from deepkg_ray.stages.relation import RelationExtractor


def test_normalize_length_preserving():
    cases = ["Hello WORLD", "ｆｕｌｌＷＩＤＴＨ", "tab\there", "mixed　ＴＥＸＴ\x01x"]
    for c in cases:
        n = normalize_text(c)
        assert len(n) == len(c)
    assert normalize_text("ＡＢＣ") == "abc"
    assert normalize_text("a\tb") == "a b"
    assert normalize_text("Ｘ　ｙ") == "x y"


def test_add_text_norm_keeps_raw():
    t = pa.table({"text": ["FOO ｂａｒ", "plain"]})
    out = add_text_norm(t)
    assert out["text"].to_pylist() == ["FOO ｂａｒ", "plain"]
    assert out["text_norm"].to_pylist() == ["foo bar", "plain"]


def test_alias_regex_longest_first():
    rx = compile_alias_regex(["ab", "abc"])
    assert rx.match("abcd").group(0) == "abc"   # maximal match wins


@pytest.fixture(scope="module")
def dict_path(synth_dir):
    return os.path.join(synth_dir, "dictionary.parquet")


def _mini_batch(texts):
    n = len(texts)
    return add_text_norm(pa.table({
        "conv_id": pa.array([f"c{i}" for i in range(n)], pa.string()),
        "turn_idx": pa.array(list(range(n)), pa.int32()),
        "text": pa.array(texts, pa.string()),
    }))


def test_mention_detector_offsets(dict_path, synth_dir):
    det = DictionaryMentionDetector(dict_path)
    some_alias = next(iter(det.alias_map))
    texts = [f"hello there. we saw {some_alias} yesterday.", "nothing here."]
    out = det(_mini_batch(texts))
    assert out.num_rows == 1
    r = out.to_pylist()[0]
    assert r["surface"] == some_alias
    assert texts[0][r["start_idx"]:r["end_idx"] + 1] == some_alias
    assert r["conv_id"] == "c0"


def test_mention_detector_batch_boundaries(dict_path):
    det = DictionaryMentionDetector(dict_path)
    a1, a2 = list(det.alias_map)[:2]
    # mentions in different rows must map to their own rows
    out = det(_mini_batch([f"x {a1}.", f"y {a2}.", "z."])).to_pylist()
    assert [(r["conv_id"], r["surface"]) for r in out] == [("c0", a1), ("c1", a2)]


def test_relation_extractor_semantics(dict_path):
    rel = RelationExtractor(dict_path)
    # pick a PERSON and an ORG surface from the alias map
    person = next(s for s, m in rel.alias_map.items() if m[1] == "PERSON")
    org = next(s for s, m in rel.alias_map.items() if m[1] == "ORG")
    loc = next(s for s, m in rel.alias_map.items() if m[1] == "LOC")
    good = f"prelude words. {person} works at {org}."
    out = rel(_mini_batch([good])).to_pylist()
    assert len(out) == 1
    assert out[0]["pred"] == "works_at"
    assert out[0]["subj_text"] == person and out[0]["obj_text"] == org
    assert good[out[0]["subj_start"]:out[0]["subj_start"] + len(person)] == person

    # type constraint: LOC works at ORG is NOT a triple
    bad_type = f"prelude. {loc} works at {org}."
    assert rel(_mini_batch([bad_type])).num_rows == 0

    # unknown surface: not in dictionary → rejected
    bad_surf = f"prelude. qqq zz works at {org}."
    assert rel(_mini_batch([bad_surf])).num_rows == 0

    # sentence must terminate with "."
    unterminated = f"prelude. {person} works at {org}"
    assert rel(_mini_batch([unterminated])).num_rows == 0

    # no crossing of row boundaries
    split = [f"prelude. {person} works at ", f"{org}."]
    assert rel(_mini_batch(split)).num_rows == 0


def test_kernel_parity_with_gold(synth_dir, dict_path):
    """Engine kernels reproduce the planted golds exactly (P/R = 1.0) on a
    full shard — the in-process version of the north-star P/R ≥ 0.95 gate."""
    batch = add_text_norm(pq.read_table(
        os.path.join(synth_dir, "transcripts", "part-0000.parquet")))
    det = DictionaryMentionDetector(dict_path)
    rel = RelationExtractor(dict_path)
    m, r = det(batch), rel(batch)

    gm = pq.read_table(os.path.join(synth_dir, "mentions_gold.parquet"))
    cols = ["conv_id", "turn_idx", "start_idx", "end_idx", "type", "surface", "entity_id"]
    assert set(zip(*[m[c].to_pylist() for c in cols])) == \
        set(zip(*[gm[c].to_pylist() for c in cols]))

    gt = pq.read_table(os.path.join(synth_dir, "triples_gold.parquet"))
    tcols = ["conv_id", "turn_idx", "pred", "subj_text", "obj_text"]
    assert set(zip(*[r[c].to_pylist() for c in tcols])) == \
        set(zip(*[gt[c].to_pylist() for c in tcols]))


# --------------------------------------------------------- Chinese path -----

def test_t2s_fold_known_pairs():
    from deepkg_ray.functions.zh import t2s
    from deepkg_ray.functions.textnorm import normalize_text
    cases = {"醜": "丑", "東": "东", "馬": "马", "魚": "鱼", "龍": "龙",
             "愛": "爱", "學": "学", "體": "体", "聽": "听", "書": "书"}
    for trad, simp in cases.items():
        assert t2s(trad) == simp
        assert normalize_text(trad) == simp          # folded inside normalize
    s = "東亞學會 ABC Ｘｙｚ"
    n = normalize_text(s)
    assert len(n) == len(s)                          # CJK length invariant
    assert n == "东亚学会 abc xyz"


def test_dict_segmenter_gold():
    from deepkg_ray.functions.zh import DictSegmenter
    seg = DictSegmenter({"北京": 100, "北京大学": 200, "大学": 80,
                         "生": 5, "学生": 50, "研究": 60, "研究生": 90,
                         "命": 5, "生命": 70, "起源": 40})
    # longest/most-probable route wins
    assert seg.cut("北京大学") == ["北京大学"]
    assert seg.cut("研究生命起源") == ["研究", "生命", "起源"]
    # OOV chars fall back to single chars
    assert seg.cut("xx北京yy") == ["x", "x", "北京", "y", "y"]
    assert seg.cut("") == []


def test_dict_segmenter_maximal_match_equal_freq():
    """With equal freqs the DP reduces to maximal matching — the AutoNER
    annotation.h semantics the trie matcher also follows."""
    from deepkg_ray.functions.zh import DictSegmenter
    seg = DictSegmenter(["ab", "abc", "cd", "d"])
    assert seg.cut("abcd") == ["abc", "d"]


def test_cut_dict_mode():
    from deepkg_ray.functions.zh import DictSegmenter
    from deepkg_ray.stages.linking import cut
    seg = DictSegmenter(["alpha beta", "alpha", "beta"])
    assert cut("alpha", "dict", segmenter=seg) == ["alpha"]
    import pytest as _pt
    with _pt.raises(ValueError):
        cut("x", "dict")


def test_t2s_phrase_level_conversion():
    """opencc TSPhrases semantics: context-dependent multi-char entries
    override the per-char fold, exception phrases keep traditional chars,
    and length is preserved on every input."""
    from deepkg_ray.functions.zh import T2S_TABLE, t2s_phrases
    # context-dependent: 乾 folds in 乾燥 but NOT in 乾隆
    assert t2s_phrases("乾燥") == "干燥"
    assert t2s_phrases("乾隆") == "乾隆"
    assert t2s_phrases("瞭解瞭望") == "了解瞭望"
    assert t2s_phrases("鞦韆颱風藉口") == "秋千台风借口"
    # fallback between matches is the per-char table
    assert t2s_phrases("東乾燥馬") == "东干燥马"
    # zhe/zhù split on 著: action senses fold to 着, writing senses keep 著
    assert t2s_phrases("執著著手") == "执着着手"
    assert t2s_phrases("著名著作") == "著名著作"
    assert t2s_phrases("接著著急") == "接着着急"
    # second-char contextual simplification (傢俱→家具, not 家俱)
    assert t2s_phrases("傢俱傢伙") == "家具家伙"
    # jiè→借 vs exception phrases that keep 藉
    assert t2s_phrases("憑藉藉助") == "凭借借助"
    assert t2s_phrases("狼藉慰藉") == "狼藉慰藉"
    # length invariant on arbitrary mixes (incl. ASCII + partial phrases)
    import random
    rng = random.Random(9)
    pool = list("乾燥隆瞭解望鞦韆颱風藉口東馬abc 123")
    for _ in range(200):
        s = "".join(rng.choice(pool) for _ in range(rng.randint(0, 30)))
        assert len(t2s_phrases(s)) == len(s)
    # a phrase split across the boundary is NOT converted as a phrase
    assert t2s_phrases("乾") == "干"                 # char fold applies alone


def test_llr_collocations_golden():
    """Hand-checked G² on a 3-bigram corpus: 'a b' twice, 'a c' once —
    frequent pair scores higher than the singleton; brute-force Dunning
    formula parity."""
    import math
    import pandas as pd
    import ray.data as rd
    from deepkg_ray.stages.phrasemine import llr_collocations
    docs = pd.DataFrame({"text": ["a b", "a b", "a c"]})
    out = (llr_collocations(rd.from_pandas(docs))
           .sort_values(["w1", "w2"]).reset_index(drop=True))
    assert out["w1"].tolist() == ["a", "a"]
    assert out["w2"].tolist() == ["b", "c"]
    assert out["cnt"].tolist() == [2, 1]

    def g2(k11, r, c, n):
        tot = 0.0
        for k, row, col in [(k11, r, c), (r - k11, r, n - c),
                            (c - k11, n - r, c),
                            (n - r - c + k11, n - r, n - c)]:
            if k > 0:
                tot += k * math.log((k * n) / (row * col))
        return 2.0 * tot

    exp_ab = g2(2, 3, 2, 3)
    exp_ac = g2(1, 3, 1, 3)
    assert abs(out["llr"][0] - round(exp_ab, 6)) < 2e-6
    assert abs(out["llr"][1] - round(exp_ac, 6)) < 2e-6


def test_role_entity_cells_distinct_turns(dict_path):
    """Two aliases of the SAME entity in one turn: n_mentions=2, n_turns=1;
    the same alias from two roles stays separated by role."""
    from deepkg_ray.stages.mention import RoleEntityCells
    det = RoleEntityCells(dict_path)
    # find an entity with >= 2 aliases
    by_eid = {}
    for s, (eid, et, _) in det.alias_map.items():
        by_eid.setdefault(eid, []).append(s)
    eid, aliases = next((e, a) for e, a in by_eid.items() if len(a) >= 2)
    a1, a2 = aliases[:2]
    b = add_text_norm(pa.table({
        "conv_id": pa.array(["c0", "c1"], pa.string()),
        "turn_idx": pa.array([0, 0], pa.int32()),
        "text": pa.array([f"we saw {a1} and {a2}.", f"again {a1}."],
                         pa.string()),
        "role": pa.array(["user", "assistant"], pa.string())}))
    out = {(r["role"], r["entity_id"]): r for r in det(b).to_pylist()}
    assert out[("user", eid)]["n_mentions"] == 2
    assert out[("user", eid)]["n_turns"] == 1
    assert out[("assistant", eid)]["n_mentions"] == 1
