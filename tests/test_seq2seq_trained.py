"""Trained tiny-seq2seq tier: gradient exactness, checkpoint round-trip,
seeded-tier bit-stability, micro-task learnability, and the full
trained-extraction pipeline at sf0.001 (P/R asserted).

Reference parity: the torch fine-tune + generate chain of
UIE_torch/run_seq2struct_torch.py:115-137 — here a numpy attention
encoder-decoder trained on the dictionary-derived text→SEL corpus.
"""

import copy

import numpy as np
import pytest

from deepkg_ray.stages.seq2seq import (SELTokenizer, TinySeq2Seq,
                                       build_schema_vocab,
                                       build_sel_training_corpus,
                                       load_checkpoint, save_checkpoint,
                                       train_tiny_seq2seq)

SF = "/root/testdata/sf0.001"


def _loss_of(model, tok, pairs, enc_len=10, dec_len=8):
    """Full-batch mean token loss replicated independently of the trainer
    (forward only) — used for finite-difference checks."""
    pad = model.pad_id
    X = tok.encode_batch([s for s, _ in pairs], max_len=enc_len)
    Yfull = tok.encode_batch([t for _, t in pairs], max_len=dec_len)
    Yin = np.concatenate([np.full((len(Yfull), 1), pad, np.int64),
                          Yfull[:, :-1]], 1)
    Yin2 = np.concatenate([np.full((len(Yfull), 2), pad, np.int64),
                           Yfull[:, :-2]], 1)
    eos_pos = np.argmax(Yfull == model.eos_id, axis=1)
    Ymask = (np.arange(Yfull.shape[1])[None, :] <= eos_pos[:, None])
    x, y = X, Yfull
    B, T = y.shape
    L = x.shape[1]
    d = model.E.shape[1]
    xm = (x != pad).astype(np.float64)[:, :, None]
    emb = model.E[x] * xm
    denom = np.maximum(xm.sum(axis=1), 1.0)
    ctx = np.tanh((emb.sum(axis=1) / denom) @ model.W_enc)
    pre = model.E[Yin] @ model.W_dec + (ctx @ model.U)[:, None, :] + model.b
    if model.order2:
        pre = pre + model.E[Yin2] @ model.W_dec2
    if model.pos_emb:
        pre = pre + model.P[:T][None]
    h = np.tanh(pre)
    o = h
    if model.attn:
        kin = emb + model.Penc[:L][None] * xm
        K = kin @ model.W_k
        V = emb @ model.W_v
        q = h @ model.W_q
        sc = np.einsum("btd,bld->btl", q, K) / np.sqrt(d)
        sc = sc + (1.0 - xm[:, :, 0])[:, None, :] * -1e9
        sc -= sc.max(axis=2, keepdims=True)
        a = np.exp(sc)
        a /= a.sum(axis=2, keepdims=True)
        o = h + np.einsum("btl,bld->btd", a, V)
    logits = o @ model.E.T
    logits -= logits.max(axis=2, keepdims=True)
    p = np.exp(logits)
    p /= p.sum(axis=2, keepdims=True)
    py = np.take_along_axis(p, y[:, :, None], 2)[:, :, 0]
    nvalid = max(int(Ymask.sum()), 1)
    return float(-(np.log(np.maximum(py, 1e-12)) * Ymask).sum()) / nvalid


def test_gradients_match_finite_differences():
    """Adam's first step direction is exactly -sign(gradient) per coordinate;
    finite-difference the loss at sampled coordinates of EVERY parameter
    group (attention, position tables, second-order decoder included) and
    require sign agreement."""
    tok = SELTokenizer(["aa bb cc", "dd ee ff", "gg hh",
                        "<extra_id_0> x", "y z"])
    pairs = [("aa bb cc", "<extra_id_0> aa <extra_id_5> bb <extra_id_1>"),
             ("dd ee", "y z dd"), ("gg hh ff", "gg hh"), ("cc", "cc cc")]
    model = TinySeq2Seq(len(tok), d_model=6, seed=3, pad_id=tok.pad_id,
                        eos_id=tok.eos_id, order2=True, pos_emb=8,
                        attn=True, enc_pos=10)
    params = model.param_names()
    before = {p: getattr(model, p).copy() for p in params}
    m2 = copy.deepcopy(model)
    train_tiny_seq2seq(m2, tok, pairs, epochs=1, batch_size=64, lr=1e-3,
                       enc_len=10, dec_len=8)
    rng = np.random.default_rng(0)
    for p in params:
        arr = getattr(model, p)
        flat = arr.reshape(-1)
        coords = rng.choice(flat.size, size=min(flat.size, 25),
                            replace=False)
        step = (getattr(m2, p) - before[p]).reshape(-1)[coords]
        for c, s in zip(coords, step):
            old = flat[c]
            flat[c] = old + 1e-6
            lp = _loss_of(model, tok, pairs)
            flat[c] = old - 1e-6
            lm = _loss_of(model, tok, pairs)
            flat[c] = old
            g = (lp - lm) / 2e-6
            if abs(g) > 1e-9:
                assert np.sign(-g) == np.sign(s), \
                    f"grad sign mismatch in {p} at {c}"


def test_flags_off_is_bit_identical_to_base_tier():
    """order2/pos_emb/attn weights are drawn AFTER the base weights: the
    all-off model must produce byte-identical base matrices and generate()
    output regardless of python version / call order."""
    a = TinySeq2Seq(40, d_model=16, seed=11)
    b = TinySeq2Seq(40, d_model=16, seed=11, order2=True, pos_emb=8,
                    attn=True)
    for p in ["E", "W_enc", "W_dec", "U", "b"]:
        assert np.array_equal(getattr(a, p), getattr(b, p))
    ids = np.array([[5, 9, 2, 0], [7, 7, 1, 0]], dtype=np.int64)
    base = TinySeq2Seq(40, d_model=16, seed=11)
    assert np.array_equal(a.generate(ids, 12), base.generate(ids, 12))


def test_checkpoint_roundtrip(tmp_path):
    words = ["alpha beta", "gamma delta", "<extra_id_0> t"]
    tok = SELTokenizer(words)
    model = TinySeq2Seq(len(tok), d_model=12, seed=4, pad_id=tok.pad_id,
                        eos_id=tok.eos_id, order2=True, pos_emb=10,
                        attn=True, enc_pos=8)
    path = str(tmp_path / "ck.npz")
    save_checkpoint(path, model, words, meta={"k": 1})
    m2, tok2, meta = load_checkpoint(path)
    assert meta == {"k": 1}
    assert tok2.vocab == tok.vocab
    ids = tok.encode_batch(["alpha beta gamma"], max_len=8)
    assert np.array_equal(model.generate(ids, 10), m2.generate(ids, 10))


def test_micro_copy_task_learns():
    """The attention tier must learn a tiny copy-and-tag task to
    (near-)zero loss in seconds — the capability the bag-of-words base tier
    provably lacks (which source word to emit at each step)."""
    import random
    words = [f"w{i}" for i in range(12)]
    tok = SELTokenizer(words + ["<extra_id_0>", "<extra_id_5>",
                                "<extra_id_1>"])
    rng = random.Random(5)
    pairs = []
    for a in words:
        for b in words:
            if a != b and rng.random() < 0.7:
                pairs.append((f"{a} {b}",
                              f"<extra_id_0> {a} <extra_id_5> {b} "
                              f"<extra_id_1>"))
    model = TinySeq2Seq(len(tok), d_model=32, seed=9, pad_id=tok.pad_id,
                        eos_id=tok.eos_id, order2=True, pos_emb=8,
                        attn=True, enc_pos=6)
    res = train_tiny_seq2seq(model, tok, pairs, epochs=60, batch_size=64,
                             lr=5e-3, enc_len=4, dec_len=8)
    assert res["losses"][-1] < 0.02, res["losses"][-5:]
    # held-out-order generate: exact match on a sample
    sample = pairs[::7]
    ids = tok.encode_batch([s for s, _ in sample], max_len=4)
    gen = model.generate(ids, max_length=8)
    dec = [tok.decode(r) for r in gen]
    ok = sum(d == t for d, (_, t) in zip(dec, sample))
    assert ok >= int(0.95 * len(sample)), f"{ok}/{len(sample)}"


def test_corpus_and_vocab_are_deterministic():
    import pyarrow.parquet as pq

    from deepkg_ray import synth
    from deepkg_ray.synth import ENTITY_TYPES, EVENT_TYPES, RELATION_TEMPLATES
    rows = pq.read_table(synth.dictionary_path(SF)).to_pylist()
    v1 = build_schema_vocab(rows, RELATION_TEMPLATES, ENTITY_TYPES)
    v2 = build_schema_vocab(rows, RELATION_TEMPLATES, ENTITY_TYPES)
    assert v1 == v2
    p1 = build_sel_training_corpus(rows, RELATION_TEMPLATES, EVENT_TYPES)
    p2 = build_sel_training_corpus(rows, RELATION_TEMPLATES, EVENT_TYPES)
    assert p1 == p2
    # every subject alias must co-occur with BOTH object alias suffixes of
    # some partner (the coverage property whose absence caused suffix
    # confusion): check one template's combinations exist
    srcs = {s for s, _ in p1}
    assert any(" acquired " in s for s in srcs)


@pytest.mark.usefixtures("ray_session")
def test_trained_extraction_full_pipeline():
    """End-to-end: train/cache checkpoint, run the trained generator actor
    pool over every sf0.001 sentence, distributed-PRF against the
    construction gold — expected exact on this closed-vocabulary task."""
    from deepkg_ray.pipelines.uie import trained_extraction_metrics
    df = trained_extraction_metrics(SF)
    assert float(df["precision_pct"].iloc[0]) >= 99.9
    assert float(df["recall_pct"].iloc[0]) >= 99.9
    assert int(df["n_gold"].iloc[0]) > 1000
