"""UIE-style generative extraction pipeline: transcripts → seq2struct
generator (SEL strings) → SEL parser → relation records → triples.

This is the reference's main extraction path
(UIE_torch/run_seq2struct_torch.py:115-146: model.generate → decode →
SEL2Record per instance) re-expressed as two Ray stages:

1. a **generator actor pool** emitting one SEL string per turn.  The real
   tier would hold a T5ForConditionalGeneration replica per GPU actor
   (import-gated here — torch is not in this container); the bundled
   ``TemplateSEL`` generator is the deterministic stand-in: it builds the
   SEL string from the same sentence templates the transcripts were
   synthesized with, so the downstream parse is exercised on realistic,
   well-formed-and-occasionally-truncated generator output.

2. the stateless ``Sel2RecordKernel`` parse (stages/selparse.py) with the
   record schema broadcast in the constructor.

End-to-end this path must produce the SAME triples as the direct
mention-anchored path (pipelines/kg.py) — the driver checks it against the
same SQL oracle.
"""

from __future__ import annotations

import pyarrow as pa

from deepkg_ray import synth
from deepkg_ray.functions.textnorm import add_text_norm
from deepkg_ray.sources.readers import read_transcripts
from deepkg_ray.stages.relation import RelationExtractor
from deepkg_ray.stages.selparse import Sel2RecordKernel, convert_spot_asoc
from deepkg_ray.synth import ENTITY_TYPES, RELATION_TEMPLATES


class TemplateSEL:
    """Deterministic 'generator': text → SEL string via the template
    extractor + records→SEL serializer.  Stands in for the T5 actor tier
    (same __init__/__call__ contract; swap in a TorchSeq2SEL with
    num_gpus=1 for the model tier)."""

    def __init__(self, dictionary_path: str, text_col: str = "text_norm"):
        self.extractor = RelationExtractor(dictionary_path, text_col=text_col)
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        triples = self.extractor(batch)
        # group extracted records per input row, serialize to SEL
        per_row: dict[tuple, list[dict]] = {}
        for r in triples.to_pylist():
            key = (r["conv_id"], r["turn_idx"])
            recs = per_row.setdefault(key, [])
            # spot = subject with an asoc (pred, obj) — the spot-asoc shape
            for rec in recs:
                if rec["type"] == r["subj_type"] and rec["spot"] == r["subj_text"]:
                    rec["asocs"].append((r["pred"], r["obj_text"]))
                    break
            else:
                recs.append({"type": r["subj_type"], "spot": r["subj_text"],
                             "asocs": [(r["pred"], r["obj_text"])]})
            # objects are entity spots too (the gold-side annonote_graph
            # emits every entity as a spot) — without this the downstream
            # projection would fall back to the subject's type for the tail
            # (sel2record.py:83)
            if not any(rec["type"] == r["obj_type"] and
                       rec["spot"] == r["obj_text"] for rec in recs):
                recs.append({"type": r["obj_type"], "spot": r["obj_text"],
                             "asocs": []})
        sels = []
        for c, t in zip(batch["conv_id"].to_pylist(),
                        batch["turn_idx"].to_pylist()):
            recs = per_row.get((c, t))
            sels.append(convert_spot_asoc(recs) if recs else
                        "<extra_id_0> <extra_id_1>")
        return (batch.select(["conv_id", "turn_idx", self.text_col])
                .append_column("pred_sel", pa.array(sels, pa.string())))


class NumpySeq2SEL:
    """Model tier that actually RUNS in this container: a seeded-random
    numpy encoder-decoder behind the exact tokenizer/generate/decode chain
    of the reference T5 tier (run_seq2struct_torch.py:115-137).  __init__
    builds tokenizer + weights once per actor (vocab from the entity
    dictionary + predicates + SEL structure tokens — the reference builds
    its tokenizer from the schema's spot/asoc names, t5tokenizer.py:27-133);
    __call__ batch-encodes, greedy-generates, batch-decodes to `pred_sel`.

    Being untrained, its SEL output is structurally arbitrary — the
    downstream Sel2RecordKernel must repair/parse it without crashing,
    which is the same robustness contract the reference demands of
    early-training checkpoints."""

    def __init__(self, dictionary_path: str, text_col: str = "text_norm",
                 d_model: int = 48, seed: int = 11, max_length: int = 48,
                 enc_len: int = 64):
        import pyarrow.parquet as pq
        from deepkg_ray.stages.seq2seq import SELTokenizer, TinySeq2Seq
        t = pq.read_table(dictionary_path, columns=["name", "type"])
        words: list[str] = ["[", "]", ":"]
        words += sorted({w for n in t["name"].to_pylist() for w in n.split()})
        words += sorted(set(t["type"].to_pylist()))
        words += sorted({p for p, _, _, _ in RELATION_TEMPLATES})
        self.tok = SELTokenizer(words)
        self.model = TinySeq2Seq(len(self.tok), d_model=d_model, seed=seed,
                                 pad_id=self.tok.pad_id,
                                 eos_id=self.tok.eos_id)
        self.text_col = text_col
        self.max_length = max_length
        self.enc_len = enc_len

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_col].to_pylist()
        ids = self.tok.encode_batch(texts, max_len=self.enc_len)
        gen = self.model.generate(ids, max_length=self.max_length)
        sels = [self.tok.decode(row) for row in gen]
        return (batch.select(["conv_id", "turn_idx", self.text_col])
                .append_column("pred_sel", pa.array(sels, pa.string())))


class TorchSeq2SEL:
    """Trained-checkpoint tier; import-gated (no torch in this container).
    Same contract: __init__ loads tokenizer+model once per (GPU) actor,
    __call__ batch-generates SEL strings (model.generate(max_length=192),
    run_seq2struct_torch.py:115-137).  NumpySeq2SEL above exercises the
    identical actor/tokenizer/decode plumbing on CPU."""

    def __init__(self, model_path: str, **_):
        try:
            import torch  # noqa: F401
        except ImportError as e:
            raise NotImplementedError(
                "torch is not available in this environment; use NumpySeq2SEL "
                "(real generate loop) or TemplateSEL (deterministic)") from e


def triples_via_sel(sf_dir: str, *, concurrency=(1, 8), generator=TemplateSEL,
                    limit: int | None = None):
    """transcripts → SEL generator actor pool → Sel2RecordKernel →
    surface-triple rows (conv_id, turn_idx, pred, subj/obj text+type).
    `generator` selects the tier: TemplateSEL (deterministic, oracle-exact),
    NumpySeq2SEL (real generate loop, untrained), TorchSeq2SEL (trained)."""
    dict_path = synth.dictionary_path(sf_dir)
    ds = read_transcripts(synth.transcripts_path(sf_dir))
    if limit is not None:
        ds = ds.limit(limit)
    ds = ds.map_batches(add_text_norm, batch_format="pyarrow", batch_size=8192)
    sel = ds.map_batches(generator,
                         fn_constructor_kwargs={"dictionary_path": dict_path},
                         batch_format="pyarrow", batch_size=4096,
                         concurrency=concurrency)
    # schema: entity types as spots, predicates as asocs — broadcast object
    asoc_types = {p for p, _, _, _ in RELATION_TEMPLATES}
    parsed = sel.map_batches(
        Sel2RecordKernel,
        fn_constructor_kwargs={"entity_types": set(ENTITY_TYPES),
                               "event_types": set(),
                               "asoc_types": asoc_types,
                               "sel_col": "pred_sel",
                               "text_col": "text_norm"},
        batch_format="pyarrow", batch_size=4096, concurrency=concurrency)
    return parsed


class TrainedSeq2SEL:
    """Trained-checkpoint model tier: loads the tiny attention
    encoder-decoder checkpoint once per actor and batch-generates SEL
    strings — the CPU-scale analog of the reference's fine-tuned
    T5ForConditionalGeneration inference (run_seq2struct_torch.py:115-137:
    tokenizer(batch, padding=True) → model.generate → batch_decode).
    Operates on SENTENCE rows (the reference's instance unit); sources are
    encoded in the schema-vocabulary mode (drop_oov=True, the trained
    tokenizer's closed task vocabulary)."""

    def __init__(self, ckpt_path: str, text_col: str = "sent",
                 enc_len: int = 12, max_length: int = 26,
                 dtype: str = "float32"):
        from deepkg_ray.stages.seq2seq import load_checkpoint
        self.model, self.tok, self.meta = load_checkpoint(ckpt_path)
        if dtype == "float32":
            # inference-only downcast: halves the matmul bandwidth of the
            # decode loop.  Deterministic (float32 math is), and safe here
            # because every consumer of this tier is accuracy-asserted
            # (trained_extraction_metrics raises below P/R 95) — pass
            # dtype="float64" to reproduce the training-precision logits.
            import numpy as np
            for p in self.model.param_names():
                setattr(self.model, p,
                        getattr(self.model, p).astype(np.float32))
        self.model.freeze_for_inference()
        self.text_col = text_col
        self.enc_len = enc_len
        self.max_length = max_length

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_col].to_pylist()
        ids = self.tok.encode_batch(texts, max_len=self.enc_len,
                                    drop_oov=True)
        # decode in ~1k-row chunks regardless of the caller's batch size:
        # the per-step K/V working set then stays cache-resident (measured
        # ~1.5-5x over one huge call; outputs are row-independent)
        sels: list[str] = []
        for i in range(0, len(ids), 1024):
            gen = self.model.generate(ids[i:i + 1024],
                                      max_length=self.max_length)
            sels.extend(self.tok.decode(row) for row in gen)
        return batch.append_column("pred_sel", pa.array(sels, pa.string()))


def split_sentences(batch: pa.Table, text_col: str = "text_norm") -> pa.Table:
    """Explode turns into sentence rows — the reference's per-instance unit
    (one generate() call per text instance).  '.' terminates every synth
    sentence and never appears inside a token (synth.py invariants), so a
    vectorized split_pattern is exact."""
    import pyarrow.compute as pc
    parts = pc.split_pattern(batch[text_col], ".")
    flat = pc.utf8_trim_whitespace(pc.list_flatten(parts))
    parent = pc.list_parent_indices(parts)
    keep = pc.not_equal(flat, "")
    taken = batch.select(["conv_id", "turn_idx"]).take(parent.filter(keep))
    return taken.append_column("sent", flat.filter(keep))


def checkpoint_path() -> str:
    """Cache location for the trained tiny checkpoint.  The entity
    dictionary is scale-invariant (synth.build_dictionary is seeded and
    independent of sf), so one checkpoint serves every sf_dir."""
    import os
    return os.path.join(synth.SYNTH_ROOT, synth.SYNTH_VERSION,
                        "tiny_seq2seq_attn_v1.npz")


def ensure_trained_checkpoint(sf_dir: str, *, epochs: int = 70,
                              stop_below: float = 5e-4) -> str:
    """Idempotently train + cache the tiny attention seq2struct checkpoint
    on the dictionary-derived fine-tune corpus (build_sel_training_corpus).
    Pure numpy, driver-side, seconds-to-minutes — the analog of the
    reference's offline fine-tune step; inference then runs distributed
    through the actor pool.  Early-stops once mean token loss < stop_below."""
    import os
    path = checkpoint_path()
    if os.path.exists(path):
        return path
    import pyarrow.parquet as pq
    from deepkg_ray.state.callbacks import Callback
    from deepkg_ray.stages.seq2seq import (SELTokenizer, TinySeq2Seq,
                                           build_schema_vocab,
                                           build_sel_training_corpus,
                                           save_checkpoint,
                                           train_tiny_seq2seq)
    from deepkg_ray.synth import EVENT_TYPES

    class _StopBelow(Callback):
        def on_epoch_end(self, epoch, state):
            if float(state.get("loss", 1e9)) < stop_below:
                state["early_stop"] = True

    rows = pq.read_table(synth.dictionary_path(sf_dir)).to_pylist()
    words = build_schema_vocab(rows, RELATION_TEMPLATES, ENTITY_TYPES)
    tok = SELTokenizer(words)
    pairs = build_sel_training_corpus(rows, RELATION_TEMPLATES, EVENT_TYPES)
    model = TinySeq2Seq(len(tok), d_model=128, seed=13, pad_id=tok.pad_id,
                        eos_id=tok.eos_id, order2=True, pos_emb=26,
                        attn=True, enc_pos=16)
    res = train_tiny_seq2seq(model, tok, pairs, epochs=epochs,
                             batch_size=256, lr=3e-3, enc_len=12,
                             dec_len=26, drop_oov=True,
                             callbacks=[_StopBelow()])
    tmp = path + ".tmp.npz"
    save_checkpoint(tmp, model, words,
                    meta={"final_loss": res["losses"][-1],
                          "epochs_run": len(res["losses"]),
                          "n_pairs": len(pairs)})
    os.replace(tmp, path)
    return path


def _norm_split(batch: pa.Table) -> pa.Table:
    """Fused normalize + sentence explode (one task stage, arrow-native)."""
    return split_sentences(add_text_norm(batch))


def trained_triples(sf_dir: str, *, concurrency=None,
                    dedup_sentences: bool = True,
                    num_partitions: int | None = None):
    """transcripts → sentence explode → TRAINED generator (worker-cached
    task pool: the checkpoint loads once per worker process, util.py
    stateful_map) → Sel2RecordKernel → surface-triple rows.  The model path
    of triples_via_sel: same parse, but pred_sel comes from a genuinely
    trained neural generate loop.

    ``dedup_sentences`` (default): identical sentences are generated ONCE —
    hash(sentence) → groupby-first over the hash → generate + parse the
    unique set → hash-join the records back onto the (conv_id, turn_idx)
    occurrences.  Exactly the dedup_exact plan; the neural decode (the one
    compute-bound stage in the engine) runs on distinct inputs only.  The
    64-bit key is pandas siphash13 (functions/hashing.stable_hash64_batch);
    at n distinct sentences the collision odds are ~n²/2⁶⁵ (negligible
    below ~10⁹ distinct), and a collision can only drop/duplicate records
    for the colliding pair — the accuracy assertion downstream would trip."""
    from deepkg_ray.functions.hashing import stable_hash64_batch
    from deepkg_ray.util import stateful_map

    ckpt = ensure_trained_checkpoint(sf_dir)
    ds = read_transcripts(synth.transcripts_path(sf_dir),
                          columns=["conv_id", "turn_idx", "text"])
    sents = ds.map_batches(_norm_split, batch_format="pyarrow",
                           batch_size=8192)
    asoc_types = {p for p, _, _, _ in RELATION_TEMPLATES}
    parse_kwargs = {"entity_types": set(ENTITY_TYPES),
                    "event_types": set(),
                    "asoc_types": asoc_types,
                    "sel_col": "pred_sel",
                    "text_col": "sent"}

    if not dedup_sentences:
        sel = stateful_map(sents, TrainedSeq2SEL, {"ckpt_path": ckpt},
                           concurrency=concurrency, batch_size=2048)
        return stateful_map(sel, Sel2RecordKernel, parse_kwargs,
                            concurrency=concurrency, batch_size=2048)

    import numpy as np

    from deepkg_ray.stages.treeagg import merge_partials

    def add_key(b: pa.Table) -> pa.Table:
        h = stable_hash64_batch(b["sent"].to_pylist()).view(np.int64)
        return b.append_column("sk", pa.array(h, pa.int64()))

    # materialize once: BOTH branches (occurrence side of the join, unique
    # side of the merge tree) consume keyed — lazy would re-read +
    # re-normalize + re-split the corpus twice.  Narrow rows (two ints, a
    # hash, one sentence), object-store resident.
    keyed = sents.map_batches(add_key, batch_format="pyarrow",
                              batch_size=8192).materialize()
    # unique sentences: per-batch local dedup (cheap combiner) then the
    # cardinality-auto merge tree ('first' — all sents under one sk are
    # identical, so the pick is representative, not a choice); tree while
    # the distinct set fits one task, Ray groupby beyond
    def local_uniq(b: pa.Table) -> pa.Table:
        _, idx = np.unique(b["sk"].to_numpy(zero_copy_only=False),
                           return_index=True)
        return b.select(["sk", "sent"]).take(pa.array(idx))

    if num_partitions is None:
        from deepkg_ray.util import join_partitions
        num_partitions = join_partitions()
    uniq = merge_partials(
        keyed.map_batches(local_uniq, batch_format="pyarrow",
                          batch_size=8192),
        ["sk"], {"sent": "first"}, mode="auto")
    # the merge tree finishes in one block — spread the unique set back
    # out so the compute-bound generate stage parallelizes across the
    # WHOLE pool (2 blocks per CPU: decode is the engine's one
    # compute-bound stage, stragglers matter)
    from deepkg_ray.util import cluster_cpus
    uniq = uniq.repartition(max(num_partitions, 2 * cluster_cpus()))
    sel = stateful_map(uniq, TrainedSeq2SEL, {"ckpt_path": ckpt},
                       concurrency=concurrency, batch_size=2048)
    records = stateful_map(sel, Sel2RecordKernel, parse_kwargs,
                           concurrency=concurrency, batch_size=2048)
    occ = keyed.drop_columns(["sent"])
    joined = occ.join(records, join_type="inner",
                      num_partitions=num_partitions, on=("sk",))
    return joined.drop_columns(["sk"])


def trained_extraction_metrics(sf_dir: str, *, assert_prf: float = 95.0):
    """Accuracy-asserted trained-model query: run the trained tier over the
    whole corpus, score against the construction-gold triples with the
    distributed cogroup P/R/F1 (scoring.distributed_prf, 'set' semantics —
    per-turn distinct triples), and return one metrics row.  Raises if
    P or R falls below ``assert_prf`` (percent) — the trained checkpoint is
    expected to be near-exact on this closed-vocabulary task."""
    import os

    import pandas as pd
    import ray.data

    from deepkg_ray.stages.scoring import distributed_prf

    pred = trained_triples(sf_dir)
    gold_path = os.path.join(synth.ensure_synth(sf_dir),
                             "triples_gold.parquet")
    gold = ray.data.read_parquet(gold_path)
    tuple_cols = ("pred", "subj_type", "subj_text", "obj_type", "obj_text")
    res = distributed_prf(gold, pred, key_cols=("conv_id", "turn_idx"),
                          tuple_cols=tuple_cols, match_mode="set")
    if res["P"] < assert_prf or res["R"] < assert_prf:
        raise AssertionError(
            f"trained extraction degraded: P={res['P']:.2f} "
            f"R={res['R']:.2f} < {assert_prf}")
    return pd.DataFrame({"n_gold": [int(res["gold"])],
                         "n_pred": [int(res["pred"])],
                         "tp": [int(res["tp"])],
                         "precision_pct": [round(res["P"], 4)],
                         "recall_pct": [round(res["R"], 4)],
                         "f1_pct": [round(res["F1"], 4)]})


def model_sel_gold_path(sf_dir: str, *, limit: int = 2000) -> str:
    """Construction gold for the NumpySeq2SEL model tier: an INDEPENDENT
    re-implementation of the generate chain — per-sentence, no active-row
    compaction, no frozen lookup tables, no batched decode, scalar
    argmax — over the same limit-slice of transcripts, cached as a
    parquet the SQL oracle reads verbatim (the multimodal
    media_features_gold pattern: shared weight init + tokenizer, but the
    entire batching/caching/actor-pool execution path under test is
    re-derived from the bare recurrence).  Deterministic: seeded weights,
    file-order limit slice."""
    import os

    import numpy as np
    import pyarrow.parquet as pq

    out_path = os.path.join(synth.ensure_synth(sf_dir),
                            f"uie_model_gold_{limit}.parquet")
    if os.path.exists(out_path):
        return out_path

    dict_path = synth.dictionary_path(sf_dir)
    t = pq.read_table(synth.transcripts_path(sf_dir),
                      columns=["conv_id", "turn_idx", "text"]) \
        .slice(0, limit)
    t = add_text_norm(t)
    texts = t["text_norm"].to_pylist()

    # tokenizer + weights exactly as NumpySeq2SEL.__init__ builds them —
    # the INIT is shared (it is not under test); the forward is not
    from deepkg_ray.stages.seq2seq import SELTokenizer, TinySeq2Seq
    d = pq.read_table(dict_path, columns=["name", "type"])
    words: list[str] = ["[", "]", ":"]
    words += sorted({w for n in d["name"].to_pylist() for w in n.split()})
    words += sorted(set(d["type"].to_pylist()))
    words += sorted({p for p, _, _, _ in RELATION_TEMPLATES})
    tok = SELTokenizer(words)
    model = TinySeq2Seq(len(tok), d_model=48, seed=11,
                        pad_id=tok.pad_id, eos_id=tok.eos_id)
    E, W_enc, W_dec = model.E, model.W_enc, model.W_dec
    U, bvec = model.U, model.b
    max_length, enc_len = 48, 64

    sels = []
    for text in texts:
        ids = tok.encode_batch([text], max_len=enc_len)[0]
        mask = (ids != tok.pad_id).astype(E.dtype)
        emb = E[ids] * mask[:, None]
        denom = max(float(mask.sum()), 1.0)
        ctx = np.tanh((emb.sum(axis=0) / denom) @ W_enc)
        cu = ctx @ U
        prev = tok.pad_id
        out = np.full(max_length, tok.pad_id, dtype=np.int64)
        for step in range(max_length):
            h = np.tanh(E[prev] @ W_dec + cu + bvec)
            nxt = int(np.argmax(h @ E.T))
            out[step] = nxt
            if nxt == tok.eos_id:
                break
            prev = nxt
        sels.append(tok.decode(out))

    tmp = out_path + ".tmp"
    pq.write_table(pa.table({
        "conv_id": t["conv_id"],
        "turn_idx": t["turn_idx"],
        "pred_sel": pa.array(sels, pa.string())}), tmp)
    os.replace(tmp, out_path)
    return out_path


def model_sel_table(sf_dir: str, *, limit: int = 2000, concurrency=(1, 4)):
    """Per-turn SEL output of the REAL model tier (NumpySeq2SEL, seeded
    random weights) through the generator actor pool: (conv_id, turn_idx,
    pred_sel) — value-checked against the construction gold
    (model_sel_gold_path), which re-derives every string from the bare
    recurrence with none of the engine's batching/compaction/lookup-table
    machinery.  The parse branch (Sel2RecordKernel over the arbitrary
    model SEL) still runs as an internal smoke: its robustness contract —
    never crash on early-training-quality output — is asserted, its
    counts are not part of the compared artifact."""
    dict_path = synth.dictionary_path(sf_dir)
    ds = read_transcripts(synth.transcripts_path(sf_dir)).limit(limit)
    ds = ds.map_batches(add_text_norm, batch_format="pyarrow",
                        batch_size=8192)
    sel = ds.map_batches(NumpySeq2SEL,
                         fn_constructor_kwargs={"dictionary_path": dict_path},
                         batch_format="pyarrow", batch_size=1024,
                         concurrency=concurrency).materialize()
    asoc_types = {p for p, _, _, _ in RELATION_TEMPLATES}
    parsed = sel.map_batches(
        Sel2RecordKernel,
        fn_constructor_kwargs={"entity_types": set(ENTITY_TYPES),
                               "event_types": set(),
                               "asoc_types": asoc_types,
                               "sel_col": "pred_sel",
                               "text_col": "text_norm"},
        batch_format="pyarrow", batch_size=1024, concurrency=concurrency)
    assert parsed.count() >= 0          # parse must complete, not crash
    return sel.select_columns(["conv_id", "turn_idx", "pred_sel"])


def model_sel_stats(sf_dir: str, *, limit: int = 2000, concurrency=(1, 4)):
    """Model-tier smoke pipeline (rows-only driver query): run the REAL
    autoregressive generator (NumpySeq2SEL, seeded-random weights) over a
    bounded slice, parse with Sel2RecordKernel, and return one deterministic
    summary row: turns processed, SEL strings that decoded non-trivially,
    relation records that survived the parse.  Not SQL-expressible (model
    scoring) — the point is proving the generate→decode→parse chain runs
    end-to-end through the actor pool on CPU."""
    import pandas as pd

    dict_path = synth.dictionary_path(sf_dir)
    ds = read_transcripts(synth.transcripts_path(sf_dir)).limit(limit)
    ds = ds.map_batches(add_text_norm, batch_format="pyarrow", batch_size=8192)
    # the sel slice is bounded (`limit`) — materializing it lets the stats
    # and the parse branch share one generator execution
    sel = ds.map_batches(NumpySeq2SEL,
                         fn_constructor_kwargs={"dictionary_path": dict_path},
                         batch_format="pyarrow", batch_size=1024,
                         concurrency=concurrency).materialize()
    n_turns = sel.count()
    n_nonempty = sel.map_batches(
        lambda b: pa.table({"n": pa.array(
            [sum(1 for s in b["pred_sel"].to_pylist() if s.strip())],
            pa.int64())}), batch_format="pyarrow").sum("n")
    asoc_types = {p for p, _, _, _ in RELATION_TEMPLATES}
    parsed = sel.map_batches(
        Sel2RecordKernel,
        fn_constructor_kwargs={"entity_types": set(ENTITY_TYPES),
                               "event_types": set(),
                               "asoc_types": asoc_types,
                               "sel_col": "pred_sel",
                               "text_col": "text_norm"},
        batch_format="pyarrow", batch_size=1024, concurrency=concurrency)
    n_records = parsed.count()
    return pd.DataFrame({"n_turns": [n_turns],
                         "n_sel_nonempty": [int(n_nonempty or 0)],
                         "n_records": [n_records]})
