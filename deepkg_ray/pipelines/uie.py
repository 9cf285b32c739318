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
