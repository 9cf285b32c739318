"""Config-driven pipeline assembly — the engine's user-extension surface.

The reference exposes extension through abstract classes + adapter dicts and
an ini-file Config (AbstractTokenizer tokenizer.py:12-39,
AbstractFeatureExtractor extractors.py:18-51, cut-function adapter
BM25_Model.py:22-28, Config ini ExtractionEntities/Config.py:4-47,
UIE_torch/Config.py:21-58).  Here the analog is a *stage registry*: named
factories from stage name → Dataset transform, plus a declarative pipeline
spec (list of {stage, params}) that `build_pipeline` folds over a source
Dataset.  Users register their own stages with ``@register_stage``.
"""

from __future__ import annotations

from collections.abc import Callable

STAGE_REGISTRY: dict[str, Callable] = {}


def register_stage(name: str):
    def deco(fn):
        STAGE_REGISTRY[name] = fn
        return fn
    return deco


def build_pipeline(ds, spec: list[dict], context: dict | None = None,
                   callbacks=None):
    """Fold a declarative spec over a Dataset:
    spec = [{"stage": "normalize"}, {"stage": "mentions",
             "params": {"dictionary_path": ...}}, ...]
    Params named in ``context`` are resolved from it (e.g. paths).
    ``callbacks`` (state/callbacks.py) get begin/end and per-stage events —
    the reference's lifecycle Callback surface (AutoPhraseX
    callbacks.py:5-120)."""
    from deepkg_ray.state.callbacks import Callback, CallbackList
    cbs = callbacks if isinstance(callbacks, Callback) else CallbackList(callbacks)
    context = context or {}
    cbs.begin()
    for step in spec:
        fn = STAGE_REGISTRY[step["stage"]]
        params = dict(step.get("params", {}))
        for k, v in params.items():
            if isinstance(v, str) and v.startswith("$"):
                params[k] = context[v[1:]]
        cbs.on_stage_begin(step["stage"], params)
        ds = fn(ds, **params)
        cbs.on_stage_end(step["stage"], ds)
    cbs.end()
    return ds


# ---- built-in registrations -------------------------------------------------

@register_stage("normalize")
def _normalize(ds):
    from deepkg_ray.functions.textnorm import add_text_norm
    return ds.map_batches(add_text_norm, batch_format="pyarrow",
                          batch_size=8192)


@register_stage("mentions")
def _mentions(ds, dictionary_path: str, **kw):
    from deepkg_ray.stages.mention import detect_mentions
    return detect_mentions(ds, dictionary_path, **kw)


@register_stage("triples")
def _triples(ds, dictionary_path: str, **kw):
    from deepkg_ray.stages.relation import extract_triples
    return extract_triples(ds, dictionary_path, **kw)


@register_stage("link")
def _link(ds, dictionary_path: str, **kw):
    from deepkg_ray.stages.linking import link_triples
    return link_triples(ds, dictionary_path, **kw)


@register_stage("adjacency")
def _adjacency(ds, **kw):
    from deepkg_ray.stages.canonical import aggregate_adjacency
    return aggregate_adjacency(ds, **kw)


@register_stage("dedup_exact")
def _dedup_exact(ds, **kw):
    from deepkg_ray.stages.dedup import dedup_exact
    return dedup_exact(ds, **kw)


@register_stage("doc_stats")
def _doc_stats(ds, **kw):
    from deepkg_ray.stages.textstats import doc_stats
    return doc_stats(ds, **kw)


@register_stage("encode")
def _encode(ds, **kw):
    from deepkg_ray.stages.linking import encode_texts
    return encode_texts(ds, **kw)
