"""PII scrubbing and benchmark decontamination over a document table.

Two training-data-pipeline operators the reference lacks but any corpus
cleaning run needs (C4 / RefinedWeb style; the reference's closest analogs
are the uniformization maps, AutoPhraseX tokenizer.py:17-39, which rewrite
text per record the same way):

- ``pii_scrub``: vectorized regex redaction of emails / URLs / phone
  numbers with per-category match counts.  The patterns are deliberately
  restricted to constructs whose semantics are identical between Python
  ``re`` and DuckDB's RE2 (character classes, greedy quantifiers, no
  backrefs) so the scrub is SQL-oracle-checkable character for character.
- ``decontaminate``: flag documents sharing any word n-gram with a
  benchmark corpus (the GPT-3 appendix-C training-set decontamination
  shape).  The benchmark n-gram set is the small side: mode='broadcast'
  ships it once via ``ray.put`` (right whenever the benchmark is
  benchmark-sized); mode='join' keeps it a Dataset and hash-joins on the
  gram for the open-ended case.

Scale notes: both stages are stateless vectorized kernels over batches;
decontaminate's join mode shuffles (doc_id, gram) pairs — bounded by
total corpus grams — and never materializes the corpus anywhere.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa

from deepkg_ray.util import rows_all

# ---------------------------------------------------------------- pii scrub

# Patterns restricted to the Python-re ∩ RE2 common subset (see module
# docstring).  Order matters and is part of the contract: emails are
# scrubbed before URLs so a URL pattern never eats an address' domain.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("url", r"https?://[A-Za-z0-9./_-]+", "<URL>"),
    ("phone", r"\d{3}-\d{3}-\d{4}", "<PHONE>"),
]


def source_pii_rates(ds, text_col: str = "text",
                     src_col: str = "source"):
    """Per-source PII exposure audit: for each PII class (the
    pii_scrub pattern set — emails, URLs, phones), how many documents
    contain ≥ 1 hit and the total hit count — the report a data-owner
    reads BEFORE deciding whether scrubbing suffices or the source
    must be dropped.  Patterns stay in the Python-re ∩ RE2 subset so
    DuckDB regexp oracles are exact (the pii_scrub contract).

    Shuffle shape: per-batch vectorized findall counts collapse to
    (source, kind) cells — dictionary-bounded tree merge.  Returns
    (source, kind, n_docs, n_docs_hit, n_hits, hit_rate)."""
    import re

    import pandas as pd

    from deepkg_ray.stages.treeagg import merge_partials

    pats = [(k, re.compile(p)) for k, p, _ in PII_PATTERNS]

    def cells(b: pa.Table) -> pd.DataFrame:
        texts = b[text_col].to_pylist()
        srcs = b[src_col].to_pylist()
        rows = []
        for s, t in zip(srcs, texts):
            for kind, rx in pats:
                n = len(rx.findall(t))
                rows.append((s, kind, 1, 1 if n else 0, n))
        g = (pd.DataFrame(rows, columns=["source", "kind", "n_docs",
                                         "n_docs_hit", "n_hits"])
             .groupby(["source", "kind"], as_index=False).sum())
        for c in ("n_docs", "n_docs_hit", "n_hits"):
            g[c] = g[c].astype("int64")
        return g

    merged = merge_partials(
        ds.select_columns([src_col, text_col]).map_batches(
            cells, batch_format="pyarrow"),
        ["source", "kind"],
        {"n_docs": "sum", "n_docs_hit": "sum", "n_hits": "sum"},
        mode="tree")

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        nd = df["n_docs"].to_numpy(np.int64)
        nh = df["n_docs_hit"].to_numpy(np.int64)
        return df.assign(hit_rate=np.floor(
            nh / nd.astype(np.float64) * 1e6 + 0.5) / 1e6)

    return merged.map_batches(finish, batch_format="pandas",
                              batch_size=None)


def pii_scrub_kernel(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Count then redact each PII category.  Counts are taken on the
    pre-scrub text; replacements are applied sequentially in PII_PATTERNS
    order — both facts mirrored in oracle.pii_scrub_oracle."""
    s = pd.Series(batch[text_col].to_pylist(), dtype=object)
    out = batch.select([c for c in batch.column_names if c != text_col])
    scrubbed = s
    for name, pat, rep in PII_PATTERNS:
        rx = re.compile(pat)
        counts = s.str.count(rx).to_numpy(np.int64)
        scrubbed = scrubbed.str.replace(rx, rep, regex=True)
        out = out.append_column(f"n_{name}s", pa.array(counts, pa.int64()))
    return out.append_column("text_scrubbed",
                             pa.array(scrubbed.tolist(), pa.string()))


def pii_scrub(ds, text_col: str = "text", id_col: str = "doc_id"):
    return ds.select_columns([id_col, text_col]).map_batches(
        lambda b: pii_scrub_kernel(b, text_col), batch_format="pyarrow",
        batch_size=8192)


def augment_pii_kernel(batch: pa.Table, text_col: str = "text",
                       id_col: str = "doc_id") -> pa.Table:
    """Deterministically append synthetic PII derived from the row id —
    the test-input builder for the scrub demo (the public testdata corpus
    contains no PII, so the query injects its own; the SQL oracle appends
    the identical suffix).  Not part of the scrub operator itself."""
    ids = batch[id_col].to_pylist()
    texts = batch[text_col].to_pylist()
    aug = [f"{t} contact doc{d}@mail.example.com see "
           f"https://docs.example.org/d/{d} call 202-555-{d % 10000:04d}"
           for d, t in zip(ids, texts)]
    return batch.set_column(batch.schema.get_field_index(text_col), text_col,
                            pa.array(aug, pa.string()))


def augment_urls_kernel(batch: pa.Table, text_col: str = "text",
                        id_col: str = "doc_id") -> pa.Table:
    """Deterministically append id-derived URLs spanning several hosts —
    the test-input builder for domain_stats (the public testdata corpus
    contains no URLs; the SQL oracle appends the identical suffix).
    Every doc links one of 7 site hosts; every 3rd doc also links a CDN
    host, so per-domain doc and occurrence counts differ."""
    ids = batch[id_col].to_pylist()
    texts = batch[text_col].to_pylist()
    aug = [f"{t} link https://site{d % 7}.example.com/p/{d}"
           + (" more https://cdn.example.net/x" if d % 3 == 0 else "")
           for d, t in zip(ids, texts)]
    return batch.set_column(batch.schema.get_field_index(text_col), text_col,
                            pa.array(aug, pa.string()))


# ----------------------------------------------------------- decontaminate

_WS = re.compile(r"\s+")


def _doc_grams(text: str, n: int) -> list[str]:
    t = text.strip()
    ws = _WS.split(t) if t else []
    return [" ".join(ws[i:i + n]) for i in range(len(ws) - n + 1)]


def benchmark_ngrams(bench_ds, n: int, text_col: str = "text"):
    """Distinct word n-grams of the benchmark corpus as a (gram,) Dataset —
    per-batch set partial, then a distinct-bounded tree merge."""
    from deepkg_ray.stages.treeagg import merge_partials

    def partial(b: pa.Table) -> pa.Table:
        grams: set[str] = set()
        for t in b[text_col].to_pylist():
            grams.update(_doc_grams(t, n))
        return pa.table({"gram": pa.array(sorted(grams), pa.string()),
                         "one": pa.array([1] * len(grams), pa.int64())})

    merged = merge_partials(bench_ds.select_columns([text_col]).map_batches(
        partial, batch_format="pyarrow"), ["gram"], {"one": "max"}, fanout=2)
    return merged.select_columns(["gram"])


def _hits_kernel(batch: pa.Table, bench: frozenset, n: int, text_col: str,
                 id_col: str) -> pa.Table:
    ids = batch[id_col].to_pylist()
    hits = np.empty(len(ids), dtype=np.int64)
    for i, t in enumerate(batch[text_col].to_pylist()):
        hits[i] = len({g for g in _doc_grams(t, n)} & bench)
    return pa.table({
        id_col: pa.array(ids, batch[id_col].type),
        "n_hits": pa.array(hits, pa.int64()),
        "contaminated": pa.array((hits > 0).astype(np.int64), pa.int64()),
    })


def decontaminate(ds, bench_ds, n: int = 4, text_col: str = "text",
                  id_col: str = "doc_id", mode: str = "broadcast"):
    """(doc_id, n_hits, contaminated) per input doc: n_hits = number of
    DISTINCT word n-grams the doc shares with the benchmark corpus.

    mode='broadcast': collect the (benchmark-bounded) distinct gram set to
    the driver once, ``ray.put`` it, intersect per batch — zero shuffles.
    mode='join': explode (doc_id, gram-distinct-within-doc) rows, inner
    hash-join against the benchmark gram Dataset, count per doc; returns
    ONLY contaminated docs (the open-vocab escape hatch — callers union
    the zero-hit remainder via an anti-join when they need it)."""
    import ray

    if mode == "join":
        def explode(b: pa.Table) -> pa.Table:
            ids, grams = [], []
            for d, t in zip(b[id_col].to_pylist(), b[text_col].to_pylist()):
                for g in set(_doc_grams(t, n)):
                    ids.append(d)
                    grams.append(g)
            return pa.table({id_col: pa.array(ids, b[id_col].type),
                             "gram": pa.array(grams, pa.string())})

        pairs = ds.select_columns([id_col, text_col]).map_batches(
            explode, batch_format="pyarrow")
        joined = pairs.join(bench_ds, join_type="inner", num_partitions=8,
                            on=("gram",))
        hits = joined.groupby(id_col).count()

        def finish(b: pa.Table) -> pa.Table:
            cnt = b["count()"].to_numpy(zero_copy_only=False).astype(np.int64)
            return pa.table({
                id_col: b[id_col],
                "n_hits": pa.array(cnt, pa.int64()),
                "contaminated": pa.array(np.ones(len(cnt), dtype=np.int64),
                                         pa.int64()),
            })
        return hits.map_batches(finish, batch_format="pyarrow")

    bench = frozenset(r["gram"] for r in rows_all(bench_ds))
    ref = ray.put(bench)

    def per_batch(b: pa.Table) -> pa.Table:
        return _hits_kernel(b, ray.get(ref), n, text_col, id_col)

    return ds.select_columns([id_col, text_col]).map_batches(
        per_batch, batch_format="pyarrow", batch_size=8192)


# URL host extraction: the capture-group refinement of the PII url pattern
# (kept in re ∩ RE2 so DuckDB regexp_extract_all(text, pat, 1) is the exact
# oracle; the host stops at the first character outside [A-Za-z0-9._-]).
URL_HOST_RE = re.compile(r"https?://([A-Za-z0-9._-]+)")


def domain_stats(ds, text_col: str = "text", id_col: str = "doc_id"):
    """Per-domain URL exposure over the corpus: (domain, n_docs, n_occ) —
    how many documents mention each URL host and how many URL occurrences
    point at it.  The CommonCrawl-pipeline staple behind domain blocklists
    (UT1-style) and per-domain quality/dedup decisions.

    Plan: per-batch (domain → occurrences, distinct-doc count) combiner
    rows — exact, since batches never split a document — then the
    cardinality-auto merge (web domain counts are Zipfian: usually
    tree-sized, but the shuffle tier engages above 2M distinct hosts).
    Engine-only addition (the reference has no URL analytics)."""
    from deepkg_ray.stages.treeagg import merge_partials

    def partial(b: pa.Table) -> pa.Table:
        occ: dict[str, int] = {}
        docs: dict[str, int] = {}
        for t in b[text_col].to_pylist():
            hosts = URL_HOST_RE.findall(t)
            for h in hosts:
                occ[h] = occ.get(h, 0) + 1
            for h in set(hosts):
                docs[h] = docs.get(h, 0) + 1
        return pa.table({
            "domain": pa.array(list(occ.keys()), pa.string()),
            "n_docs": pa.array([docs[h] for h in occ], pa.int64()),
            "n_occ": pa.array(list(occ.values()), pa.int64())})

    part = (ds.select_columns([id_col, text_col])
            .map_batches(partial, batch_format="pyarrow"))
    return merge_partials(part, ["domain"],
                          {"n_docs": "sum", "n_occ": "sum"}, mode="auto")
