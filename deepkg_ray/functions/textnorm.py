"""Length-preserving text normalization.

Semantics modeled on the reference's uniformization chain — full-width →
half-width folding and lowercasing (AutoPhraseX-main/autophrasex/utils.py:33-49,
tokenizer.py:17-39) and control-character stripping
(ExtractionEntities/utils/tools.py:47-63) — with one deliberate difference:
every mapping here is 1 char → 1 char (controls map to space instead of being
deleted, no NFD decomposition), so **char offsets in the normalized text are
identical to offsets in the raw text**.  That is how the engine preserves the
reference's token↔char alignment contract (tools.py:23-75) without carrying a
per-row char_mapping: mention spans computed on `text_norm` are valid spans
into the untouched `text` column (SURVEY.md §7.5 "per-turn text equality").
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def _build_table() -> dict[int, int]:
    t: dict[int, int] = {}
    for i in list(range(0x00, 0x20)) + [0x7F]:   # C0 controls + DEL → space
        t[i] = 0x20
    for i in range(0xFF01, 0xFF5F):              # full-width ASCII block → ASCII
        t[i] = i - 0xFEE0
    t[0x3000] = 0x20                             # ideographic space
    t[0x0130] = 0x69                             # İ → i (lower() would expand
    # it to 'i̇', 2 chars — the one Unicode char whose lowercase grows)
    # traditional → simplified fold (1:1 pairs only, so the length invariant
    # holds) — the reference's opencc t2s step (AutoPhraseX tokenizer.py:17-39)
    from deepkg_ray.functions.zh import T2S_TABLE
    t.update(T2S_TABLE)
    return t


NORM_TABLE = _build_table()

# rows that are already pure printable-ASCII need no Python pass (ASCII
# lower() is always length-preserving; non-ASCII rows take the per-char fold)
_NEEDS_FOLD_RE = r"[^\x20-\x7e]|[\x00-\x1f\x7f]"


def _fold_char(c: str) -> str:
    c = NORM_MAP_STR.get(c, c)
    lc = c.lower()
    return lc if len(lc) == 1 else c   # never let lower() change the length


NORM_MAP_STR = {chr(k): chr(v) for k, v in NORM_TABLE.items()}


def normalize_array(arr: pa.Array | pa.ChunkedArray) -> pa.Array | pa.ChunkedArray:
    """Vectorized lower + width-fold + control→space over an Arrow string
    array.  The needs-fold test runs on the RAW strings (pre-lower), because
    folding must see the original char to stay length-preserving.

    Rows stay on the C path (utf8_lower) unless they contain non-printable/
    non-ASCII chars; only those few rows take the per-char Python fold and
    are scattered back with replace_with_mask — the batch never round-trips
    through Python lists (was ~30% of normalize cost at 8%-weird-row data)."""
    needs = pc.match_substring_regex(arr, _NEEDS_FOLD_RE)
    low = pc.utf8_lower(arr)
    if not pc.any(needs).as_py():
        return low
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
        needs = needs.combine_chunks()
        low = low.combine_chunks()
    needs = pc.fill_null(needs, False)
    fixed = pa.array([normalize_text(s)
                      for s in arr.filter(needs).to_pylist()], pa.string())
    return pc.replace_with_mask(low, needs, fixed)


def normalize_text(s: str) -> str:
    """Single-string variant (unit tests / oracles).  Guaranteed
    length-preserving: len(normalize_text(s)) == len(s) for every s — the
    invariant the span/offset story rests on (see module docstring)."""
    if s.isascii():
        return s.lower().translate(NORM_TABLE)
    return "".join(map(_fold_char, s))


def add_text_norm(batch: pa.Table, text_col: str = "text",
                  out_col: str = "text_norm") -> pa.Table:
    """map_batches kernel: append a normalized view, keep the raw column
    untouched (the reference mutates text in place via char_mapping; we must
    not — SURVEY.md §7.5)."""
    norm = normalize_array(batch[text_col])
    if isinstance(norm, pa.ChunkedArray):
        norm = norm.combine_chunks()
    return batch.append_column(out_col, norm)


def md5_keep_mask(keys: list[str], keep_pct: int) -> list[bool]:
    """Deterministic row-sampling mask: keep iff the first md5 byte of the
    key is < keep_pct*256/100.  Seeded-hash analog of the reference's
    negative-sample filter (utils_torch.py:133-139) that is reproducible
    across processes AND expressible in SQL (DuckDB md5())."""
    import hashlib
    cut = keep_pct * 256 // 100
    return [int(hashlib.md5(k.encode()).hexdigest()[:2], 16) < cut
            for k in keys]
