"""Parquet readers with column pruning for every table the engine touches.

Reading convention: always pass ``columns=[...]`` so only needed columns
leave storage (at 100 TB a read that loads all columns for a 2-column
transform is wrong).  The reference's whole-file ``json.load`` readers
(ExtractionEntities/data_processing/data_process.py:9-29,
UIE_torch/uie/seq2struct/utils_torch.py:98-102) become streaming
``ray.data.read_parquet`` here.
"""

from __future__ import annotations

import ray.data as rd

TRANSCRIPT_COLS = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]


def read_transcripts(path: str, columns: list[str] | None = None):
    """Transcript table (input_hint schema). Default prunes to the columns
    the KG pipeline needs."""
    return rd.read_parquet(path, columns=columns or ["conv_id", "turn_idx", "text"])


def read_table(sf_dir: str, name: str, columns: list[str] | None = None):
    return rd.read_parquet(f"{sf_dir}/{name}.parquet", columns=columns)


def read_documents(sf_dir: str, columns: list[str] | None = None):
    return read_table(sf_dir, "documents", columns)


def read_embeddings(sf_dir: str, columns: list[str] | None = None):
    return read_table(sf_dir, "embeddings", columns)


def read_events(sf_dir: str, columns: list[str] | None = None):
    return read_table(sf_dir, "events", columns)


def read_text_corpus(path: str):
    """Line-oriented text corpus (reference AutoPhraseX reader.py:46-91
    analog): one row per line, column 'text'."""
    import ray.data as rd
    return rd.read_text(path)


def read_jsonl(path: str):
    """jsonline reader (reference utils_torch.py:98-102 analog)."""
    import ray.data as rd
    return rd.read_json(path)


def export_text_corpus(ds, path: str, text_col: str = "text"):
    """Materialize a Dataset's text column as a plain-text corpus dir
    (debug/aux interchange; parquet remains the primary sink)."""
    import pyarrow as pa

    def to_lines(b: pa.Table) -> pa.Table:
        return b.select([text_col])
    ds.map_batches(to_lines, batch_format="pyarrow").write_csv(path)
    return path
