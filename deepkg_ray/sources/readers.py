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
