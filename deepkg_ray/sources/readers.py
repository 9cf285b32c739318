"""Parquet readers with column pruning for every table the engine touches.

Reading convention: always pass ``columns=[...]`` so only needed columns
leave storage (at 100 TB a read that loads all columns for a 2-column
transform is wrong).  The reference's whole-file ``json.load`` readers
(ExtractionEntities/data_processing/data_process.py:9-29,
UIE_torch/uie/seq2struct/utils_torch.py:98-102) become streaming
``ray.data.read_parquet`` here.
"""

from __future__ import annotations

import pyarrow as pa
import ray.data as rd

TRANSCRIPT_COLS = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]


def read_transcripts(path: str, columns: list[str] | None = None,
                     num_cpus: float | None = None):
    """Transcript table (input_hint schema). Default prunes to the columns
    the KG pipeline needs.  num_cpus: per-read-task CPU request (fractional
    on tiny clusters so reads co-schedule with a fractional actor pool)."""
    kw = {"ray_remote_args": {"num_cpus": num_cpus}} if num_cpus else {}
    return rd.read_parquet(path, columns=columns or ["conv_id", "turn_idx", "text"],
                           **kw)


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


def read_ck_corpus(path: str):
    """.ck noisy-annotation corpus reader — the AutoNER distant-supervision
    train format: one ``token I/O type[,type...] [S|D]`` line per token
    (I = chunk break before the token, O = connected; the optional 4th
    column marks the annotation safe/dangerous), blank line between
    sentences, ``-DOCSTART-`` between documents (reference
    AutoNER/preprocess_partial_ner/encode_folder.py:55-75 read_noisy_corpus
    and the format comment at :62-68).

    One output row per token with (doc_idx, sent_idx, token_idx) position
    columns; structural lines are consumed.  Files parse independently
    (indices are per-file), so a directory of .ck shards parallelizes per
    file — the reader is a map_batches over ``read_binary_files`` rather
    than read_text because sentence grouping crosses line boundaries."""
    import ray.data as rd

    def parse(batch: pa.Table) -> pa.Table:
        cols: dict[str, list] = {k: [] for k in
                                 ("doc_idx", "sent_idx", "token_idx",
                                  "token", "boundary", "types", "safe")}
        for blob in batch["bytes"].to_pylist():
            doc_idx, sent_idx, tok_idx = 0, 0, 0
            started = False   # a -DOCSTART- before any sentence is doc 0
            in_sent = False
            for line in blob.decode("utf-8").split("\n"):
                if line.startswith("-DOCSTART-"):
                    if started:
                        doc_idx += 1
                    started = True
                    in_sent = False
                    tok_idx = 0
                    continue
                if not line or line.isspace():
                    if in_sent:
                        sent_idx += 1
                        in_sent = False
                        tok_idx = 0
                    continue
                parts = line.split()
                assert 3 <= len(parts) <= 4, f"wrong ck file format: {line!r}"
                cols["doc_idx"].append(doc_idx)
                cols["sent_idx"].append(sent_idx)
                cols["token_idx"].append(tok_idx)
                cols["token"].append(parts[0])
                cols["boundary"].append(parts[1])
                cols["types"].append(parts[2])
                # 3-column lines are implicitly safe (encode_folder.py:73-75)
                cols["safe"].append(1 if len(parts) == 3
                                    else int(parts[3] == "S"))
                tok_idx += 1
                in_sent = True
        return pa.table({
            "doc_idx": pa.array(cols["doc_idx"], pa.int64()),
            "sent_idx": pa.array(cols["sent_idx"], pa.int64()),
            "token_idx": pa.array(cols["token_idx"], pa.int64()),
            "token": pa.array(cols["token"], pa.string()),
            "boundary": pa.array(cols["boundary"], pa.string()),
            "types": pa.array(cols["types"], pa.string()),
            "safe": pa.array(cols["safe"], pa.int64()),
        })

    # one read block per input file: read_binary_files otherwise shreds a
    # single file into cluster-parallelism blocks, and Ray forwards the
    # resulting EMPTY blocks downstream without calling the UDF — their
    # 0-column schema then poisons the stream (the round-1 '32-CPU
    # empty-block condition').
    n_files = len(path) if isinstance(path, (list, tuple)) else 1
    return rd.read_binary_files(path, override_num_blocks=n_files).map_batches(
        parse, batch_format="pyarrow", batch_size=None)


def export_text_corpus(ds, path: str, text_col: str = "text"):
    """Materialize a Dataset's text column as a plain-text corpus dir
    (debug/aux interchange; parquet remains the primary sink)."""
    import pyarrow as pa

    def to_lines(b: pa.Table) -> pa.Table:
        return b.select([text_col])
    ds.map_batches(to_lines, batch_format="pyarrow").write_csv(path)
    return path


def _unique_out_dir(tmp_root: str, sf_dir: str) -> str:
    """Per-invocation output dir: two concurrent sessions over the same
    sf_dir (bench.py + driver_sim) must never share a sink path — a fixed
    path races (one reads a half-written / just-deleted directory)."""
    import os
    import uuid
    return os.path.join(
        tmp_root,
        f"{os.path.basename(sf_dir.rstrip('/'))}-{os.getpid()}"
        f"-{uuid.uuid4().hex[:8]}")


def csv_roundtrip_counts(sf_dir: str, tmp_root: str = "/tmp/deepkg_csv"):
    """CSV sink + source demonstrated as a verified roundtrip: events
    project to (event_type, value micros), write a partitioned CSV
    directory, read it back with ray.data.read_csv, and aggregate — the
    hash check against the parquet-side oracle proves the CSV layer is
    lossless (floats cross the text boundary as int64 micros, the only
    safe way to roundtrip doubles through CSV).  Reference analog: the
    json/jsonline interchange of the reference's readers
    (run_seq2struct.py data loading), here on the columnar CSV path.
    Returns (event_type, n, sum_micros)."""
    import os
    import shutil

    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    from deepkg_ray.functions.numeric import to_micros

    out_dir = _unique_out_dir(tmp_root, sf_dir)
    os.makedirs(out_dir, exist_ok=True)

    def proj(b: pa.Table) -> pa.Table:
        return pa.table({
            "event_type": b["event_type"],
            "vm": pa.array(to_micros(b["value"].to_pylist()), pa.int64())})

    (rd.read_parquet(f"{sf_dir}/events.parquet",
                     columns=["event_type", "value"])
     .map_batches(proj, batch_format="pyarrow")
     .write_csv(out_dir))

    back = rd.read_csv(out_dir)
    agg = (back.groupby("event_type")
           .aggregate(Count(alias_name="n"),
                      Sum("vm", alias_name="sum_micros")))
    # materialize the dictionary-sized result so the sink dir can be
    # removed before returning (the returned Dataset must not read it)
    out = agg.map_batches(
        lambda b: pa.table({
            "event_type": b["event_type"],
            "n": b["n"].combine_chunks().cast(pa.int64()),
            "sum_micros":
                b["sum_micros"].combine_chunks().cast(pa.int64())}),
        batch_format="pyarrow").to_pandas()
    shutil.rmtree(out_dir, ignore_errors=True)
    return rd.from_pandas(out)


def json_roundtrip_counts(sf_dir: str, tmp_root: str = "/tmp/deepkg_jsonl"):
    """JSONL sink + source as a verified roundtrip (the reference's
    jsonline writer/reader pair, sel2record output jsonlines — here
    Ray-native write_json/read_json over a partitioned directory).  Floats
    cross as int64 micros like csv_roundtrip_counts.  Returns
    (event_type, n, sum_micros)."""
    import os
    import shutil

    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    from deepkg_ray.functions.numeric import to_micros

    out_dir = _unique_out_dir(tmp_root, sf_dir)
    os.makedirs(out_dir, exist_ok=True)

    def proj(b: pa.Table) -> pa.Table:
        return pa.table({
            "event_type": b["event_type"],
            "vm": pa.array(to_micros(b["value"].to_pylist()), pa.int64())})

    (rd.read_parquet(f"{sf_dir}/events.parquet",
                     columns=["event_type", "value"])
     .map_batches(proj, batch_format="pyarrow")
     .write_json(out_dir))

    back = rd.read_json(out_dir)
    agg = (back.groupby("event_type")
           .aggregate(Count(alias_name="n"),
                      Sum("vm", alias_name="sum_micros")))
    out = agg.map_batches(
        lambda b: pa.table({
            "event_type": b["event_type"],
            "n": b["n"].combine_chunks().cast(pa.int64()),
            "sum_micros":
                b["sum_micros"].combine_chunks().cast(pa.int64())}),
        batch_format="pyarrow").to_pandas()
    shutil.rmtree(out_dir, ignore_errors=True)
    return rd.from_pandas(out)


def partitioned_prune_counts(sf_dir: str,
                             tmp_root: str = "/tmp/deepkg_part",
                             keep_type: str = "purchase",
                             cleanup: bool = True):
    """Hive-partitioned sink + partition-PRUNED source: events write as a
    parquet directory partitioned by event_type (write_parquet
    partition_cols — the resumable-output layout the 100-TB posture
    requires), then the read targets ONE partition directory so only that
    partition's row groups ever leave storage — the partition-pruning
    pattern that turns a full-table scan into a 1/k read.  Hash-checked
    against the predicate-filtered oracle on the unpartitioned base.
    Returns (n, sum_micros, n_users)."""
    import os
    import shutil

    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    from deepkg_ray.functions.numeric import to_micros

    out_dir = _unique_out_dir(tmp_root, sf_dir)
    os.makedirs(out_dir, exist_ok=True)

    def proj(b: pa.Table) -> pa.Table:
        return pa.table({
            "event_type": b["event_type"],
            "user_id": b["user_id"],
            "vm": pa.array(to_micros(b["value"].to_pylist()), pa.int64())})

    (rd.read_parquet(f"{sf_dir}/events.parquet",
                     columns=["event_type", "user_id", "value"])
     .map_batches(proj, batch_format="pyarrow")
     .write_parquet(out_dir, partition_cols=["event_type"]))

    pruned = rd.read_parquet(os.path.join(out_dir,
                                          f"event_type={keep_type}"))

    # per-user combiner groupby (user-bounded), tiny driver fold
    agg = pruned.groupby("user_id").aggregate(
        Count(alias_name="c"), Sum("vm", alias_name="s"))
    df = agg.to_pandas()
    if cleanup:
        shutil.rmtree(out_dir, ignore_errors=True)
    else:
        # layout-inspection mode (tests): leave the dir, report its path
        partitioned_prune_counts.last_out_dir = out_dir
    return pa.table({
        "n": pa.array([int(df["c"].sum())], pa.int64()),
        "sum_micros": pa.array([int(df["s"].sum())], pa.int64()),
        "n_users": pa.array([len(df)], pa.int64())})


def orc_roundtrip_counts(sf_dir: str, tmp_root: str = "/tmp/deepkg_orc"):
    """ORC sink + source as a verified roundtrip (columnar-interchange
    coverage beyond parquet/CSV/JSONL): events project to (event_type,
    value micros), each block writes ONE .orc file inside its task
    (pyarrow.orc — ray 2.49 has no native ORC datasource, so the sink is
    a map_batches side effect and the source is read_binary_files +
    per-file pyarrow.orc decode, both fully distributed), then the
    aggregate hash-checks against the parquet-side oracle.  Returns
    (event_type, n, sum_micros)."""
    import os
    import shutil
    import uuid

    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    from deepkg_ray.functions.numeric import to_micros

    out_dir = _unique_out_dir(tmp_root, sf_dir)
    os.makedirs(out_dir, exist_ok=True)

    def write_block(b: pa.Table) -> pa.Table:
        import pyarrow.orc as orc
        t = pa.table({
            "event_type": b["event_type"],
            "vm": pa.array(to_micros(b["value"].to_pylist()), pa.int64())})
        orc.write_table(t, os.path.join(out_dir,
                                        f"{uuid.uuid4().hex}.orc"))
        return pa.table({"n": pa.array([t.num_rows], pa.int64())})

    n_written = int(rd.read_parquet(f"{sf_dir}/events.parquet",
                                    columns=["event_type", "value"])
                    .map_batches(write_block, batch_format="pyarrow")
                    .sum("n"))

    def decode(b: pa.Table) -> pa.Table:
        import pyarrow.orc as orc
        tabs = [orc.read_table(pa.BufferReader(buf.as_py()))
                for buf in b["bytes"]]
        return pa.concat_tables(tabs) if tabs else pa.table({
            "event_type": pa.array([], pa.string()),
            "vm": pa.array([], pa.int64())})

    back = (rd.read_binary_files(out_dir)
            .select_columns(["bytes"])
            .map_batches(decode, batch_format="pyarrow"))
    agg = (back.groupby("event_type")
           .aggregate(Count(alias_name="n"),
                      Sum("vm", alias_name="sum_micros")))
    out = agg.map_batches(
        lambda b: pa.table({
            "event_type": b["event_type"],
            "n": b["n"].combine_chunks().cast(pa.int64()),
            "sum_micros":
                b["sum_micros"].combine_chunks().cast(pa.int64())}),
        batch_format="pyarrow").to_pandas()
    shutil.rmtree(out_dir, ignore_errors=True)
    assert int(out["n"].sum()) == n_written, "ORC roundtrip lost rows"
    return rd.from_pandas(out)
