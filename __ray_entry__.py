"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship KG pipeline at sf0.001; ``queries()`` exposes
one callable per implemented operator/pipeline (SURVEY.md §2), each taking
``sf_dir``; ``oracle_sql()`` returns the DuckDB-equivalent SQL for every
SQL-expressible query (same column names both sides).

Ray is initialised by the driver BEFORE this module is imported: nothing
here (or in deepkg_ray) calls ``ray.init()`` / ``ray.shutdown()``.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

SF_ORACLE = "/root/testdata/sf0.01"   # the driver's correctness scale


def entry() -> Any:
    """Flagship pipeline: transcripts → mentions → triples → linking →
    canonical adjacency, at sf0.001."""
    from deepkg_ray.pipelines import kg
    return kg.adjacency_dataset("/root/testdata/sf0.001")


# --------------------------------------------------------------- queries ----

def _q_kg_mention_counts(sf_dir: str):
    import pyarrow as pa
    from deepkg_ray.pipelines import kg
    from deepkg_ray.stages.treeagg import merge_partials
    keys = ["conv_id", "turn_idx", "surface", "entity_id", "type"]

    def combine(b: pa.Table) -> pa.Table:
        g = b.select(keys).to_pandas().groupby(keys, as_index=False).size()
        return pa.Table.from_pandas(g.rename(columns={"size": "n_occ"}),
                                    preserve_index=False)

    partial = kg.mentions_dataset(sf_dir).map_batches(combine,
                                                      batch_format="pyarrow")
    return merge_partials(partial, keys, {"n_occ": "sum"})


def _q_kg_mention_counts_sharded(sf_dir: str):
    """kg_mention_counts through the above-broadcast dictionary tier
    (shardeddict.detect_mentions_sharded, n_shards=4): hash-sharded
    automata over the replicated stream + greedy resolve — proven
    identical to the broadcast tier against the SAME SQL oracle."""
    import pyarrow as pa
    from deepkg_ray import synth
    from deepkg_ray.pipelines.kg import transcripts_with_norm
    from deepkg_ray.stages.shardeddict import detect_mentions_sharded
    from deepkg_ray.stages.treeagg import merge_partials
    keys = ["conv_id", "turn_idx", "surface", "entity_id", "type"]

    def combine(b: pa.Table) -> pa.Table:
        g = b.select(keys).to_pandas().groupby(keys, as_index=False).size()
        return pa.Table.from_pandas(g.rename(columns={"size": "n_occ"}),
                                    preserve_index=False)

    men = detect_mentions_sharded(transcripts_with_norm(sf_dir),
                                  synth.dictionary_path(sf_dir),
                                  n_shards=4)
    return merge_partials(men.map_batches(combine, batch_format="pyarrow"),
                          keys, {"n_occ": "sum"})


def _q_kg_mention_counts_delta(sf_dir: str):
    """kg_mention_counts through the dictionary-DELTA ingest path
    (shardeddict.detect_mentions_multi): the dictionary split into a
    base and a delta file, per-file candidate passes + global greedy
    resolve — proven identical to full-dictionary detection against the
    SAME SQL oracle (maximal matching is non-compositional; the resolve
    step is where the delta composes correctly)."""
    import os

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from deepkg_ray import synth
    from deepkg_ray.pipelines.kg import transcripts_with_norm
    from deepkg_ray.stages.shardeddict import detect_mentions_multi
    from deepkg_ray.stages.treeagg import merge_partials
    root = synth.ensure_synth(sf_dir)
    base_p = os.path.join(root, "dictionary_base.parquet")
    delta_p = os.path.join(root, "dictionary_delta.parquet")
    if not (os.path.exists(base_p) and os.path.exists(delta_p)):
        t = pq.read_table(synth.dictionary_path(sf_dir))
        eid = np.asarray(t["entity_id"].to_pylist(), np.int64)
        pq.write_table(t.filter(pa.array(eid % 2 == 0)),
                       base_p + ".tmp")
        os.replace(base_p + ".tmp", base_p)
        pq.write_table(t.filter(pa.array(eid % 2 == 1)),
                       delta_p + ".tmp")
        os.replace(delta_p + ".tmp", delta_p)
    men = detect_mentions_multi(transcripts_with_norm(sf_dir),
                                [base_p, delta_p])
    keys = ["conv_id", "turn_idx", "surface", "entity_id", "type"]

    def combine(b: pa.Table) -> pa.Table:
        g = b.select(keys).to_pandas().groupby(keys, as_index=False).size()
        return pa.Table.from_pandas(g.rename(columns={"size": "n_occ"}),
                                    preserve_index=False)

    return merge_partials(men.map_batches(combine, batch_format="pyarrow"),
                          keys, {"n_occ": "sum"})


def _q_bm25_topn_sharded(sf_dir: str):
    """bm25_topn through the sharded index tier
    (shardeddict.bm25_candidates_sharded, n_shards=3): per-shard dense tf
    with global idf/avgdl, cross-shard top-5 merge — same SQL oracle as
    the broadcast tier."""
    import pandas as pd
    import ray.data as rd
    from deepkg_ray import synth
    from deepkg_ray.stages.shardeddict import bm25_candidates_sharded
    dict_path = synth.dictionary_path(sf_dir)
    aliases = rd.read_parquet(dict_path, columns=["aliases"]).to_pandas()
    surf = pd.DataFrame({"surface": sorted({a for al in aliases["aliases"]
                                            for a in al})})
    return bm25_candidates_sharded(rd.from_pandas(surf), dict_path,
                                   n_shards=3, top_n=5)


def _q_kg_triples(sf_dir: str):
    from deepkg_ray.pipelines import kg
    return kg.surface_triples_dataset(sf_dir).select_columns(
        ["conv_id", "turn_idx", "pred", "subj_text", "subj_type",
         "obj_text", "obj_type"])


def _q_kg_adjacency(sf_dir: str):
    from deepkg_ray.pipelines import kg
    return kg.adjacency_dataset(sf_dir)


def _q_kg_incremental(sf_dir: str):
    """Incremental ingest proof: adjacency built on the first half of the
    transcript files, then the second half's delta folded in with
    update_adjacency — must hash-equal the full-rebuild oracle."""
    import glob
    from deepkg_ray import synth
    from deepkg_ray.pipelines.kg import (adjacency_dataset_for_files,
                                         update_adjacency)
    files = sorted(glob.glob(f"{synth.transcripts_path(sf_dir)}/*.parquet"))
    half = max(1, len(files) // 2)
    base = adjacency_dataset_for_files(sf_dir, files[:half])
    delta = adjacency_dataset_for_files(sf_dir, files[half:])
    return update_adjacency(base, delta)


def _q_kg_entities(sf_dir: str):
    from deepkg_ray.pipelines import kg
    from deepkg_ray.stages.canonical import entity_table
    return entity_table(kg.adjacency_dataset(sf_dir))


def _q_kg_predicates(sf_dir: str):
    from deepkg_ray.pipelines import kg
    from deepkg_ray.stages.canonical import predicate_table
    return predicate_table(kg.adjacency_dataset(sf_dir))


def _q_entity_spans(sf_dir: str):
    """Entity lifecycle timeline: first/last mention microsecond + total
    mention count per entity (partition-merge plan, no generic join)."""
    from deepkg_ray import synth
    from deepkg_ray.pipelines import kg
    from deepkg_ray.sources.readers import read_transcripts
    from deepkg_ray.stages.mention import entity_spans
    turns = read_transcripts(synth.transcripts_path(sf_dir),
                             columns=["conv_id", "turn_idx", "ts"])
    return entity_spans(kg.mentions_dataset(sf_dir), turns)


def _q_entity_lifespan(sf_dir: str):
    """Per-entity temporal lineage with a day dimension: total mentions,
    first/last mention microsecond and distinct active days — fused
    detect+collapse (mention rows never shuffle; ts attaches batch-locally),
    then two dictionary-×-days-bounded tree merges."""
    from deepkg_ray.pipelines import kg
    return kg.entity_lifespan_dataset(sf_dir)


def _q_decayed_adjacency(sf_dir: str):
    """Freshness-weighted KG edges: per-extraction exp-decay in exact
    int64 micros, fused extract+decay+collapse, ts-only Max pre-pass."""
    from deepkg_ray.pipelines import kg
    return kg.decayed_adjacency_dataset(sf_dir)


def _q_kg_entity_relatedness(sf_dir: str):
    """Entity-relatedness edges: conversation-set Jaccard per entity
    pair (conv-grain co-presence, degree-normalized)."""
    from deepkg_ray.pipelines import kg
    from deepkg_ray.stages.mention import entity_relatedness
    return entity_relatedness(kg.mentions_dataset(sf_dir))


def _q_conv_entity_entropy(sf_dir: str):
    """Per-conversation entity-mention entropy (topical-focus signal)."""
    from deepkg_ray.pipelines import kg
    from deepkg_ray.stages.mention import conv_entity_entropy
    return conv_entity_entropy(kg.mentions_dataset(sf_dir))


def _q_mention_gini(sf_dir: str):
    """Mention-concentration Gini per entity type (KG hot-key skew
    diagnostic, exact-integer sorted form)."""
    from deepkg_ray.pipelines import kg
    from deepkg_ray.stages.mention import mention_concentration_gini
    return mention_concentration_gini(kg.mentions_dataset(sf_dir))


def _q_alias_usage(sf_dir: str):
    """Alias-usage distribution per entity (canonicalization evidence)."""
    from deepkg_ray.pipelines import kg
    from deepkg_ray.stages.mention import alias_usage
    return alias_usage(kg.mentions_dataset(sf_dir))


def _q_edge_provenance(sf_dir: str):
    """Distinct evidencing conversations per canonical edge (trust/
    diversity signal beside raw weight)."""
    from deepkg_ray.pipelines import kg
    from deepkg_ray.stages.canonical import edge_provenance
    return edge_provenance(kg.linked_triples_dataset(sf_dir))


def _q_entity_transitions(sf_dir: str):
    """Discourse-flow entity transition edges across consecutive turns
    (conversation-complete partitions, dictionary²-bounded merge)."""
    from deepkg_ray.pipelines import kg
    from deepkg_ray.stages.mention import entity_transitions
    return entity_transitions(kg.mentions_dataset(sf_dir))


def _q_conv_profile(sf_dir: str):
    """Per-conversation knowledge-density profile (turns, mentions,
    distinct entities, triples) — padded partial streams summed by one
    cardinality-auto merge, no generic join."""
    from deepkg_ray.pipelines import kg
    return kg.conv_profile_dataset(sf_dir)


def _q_entity_timeseries(sf_dir: str):
    """Per-entity activity time series (entity_id, bucket, n)."""
    from deepkg_ray.pipelines import kg
    return kg.entity_timeseries_dataset(sf_dir)


def _q_entity_burst(sf_dir: str):
    """Burst concentration per entity: peak bucket share of mentions."""
    from deepkg_ray.pipelines import kg
    return kg.entity_burst_dataset(sf_dir)


def _q_kg_entity_introducer(sf_dir: str):
    """Which role introduces entities per conversation (initiative
    signal; argmin turn inside conv-complete partitions)."""
    from deepkg_ray import synth
    from deepkg_ray.pipelines.kg import transcripts_with_norm
    from deepkg_ray.stages.mention import entity_introducer
    ds = transcripts_with_norm(
        sf_dir, columns=["conv_id", "turn_idx", "text", "role"])
    return entity_introducer(ds, synth.dictionary_path(sf_dir))


def _q_role_entity_affinity(sf_dir: str):
    """Who talks about what: (role, entity_id, type, n_mentions, n_turns)
    via the fused detect+collapse plan (role attaches batch-locally)."""
    from deepkg_ray.pipelines import kg
    return kg.role_entity_affinity_dataset(sf_dir)


def _q_lang_confusion(sf_dir: str):
    """Lang-id heuristic confusion matrix vs the gold lang column."""
    from deepkg_ray.sources.readers import read_documents
    from deepkg_ray.stages.textstats import lang_confusion
    return lang_confusion(read_documents(sf_dir, ["text", "lang"]))


def _q_conv_sessions(sf_dir: str):
    """Per-conversation session segmentation (gap > 30 min splits) over
    conversation-complete hash partitions."""
    import ray.data as rd
    from deepkg_ray import synth
    from deepkg_ray.stages.convgroup import conv_sessions
    return conv_sessions(rd.read_parquet(
        synth.transcripts_path(sf_dir), columns=["conv_id", "turn_idx",
                                                 "ts"]))


def _q_kg_cooccurrence_pmi(sf_dir: str):
    """PMI-scored entity co-occurrence edges (ranked edge proposals)."""
    import glob
    import pyarrow.parquet as pq
    from deepkg_ray import synth
    from deepkg_ray.pipelines import kg
    from deepkg_ray.stages.mention import cooccurrence_pmi
    n_total = sum(pq.read_metadata(f).num_rows for f in
                  glob.glob(synth.transcripts_path(sf_dir) + "/*.parquet"))
    return cooccurrence_pmi(kg.mentions_dataset(sf_dir), n_total)


def _q_kg_pred_cardinality(sf_dir: str):
    """Relation-cardinality classes (1:1/1:N/N:1/M:N) per predicate."""
    from deepkg_ray.pipelines import kg
    from deepkg_ray.stages.canonical import predicate_cardinality
    return predicate_cardinality(kg.adjacency_dataset(sf_dir))


def _q_kg_schema(sf_dir: str):
    """Predicate type-signature induction over the canonical graph."""
    from deepkg_ray.pipelines import kg
    from deepkg_ray.stages.canonical import schema_table
    return schema_table(kg.adjacency_dataset(sf_dir))


def _q_transcript_stats(sf_dir: str):
    """Per-role turn/char/conversation counts over the transcript table —
    two-level aggregation (partial per (role, conv) then final per role) so
    the wide shuffle only moves pre-aggregated rows."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data as rd
    from ray.data.aggregate import Count, Sum
    from deepkg_ray import synth

    ds = rd.read_parquet(synth.transcripts_path(sf_dir),
                         columns=["conv_id", "role", "text"])

    def add_len(b: pa.Table) -> pa.Table:
        return (b.append_column("chars", pc.utf8_length(b["text"]))
                .drop_columns(["text"]))

    lv1 = (ds.map_batches(add_len, batch_format="pyarrow")
           .groupby(["role", "conv_id"])
           .aggregate(Count(alias_name="turns"), Sum("chars", alias_name="chars")))
    return (lv1.groupby("role")
            .aggregate(Sum("turns", alias_name="n_turns"),
                       Sum("chars", alias_name="n_chars"),
                       Count(alias_name="n_convs")))


def _q_context_budget(sf_dir: str):
    """Context-window budget report: fit/truncate split of whole
    conversations against a 2048-token limit."""
    import ray.data as rd
    from deepkg_ray import synth
    from deepkg_ray.stages.convgroup import context_budget_report
    return context_budget_report(rd.read_parquet(
        synth.transcripts_path(sf_dir), columns=["conv_id", "text"]))


def _q_conv_turn_taking(sf_dir: str):
    """Per-conversation role-alternation rate (dialogue-quality signal)."""
    import ray.data as rd
    from deepkg_ray import synth
    from deepkg_ray.stages.convgroup import conv_turn_taking
    return conv_turn_taking(rd.read_parquet(
        synth.transcripts_path(sf_dir),
        columns=["conv_id", "turn_idx", "role"]))


def _q_turn_latency(sf_dir: str):
    """Role-transition latency stats (salted blocks + 1-turn overlap
    carry so hot conversations never straggle)."""
    import ray.data as rd
    from deepkg_ray import synth
    from deepkg_ray.stages.convgroup import turn_latency
    ds = rd.read_parquet(synth.transcripts_path(sf_dir),
                         columns=["conv_id", "turn_idx", "role", "ts"])
    return turn_latency(ds)


def _q_tool_usage(sf_dir: str):
    """Per (role, tool) usage with distinct-conversation counts."""
    import ray.data as rd
    from deepkg_ray import synth
    from deepkg_ray.stages.convgroup import tool_usage
    return tool_usage(rd.read_parquet(
        synth.transcripts_path(sf_dir), columns=["conv_id", "role", "tool"]))


def _q_key_skew(sf_dir: str):
    """Per-key row-count distribution for the groupby key (the salting
    decision signal for hot conversations)."""
    import ray.data as rd
    from deepkg_ray import synth
    from deepkg_ray.stages.quantiles import key_skew_stats
    ds = rd.read_parquet(synth.transcripts_path(sf_dir), columns=["conv_id"])
    return key_skew_stats(ds, "conv_id")


def _q_conv_cumulative_triples(sf_dir: str):
    from deepkg_ray.pipelines import kg
    return kg.conv_cumulative_triples(sf_dir)


# ----------------------------------------------- documents / text analysis --

def _docs(sf_dir: str, cols):
    import ray.data as rd
    return rd.read_parquet(f"{sf_dir}/documents.parquet", columns=cols)


def _q_doc_stats(sf_dir: str):
    from deepkg_ray.stages.textstats import doc_stats
    return doc_stats(_docs(sf_dir, ["doc_id", "text"]))


def _q_lang_id(sf_dir: str):
    from deepkg_ray.stages.textstats import lang_id
    return lang_id(_docs(sf_dir, ["doc_id", "text"]))


def _q_bpe_merge_token_counts(sf_dir: str):
    """Real-BPE tier: merge table learned from the corpus (driver-side on
    the word-frequency dict -- the distributed pre-aggregation plan is
    phrasemine's ngram counts), applied per doc through a per-actor
    word->count cache.  Oracle joins the persisted vocabulary."""
    from deepkg_ray.stages.bpe import bpe_artifacts, bpe_merge_token_counts
    import pyarrow.parquet as pq
    merges_p, _ = bpe_artifacts(sf_dir, n_merges=200)
    mt = pq.read_table(merges_p)
    merges = list(zip(mt["left"].to_pylist(), mt["right"].to_pylist()))
    return bpe_merge_token_counts(_docs(sf_dir, ["doc_id", "text"]), merges,
                                  concurrency=(1, 8))


def _q_source_fertility(sf_dir: str):
    """Tokenizer fertility (BPE pretokens per whitespace word) per
    source — corpus-ratio from exact integer sums
    (stages/textstats.source_fertility)."""
    from deepkg_ray.stages.textstats import source_fertility
    return source_fertility(_docs(sf_dir, ["doc_id", "text", "source"]))


def _q_bpe_token_counts(sf_dir: str):
    from deepkg_ray.stages.textstats import bpe_token_counts
    return bpe_token_counts(_docs(sf_dir, ["doc_id", "text"]))


def _q_sequence_packing(sf_dir: str):
    """Concat-and-chunk training-sequence packing via distributed exclusive
    prefix sum (two-phase scan; one bucket shuffle)."""
    from deepkg_ray.stages.packing import pack_sequences
    return pack_sequences(_docs(sf_dir, ["doc_id", "text"]))


def _q_chunk_documents(sf_dir: str):
    """Overlapping token-window chunking (shuffle-free per-doc map)."""
    from deepkg_ray.stages.textstats import chunk_documents
    return chunk_documents(_docs(sf_dir, ["doc_id", "text"]))


def _q_sample_exact_k(sf_dir: str):
    """Deterministic exact-size-k sample via md5 rank top-k."""
    from deepkg_ray.stages.textstats import sample_exact_k
    return sample_exact_k(_docs(sf_dir, ["doc_id"]), k=100)


def _q_global_shuffle(sf_dir: str):
    """Deterministic global shuffle rank (distributed row_number via the
    two-phase scan over md5-uniform key buckets)."""
    from deepkg_ray.stages.packing import global_shuffle_positions
    return global_shuffle_positions(_docs(sf_dir, ["doc_id"]))


def _q_stratified_exact_k(sf_dir: str):
    """Hard per-source sample quotas (exact-k per group)."""
    from deepkg_ray.stages.textstats import stratified_exact_k
    return stratified_exact_k(_docs(sf_dir, ["doc_id", "source"]), k=10)


def _q_containment_pairs(sf_dir: str):
    """Winnowing containment (MOSS-style quotation/subset detection)."""
    from deepkg_ray.stages.dedup import containment_pairs
    return containment_pairs(_docs(sf_dir, ["doc_id", "text"]),
                             threshold=0.5)


def _explode_feature_cols(ds):
    """features list<float> column → round6 float64 columns f00..f15 (the
    golden-oracle compare layout, stages/multimodal.FEAT_COLS)."""
    import numpy as np
    import pyarrow as pa
    from deepkg_ray.functions.numeric import round6
    from deepkg_ray.stages.multimodal import FEAT_COLS

    def explode(b: pa.Table) -> pa.Table:
        lst = b["features"]
        if isinstance(lst, pa.ChunkedArray):
            lst = lst.combine_chunks()
        m = round6(np.stack(lst.to_numpy(zero_copy_only=False))
                   .astype(np.float64))
        b = b.drop_columns(["features"])
        for j, c in enumerate(FEAT_COLS):
            b = b.append_column(c, pa.array(m[:, j], pa.float64()))
        return b

    return ds.map_batches(explode, batch_format="pyarrow")


def _q_video_frame_sample(sf_dir: str):
    """Frame sampling over raw concatenated-PPM video payloads: decode
    every 4th frame only.  Value-checked against the construction gold
    (multimodal.video_frames_gold — raw frames, no payload walk)."""
    import ray.data as rd
    from deepkg_ray.stages.multimodal import (sample_video_frames,
                                              synth_video_table)
    return _explode_feature_cols(
        sample_video_frames(rd.from_arrow(synth_video_table(n=16))))


def _q_packing_stats(sf_dir: str):
    from deepkg_ray.stages.packing import packing_stats
    return packing_stats(_docs(sf_dir, ["doc_id", "text"]))



def _q_gopher_repetition(sf_dir: str):
    """Gopher-rule repetition quality signals: duplicate-line instance /
    char fractions + modal-bigram fraction per document."""
    from deepkg_ray.stages.textstats import gopher_repetition
    return gopher_repetition(_docs(sf_dir, ["doc_id", "text"]))


def _q_doc_fingerprints(sf_dir: str):
    """Winnowing rolling-hash fingerprints, exploded to (doc_id, fp) rows.
    Each fp is the polynomial window hash Σ ord·257^t mod 2^61-1 —
    integer-exact and reproduced by oracle.doc_fingerprints_oracle."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    from deepkg_ray.stages.textstats import fingerprints

    def explode(b: pa.Table) -> pa.Table:
        lst = b["fingerprints"]
        if isinstance(lst, pa.ChunkedArray):
            lst = lst.combine_chunks()
        lens = pc.list_value_length(lst).to_numpy(zero_copy_only=False)
        ids = np.repeat(b["doc_id"].to_numpy(zero_copy_only=False),
                        lens.astype(np.int64))
        flat = lst.flatten().to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "fp": pa.array(flat, pa.int64())})
    return fingerprints(_docs(sf_dir, ["doc_id", "text"])).map_batches(
        explode, batch_format="pyarrow")


def _q_substring_dup_spans(sf_dir: str):
    """Repeated w-gram span detection (hash-variant suffix-array dedup),
    md5-parity tier — full derivation re-checked in SQL."""
    from deepkg_ray.stages.dedup import substring_dup_spans
    return substring_dup_spans(_docs(sf_dir, ["doc_id", "text"]),
                               hash_mode="parity")


def _q_cdc_chunk_stats(sf_dir: str):
    """Content-defined chunking dedup audit (Rabin/LBFS boundaries via
    the rolling polynomial hash, md5 chunk identity) — the blob-level
    dedup reclamation estimate."""
    from deepkg_ray.stages.dedup import cdc_chunk_stats
    return cdc_chunk_stats(_docs(sf_dir, ["doc_id", "text"]))


def _q_doc_dup_fraction(sf_dir: str):
    """Per-doc duplicated-token share (substring_dup_spans rolled up +
    left join onto doc lengths) — the cut-or-drop curation signal."""
    from deepkg_ray.stages.dedup import doc_dup_fraction
    return doc_dup_fraction(_docs(sf_dir, ["doc_id", "text"]))


def _q_dedup_exact(sf_dir: str):
    from deepkg_ray.stages.dedup import dedup_exact
    return dedup_exact(_docs(sf_dir, ["doc_id", "text"]))


def _q_dedup_stats(sf_dir: str):
    from deepkg_ray.stages.dedup import exact_dup_stats
    return exact_dup_stats(_docs(sf_dir, ["doc_id", "text"]))


def _q_dedup_minhash(sf_dir: str):
    """MinHash-LSH near-dup pairs, md5-parity shingle hashes — value-checked
    against a full SQL re-derivation (signatures → band keys → candidates →
    exact Jaccard), proving LSH bucketing AND the distributed verify join."""
    from deepkg_ray.stages.dedup import minhash_dedup_pairs
    return minhash_dedup_pairs(_docs(sf_dir, ["doc_id", "text"]),
                               f"{sf_dir}/documents.parquet", threshold=0.8,
                               hash_mode="parity")


def _q_dedup_simhash(sf_dir: str):
    """SimHash near-dup pairs, md5-parity word hashes — value-checked
    against the ALL-PAIRS SQL ground truth, proving the 16-bit-chunk
    blocking loses no pair at hamming ≤ 3."""
    from deepkg_ray.stages.dedup import simhash_near_pairs
    return simhash_near_pairs(_docs(sf_dir, ["doc_id", "text"]),
                              hash_mode="parity")


def _q_bigram_counts(sf_dir: str):
    from deepkg_ray.stages.phrasemine import ngram_counts
    return ngram_counts(_docs(sf_dir, ["text"]), 2)


def _q_word_idf(sf_dir: str):
    from deepkg_ray.stages.phrasemine import idf_table
    docs = _docs(sf_dir, ["doc_id", "text"])
    return idf_table(docs.select_columns(["text"]), n_docs=docs.count())


def _q_tfidf_top_terms(sf_dir: str):
    """Per-doc top-5 tf·idf keywords — shuffle-free per-doc top-k with a
    ray.put idf broadcast.  Oracle: oracle.tfidf_top_terms_oracle."""
    from deepkg_ray.stages.phrasemine import tfidf_top_terms
    docs = _docs(sf_dir, ["doc_id", "text"])
    return tfidf_top_terms(docs, n_docs=docs.count(), k=5)


def _q_inverted_index(sf_dir: str):
    """Posting-list index build per term (df, cf, ordered postings)."""
    from deepkg_ray.stages.phrasemine import inverted_index
    return inverted_index(_docs(sf_dir, ["doc_id", "text"]))


def _q_textrank_words(sf_dir: str):
    """TextRank keyword scores: integer PageRank over the documents bigram
    digraph, word ids via broadcast sorted-vocab dense rank."""
    from deepkg_ray.sources.readers import read_documents
    from deepkg_ray.stages.phrasemine import textrank_words
    return textrank_words(read_documents(sf_dir, ["text"]))


def _q_pmi_bigrams(sf_dir: str):
    from deepkg_ray.stages.phrasemine import pmi_bigrams
    return pmi_bigrams(_docs(sf_dir, ["text"]))


def _q_llr_collocations(sf_dir: str):
    """Dunning G² collocation significance per bigram (margins re-derived
    from the bigram count table; driver-tier finish like pmi_bigrams)."""
    from deepkg_ray.stages.phrasemine import llr_collocations
    return llr_collocations(_docs(sf_dir, ["text"]))


def _q_neighbor_entropy(sf_dir: str):
    from deepkg_ray.stages.phrasemine import neighbor_entropy
    return neighbor_entropy(_docs(sf_dir, ["text"]), side="right")


# ------------------------------------------------------ similarity search --

def _embed_queries(sf_dir: str, n: int = 8):
    import numpy as np
    import pyarrow.parquet as pq
    import pyarrow.compute as pc
    t = pq.read_table(f"{sf_dir}/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    t = t.filter(pc.less(t["vec_id"], n))
    q = np.stack(t["embedding"].to_pandas().to_numpy())
    return q, t["vec_id"].to_pylist()


def _q_ann_topk(sf_dir: str):
    from deepkg_ray.sources.readers import read_embeddings
    from deepkg_ray.stages.similarity import brute_force_topk
    q, qids = _embed_queries(sf_dir)
    return brute_force_topk(read_embeddings(sf_dir, ["vec_id", "embedding"]),
                            q, qids, k=10)


def _q_truncation_recall(sf_dir: str):
    """Matryoshka-dimension diagnostic: recall@10 of first-16/32-dim
    brute top-k vs the full 64-dim top-k (one ann_topk-shaped pass per
    level, driver-side overlap on k·n_queries rows)."""
    from deepkg_ray.sources.readers import read_embeddings
    from deepkg_ray.stages.similarity import truncation_recall
    q, qids = _embed_queries(sf_dir)
    return truncation_recall(
        read_embeddings(sf_dir, ["vec_id", "embedding"]), q, qids,
        k=10, dims=(16, 32))


def _q_knn_mutuality(sf_dir: str):
    """Mutual-neighbor rate per kNN rank (hubness/asymmetry diagnostic
    of the embedding space)."""
    from deepkg_ray.sources.readers import read_embeddings
    from deepkg_ray.stages.similarity import knn_mutuality
    return knn_mutuality(read_embeddings(sf_dir, ["vec_id", "embedding"]),
                         k=5)


def _q_knn_graph(sf_dir: str):
    """Exact kNN graph (k=5 cosine neighbors per vector): whole-corpus
    broadcast tier, per-batch matmul emits final rows — zero shuffle."""
    from deepkg_ray.sources.readers import read_embeddings
    from deepkg_ray.stages.similarity import knn_graph
    return knn_graph(read_embeddings(sf_dir, ["vec_id", "embedding"]), k=5)


def _q_pq_codes(sf_dir: str):
    """Product-quantization codes (m=4 subspaces × k=16 centroids) —
    the memory-bound scale path for the embedding index family."""
    from deepkg_ray.sources.readers import read_embeddings
    from deepkg_ray.stages.kmeans import pq_codes
    return pq_codes(read_embeddings(sf_dir, ["vec_id", "embedding"]))


def _q_sq8_audit(sf_dir: str):
    """Int8 scalar-quantization (SQ8) reconstruction audit per embedding
    dimension — faiss QT_8bit-style min/max affine grid, fully integer
    codec (stages/similarity.sq8_audit); the distortion comparison point
    against pq_distortion."""
    from deepkg_ray.sources.readers import read_embeddings
    from deepkg_ray.stages.similarity import sq8_audit
    return sq8_audit(read_embeddings(sf_dir, ["embedding"]))


def _q_pq_distortion(sf_dir: str):
    """Per-subspace PQ reconstruction SSE/MSE (quantization-error audit
    over the fitted codebooks — one extra streaming pass, m partial rows
    per block)."""
    from deepkg_ray.sources.readers import read_embeddings
    from deepkg_ray.stages.kmeans import pq_distortion
    return pq_distortion(read_embeddings(sf_dir, ["vec_id", "embedding"]))


def _q_pq_adc_topk(sf_dir: str):
    """ADC top-k over PQ codes — the compressed-index answer path."""
    from deepkg_ray.sources.readers import read_embeddings
    from deepkg_ray.stages.kmeans import pq_adc_topk, pq_fit
    ds = read_embeddings(sf_dir, ["vec_id", "embedding"])
    q, qids = _embed_queries(sf_dir)
    return pq_adc_topk(ds, q, qids, pq_fit(ds), k=10)


def _q_hard_negatives(sf_dir: str):
    import numpy as np
    import pyarrow.parquet as pq
    import pyarrow.compute as pc
    from deepkg_ray.sources.readers import read_embeddings
    from deepkg_ray.stages.similarity import hard_negatives
    t = pq.read_table(f"{sf_dir}/embeddings.parquet",
                      columns=["vec_id", "embedding", "label"])
    t = t.filter(pc.less(t["vec_id"], 8))
    anchors = np.stack(t["embedding"].to_pandas().to_numpy())
    return hard_negatives(
        read_embeddings(sf_dir, ["vec_id", "embedding", "label"]),
        anchors, t["vec_id"].to_pylist(), t["label"].to_pylist(), k=5)


def _q_ann_ivf(sf_dir: str):
    """IVF path with nprobe = n_centroids → exact, so it shares the
    brute-force oracle; bench runs it with low nprobe for the scale path."""
    import pyarrow.parquet as pq
    import numpy as np
    from deepkg_ray.sources.readers import read_embeddings
    from deepkg_ray.stages.similarity import ivf_topk, train_centroids
    q, qids = _embed_queries(sf_dir)
    sample = np.stack(pq.read_table(f"{sf_dir}/embeddings.parquet",
                                    columns=["embedding"])["embedding"]
                      .slice(0, 2000).to_pandas().to_numpy())
    cents = train_centroids(sample, n_centroids=8)
    return ivf_topk(read_embeddings(sf_dir, ["vec_id", "embedding"]),
                    q, qids, k=10, centroids=cents, nprobe=8)


def _q_ann_recall(sf_dir: str):
    """Quality measurement of the approximate scale path: recall@10 of
    IVF(64 cells, nprobe=24, spill=2 multi-assignment) against the exact
    brute-force top-10, per query and overall — the eval that makes the
    approximate tier a measured component rather than a hope.  The
    overall floor recall ≥ 0.9 is ASSERTED (the uie_trained convention:
    a quality regression fails the query rather than shipping silently;
    measured 0.925 at sf0.01 / 0.975 at sf0.1).  Rows-only (the
    measurement compares two engine tiers; no independent SQL
    semantics)."""
    import numpy as np
    import pandas as pd
    import pyarrow.parquet as pq
    from deepkg_ray.sources.readers import read_embeddings
    from deepkg_ray.stages.similarity import (brute_force_topk, ivf_topk,
                                              train_centroids)
    q, qids = _embed_queries(sf_dir)
    sample = np.stack(pq.read_table(f"{sf_dir}/embeddings.parquet",
                                    columns=["embedding"])["embedding"]
                      .slice(0, 2000).to_pandas().to_numpy())
    cents = train_centroids(sample, n_centroids=64)
    exact = brute_force_topk(read_embeddings(sf_dir, ["vec_id", "embedding"]),
                             q, qids, k=10).to_pandas()
    approx = ivf_topk(read_embeddings(sf_dir, ["vec_id", "embedding"]),
                      q, qids, k=10, centroids=cents, nprobe=24,
                      spill=2).to_pandas()
    ex = exact.groupby("query_id")["vec_id"].agg(set)
    ap = approx.groupby("query_id")["vec_id"].agg(set)
    rows = []
    for qid in sorted(ex.index):
        hit = len(ex[qid] & ap.get(qid, set()))
        rows.append((int(qid), hit, len(ex[qid])))
    df = pd.DataFrame(rows, columns=["query_id", "n_hit", "n_exact"])
    df["recall"] = np.floor(df["n_hit"] / df["n_exact"] * 1e6 + 0.5) / 1e6
    overall = df["n_hit"].sum() / df["n_exact"].sum()
    assert overall >= 0.9, \
        f"IVF recall@10 floor breached: {overall:.3f} < 0.9"
    return df


def _q_embedding_near_dup(sf_dir: str):
    from deepkg_ray.sources.readers import read_embeddings
    from deepkg_ray.stages.dedup import embedding_near_pairs
    return embedding_near_pairs(
        read_embeddings(sf_dir, ["vec_id", "embedding", "label"]),
        threshold=0.3, block_col="label")


def _q_embedding_near_dup_lsh(sf_dir: str):
    """Unlabeled-corpus near-dup: random-hyperplane LSH buckets; must
    recover EVERY pair ≥ threshold to hash-match the all-pairs oracle
    (recall-1 of the 4-bit × 48-table config verified in tests)."""
    from deepkg_ray.sources.readers import read_embeddings
    from deepkg_ray.stages.dedup import embedding_lsh_near_pairs
    return embedding_lsh_near_pairs(
        read_embeddings(sf_dir, ["vec_id", "embedding"]),
        threshold=0.45, dim=64)


# ----------------------------------------------------------------- events --

def _q_events_window(sf_dir: str):
    from deepkg_ray.sources.readers import read_events
    from deepkg_ray.stages.windows import tumbling_window
    return tumbling_window(read_events(sf_dir, ["event_type", "ts", "value"]),
                           window_sec=300)


def _q_events_hopping(sf_dir: str):
    from deepkg_ray.sources.readers import read_events
    from deepkg_ray.stages.windows import hopping_window
    return hopping_window(read_events(sf_dir, ["event_type", "ts", "value"]),
                          window_sec=300, hop_sec=60)


def _q_benford(sf_dir: str):
    """Benford first-digit audit of positive values (forensic signal)."""
    from deepkg_ray.sources.readers import read_events
    from deepkg_ray.stages.quantiles import benford_digits
    return benford_digits(read_events(sf_dir, ["value"]))


def _q_events_emd(sf_dir: str):
    """1-D Wasserstein distance between two event types' value
    distributions (exact integer CDF cross terms on the micros support)."""
    from deepkg_ray.sources.readers import read_events
    from deepkg_ray.stages.quantiles import events_emd_1d
    return events_emd_1d(read_events(sf_dir, ["event_type", "value"]))


def _q_events_geometric_mean(sf_dir: str):
    """Grouped geometric mean (ln-micros integer sums, one exp)."""
    from deepkg_ray.sources.readers import read_events
    from deepkg_ray.stages.quantiles import grouped_geometric_mean
    return grouped_geometric_mean(read_events(sf_dir,
                                              ["event_type", "value"]))


def _q_events_expfit(sf_dir: str):
    """Exponential fit + one-sample KS over inter-arrival gaps (Poisson
    model check; histogram-based sup, no global sort)."""
    from deepkg_ray.sources.readers import read_events
    from deepkg_ray.stages.windows import expfit_ks
    return expfit_ks(read_events(sf_dir, ["user_id", "event_id", "ts"]))


def _q_session_paths(sf_dir: str):
    """Top session type-path prefixes (clickstream path report)."""
    from deepkg_ray.sources.readers import read_events
    from deepkg_ray.stages.windows import session_paths
    return session_paths(read_events(
        sf_dir, ["user_id", "event_id", "ts", "event_type"]))


def _q_channel_ltv(sf_dir: str):
    """LTV quantiles per acquisition channel (first-touch composed with
    grouped percentile_cont)."""
    from deepkg_ray.sources.readers import read_events
    from deepkg_ray.stages.windows import channel_ltv_quantiles
    return channel_ltv_quantiles(read_events(
        sf_dir, ["user_id", "event_id", "ts", "event_type", "value"]))


def _q_events_first_touch(sf_dir: str):
    """First-touch attribution: purchases and revenue rolled up to each
    user's acquisition channel (their first event's type)."""
    from deepkg_ray.sources.readers import read_events
    from deepkg_ray.stages.windows import first_touch_attribution
    return first_touch_attribution(read_events(
        sf_dir, ["user_id", "event_id", "ts", "event_type", "value"]))


def _q_user_twa(sf_dir: str):
    """Per-user time-weighted average value (step-function integral)."""
    from deepkg_ray.sources.readers import read_events
    from deepkg_ray.stages.windows import user_time_weighted_avg
    return user_time_weighted_avg(read_events(
        sf_dir, ["user_id", "event_id", "ts", "value"]))


def _q_events_dup_audit(sf_dir: str):
    """Instrumentation double-fire audit (same user/type/value within
    5 s of the previous event)."""
    from deepkg_ray.sources.readers import read_events
    from deepkg_ray.stages.windows import duplicate_event_audit
    return duplicate_event_audit(read_events(
        sf_dir, ["user_id", "event_id", "ts", "event_type", "value"]))


def _q_user_regularity(sf_dir: str):
    """Per-user inter-arrival VMR (bot-likeness screen)."""
    from deepkg_ray.sources.readers import read_events
    from deepkg_ray.stages.windows import user_regularity
    return user_regularity(read_events(sf_dir,
                                       ["user_id", "event_id", "ts"]))


def _q_seasonality_strength(sf_dir: str):
    """Weekly seasonality strength: between-dow share of daily-count
    variance (one-way ANOVA R^2)."""
    from deepkg_ray.sources.readers import read_events
    from deepkg_ray.stages.windows import seasonality_strength
    return seasonality_strength(read_events(sf_dir, ["ts"]))


def _q_user_survival(sf_dir: str):
    """Kaplan-Meier time-to-first-purchase survival curve with honest
    right-censoring at each user's last observed event."""
    from deepkg_ray.sources.readers import read_events
    from deepkg_ray.stages.windows import survival_curve
    return survival_curve(read_events(sf_dir,
                                      ["user_id", "ts", "event_type"]))


def _q_events_dow_anomaly(sf_dir: str):
    """Seasonality-adjusted daily volume anomaly (per-dow z-scores over
    the calendar-complete daily counts)."""
    from deepkg_ray.sources.readers import read_events
    from deepkg_ray.stages.windows import dow_daily_anomaly
    return dow_daily_anomaly(read_events(sf_dir, ["ts"]))


def _q_events_changepoint(sf_dir: str):
    """CUSUM level-shift scan over the calendar-complete daily count
    series (offline mean-shift detector; scaled-integer statistic)."""
    from deepkg_ray.sources.readers import read_events
    from deepkg_ray.stages.windows import cusum_changepoint
    return cusum_changepoint(read_events(sf_dir, ["ts"]))


def _q_session_type_pairs(sf_dir: str):
    """Within-session event-type co-occurrence pairs (session-granular
    basket signal)."""
    from deepkg_ray.sources.readers import read_events
    from deepkg_ray.stages.windows import session_type_pairs
    return session_type_pairs(read_events(
        sf_dir, ["user_id", "event_id", "ts", "event_type"]))


def _q_user_streaks(sf_dir: str):
    """Longest consecutive-day activity streak per user (gaps-and-islands
    without window functions — one vectorized diff pass per partition)."""
    from deepkg_ray.sources.readers import read_events
    from deepkg_ray.stages.windows import user_activity_streaks
    return user_activity_streaks(read_events(sf_dir, ["user_id", "ts"]))


def _q_trending(sf_dir: str):
    """Top-3 event types per tumbling hour (grouped top-k, deterministic
    ties)."""
    from deepkg_ray.sources.readers import read_events
    from deepkg_ray.stages.windows import trending_per_window
    return trending_per_window(read_events(sf_dir, ["event_type", "ts"]))


def _q_events_watermark(sf_dir: str):
    """Streaming watermark audit: on-time vs late counts per tumbling
    window under merged per-user arrival order — global prefix-max via a
    two-pass bucket carry (driver sees n_parts scalars)."""
    from deepkg_ray.sources.readers import read_events
    from deepkg_ray.stages.windows import watermark_late_counts
    return watermark_late_counts(
        read_events(sf_dir, ["user_id", "event_id", "ts"]))


def _q_events_sessionize(sf_dir: str):
    from deepkg_ray.sources.readers import read_events
    from deepkg_ray.stages.windows import sessionize
    return sessionize(read_events(sf_dir, ["user_id", "ts", "event_id"]))


def _q_distinct_event_types(sf_dir: str):
    from deepkg_ray.pipelines.relational import distinct_event_types
    return distinct_event_types(sf_dir)


# ------------------------------------------------------------- relational --

def _q_pricing_summary(sf_dir: str):
    from deepkg_ray.pipelines.relational import pricing_summary
    return pricing_summary(sf_dir)


def _q_top_revenue_orders(sf_dir: str):
    from deepkg_ray.pipelines.relational import top_revenue_orders
    return top_revenue_orders(sf_dir)


def _q_segment_revenue(sf_dir: str):
    from deepkg_ray.pipelines.relational import segment_revenue
    return segment_revenue(sf_dir)


# ------------------------------------------------- linking (rows-only) -----


def _q_local_supplier_volume(sf_dir: str):
    """TPC-H Q5 proper (customer nation = lineitem-supplier nation, one
    region, one order year)."""
    from deepkg_ray.pipelines.relational import local_supplier_volume
    return local_supplier_volume(sf_dir)


def _q_volume_shipping(sf_dir: str):
    """TPC-H Q7 proper (directed nation-pair revenue by ship year)."""
    from deepkg_ray.pipelines.relational import volume_shipping
    return volume_shipping(sf_dir)


def _q_product_type_profit(sf_dir: str):
    """TPC-H Q9 shape (profit by supplier nation x order year for a part
    name substring; supplycost term dropped - no partsupp table)."""
    from deepkg_ray.pipelines.relational import product_type_profit
    return product_type_profit(sf_dir)


def _q_shipmode_priority_counts(sf_dir: str):
    """TPC-H Q12 shape (late/ontime x priority CASE-sums over the join)."""
    from deepkg_ray.pipelines.relational import shipmode_priority_counts
    return shipmode_priority_counts(sf_dir)


def _q_waiting_suppliers(sf_dir: str):
    """TPC-H Q21 shape (unique-latest supplier on multi-supplier 'F'
    orders)."""
    from deepkg_ray.pipelines.relational import waiting_suppliers
    return waiting_suppliers(sf_dir)



def _q_semantic_contamination(sf_dir: str):
    """Train/eval semantic decontamination: every (eval, train) embedding
    pair with cosine >= tau, eval matrix broadcast, train side streaming
    (one pass, no shuffle)."""
    import numpy as np
    import pyarrow.parquet as pq
    from deepkg_ray.sources.readers import read_embeddings
    from deepkg_ray.stages.similarity import semantic_contamination
    t = pq.read_table(f"{sf_dir}/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    keep = np.asarray(t["vec_id"].to_pylist()) < 16
    q = np.stack(t["embedding"].to_pandas().to_numpy())[keep]
    qids = np.asarray(t["vec_id"].to_pylist())[keep]
    train = read_embeddings(sf_dir, ["vec_id", "embedding"]) \
        .filter(expr="vec_id >= 16")
    return semantic_contamination(train, q, qids, tau=0.3)



def _q_mixture_plan(sf_dir: str):
    """Target-weighted data mixing: per-source quotas filled in the
    deterministic (md5(doc_id), doc_id) order."""
    from deepkg_ray.stages.textstats import mixture_plan
    return mixture_plan(_docs(sf_dir, ["doc_id", "source"]),
                        weights={f"src{i}": 1.0 / 8 for i in range(8)},
                        budget=200)


def _q_linking_candidates(sf_dir: str):
    """BM25 top-N candidate generation for every dictionary alias surface —
    the recall-stage output at its full width (top_n=10, the
    CandidateGenerator default), routed through the micros-exact scoring
    tier so the whole eval family is SQL-checked
    (oracle.bm25_topn_oracle(top_n=10) evaluates the identical grid)."""
    import ray.data as rd
    from deepkg_ray import synth
    from deepkg_ray.stages.linking import CandidateGenerator
    dict_path = synth.dictionary_path(sf_dir)
    aliases = rd.read_parquet(dict_path, columns=["aliases"]).to_pandas()
    import pandas as pd
    surf = pd.DataFrame({"surface": sorted({a for al in aliases["aliases"]
                                            for a in al})})
    return rd.from_pandas(surf).map_batches(
        CandidateGenerator,
        fn_constructor_kwargs={"dictionary_path": dict_path, "top_n": 10,
                               "exact": True},
        batch_format="pyarrow", concurrency=(1, 4))


def _q_mmr_select(sf_dir: str):
    """MMR diversity-aware top-k over the embedding column: one
    distributed micros-relevance scan feeds a window-bounded driver
    greedy; integer-exact scores vs the unrolled-CTE SQL oracle."""
    from deepkg_ray.sources.readers import read_embeddings
    from deepkg_ray.stages.similarity import mmr_select
    return mmr_select(read_embeddings(sf_dir, ["vec_id", "embedding"]),
                      query_id=0, k=8, window=50)


def _q_similarity_join(sf_dir: str):
    """Prefix-filtered exact-Jaccard R×S similarity join (AllPairs) over a
    disjoint id split of documents; oracle = the all-pairs SQL ground
    truth, so the driver check proves the prefix filter loses no pair."""
    import pyarrow.compute as pc
    from deepkg_ray.stages.simjoin import similarity_join
    docs = _docs(sf_dir, ["doc_id", "text"])
    left = docs.filter(expr="doc_id < 300")
    right = docs.filter(expr="doc_id >= 300 and doc_id < 600")
    return similarity_join(left, right, threshold=0.8)


def _q_bm25_topn(sf_dir: str):
    """Micros-exact Okapi BM25 top-5 per alias surface (positive scores,
    rank by score desc / entity_id) — the SQL-checkable tier of the recall
    stage (oracle.bm25_topn_oracle evaluates the identical float64
    expression grid)."""
    import pandas as pd
    import ray.data as rd
    from deepkg_ray import synth
    from deepkg_ray.stages.linking import CandidateGenerator
    dict_path = synth.dictionary_path(sf_dir)
    aliases = rd.read_parquet(dict_path, columns=["aliases"]).to_pandas()
    surf = pd.DataFrame({"surface": sorted({a for al in aliases["aliases"]
                                            for a in al})})
    return rd.from_pandas(surf).map_batches(
        CandidateGenerator,
        fn_constructor_kwargs={"dictionary_path": dict_path, "top_n": 5,
                               "exact": True},
        batch_format="pyarrow", concurrency=(1, 4))


def _q_media_phash(sf_dir: str):
    """Perceptual image hash: P6 decode → exact int64 DCT-II (micros
    cosine basis, BLAS-free) → 63-bit median-threshold pHash through the
    actor pool; value-checked against the raw-pixel construction gold."""
    import ray.data as rd
    from deepkg_ray.stages.multimodal import phash_hashes, synth_phash_table
    return phash_hashes(rd.from_arrow(synth_phash_table(n=256)))


def _q_phash_near_dups(sf_dir: str):
    """Image near-dup pairs by pHash: 8×8-bit band LSH (lossless for
    hamming ≤ 7) + exact XOR-popcount verify, vs the brute-force
    self-join oracle."""
    import ray.data as rd
    from deepkg_ray.stages.multimodal import (phash_near_dups,
                                              synth_phash_table)
    return phash_near_dups(rd.from_arrow(synth_phash_table(n=256)),
                           hamming_max=6)


def _q_image_exposure(sf_dir: str):
    """REAL P6 decode → over/under-exposure stats through the actor
    pool; value-checked against the raw-pixel construction gold."""
    import ray.data as rd
    from deepkg_ray.stages.multimodal import (image_exposure,
                                              synth_real_media_table)
    return image_exposure(rd.from_arrow(synth_real_media_table(n=256)))


def _q_audio_silence(sf_dir: str):
    """REAL WAV decode → silence statistics (VAD-style pre-filter)
    through the actor pool; value-checked against the construction
    gold computed from the raw sample arrays."""
    import ray.data as rd
    from deepkg_ray.stages.multimodal import (audio_silence,
                                              synth_real_media_table)
    return audio_silence(rd.from_arrow(synth_real_media_table(n=256)))


def _q_audio_spectral(sf_dir: str):
    """REAL WAV decode → rFFT spectral centroid / bandwidth / rolloff
    through the actor pool; value-checked against the construction gold
    computed from the raw sample arrays."""
    import ray.data as rd
    from deepkg_ray.stages.multimodal import (audio_spectral,
                                              synth_real_media_table)
    return audio_spectral(rd.from_arrow(synth_real_media_table(n=256)))


def _q_multimodal_features(sf_dir: str):
    """REAL decode over valid encoded payloads (P6 PPM images, PCM16 WAV
    audio — parsed with numpy, no codec libs): decode → resize → feature
    extraction through the actor pool.  Value-checked against the
    construction gold (multimodal.media_features_gold — features computed
    from the raw arrays, never through the codec)."""
    import ray.data as rd
    from deepkg_ray.stages.multimodal import (RealDecoder, decode_features,
                                              synth_real_media_table)
    ds = rd.from_arrow(synth_real_media_table(n=256))
    return _explode_feature_cols(decode_features(ds, decoder=RealDecoder))


def _q_frequent_phrases(sf_dir: str):
    from deepkg_ray.stages.phrasemine import frequent_phrases
    return frequent_phrases(_docs(sf_dir, ["text"]), n=2, topk=50, min_count=2)


def _q_autophrase_selftrain(sf_dir: str):
    """AutoPhrase iterative self-training (classify → threshold-reselect →
    refit epochs with EarlyStopping at the fixed point) — the reference's
    mining loop, oracle-checked end-to-end by an unrolled per-epoch SQL
    re-derivation (the kg_pagerank convention applied to a learning
    loop)."""
    from deepkg_ray.stages.autophrase import autophrase_selftrain
    return autophrase_selftrain(_docs(sf_dir, ["doc_id", "text"]),
                                topk=200, min_count=2, n_seed=10,
                                max_epochs=6)


def _q_ner_span_model(sf_dir: str):
    """Second NER tier (tokenize → span-score → threshold decode) projected
    to mention counts — shares the kg_mention_counts oracle, so the two
    deterministic NER paths are independently SQL-validated."""
    import pyarrow as pa
    from deepkg_ray import synth
    from deepkg_ray.pipelines.kg import transcripts_with_norm
    from deepkg_ray.stages.spandecode import SpanModelNER
    from deepkg_ray.stages.treeagg import merge_partials
    keys = ["conv_id", "turn_idx", "surface", "entity_id", "type"]
    ds = transcripts_with_norm(sf_dir).map_batches(
        SpanModelNER,
        fn_constructor_kwargs={"dictionary_path": synth.dictionary_path(sf_dir)},
        batch_format="pyarrow", batch_size=4096, concurrency=(1, 8))

    def combine(b: pa.Table) -> pa.Table:
        g = b.select(keys).to_pandas().groupby(keys, as_index=False).size()
        return pa.Table.from_pandas(g.rename(columns={"size": "n_occ"}),
                                    preserve_index=False)
    return merge_partials(ds.map_batches(combine, batch_format="pyarrow"),
                          keys, {"n_occ": "sum"})


def _q_ner_biaffine_model(sf_dir: str):
    """Third NER head: the Biaffine span scorer (start/end MLPs -> per-type
    bilinear form + relative-position table, model/model.py:89-147
    semantics) on its dict-margin tier -- the FULL biaffine forward runs in
    the actor pool, and decode equals dictionary membership, so the head is
    SQL-validated via the shared mention-counts oracle."""
    import pyarrow as pa
    from deepkg_ray import synth
    from deepkg_ray.pipelines.kg import transcripts_with_norm
    from deepkg_ray.stages.spandecode import SpanModelNER
    from deepkg_ray.stages.treeagg import merge_partials
    keys = ["conv_id", "turn_idx", "surface", "entity_id", "type"]
    ds = transcripts_with_norm(sf_dir).map_batches(
        SpanModelNER,
        fn_constructor_kwargs={"dictionary_path": synth.dictionary_path(sf_dir),
                               "scorer_tier": "biaffine_dict"},
        batch_format="pyarrow", batch_size=4096, concurrency=(1, 8))

    def combine(b: pa.Table) -> pa.Table:
        g = b.select(keys).to_pandas().groupby(keys, as_index=False).size()
        return pa.Table.from_pandas(g.rename(columns={"size": "n_occ"}),
                                    preserve_index=False)
    return merge_partials(ds.map_batches(combine, batch_format="pyarrow"),
                          keys, {"n_occ": "sum"})


def _q_distant_label(sf_dir: str):
    """AutoNER distant supervision: core/full dictionaries + raw sentences
    -> tie-or-break token labels through the Sigma-delta-squared DP
    segmentation (string_match.h:21-99) and the Unknown-spill boundary
    rules (annotation.h:263-351).  Zero-shuffle actor-pool pass; the
    oracle re-derives the labels from the corpus-construction
    invariants."""
    import ray.data as rd
    from deepkg_ray import synth
    from deepkg_ray.stages.distant import distant_label
    sents_p, core_p, full_p = synth.distant_paths(sf_dir)
    return distant_label(rd.read_parquet(sents_p), core_p, full_p,
                         concurrency=(1, 8))


def _linking_eval_inputs(sf_dir: str):
    """(candidates_ds, gold_ds) for the alias→canonical eval: gold is a
    DATASET of (query, gold) pairs — the open-query-set contract of
    scoring.recall_at_n_distributed / mrr_distributed (no driver dict).
    An alias shared by two entities keeps BOTH gold rows, matching the
    oracle's DISTINCT (query, gold) any-match credit."""
    import pandas as pd
    import pyarrow.parquet as pq
    import ray.data as rd
    from deepkg_ray import synth
    from deepkg_ray.stages.linking import CandidateGenerator
    dict_path = synth.dictionary_path(sf_dir)
    t = pq.read_table(dict_path)
    pairs = sorted({(a, name)
                    for name, aliases in zip(t["name"].to_pylist(),
                                             t["aliases"].to_pylist())
                    for a in aliases if a != name})
    gold_ds = rd.from_pandas(pd.DataFrame(
        {"query": [q for q, _ in pairs], "gold": [g for _, g in pairs]}))
    qds = rd.from_pandas(pd.DataFrame(
        {"surface": sorted({q for q, _ in pairs})}))
    cands = qds.map_batches(
        CandidateGenerator,
        fn_constructor_kwargs={"dictionary_path": dict_path, "top_n": 5,
                               "exact": True},
        batch_format="pyarrow", concurrency=(1, 4))
    return cands, gold_ds


def _q_linking_coherence(sf_dir: str):
    """Collective entity linking: BM25 candidates reranked by KG
    coherence with the conversation's other entities (AIDA-style global
    step, stages/linking.coherence_link); emits the BM25 top-1 next to
    the coherence winner so the query is its own ablation."""
    from deepkg_ray import synth
    from deepkg_ray.pipelines import kg
    from deepkg_ray.stages.linking import coherence_link
    return coherence_link(kg.mentions_dataset(sf_dir),
                          kg.adjacency_dataset(sf_dir),
                          synth.dictionary_path(sf_dir))


def _q_linking_sem_coherence(sf_dir: str):
    """Embedding-coherence entity linking: BM25 candidates rescored by
    cosine to the conversation's context vector (sum of entity
    embeddings, lone-gold-corrected) — the dense sibling of
    linking_coherence (stages/linking.semantic_coherence_link)."""
    from deepkg_ray import synth
    from deepkg_ray.pipelines import kg
    from deepkg_ray.stages.linking import semantic_coherence_link
    return semantic_coherence_link(kg.mentions_dataset(sf_dir),
                                   f"{sf_dir}/embeddings.parquet",
                                   synth.dictionary_path(sf_dir))


def _q_linking_fused(sf_dir: str):
    """Final linker: lexicographic fusion of graph coherence, embedding
    cosine and BM25 rank per mention surface
    (stages/linking.fused_link)."""
    from deepkg_ray import synth
    from deepkg_ray.pipelines import kg
    from deepkg_ray.stages.linking import fused_link
    return fused_link(kg.mentions_dataset(sf_dir),
                      kg.adjacency_dataset(sf_dir),
                      f"{sf_dir}/embeddings.parquet",
                      synth.dictionary_path(sf_dir))


def _q_linking_recall(sf_dir: str):
    """BM25 recall@{1,5} over alias→canonical queries, on the micros-exact
    scoring tier — SQL-checked end-to-end (oracle.linking_recall_oracle).
    Fully distributed: gold joins as a Dataset, hit counters Sum down to
    four scalars (scoring.recall_at_n_distributed)."""
    import pandas as pd
    from deepkg_ray.stages.scoring import recall_at_n_distributed
    cands, gold_ds = _linking_eval_inputs(sf_dir)
    res = recall_at_n_distributed(cands.materialize(), gold_ds, ns=(1, 5))
    return pd.DataFrame({
        "n_queries": [res["n_queries"]],
        "recall_at_1": [res["recall_at_1"]],
        "recall_at_5": [res["recall_at_5"]],
    })


def _q_linking_ndcg(sf_dir: str):
    """nDCG@5 of the canonical name in BM25 candidates (micros-exact
    tier; single-gold binary relevance so IDCG = 1)."""
    import pandas as pd
    from deepkg_ray.stages.scoring import ndcg_distributed
    cands, gold_ds = _linking_eval_inputs(sf_dir)
    n_q, nd = ndcg_distributed(cands.materialize(), gold_ds)
    return pd.DataFrame({"n_queries": [n_q], "ndcg": [nd]})


def _q_linking_mrr(sf_dir: str):
    """MRR of the canonical name among BM25 top-5 candidates (micros-exact
    tier; oracle evaluates the identical expression grid).  Distributed:
    min-rank groupby → micros-reciprocal Sum (scoring.mrr_distributed)."""
    import pandas as pd
    from deepkg_ray.stages.scoring import mrr_distributed
    cands, gold_ds = _linking_eval_inputs(sf_dir)
    n_q, mrr = mrr_distributed(cands.materialize(), gold_ds)
    return pd.DataFrame({"n_queries": [n_q], "mrr": [mrr]})


def _q_extraction_prf(sf_dir: str):
    """North-star gate as a query: P/R/F1 of the engine triples vs the gold
    triples under match_mode='set' (scorer.py:79-88 semantics).  Oracle:
    oracle.prf_sql — exact DISTINCT-join counters, bit-identical doubles."""
    import os
    import pandas as pd
    import ray.data as rd
    from deepkg_ray import synth
    from deepkg_ray.pipelines import kg
    from deepkg_ray.stages.scoring import distributed_prf
    gold = rd.read_parquet(os.path.join(synth.ensure_synth(sf_dir),
                                        "triples_gold.parquet"))
    pred = kg.surface_triples_dataset(sf_dir)
    res = distributed_prf(gold, pred, key_cols=["conv_id", "turn_idx"],
                          tuple_cols=["pred", "subj_text", "obj_text"],
                          match_mode="set")
    return pd.DataFrame([{k: float(v) for k, v in res.items()}])


def _q_embedding_kmeans(sf_dir: str):
    """Distributed Lloyd's k-means over the embeddings table (the SemDeDup
    cluster step): deterministic init, 4 iterations, integer-micros exact
    arithmetic.  Oracle: oracle.kmeans_oracle unrolled CTEs."""
    from deepkg_ray.sources.readers import read_embeddings
    from deepkg_ray.stages.kmeans import kmeans
    return kmeans(read_embeddings(sf_dir, ["vec_id", "embedding"]),
                  k=8, iters=4)


def _q_cluster_ari(sf_dir: str):
    """Adjusted Rand index clusters-vs-labels (exact integer pair counts,
    one final division)."""
    from deepkg_ray.sources.readers import read_embeddings
    from deepkg_ray.stages.kmeans import cluster_ari
    return cluster_ari(
        read_embeddings(sf_dir, ["vec_id", "embedding", "label"]),
        k=8, iters=4)


def _q_cluster_nmi(sf_dir: str):
    """Normalized mutual information clusters-vs-labels (ln-micros
    integer sums, one final double division)."""
    from deepkg_ray.sources.readers import read_embeddings
    from deepkg_ray.stages.kmeans import cluster_nmi
    return cluster_nmi(
        read_embeddings(sf_dir, ["vec_id", "embedding", "label"]),
        k=8, iters=4)


def _q_cluster_purity(sf_dir: str):
    """Cluster-vs-gold-label confusion + purity (external clustering
    eval; integer cells, one round6 per cluster)."""
    from deepkg_ray.sources.readers import read_embeddings
    from deepkg_ray.stages.kmeans import cluster_purity
    return cluster_purity(
        read_embeddings(sf_dir, ["vec_id", "embedding", "label"]),
        k=8, iters=4)


def _q_silhouette(sf_dir: str):
    """Per-cluster simplified silhouette of the k-means clustering —
    clustering-quality eval, one O(n·k) streaming pass after the fit."""
    from deepkg_ray.sources.readers import read_embeddings
    from deepkg_ray.stages.kmeans import silhouette_by_cluster
    return silhouette_by_cluster(
        read_embeddings(sf_dir, ["vec_id", "embedding"]), k=8, iters=4)


def _q_semantic_dedup(sf_dir: str):
    """SemDeDup keep-set: k-means clusters, then within-cluster lower-id
    cosine dominance at tau=0.4.  Oracle: oracle.semantic_dedup_oracle."""
    from deepkg_ray.sources.readers import read_embeddings
    from deepkg_ray.stages.kmeans import semantic_dedup
    return semantic_dedup(read_embeddings(sf_dir, ["vec_id", "embedding"]),
                          k=8, iters=4, tau=0.4)


def _q_transcript_sample(sf_dir: str):
    """Deterministic seeded-hash row sampling (negative-keep filter analog,
    utils_torch.py:133-139): md5-keyed keep mask, per-role kept counts."""
    import pyarrow as pa
    import ray.data as rd
    from deepkg_ray import synth
    from deepkg_ray.functions.textnorm import md5_keep_mask
    from deepkg_ray.stages.treeagg import merge_partials

    ds = rd.read_parquet(synth.transcripts_path(sf_dir),
                         columns=["conv_id", "turn_idx", "role"])

    def kernel(b: pa.Table) -> pa.Table:
        keys = [f"{c}:{t}" for c, t in zip(b["conv_id"].to_pylist(),
                                           b["turn_idx"].to_pylist())]
        mask = pa.array(md5_keep_mask(keys, 30))
        kept = b.filter(mask)
        import pandas as pd
        g = (pd.Series(kept["role"].to_pylist()).value_counts()
             .rename_axis("role").reset_index(name="n_kept"))
        return pa.Table.from_pandas(g, preserve_index=False)

    return merge_partials(ds.map_batches(kernel, batch_format="pyarrow"),
                          ["role"], {"n_kept": "sum"}, fanout=2)


def _q_duplicate_turn_groups(sf_dir: str):
    """Merge-duplicated-texts analog (process_data.py:506-590): group turns
    with byte-identical text, report group size + first provenance."""
    import hashlib
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data as rd
    from deepkg_ray import synth
    from deepkg_ray.stages.treeagg import merge_partials

    ds = rd.read_parquet(synth.transcripts_path(sf_dir),
                         columns=["conv_id", "turn_idx", "text"])

    def kernel(b: pa.Table) -> pa.Table:
        import pandas as pd
        src = pc.binary_join_element_wise(
            b["conv_id"].combine_chunks(),
            pc.utf8_lpad(pc.cast(b["turn_idx"].combine_chunks(), pa.string()),
                         8, "0"), ":")
        df = pd.DataFrame({
            "content_hash": [hashlib.md5(t.encode()).hexdigest()
                             for t in b["text"].to_pylist()],
            "first_src": src.to_pandas(),
            "n_turns": 1,
        })
        g = (df.groupby("content_hash", as_index=False)
             .agg(n_turns=("n_turns", "sum"), first_src=("first_src", "min")))
        return pa.Table.from_pandas(g, preserve_index=False)

    merged = merge_partials(ds.map_batches(kernel, batch_format="pyarrow"),
                            ["content_hash"],
                            {"n_turns": "sum", "first_src": "min"})
    return merged.map_batches(
        lambda b: b.filter(pc.greater(b["n_turns"], 1)),
        batch_format="pyarrow")


def _q_pruned_token_counts(sf_dir: str):
    from deepkg_ray.stages.phrasemine import prune_low_freq
    return prune_low_freq(_docs(sf_dir, ["doc_id", "text"]), min_freq=2)


def _q_kg_triples_via_sel(sf_dir: str):
    """UIE generative path: SEL generator actor pool → SEL parser → triples.
    Must equal the direct mention-anchored path — same oracle as
    kg_triples."""
    from deepkg_ray.pipelines.uie import triples_via_sel
    return triples_via_sel(sf_dir).select_columns(
        ["conv_id", "turn_idx", "pred", "subj_text", "subj_type",
         "obj_text", "obj_type"])


def _q_uie_model_generate(sf_dir: str):
    """REAL model tier (numpy seq2seq, seeded random weights) through the
    generator actor pool: per-turn SEL strings, value-checked against a
    construction gold that re-derives every string from the bare
    recurrence with none of the engine's batching / compaction /
    lookup-table machinery (uie.model_sel_gold_path — the multimodal
    gold pattern).  The SEL parse still runs as an internal smoke."""
    from deepkg_ray.pipelines.uie import model_sel_table
    return model_sel_table(sf_dir, limit=2000)


def _q_uie_trained_extract(sf_dir: str):
    """TRAINED model tier: tiny attention encoder-decoder fine-tuned on the
    dictionary-derived text→SEL corpus (cached checkpoint), generating SEL
    through the actor pool over every transcript sentence; scored against
    the construction-gold triples with the distributed cogroup P/R/F1.
    Accuracy-asserted (raises below P/R 95%); rows-only for the driver
    (model scoring is not SQL-expressible)."""
    from deepkg_ray.pipelines.uie import trained_extraction_metrics
    return trained_extraction_metrics(sf_dir)


def _q_conv_context(sf_dir: str):
    """Per-turn previous-2-turn context, computed with salted conversation
    blocks + overlap carry (hot-conversation skew mitigation,
    stages/convgroup.py); the oracle recomputes it with window functions."""
    import ray.data as rd
    from deepkg_ray import synth
    from deepkg_ray.stages.convgroup import conv_context_windows
    ds = rd.read_parquet(synth.transcripts_path(sf_dir),
                         columns=["conv_id", "turn_idx", "text"])
    return conv_context_windows(ds, window=2, turns_per_salt=256)


def _q_conv_transcripts(sf_dir: str):
    """Ordered collect: one document per conversation (string_agg ORDER BY
    turn_idx) — the LLM-training document-assembly step."""
    import ray.data as rd
    from deepkg_ray import synth
    from deepkg_ray.stages.convgroup import conv_transcripts
    ds = rd.read_parquet(synth.transcripts_path(sf_dir),
                         columns=["conv_id", "turn_idx", "text"])
    return conv_transcripts(ds)


def _q_kg_events(sf_dir: str):
    """Event extraction (the third UIE record family): trigger-typed events
    with (place, actor) roles resolved to canonical ids."""
    from deepkg_ray import synth
    from deepkg_ray.pipelines.kg import transcripts_with_norm
    from deepkg_ray.stages.events import extract_events
    ds = transcripts_with_norm(sf_dir)
    return extract_events(ds, synth.dictionary_path(sf_dir)).drop_columns(
        ["trigger_start"])   # offsets are rows-only detail (SQL has no spans)


def _q_ngram_jaccard(sf_dir: str):
    from deepkg_ray.stages.dedup import ngram_jaccard_pairs
    return ngram_jaccard_pairs(_docs(sf_dir, ["doc_id", "text"]),
                               max_id=200, threshold=0.05)


def _q_heavy_hitters(sf_dir: str):
    """Exact top-k frequent tokens via the two-pass Misra-Gries plan
    (stages/sketches.py — bounded sketch shuffle + exact verify of the
    candidate set; runtime exactness certificate)."""
    from deepkg_ray.stages.sketches import heavy_hitter_tokens
    return heavy_hitter_tokens(_docs(sf_dir, ["doc_id", "text"]), k=20)


def _q_cms_state(sf_dir: str):
    """Count-min sketch over document tokens as its nonzero-cell table —
    the linear-sketch aggregation plan (per-batch d×w grids integer-summed
    through the merge tree, never a vocabulary shuffle); md5-parity
    hashing makes every cell SQL-exact (stages/approx.py)."""
    from deepkg_ray.stages.approx import cms_state
    return cms_state(_docs(sf_dir, ["doc_id", "text"]))


def _q_cms_estimates(sf_dir: str):
    """CMS point estimates vs exact truth for the certified exact top-20
    tokens: (token, n_true, n_est), n_est = min over rows of the hashed
    cell — the sketch's one-sided error guarantee, value-checked."""
    from deepkg_ray.stages.approx import cms_estimates
    return cms_estimates(_docs(sf_dir, ["doc_id", "text"]), k=20)


def _q_bootstrap_means(sf_dir: str):
    """Poisson bootstrap of mean(o_totalprice): all 100 replicates in one
    streaming pass (deterministic md5→affine-mix→integer-inverse-CDF
    Poisson(1) row weights; only B partial rows per block shuffle)."""
    import ray.data as rd
    from deepkg_ray.stages.approx import poisson_bootstrap_means
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_totalprice"])
    return poisson_bootstrap_means(orders, "o_orderkey", "o_totalprice",
                                   n_boot=100)


def _q_bootstrap_ci(sf_dir: str):
    """Percentile-bootstrap 95% CI for mean(o_totalprice) from the exact
    order statistics of the replicate means."""
    import ray.data as rd
    from deepkg_ray.stages.approx import poisson_bootstrap_ci
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_totalprice"])
    return poisson_bootstrap_ci(orders, "o_orderkey", "o_totalprice",
                                n_boot=100)


def _q_markov_entropy_rate(sf_dir: str):
    """Plug-in entropy rate H(next|current) of the event-type chain —
    bounded finisher over the markov_transitions counts (ln-micros
    terms)."""
    import ray.data as rd
    from deepkg_ray.stages.windows import markov_entropy_rate
    return markov_entropy_rate(rd.read_parquet(f"{sf_dir}/events.parquet"))


def _q_events_perm_test(sf_dir: str):
    """One-pass 64-permutation randomization test of the weekend effect
    (md5 label bits, add-one p-value; stages/experiment.py)."""
    import ray.data as rd
    from deepkg_ray.stages.experiment import permutation_test_weekend
    return permutation_test_weekend(rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["ts", "event_id", "value"]))


def _q_srm_check(sf_dir: str):
    """Sample-ratio mismatch guardrail for the odd/even assignment over
    distinct users (stages/experiment.srm_check)."""
    import ray.data as rd
    from deepkg_ray.stages.experiment import srm_check
    return srm_check(rd.read_parquet(f"{sf_dir}/events.parquet",
                                     columns=["user_id"]))


def _q_diff_in_diff(sf_dir: str):
    """Difference-in-differences estimator (odd-user treatment × CUPED
    midpoint period split; one stateless 8-cell pass,
    stages/experiment.diff_in_diff)."""
    import ray.data as rd
    from deepkg_ray.stages.experiment import diff_in_diff
    return diff_in_diff(rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["ts", "user_id", "value"]))


def _q_cuped(sf_dir: str):
    """CUPED variance-reduction audit over events (θ = cov/var on
    per-user half-period sums, millis-quantized integer moments,
    HUGEINT/big-int products)."""
    import ray.data as rd
    from deepkg_ray.stages.experiment import cuped_adjustment
    return cuped_adjustment(rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["ts", "user_id", "value"]))


def _q_psi_drift(sf_dir: str):
    """Categorical PSI of the event-type mix between the two time halves
    (+0.5 smoothing, per-term ln-micros) — the model-monitoring drift
    score."""
    import ray.data as rd
    from deepkg_ray.stages.experiment import psi_drift
    return psi_drift(rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["ts", "event_type"]))


def _q_length_bucketing(sf_dir: str):
    """Power-of-2 length-bucketed batching audit: per bucket the doc
    count, token mass, padding waste and fill factor (serving-efficiency
    report; integer bit-length buckets, no float log)."""
    from deepkg_ray.stages.packing import length_bucketing
    return length_bucketing(_docs(sf_dir, ["doc_id", "text"]))


def _q_shard_plan(sf_dir: str):
    """Rendezvous-hash shard map audit: per shard the doc count plus the
    count that KEEPS its shard when the last shard is dropped — the HRW
    minimal-disruption property, value-checked."""
    from deepkg_ray.stages.curation import shard_plan
    return shard_plan(_docs(sf_dir, ["doc_id"]))


def _q_bootstrap_diff_ci(sf_dir: str):
    """Two-sample Poisson-bootstrap CI for the urgent-vs-rest difference
    in mean order value (both arms accumulated in the same single
    streaming pass)."""
    import ray.data as rd
    from deepkg_ray.stages.approx import poisson_bootstrap_diff_ci
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_totalprice", "o_orderpriority"])
    return poisson_bootstrap_diff_ci(orders, "o_orderkey", "o_totalprice",
                                     "o_orderpriority", "1-URGENT",
                                     n_boot=100)


def _q_vocab_coverage(sf_dir: str):
    """Top-N vocabulary coverage curve (tokenizer-design diagnostic): the
    open-vocab count table folds to a count-of-counts histogram — nothing
    row-shaped reaches the driver (stages/textstats.vocab_coverage)."""
    from deepkg_ray.stages.textstats import vocab_coverage
    return vocab_coverage(_docs(sf_dir, ["doc_id", "text"]))


def _q_domain_stats(sf_dir: str):
    """Per-domain URL exposure (blocklist/domain-dedup staple): hosts via
    the capture-group URL regex, distinct-doc + occurrence counts,
    cardinality-auto merged (stages/scrub.domain_stats).  The public
    corpus has no URLs, so the query injects id-derived multi-host links
    (augment_urls_kernel — identical suffix in the SQL oracle)."""
    from deepkg_ray.stages.scrub import augment_urls_kernel, domain_stats
    aug = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        augment_urls_kernel, batch_format="pyarrow")
    return domain_stats(aug)


def _q_rake_keywords(sf_dir: str):
    """RAKE keyword extraction (Rose et al. 2010) at corpus level:
    stopword-delimited candidate phrases, deg/freq word scores, top-k
    phrases — two streaming passes, vocabulary-bounded merges."""
    from deepkg_ray.stages.textstats import rake_keywords
    return rake_keywords(_docs(sf_dir, ["doc_id", "text"]), k=50)


def _q_dedup_clusters(sf_dir: str):
    """Connected components over the exact-Jaccard pair graph — the cluster
    step that turns near-dup PAIRS into 'one survivor per duplicate group'
    (stages/graph.py; adaptive driver union-find / distributed min-label
    propagation)."""
    from deepkg_ray.stages.dedup import ngram_jaccard_pairs
    from deepkg_ray.stages.graph import connected_components
    pairs = ngram_jaccard_pairs(_docs(sf_dir, ["doc_id", "text"]),
                                max_id=200, threshold=0.05)
    return connected_components(pairs)


def _q_dedup_cluster_sizes(sf_dir: str):
    from deepkg_ray.stages.dedup import ngram_jaccard_pairs
    from deepkg_ray.stages.graph import (connected_components,
                                         dedup_cluster_stats)
    pairs = ngram_jaccard_pairs(_docs(sf_dir, ["doc_id", "text"]),
                                max_id=200, threshold=0.05)
    return dedup_cluster_stats(connected_components(pairs))


def _q_editdist_pairs(sf_dir: str):
    """Levenshtein<=1 fuzzy self-join over customer names via lossless
    deletion-neighborhood blocking (stages/editdist.py — the scalable form
    of the reference's normalization candidate recall,
    Normalization/recall/run_recall.py)."""
    import ray.data as rd
    from deepkg_ray.stages.editdist import editdist_pairs
    cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey", "c_name"])
    return editdist_pairs(cust, id_col="c_custkey", name_col="c_name")


def _q_er_canonical(sf_dir: str):
    """Golden-record survivorship per ed≤1 name cluster (per-attribute
    mode, ties → smallest value) — the MDM step completing the linkage
    chain."""
    import ray.data as rd
    from deepkg_ray.stages.editdist import er_canonical
    cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey", "c_name", "c_nationkey",
                                    "c_mktsegment"])
    return er_canonical(cust)


def _q_fs_weights(sf_dir: str):
    """Fellegi–Sunter record-linkage weights (m from the ed≤1 declared
    match set, frequency-based u from attribute marginals, ln-micros)."""
    import ray.data as rd
    from deepkg_ray.stages.editdist import fs_weight_table
    cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey", "c_name", "c_nationkey",
                                    "c_mktsegment", "c_acctbal"])
    return fs_weight_table(cust)


def _q_fs_scores(sf_dir: str):
    """Per-candidate-pair Fellegi–Sunter log-likelihood-ratio score
    (agreement flags joined through two hash joins, integer weight sum)."""
    import ray.data as rd
    from deepkg_ray.stages.editdist import fs_match_scores
    cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey", "c_name", "c_nationkey",
                                    "c_mktsegment", "c_acctbal"])
    return fs_match_scores(cust)


def _q_editdist_clusters(sf_dir: str):
    """Edit-distance canonicalization clusters: connected components over
    the ed<=1 pair graph, component = min reachable id."""
    import ray.data as rd
    from deepkg_ray.stages.editdist import editdist_clusters
    cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey", "c_name"])
    return editdist_clusters(cust, id_col="c_custkey", name_col="c_name")


def _q_kg_kcore(sf_dir: str):
    """3-core of the KG entity graph via iterative peeling (in-core
    degrees).  Oracle: oracle.kg_kcore_oracle unrolled rounds."""
    from deepkg_ray.pipelines import kg
    from deepkg_ray.stages.graph import kcore_nodes
    return kcore_nodes(kg.adjacency_dataset(sf_dir), k=3)


def _q_kg_bfs(sf_dir: str):
    """Multi-round BFS hop distances from entity 0 over the built KG
    (frontier broadcast mode).  Oracle: oracle.kg_bfs_oracle unrolled
    min-fold rounds."""
    from deepkg_ray.pipelines import kg
    from deepkg_ray.stages.graph import bfs_distances
    return bfs_distances(kg.adjacency_dataset(sf_dir), sources=[0])


def _q_kg_labelprop(sf_dir: str):
    """Synchronous label-propagation communities over the built KG
    (4 rounds, broadcast mode).  Oracle: unrolled QUALIFY-argmax CTEs."""
    from deepkg_ray.pipelines import kg
    from deepkg_ray.stages.graph import label_propagation
    return label_propagation(kg.adjacency_dataset(sf_dir), rounds=4)


def _q_kg_modularity(sf_dir: str):
    """Newman modularity per LPA community over the built KG: one extra
    label-classified edge scan on top of kg_labelprop, exact doubled-edge
    integers, round6 in double (both sides)."""
    from deepkg_ray.pipelines import kg
    from deepkg_ray.stages.graph import modularity
    return modularity(kg.adjacency_dataset(sf_dir), rounds=4)


def _q_kg_components(sf_dir: str):
    """Weakly connected components over the built KG (distributed min-label
    propagation — forced, so the driver gate exercises the 100-TB tier)."""
    from deepkg_ray.pipelines import kg
    from deepkg_ray.stages.graph import connected_components
    return connected_components(kg.adjacency_dataset(sf_dir),
                                a_col="subj_id", b_col="obj_id",
                                mode="distributed")


def _q_kg_mis(sf_dir: str):
    """Luby maximal independent set over the built KG (deterministic
    hash priorities → equals sequential greedy; broadcast tier — node
    dictionary is driver-sized; the join tier is tier-agreement-tested).
    Oracle: unrolled synchronous-round CTEs."""
    from deepkg_ray.pipelines import kg
    from deepkg_ray.stages.graph import maximal_independent_set
    return maximal_independent_set(kg.adjacency_dataset(sf_dir))


def _q_kg_negatives(sf_dir: str):
    """Filtered TransE-style negative triples over the built KG
    (deterministic corruption offsets, positives removed by a distributed
    left_anti join)."""
    from deepkg_ray.pipelines import kg
    from deepkg_ray.stages.graph import negative_triples
    return negative_triples(kg.adjacency_dataset(sf_dir), ks=(1, 7))


def _q_kg_walks(sf_dir: str):
    """Deterministic node2vec-style random walks over the built KG
    (KG-embedding corpus generation)."""
    from deepkg_ray.pipelines import kg
    from deepkg_ray.stages.graph import random_walks
    return random_walks(kg.adjacency_dataset(sf_dir), steps=4, start_mod=3)


def _q_kg_degrees(sf_dir: str):
    """Undirected distinct-neighbor degree per entity over the built KG."""
    from deepkg_ray.pipelines import kg
    from deepkg_ray.stages.graph import node_degrees
    return node_degrees(kg.adjacency_dataset(sf_dir))


def _q_kg_pagerank(sf_dir: str):
    """Fixed-iteration integer-scaled PageRank over the built KG (join-free
    scatter/fold rounds; bitwise-identical to the unrolled-CTE oracle)."""
    from deepkg_ray.pipelines import kg
    from deepkg_ray.stages.graph import pagerank_scaled
    return pagerank_scaled(kg.adjacency_dataset(sf_dir), n_iters=5)


def _q_kg_ppr(sf_dir: str):
    """Personalized PageRank (random walk with restart to the 2 smallest
    node ids) over the built KG — same int64 scatter/fold rounds as
    kg_pagerank with seed-concentrated teleport."""
    from deepkg_ray.pipelines import kg
    from deepkg_ray.stages.graph import personalized_pagerank_scaled
    return personalized_pagerank_scaled(kg.adjacency_dataset(sf_dir),
                                        n_seeds=2, n_iters=5)


def _q_kg_scc(sf_dir: str):
    """Strongly connected components of the DIRECTED KG (forward-backward
    min-label coloring, join-shaped; component = min SCC member)."""
    from deepkg_ray.pipelines import kg
    from deepkg_ray.stages.graph import scc_components
    return scc_components(kg.adjacency_dataset(sf_dir))


def _q_kg_sssp(sf_dir: str):
    """Weighted shortest paths from the smallest KG node (Bellman-Ford
    join+Min-groupby rounds to monotone fixpoint; pair weight = min
    support count)."""
    from deepkg_ray.pipelines import kg
    from deepkg_ray.stages.graph import sssp_weighted
    return sssp_weighted(kg.adjacency_dataset(sf_dir))


def _q_kg_truss(sf_dir: str):
    """3-truss of the built KG: iterative wedge-support peeling to
    fixpoint (edge-cohesion analog of k-core)."""
    from deepkg_ray.pipelines import kg
    from deepkg_ray.stages.graph import truss_edges
    return truss_edges(kg.adjacency_dataset(sf_dir), k=3)


def _q_kg_robustness(sf_dir: str):
    """Targeted-attack robustness curve: LCC after removing the top-k
    degree hubs (k = 0, 5, 10)."""
    from deepkg_ray.pipelines import kg
    from deepkg_ray.stages.graph import robustness_profile
    return robustness_profile(kg.adjacency_dataset(sf_dir))


def _q_kg_avg_nbr_degree(sf_dir: str):
    """Average neighbor degree per node (local assortativity view)."""
    from deepkg_ray.pipelines import kg
    from deepkg_ray.stages.graph import avg_neighbor_degree
    return avg_neighbor_degree(kg.adjacency_dataset(sf_dir))


def _q_kg_embeddedness(sf_dir: str):
    """Edge embeddedness: common-neighbor support per existing edge
    (bridges report 0)."""
    from deepkg_ray.pipelines import kg
    from deepkg_ray.stages.graph import edge_embeddedness
    return edge_embeddedness(kg.adjacency_dataset(sf_dir))


def _q_kg_katz(sf_dir: str):
    """Fixed-iteration integer-scaled Katz centrality over the directed
    KG (β source term + α-damped in-edge prestige, stages/graph.py
    katz_scaled)."""
    from deepkg_ray.pipelines import kg
    from deepkg_ray.stages.graph import katz_scaled
    return katz_scaled(kg.adjacency_dataset(sf_dir), n_iters=3)


def _q_kg_eigenvector(sf_dir: str):
    """Fixed-iteration integer-scaled eigenvector centrality (power
    iteration x' = A.x on the symmetrized KG, scalar max normalizer)."""
    from deepkg_ray.pipelines import kg
    from deepkg_ray.stages.graph import eigenvector_scaled
    return eigenvector_scaled(kg.adjacency_dataset(sf_dir), n_iters=3)


def _q_kg_hits(sf_dir: str):
    """Fixed-iteration integer-scaled HITS hubs/authorities over the built
    KG (join-free scatters + scalar max normalizers; bitwise-identical to
    the unrolled-CTE oracle)."""
    from deepkg_ray.pipelines import kg
    from deepkg_ray.stages.graph import hits_scaled
    return hits_scaled(kg.adjacency_dataset(sf_dir), n_iters=3)


def _q_kg_triangles(sf_dir: str):
    """Global triangle count over the simple undirected KG graph."""
    from deepkg_ray.pipelines import kg
    from deepkg_ray.stages.graph import triangle_count
    return triangle_count(kg.adjacency_dataset(sf_dir))


_QUANTILES = [0.1, 0.25, 0.5, 0.75, 0.9, 0.99]


def _q_token_quantiles(sf_dir: str):
    """Exact discrete quantiles of per-doc token counts via the distributed
    value-count histogram (stages/quantiles.py — shuffle bounded by
    DISTINCT counts, not rows)."""
    from deepkg_ray.stages.quantiles import token_count_quantiles
    return token_count_quantiles(_docs(sf_dir, ["doc_id", "text"]),
                                 _QUANTILES)


def _q_flag_quantiles_cont(sf_dir: str):
    """Per-returnflag interpolated quantiles of l_quantity — the grouped
    percentile_cont path (shuffle bounded by groups × distinct values,
    per-group micro-index interpolation)."""
    from deepkg_ray.sources.readers import read_table
    from deepkg_ray.stages.quantiles import grouped_quantiles_cont

    return grouped_quantiles_cont(
        read_table(sf_dir, "lineitem", ["l_returnflag", "l_quantity"]),
        "l_returnflag", "l_quantity", [0.25, 0.5, 0.75, 0.9])


def _q_token_quantiles_cont(sf_dir: str):
    """Interpolated (percentile_cont / type-7) quantiles of per-doc token
    counts — micro-index interpolation over the same value-count
    histogram plan as the discrete path."""
    from deepkg_ray.stages.quantiles import token_count_quantiles_cont
    return token_count_quantiles_cont(_docs(sf_dir, ["doc_id", "text"]),
                                      _QUANTILES)


def _q_events_asof_orders(sf_dir: str):
    """As-of join: each event matched to the latest order of the same
    customer at-or-before its timestamp (per-key sorted merge inside
    map_groups — the composition Ray Data lacks natively)."""
    from deepkg_ray.sources.readers import read_events
    from deepkg_ray.stages.asof import asof_join_events_orders
    return asof_join_events_orders(
        read_events(sf_dir, ["event_id", "user_id", "ts"]),
        f"{sf_dir}/orders.parquet")


def _q_events_range_join(sf_dir: str):
    from deepkg_ray.sources.readers import read_events
    from deepkg_ray.stages.asof import range_join_counts
    return range_join_counts(read_events(sf_dir, ["event_id", "user_id", "ts"]),
                             f"{sf_dir}/orders.parquet")


def _q_users_without_orders(sf_dir: str):
    """Broadcast anti-join: events of users with no high-value order, per user
    (Bloom prefilter + exact confirmation — stages/sketches.py)."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from deepkg_ray.sources.readers import read_events
    from deepkg_ray.stages.sketches import bloom_anti_join_counts
    import pyarrow.compute as pc
    ot = pq.read_table(f"{sf_dir}/orders.parquet",
                       columns=["o_custkey", "o_totalprice"])
    # anti-join against customers holding a HIGH-VALUE order (>400k) so the
    # result is non-trivial on the testdata
    ot = ot.filter(pc.greater(ot["o_totalprice"], 400_000.0))
    custkeys = [str(v) for v in ot["o_custkey"].to_pylist()]
    out = bloom_anti_join_counts(read_events(sf_dir, ["user_id"]),
                                 "user_id", custkeys)
    return out.map_batches(
        lambda b: pa.table({"user_id": pa.compute.cast(b["user_id"], pa.int64()),
                            "n_rows": b["n_rows"].combine_chunks().cast(pa.int64())}),
        batch_format="pyarrow")


def _q_native_join_revenue(sf_dir: str):
    """Ray Data's native hash-partitioned Dataset.join (both-sides-large
    path) — same result/oracle as the broadcast-join segment_revenue."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd
    from ray.data.aggregate import Count, Sum
    from deepkg_ray.functions.numeric import to_micros

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_custkey", "o_totalprice"])
    cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey", "c_mktsegment"])
    joined = orders.join(cust, join_type="inner", num_partitions=8,
                         on=("o_custkey",), right_on=("c_custkey",))

    def partial(b: pa.Table) -> pa.Table:
        return pa.table({
            "c_mktsegment": b["c_mktsegment"],
            "price_micros": pa.array(to_micros(b["o_totalprice"].to_pylist()),
                                     pa.int64())})
    agg = (joined.map_batches(partial, batch_format="pyarrow")
           .groupby("c_mktsegment")
           .aggregate(Sum("price_micros", alias_name="price_micros"),
                      Count(alias_name="n_orders")))

    def finish(b: pa.Table) -> pa.Table:
        return pa.table({
            "c_mktsegment": b["c_mktsegment"],
            "total_revenue": pa.array(
                np.asarray(b["price_micros"].to_pylist(), np.float64) / 1e6),
            "n_orders": b["n_orders"].combine_chunks().cast(pa.int64())})
    return agg.map_batches(finish, batch_format="pyarrow")


def _q_nation_revenue(sf_dir: str):
    """TPC-H Q5-shaped star join: combiner-first lineitem pre-aggregate,
    two native hash joins, broadcast 25-row nation dimension."""
    from deepkg_ray.pipelines.relational import nation_revenue
    return nation_revenue(sf_dir)


def _q_top_events_per_type(sf_dir: str):
    """Per-key windowed top-k: the 2 highest-value events per event_type
    (rank-within-partition), deterministic tie-break on event_id."""
    import numpy as np
    import pandas as pd
    from deepkg_ray.functions.numeric import round6
    from deepkg_ray.sources.readers import read_events

    def topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["value", "event_id"], ascending=[False, True],
                          kind="stable").head(2).reset_index(drop=True)
        return pd.DataFrame({
            "event_type": g["event_type"],
            "event_id": g["event_id"].astype(np.int64),
            "value": round6(g["value"].to_numpy()),
            "rank": np.arange(len(g), dtype=np.int32)})

    return (read_events(sf_dir, ["event_id", "event_type", "value"])
            .groupby("event_type").map_groups(topk, batch_format="pandas"))


def _q_approx_distinct(sf_dir: str):
    """HLL approximate-distinct over events — value-checked via the merged
    sketch STATE: (col, register, rho) rows are integer-exact and the md5-
    parity hash makes them reproducible in SQL (oracle.hll_registers_oracle);
    estimate() accuracy is pytest-covered (test_hll_accuracy)."""
    import pandas as pd
    from deepkg_ray.sources.readers import read_events
    from deepkg_ray.stages.sketches import hll_registers
    out = []
    for col in ("user_id", "event_type"):
        t = hll_registers(read_events(sf_dir, [col]), col)
        t.insert(0, "col", col)
        out.append(t)
    return pd.concat(out, ignore_index=True)


def _q_doc_repetition(sf_dir: str):
    """Within-doc duplicate-ngram fraction (C4/Gopher repetition filter)."""
    from deepkg_ray.sources.readers import read_documents
    from deepkg_ray.stages.textstats import doc_repetition
    return doc_repetition(read_documents(sf_dir, ["doc_id", "text"]))


def _q_source_pii_rates(sf_dir: str):
    """Per-source PII exposure audit over the PII-augmented corpus
    (emails/URLs/phones: doc-hit rates + total hits per class)."""
    from deepkg_ray.sources.readers import read_documents
    from deepkg_ray.stages.scrub import (augment_pii_kernel,
                                         source_pii_rates)
    aug = read_documents(sf_dir, ["doc_id", "source", "text"]) \
        .map_batches(augment_pii_kernel, batch_format="pyarrow")
    return source_pii_rates(aug)


def _q_pii_scrub(sf_dir: str):
    """PII redaction (emails/URLs/phones) over deterministically
    PII-augmented text — the public corpus has no PII, so the query injects
    a doc_id-derived suffix (declared in both engine and oracle), then runs
    the general scrub operator."""
    from deepkg_ray.sources.readers import read_documents
    from deepkg_ray.stages.scrub import augment_pii_kernel, pii_scrub
    aug = read_documents(sf_dir, ["doc_id", "text"]).map_batches(
        augment_pii_kernel, batch_format="pyarrow")
    return pii_scrub(aug)


def _q_quality_lr_weights(sf_dir: str):
    """Trained hard-sigmoid logistic-regression quality classifier:
    final weight vector after 16 integer-exact full-batch GD rounds
    (stages/logreg.py — fasttext-style corpus quality filter,
    distilling doc_stats' quality rule)."""
    from deepkg_ray.sources.readers import read_documents
    from deepkg_ray.stages.logreg import lr_weight_table
    return lr_weight_table(read_documents(sf_dir, ["doc_id", "text"]))


def _q_quality_lr_scores(sf_dir: str):
    """Per-doc margins/predictions under the trained quality classifier
    — the whole train+score chain is integer arithmetic, hash-exact vs
    the unrolled-CTE SQL."""
    from deepkg_ray.sources.readers import read_documents
    from deepkg_ray.stages.logreg import lr_scores
    return lr_scores(read_documents(sf_dir, ["doc_id", "text"]))


def _q_quality_lr_accuracy(sf_dir: str):
    """Training report for the learned quality filter (n, positives,
    correct, train accuracy)."""
    from deepkg_ray.sources.readers import read_documents
    from deepkg_ray.stages.logreg import lr_accuracy
    return lr_accuracy(read_documents(sf_dir, ["doc_id", "text"]))


def _q_quality_lr_holdout(sf_dir: str):
    """Generalization report for the learned quality filter: trained on
    the deterministic md5-80% split only, accuracy on train vs holdout."""
    from deepkg_ray.sources.readers import read_documents
    from deepkg_ray.stages.logreg import lr_holdout
    return lr_holdout(read_documents(sf_dir, ["doc_id", "text"]))


def _q_quality_filter(sf_dir: str):
    """Gopher-style rule-based quality gate with per-rule flags."""
    from deepkg_ray.sources.readers import read_documents
    from deepkg_ray.stages.textstats import quality_filter
    return quality_filter(read_documents(sf_dir, ["doc_id", "text"]))


def _q_decontaminate(sf_dir: str):
    """Benchmark 4-gram decontamination: docs with doc_id%17==0 form the
    benchmark; every other doc is flagged by distinct shared 4-grams."""
    import numpy as np
    import pyarrow as pa

    from deepkg_ray.sources.readers import read_documents
    from deepkg_ray.stages.scrub import benchmark_ngrams, decontaminate

    def mod_filter(want_zero: bool):
        def f(b: pa.Table) -> pa.Table:
            r = np.asarray(b["doc_id"].to_pylist(), dtype=np.int64) % 17
            return b.filter(pa.array(r == 0 if want_zero else r != 0))
        return f

    docs = read_documents(sf_dir, ["doc_id", "text"])
    bench = benchmark_ngrams(
        docs.map_batches(mod_filter(True), batch_format="pyarrow"), n=4)
    return decontaminate(
        docs.map_batches(mod_filter(False), batch_format="pyarrow"),
        bench, n=4)


def _q_doc_logprob(sf_dir: str):
    """Per-doc unigram log-likelihood under the corpus' own unigram model
    (micros-exact ln convention)."""
    from deepkg_ray.sources.readers import read_documents
    from deepkg_ray.stages.textstats import doc_logprob
    return doc_logprob(read_documents(sf_dir, ["doc_id", "text"]))


def _q_doc_logprob_bigram(sf_dir: str):
    """Per-doc Laplace-smoothed bigram LM score (the KenLM-style quality
    filter one rung above unigram doc_logprob); broadcast model tier, the
    open-vocab join tier is tier-agreement-tested."""
    from deepkg_ray.sources.readers import read_documents
    from deepkg_ray.stages.textstats import doc_logprob_bigram
    return doc_logprob_bigram(read_documents(sf_dir, ["doc_id", "text"]))


def _q_doc_logprob_kn(sf_dir: str):
    """Per-doc interpolated Kneser-Ney bigram LM score — the
    continuation-count smoothing (Kneser & Ney 1995) completing the
    unigram/Laplace/KN LM-scoring ladder; broadcast model tier, join
    tier tier-agreement-tested."""
    from deepkg_ray.sources.readers import read_documents
    from deepkg_ray.stages.textstats import doc_logprob_kn
    return doc_logprob_kn(read_documents(sf_dir, ["doc_id", "text"]))


def _q_boilerplate_stats(sf_dir: str):
    """CCNet-style boilerplate removal stats: sentences in ≥3 distinct
    docs are boilerplate; per-doc surviving-text accounting."""
    from deepkg_ray.sources.readers import read_documents
    from deepkg_ray.stages.curation import boilerplate_stats
    return boilerplate_stats(read_documents(sf_dir, ["doc_id", "text"]))


def _q_sentence_dedup(sf_dir: str):
    """C4/RefinedWeb line dedup: first occurrence of each sentence wins;
    docs reassembled from surviving sentences."""
    from deepkg_ray.sources.readers import read_documents
    from deepkg_ray.stages.curation import sentence_dedup
    return sentence_dedup(read_documents(sf_dir, ["doc_id", "text"]))


def _q_budget_select(sf_dir: str):
    """Token-budget corpus selection: highest-quality docs (doc_stats
    quality, ties by doc_id) until 60% of total tokens is reached —
    histogram prefix-sum + boundary binary search, never a global sort."""
    from deepkg_ray.sources.readers import read_documents
    from deepkg_ray.stages.curation import budget_select
    from deepkg_ray.stages.textstats import doc_stats
    stats = doc_stats(read_documents(sf_dir, ["doc_id", "text"])) \
        .select_columns(["doc_id", "quality", "n_tokens"]).materialize()
    budget = int(0.6 * int(stats.sum("n_tokens")))
    return budget_select(stats, budget, score_col="quality",
                         weight_col="n_tokens", id_col="doc_id")


def _q_corpus_curate(sf_dir: str):
    """End-to-end curation pipeline: quality gate → sentence dedup →
    re-score cleaned text → 60%-token-budget selection."""
    from deepkg_ray.sources.readers import read_documents
    from deepkg_ray.stages.curation import corpus_curate
    return corpus_curate(read_documents(sf_dir, ["doc_id", "text"]))


def _q_embedding_pca(sf_dir: str):
    """Distributed PCA top component: Gram reduction → driver-side power
    iteration (d² scalars) → streaming projection map (micros-exact,
    oracle is the unrolled-CTE power iteration)."""
    from deepkg_ray.sources.readers import read_embeddings
    from deepkg_ray.stages.similarity import pca_power_projection
    return pca_power_projection(read_embeddings(sf_dir,
                                                ["vec_id", "embedding"]))


def _q_segment_share(sf_dir: str):
    """Each order's share of its segment's revenue (ratio-to-group via a
    broadcast 5-row totals table; micros-exact)."""
    from deepkg_ray.pipelines.relational import segment_revenue_share
    return segment_revenue_share(sf_dir)


def _q_events_cep(sf_dir: str):
    """SEQ(view, click+, purchase) CEP pattern matches within a 1-hour
    window, skip-till-next-match semantics, per user."""
    from deepkg_ray.sources.readers import read_events
    from deepkg_ray.stages.windows import cep_pattern_matches
    return cep_pattern_matches(read_events(
        sf_dir, ["user_id", "event_id", "ts", "event_type"]))


def _q_events_cep_absence(sf_dir: str):
    """Negation CEP: SEQ(signup, no-error, purchase) within 1 hour —
    clean-conversion detection (absence semantics)."""
    from deepkg_ray.sources.readers import read_events
    from deepkg_ray.stages.windows import cep_absence_matches
    return cep_absence_matches(read_events(
        sf_dir, ["user_id", "event_id", "ts", "event_type"]))


def _q_events_funnel(sf_dir: str):
    """Ordered view->click->purchase funnel counts (per-user sequence
    match over user-complete hash partitions)."""
    from deepkg_ray.sources.readers import read_events
    from deepkg_ray.stages.windows import funnel_counts
    return funnel_counts(read_events(
        sf_dir, ["user_id", "event_type", "ts"]))


def _q_events_time_window(sf_dir: str):
    """Trailing 600-second RANGE-frame window sum per user (peer-inclusive
    SQL semantics, exact micros)."""
    from deepkg_ray.sources.readers import read_events
    from deepkg_ray.stages.windows import time_window_sum
    return time_window_sum(read_events(
        sf_dir, ["user_id", "event_id", "ts", "value"]))


def _q_windowed_distinct(sf_dir: str):
    """Approximate distinct users per tumbling hour: HLL register state
    per window (sketch merge IS the aggregate — ≤2^p rows per window
    shuffle instead of every (window, user) pair)."""
    from deepkg_ray.sources.readers import read_events
    from deepkg_ray.stages.sketches import windowed_hll_registers
    return windowed_hll_registers(read_events(sf_dir, ["ts", "user_id"]))


def _q_events_zscore(sf_dir: str):
    """Per-type z-score standardization + outlier flag (tiny moment
    aggregate broadcast into a stateless scoring map)."""
    from deepkg_ray.sources.readers import read_events
    from deepkg_ray.stages.windows import zscore_events
    return zscore_events(read_events(
        sf_dir, ["event_id", "event_type", "value"]))


def _q_events_interarrival(sf_dir: str):
    """Per-event LAG gap to the same user's previous event (user-complete
    coarse partitions, vectorized shifted diff)."""
    from deepkg_ray.sources.readers import read_events
    from deepkg_ray.stages.windows import interarrival_gaps
    return interarrival_gaps(read_events(sf_dir, ["user_id", "event_id",
                                                  "ts"]))


def _q_events_pivot(sf_dir: str):
    """Crosstab: day-of-week × event_type counts pivoted wide from a
    dictionary-bounded grid aggregate."""
    from deepkg_ray.sources.readers import read_events
    from deepkg_ray.stages.windows import pivot_counts
    return pivot_counts(read_events(sf_dir, ["ts", "event_type"]))


def _q_kg_reciprocity(sf_dir: str):
    """Directed-edge reciprocity of the built KG (unordered-pair groupby,
    ≤2 rows per group)."""
    from deepkg_ray.pipelines import kg
    from deepkg_ray.stages.graph import reciprocity
    return reciprocity(kg.adjacency_dataset(sf_dir))


def _q_events_corr(sf_dir: str):
    """Per-type Pearson r between value and hour-of-day (single-pass
    mergeable six-tuple moments)."""
    from deepkg_ray.sources.readers import read_events
    from deepkg_ray.stages.windows import corr_events
    return corr_events(read_events(sf_dir, ["event_type", "ts", "value"]))


def _q_events_resample(sf_dir: str):
    """Per (user, 5-min tumbling window) OHLC resample: first/last/min/max
    value + count, via associative per-block partials (one tiny row per
    key per block travels the shuffle, never the events)."""
    from deepkg_ray.sources.readers import read_events
    from deepkg_ray.stages.windows import resample_ohlc
    return resample_ohlc(read_events(
        sf_dir, ["user_id", "ts", "event_id", "value"]))


def _q_state_history(sf_dir: str):
    """SCD2 validity intervals: per-user consecutive equal-type runs
    collapsed to (valid_from_us, valid_to_us, n_events) via one
    vectorized run-length encode per user-complete partition."""
    from deepkg_ray.sources.readers import read_events
    from deepkg_ray.stages.windows import state_history
    return state_history(read_events(
        sf_dir, ["user_id", "ts", "event_id", "event_type"]))


def _q_markov_stationary(sf_dir: str):
    """Stationary distribution of the event-type Markov chain (pi.P^k,
    integer floor arithmetic, unrolled-CTE oracle)."""
    from deepkg_ray.sources.readers import read_events
    from deepkg_ray.stages.windows import markov_stationary
    return markov_stationary(read_events(
        sf_dir, ["user_id", "ts", "event_id", "event_type"]))


def _q_markov_transitions(sf_dir: str):
    """First-order Markov transition matrix over per-user event-type
    sequences (per-partition pair combiner → tree merge over the
    |types|² key space → one row-normalizing divide)."""
    from deepkg_ray.sources.readers import read_events
    from deepkg_ray.stages.windows import markov_transitions
    return markov_transitions(read_events(
        sf_dir, ["user_id", "ts", "event_id", "event_type"]))


def _q_frequent_pairs(sf_dir: str):
    """Market-basket pair supports over lineitem (basket = order, item =
    part): vectorized within-basket pair fan-out + per-partition combiner
    before the one pair-space shuffle; support ≥ 2."""
    from deepkg_ray.sources.readers import read_table
    from deepkg_ray.stages.basket import frequent_pairs
    return frequent_pairs(
        read_table(sf_dir, "lineitem", ["l_orderkey", "l_partkey"]),
        basket_col="l_orderkey", item_col="l_partkey", min_support=2)


def _q_part_skyline(sf_dir: str):
    """Pareto frontier of part in (min price, max size): per-block local
    skyline → fanout merge tree (skyline is closed under union, so only
    frontier rows ever move)."""
    from deepkg_ray.sources.readers import read_table
    from deepkg_ray.stages.skyline import skyline_2d
    return skyline_2d(
        read_table(sf_dir, "part", ["p_partkey", "p_retailprice", "p_size"]),
        key_col="p_partkey", min_col="p_retailprice", max_col="p_size")


def _q_snapshot_diff(sf_dir: str):
    """CDC delta between two deterministic orders snapshots (A drops keys
    %10==3; B drops keys %7==2 and bumps price +1.0 on keys %5==0):
    added/removed/changed rows via a narrow-row co-group, unchanged
    dropped batch-side."""
    import numpy as np
    import pyarrow as pa
    from deepkg_ray.sources.readers import read_table
    from deepkg_ray.stages.diff import table_diff

    def snap_a(b: "pa.Table") -> "pa.Table":
        k = b["o_orderkey"].to_numpy()
        keep = (k % 10) != 3
        return pa.table({
            "o_orderkey": pa.array(k[keep], pa.int64()),
            "price": pa.array(b["o_totalprice"].to_numpy()[keep],
                              pa.float64())})

    def snap_b(b: "pa.Table") -> "pa.Table":
        k = b["o_orderkey"].to_numpy()
        keep = (k % 7) != 2
        p = (b["o_totalprice"].to_numpy()[keep]
             + (k[keep] % 5 == 0).astype(np.float64))
        return pa.table({"o_orderkey": pa.array(k[keep], pa.int64()),
                         "price": pa.array(p, pa.float64())})

    cols = ["o_orderkey", "o_totalprice"]
    ds_a = read_table(sf_dir, "orders", cols).map_batches(
        snap_a, batch_format="pyarrow")
    ds_b = read_table(sf_dir, "orders", cols).map_batches(
        snap_b, batch_format="pyarrow")
    return table_diff(ds_a, ds_b, "o_orderkey", "price")


def _q_fk_audit(sf_dir: str):
    """Referential-integrity audit over four FK edges (parents drop keys
    %13==0 to inject orphans): broadcast-set tier for dictionary-sized
    parents, key co-group tier for the rest."""
    import pandas as pd
    import pyarrow as pa
    from deepkg_ray.sources.readers import read_table
    from deepkg_ray.stages.diff import fk_orphans

    def drop13(key):
        def fn(b: "pa.Table") -> "pa.Table":
            return b.filter(pa.array((b[key].to_numpy() % 13) != 0))
        return fn

    def parent(tbl, key, inject=True):
        ds = read_table(sf_dir, tbl, [key])
        return ds.map_batches(drop13(key), batch_format="pyarrow") \
            if inject else ds

    rows = [
        fk_orphans(read_table(sf_dir, "lineitem", ["l_orderkey"]),
                   parent("orders", "o_orderkey"),
                   "l_orderkey", "o_orderkey",
                   "lineitem.l_orderkey->orders"),
        fk_orphans(read_table(sf_dir, "orders", ["o_custkey"]),
                   parent("customer", "c_custkey"),
                   "o_custkey", "c_custkey",
                   "orders.o_custkey->customer"),
        fk_orphans(read_table(sf_dir, "customer", ["c_nationkey"]),
                   parent("nation", "n_nationkey", inject=False),
                   "c_nationkey", "n_nationkey",
                   "customer.c_nationkey->nation", broadcast=True),
        fk_orphans(read_table(sf_dir, "lineitem", ["l_suppkey"]),
                   parent("supplier", "s_suppkey"),
                   "l_suppkey", "s_suppkey",
                   "lineitem.l_suppkey->supplier", broadcast=True),
    ]
    return pd.concat(rows, ignore_index=True)


def _q_running_distinct(sf_dir: str):
    """Per-event running count of DISTINCT event types per user
    (first-occurrence flag + segment-rebased cumulative sum over
    user-complete partitions)."""
    from deepkg_ray.sources.readers import read_events
    from deepkg_ray.stages.windows import running_distinct
    return running_distinct(read_events(
        sf_dir, ["user_id", "ts", "event_id", "event_type"]))


def _q_shipping_priority(sf_dir: str):
    """TPC-H Q3-shaped pipeline: segment + date-filtered 3-table join,
    lineitem pre-aggregated before any join, deterministic top-10."""
    from deepkg_ray.pipelines.relational import shipping_priority
    return shipping_priority(sf_dir)


def _q_events_iqr_outliers(sf_dir: str):
    """Tukey-fence outliers per event_type: grouped interpolated quartiles
    in exact scaled-integer space, broadcast fences, pure-int64 boundary
    test (the quantile-join-filter pattern)."""
    from deepkg_ray.sources.readers import read_events
    from deepkg_ray.stages.quantiles import grouped_iqr_outliers
    return grouped_iqr_outliers(read_events(
        sf_dir, ["event_id", "event_type", "value"]))


def _q_events_chi_square(sf_dir: str):
    """Pearson χ² independence test of day-of-week × event_type over the
    full margin grid (unobserved cells included)."""
    from deepkg_ray.sources.readers import read_events
    from deepkg_ray.stages.windows import chi_square_independence
    return chi_square_independence(read_events(sf_dir, ["ts", "event_type"]))


def _q_kg_diameter(sf_dir: str):
    """2-sweep diameter lower bound over the built KG (two BFS passes,
    far-node tie-break to the smallest id)."""
    from deepkg_ray.pipelines import kg
    from deepkg_ray.stages.graph import diameter_2sweep
    return diameter_2sweep(kg.adjacency_dataset(sf_dir))


def _q_events_props_extract(sf_dir: str):
    """Vectorized JSON-field extraction from the props column + per-type
    integer stats (the semi-structured column path)."""
    from deepkg_ray.sources.readers import read_events
    from deepkg_ray.stages.windows import props_extract_stats
    return props_extract_stats(read_events(sf_dir, ["event_type", "props"]))


def _q_kg_walk_counts(sf_dir: str):
    """Directed walk counts A^k·e_s for k=1..4 (integer matvec chain —
    the exact backbone of Katz/diffusion scores)."""
    from deepkg_ray.pipelines import kg
    from deepkg_ray.stages.graph import walk_counts_from
    return walk_counts_from(kg.adjacency_dataset(sf_dir), max_len=4)


def _q_kg_rich_club(sf_dir: str):
    """Rich-club connectivity profile (min-degree histogram + suffix
    sums — one edge pass for every threshold)."""
    from deepkg_ray.pipelines import kg
    from deepkg_ray.stages.graph import rich_club
    return rich_club(kg.adjacency_dataset(sf_dir))


def _q_kg_node_profiles(sf_dir: str):
    """Per-node BFS profile (reach, eccentricity, harmonic centrality in
    integer micros) — source fan-out over a broadcast CSR, one row per
    task-local source, zero all-pairs state."""
    from deepkg_ray.pipelines import kg
    from deepkg_ray.stages.graph import node_bfs_profiles
    return node_bfs_profiles(kg.adjacency_dataset(sf_dir))


def _q_kg_pagerank_weighted(sf_dir: str):
    """Evidence-weighted PageRank: mass splits across out-edges by
    extraction-count weight, exact int64 chain."""
    from deepkg_ray.pipelines import kg
    from deepkg_ray.stages.graph import weighted_pagerank_scaled
    return weighted_pagerank_scaled(kg.adjacency_dataset(sf_dir))


def _q_kg_stress(sf_dir: str):
    """Stress centrality (integer betweenness cousin) over the built KG:
    per-source BFS+σ fan-out on a broadcast CSR, n²-bounded assembly,
    distributed per-node masked-outer-product accumulation."""
    from deepkg_ray.pipelines import kg
    from deepkg_ray.stages.graph import stress_centrality
    return stress_centrality(kg.adjacency_dataset(sf_dir))


def _q_kg_harmonic(sf_dir: str):
    """Landmark harmonic centrality (Σ 1/dist, integer 1e6//d terms) for
    the 4 smallest entity ids — the disconnected-graph-safe closeness
    variant (Boldi & Vigna 2014)."""
    from deepkg_ray.pipelines import kg
    from deepkg_ray.stages.graph import harmonic_centrality
    return harmonic_centrality(kg.adjacency_dataset(sf_dir), k_seeds=4)


def _q_kg_closeness(sf_dir: str):
    """Landmark closeness centrality for the 4 smallest entity ids over the
    built KG — one labeled Bellman-Ford fixpoint runs all seeds together."""
    from deepkg_ray.pipelines import kg
    from deepkg_ray.stages.graph import closeness_centrality
    return closeness_centrality(kg.adjacency_dataset(sf_dir), k_seeds=4)


def _q_events_cume_dist(sf_dir: str):
    """Tie-aware cume_dist() window per event_type (exact-micros tie
    classes, vectorized searchsorted per key)."""
    from deepkg_ray.sources.readers import read_events
    from deepkg_ray.stages.windows import cume_dist_events
    return cume_dist_events(read_events(
        sf_dir, ["event_id", "event_type", "value"]))


def _q_mode_event_type(sf_dir: str):
    """Grouped MODE aggregate: each user's most frequent event type,
    deterministic lexicographic tie-break (count groupby + user-complete
    partition argmax)."""
    from deepkg_ray.sources.readers import read_events
    from deepkg_ray.stages.windows import mode_per_user
    return mode_per_user(read_events(sf_dir, ["user_id", "event_type"]))


def _q_part_unpivot(sf_dir: str):
    """UNPIVOT/melt reshape of part's numeric measures to long form —
    stateless per-batch melt, no shuffle."""
    from deepkg_ray.pipelines.relational import part_unpivot
    return part_unpivot(sf_dir)



def _q_customer_order_distribution(sf_dir: str):
    """TPC-H Q13-shaped left-outer count distribution: per order count
    (including 0), how many customers placed exactly that many orders."""
    from deepkg_ray.pipelines.relational import customer_order_distribution
    return customer_order_distribution(sf_dir)


def _q_dormant_rich_customers(sf_dir: str):
    """TPC-H Q22-shaped anti-join: above-positive-average-balance customers
    with no orders, counted/summed per nation (division-cleared threshold,
    native left_anti join)."""
    from deepkg_ray.pipelines.relational import dormant_rich_customers
    return dormant_rich_customers(sf_dir)


def _q_small_lot_revenue(sf_dir: str):
    """TPC-H Q17-shaped correlated-average filter: revenue of below-20%%-of-
    part-average lots for one brand, integer-exact threshold."""
    from deepkg_ray.pipelines.relational import small_lot_revenue
    return small_lot_revenue(sf_dir)


def _q_supplier_share_nations(sf_dir: str):
    """TPC-H Q11-shaped global-threshold HAVING: nations holding >5%% of
    total supplier balance (division-cleared against one broadcast scalar)."""
    from deepkg_ray.pipelines.relational import supplier_share_nations
    return supplier_share_nations(sf_dir)



def _q_events_mad(sf_dir: str):
    """Grouped median absolute deviation per event type — doubled-micros
    exact medians, two distinct-bounded histogram passes."""
    from deepkg_ray.sources.readers import read_events
    from deepkg_ray.stages.quantiles import grouped_mad
    return grouped_mad(read_events(sf_dir, ["event_type", "value"]))


def _q_events_ks(sf_dir: str):
    """Two-sample Kolmogorov-Smirnov D between click and view value
    distributions, division-cleared integer max."""
    from deepkg_ray.sources.readers import read_events
    from deepkg_ray.stages.quantiles import ks_two_sample
    return ks_two_sample(read_events(sf_dir, ["event_type", "value"]))


def _q_events_auc(sf_dir: str):
    """ROC AUC of value as a purchase-detector score, exact average-rank
    tie handling in doubled integer space."""
    from deepkg_ray.sources.readers import read_events
    from deepkg_ray.stages.quantiles import roc_auc
    return roc_auc(read_events(sf_dir, ["event_type", "value"]))


def _q_events_pr_auc(sf_dir: str):
    """Average precision (PR-AUC) of value as a purchase-detector score,
    integer per-threshold terms over the distinct-value histogram
    (stages/quantiles.pr_auc)."""
    from deepkg_ray.sources.readers import read_events
    from deepkg_ray.stages.quantiles import pr_auc
    return pr_auc(read_events(sf_dir, ["event_type", "value"]))


def _q_events_drawdown(sf_dir: str):
    """Per-user max drawdown of the cumulative value series (chained
    SUM-OVER / MAX-OVER windows on user-complete partitions)."""
    from deepkg_ray.sources.readers import read_events
    from deepkg_ray.stages.windows import max_drawdown
    return max_drawdown(read_events(sf_dir, ["user_id", "event_id", "ts",
                                             "value"]))



def _q_bigram_entropy(sf_dir: str):
    """Per-source conditional bigram entropy H(w2|w1): next-token
    predictability (template/duplication detector)."""
    from deepkg_ray.sources.readers import read_documents
    from deepkg_ray.stages.textstats import bigram_cond_entropy
    return bigram_cond_entropy(read_documents(sf_dir,
                                              ["source", "text"]))


def _q_heaps_fit(sf_dir: str):
    """Heaps'-law vocabulary-growth fit (ln V ~ ln N OLS at doc-prefix
    checkpoints) — token_zipf_fit's companion corpus-health law."""
    from deepkg_ray.sources.readers import read_documents
    from deepkg_ray.stages.textstats import heaps_fit
    return heaps_fit(read_documents(sf_dir, ["doc_id", "text"]))


def _q_token_zipf_fit(sf_dir: str):
    """Zipf-law OLS fit (ln freq ~ ln rank) over the top-500 corpus
    unigrams — corpus-health diagnostic, big-int exact moments."""
    from deepkg_ray.sources.readers import read_documents
    from deepkg_ray.stages.textstats import token_zipf_fit
    return token_zipf_fit(read_documents(sf_dir, ["text"]))


def _q_token_burstiness(sf_dir: str):
    """Variance-to-mean ratio of per-doc term frequency for the top-50
    tokens (burstiness, zeros included) — division-cleared exact."""
    from deepkg_ray.sources.readers import read_documents
    from deepkg_ray.stages.textstats import token_burstiness
    return token_burstiness(read_documents(sf_dir, ["doc_id", "text"]))


def _q_char_entropy(sf_dir: str):
    """Per-doc character entropy (gibberish/boilerplate signal)."""
    from deepkg_ray.sources.readers import read_documents
    from deepkg_ray.stages.textstats import char_entropy
    return char_entropy(read_documents(sf_dir, ["doc_id", "text"]))


def _q_readability(sf_dir: str):
    """Flesch reading ease + type-token ratio per document (stateless
    per-record map, round6 double chain on both sides)."""
    from deepkg_ray.sources.readers import read_documents
    from deepkg_ray.stages.textstats import readability_scores
    return readability_scores(read_documents(sf_dir, ["doc_id", "text"]))


def _q_source_weighted_jaccard(sf_dir: str):
    """Token-mass-weighted Jaccard between sources (Σmin/Σmax)."""
    from deepkg_ray.sources.readers import read_documents
    from deepkg_ray.stages.textstats import source_weighted_jaccard
    return source_weighted_jaccard(read_documents(sf_dir,
                                                  ["text", "source"]))


def _q_hapax_by_source(sf_dir: str):
    """Corpus-wide singleton-token rate per source (vocabulary tail)."""
    from deepkg_ray.sources.readers import read_documents
    from deepkg_ray.stages.textstats import hapax_by_source
    return hapax_by_source(read_documents(sf_dir, ["text", "source"]))


def _q_cross_source_dups(sf_dir: str):
    """Where exact duplication lives: per-source-pair shared normalized
    texts (bitmask/Gram core keyed by text)."""
    from deepkg_ray.sources.readers import read_documents
    from deepkg_ray.stages.textstats import cross_source_dups
    return cross_source_dups(read_documents(sf_dir, ["text", "source"]))


def _q_source_vocab_overlap(sf_dir: str):
    """Pairwise source vocabulary Jaccard via token membership bitmasks
    (distinct (source, token) → masks → one Gram matmul per batch)."""
    from deepkg_ray.sources.readers import read_documents
    from deepkg_ray.stages.textstats import source_vocab_overlap
    return source_vocab_overlap(read_documents(sf_dir, ["text", "source"]))


def _q_chi2_tokens(sf_dir: str):
    """Top-3 chi-square discriminative tokens per source (Yang &
    Pedersen 1997 feature selection, integer-rational micros,
    stages/textstats.chi2_tokens)."""
    from deepkg_ray.sources.readers import read_documents
    from deepkg_ray.stages.textstats import chi2_tokens
    return chi2_tokens(read_documents(sf_dir, ["doc_id", "text",
                                               "source"]))


def _q_source_js(sf_dir: str):
    """Jensen-Shannon divergence between src0/src1 unigram
    distributions — the symmetric bounded drift monitor next to
    source_kl (stages/textstats.source_js_divergence)."""
    from deepkg_ray.sources.readers import read_documents
    from deepkg_ray.stages.textstats import source_js_divergence
    return source_js_divergence(read_documents(
        sf_dir, ["doc_id", "text", "source"]))


def _q_source_kl(sf_dir: str):
    """KL divergence between two sources' add-one-smoothed unigram
    distributions — domain-shift monitor, ln-micros integer sum."""
    from deepkg_ray.sources.readers import read_documents
    from deepkg_ray.stages.textstats import source_kl_divergence
    return source_kl_divergence(
        read_documents(sf_dir, ["source", "text"]))



def _q_returned_item_customers(sf_dir: str):
    """TPC-H Q10-shaped returned-item revenue: top-20 customers by
    returned-lineitem revenue with nation attached."""
    from deepkg_ray.pipelines.relational import returned_item_customers
    return returned_item_customers(sf_dir)


def _q_top_supplier_revenue(sf_dir: str):
    """TPC-H Q15-shaped top supplier WITH TIES over one quarter."""
    from deepkg_ray.pipelines.relational import top_supplier_revenue
    return top_supplier_revenue(sf_dir)


def _q_brand_supplier_counts(sf_dir: str):
    """TPC-H Q16-shaped distinct-supplier counts per (brand, type)."""
    from deepkg_ray.pipelines.relational import brand_supplier_counts
    return brand_supplier_counts(sf_dir)


def _q_disjunctive_revenue(sf_dir: str):
    """TPC-H Q19-shaped OR-of-conjuncts revenue filter."""
    from deepkg_ray.pipelines.relational import disjunctive_revenue
    return disjunctive_revenue(sf_dir)



def _q_orc_roundtrip(sf_dir: str):
    """ORC sink + source roundtrip (per-block pyarrow.orc write inside
    the task, read_binary_files + decode back) hash-matched against the
    parquet-side aggregate."""
    from deepkg_ray.sources.readers import orc_roundtrip_counts
    return orc_roundtrip_counts(sf_dir)


def _q_csv_roundtrip(sf_dir: str):
    """CSV sink + source roundtrip (micros-int crossing) verified by
    hash-matching the parquet-side aggregate."""
    from deepkg_ray.sources.readers import csv_roundtrip_counts
    return csv_roundtrip_counts(sf_dir)


def _q_user_event_entropy(sf_dir: str):
    """Per-user Shannon entropy of the event-type mix (order-free
    ln-micros integer sum)."""
    from deepkg_ray.sources.readers import read_events
    from deepkg_ray.stages.windows import user_event_entropy
    return user_event_entropy(read_events(sf_dir, ["user_id",
                                                   "event_type"]))



def _q_monthly_revenue_growth(sf_dir: str):
    """Month-over-month revenue growth (LAG on the aggregated series)."""
    from deepkg_ray.pipelines.relational import monthly_revenue_growth
    return monthly_revenue_growth(sf_dir)


def _q_conversion_lag(sf_dir: str):
    """First-view to first-purchase lag quantiles per user (funnel
    latency distribution, interpolated type-7)."""
    from deepkg_ray.sources.readers import read_events
    from deepkg_ray.stages.windows import conversion_lag_quantiles
    return conversion_lag_quantiles(
        read_events(sf_dir, ["user_id", "ts", "event_type"]))



def _q_json_roundtrip(sf_dir: str):
    """JSONL sink + source roundtrip (micros-int crossing), hash-checked
    against the parquet-side aggregate."""
    from deepkg_ray.sources.readers import json_roundtrip_counts
    return json_roundtrip_counts(sf_dir)


def _q_timed_conversions(sf_dir: str):
    """Per-user purchases with a view in the strictly-preceding hour
    (timed funnel step, vectorized searchsorted containment)."""
    from deepkg_ray.sources.readers import read_events
    from deepkg_ray.stages.windows import timed_conversions
    return timed_conversions(read_events(sf_dir, ["user_id", "ts",
                                                  "event_type"]))



def _q_events_mad_outliers(sf_dir: str):
    """Hampel-filter robust outliers: rows beyond 3 MADs from their
    group median (division-cleared doubled-space integer test)."""
    from deepkg_ray.sources.readers import read_events
    from deepkg_ray.stages.quantiles import grouped_mad_outliers
    return grouped_mad_outliers(
        read_events(sf_dir, ["event_id", "event_type", "value"]))


def _q_part_size_histogram(sf_dir: str):
    """Equal-width histogram of p_size (bincount combiner + tree merge)."""
    from deepkg_ray.pipelines.relational import part_size_histogram
    return part_size_histogram(sf_dir)



def _q_rfm_scores(sf_dir: str):
    """RFM customer segmentation: NTILE(5) over recency/frequency/
    monetary via three exact two-phase distributed global ranks."""
    from deepkg_ray.pipelines.relational import rfm_scores
    return rfm_scores(sf_dir)



def _q_kwic_search(sf_dir: str):
    """Keyword-in-context concordance view (first hit + context
    windows), shuffle-free scan."""
    from deepkg_ray.sources.readers import read_documents
    from deepkg_ray.stages.textstats import kwic_search
    return kwic_search(read_documents(sf_dir, ["doc_id", "text"]))


def _q_conjunctive_search(sf_dir: str):
    """AND keyword search over documents (scan tier: broadcast query
    tokens, vectorized per-batch hit masks)."""
    from deepkg_ray.sources.readers import read_documents
    from deepkg_ray.stages.textstats import conjunctive_search
    return conjunctive_search(read_documents(sf_dir, ["doc_id", "text"]))


def _q_source_length_gini(sf_dir: str):
    """Per-source Gini coefficient of doc token counts (sorted-form
    integer numerator)."""
    from deepkg_ray.sources.readers import read_documents
    from deepkg_ray.stages.textstats import source_length_gini
    return source_length_gini(read_documents(sf_dir, ["source", "text"]))



def _q_forecast_revenue(sf_dir: str):
    """TPC-H Q6-shaped predicate-pushdown aggregate (micros-exact
    discount band)."""
    from deepkg_ray.pipelines.relational import forecast_revenue
    return forecast_revenue(sf_dir)


def _q_nation_market_share(sf_dir: str):
    """TPC-H Q8-shaped market share per order year (conditional micros
    aggregation through two hash joins + broadcast dims)."""
    from deepkg_ray.pipelines.relational import nation_market_share
    return nation_market_share(sf_dir)


def _q_heavy_part_suppliers(sf_dir: str):
    """TPC-H Q20-shaped nested semi-join supplier screen."""
    from deepkg_ray.pipelines.relational import heavy_part_suppliers
    return heavy_part_suppliers(sf_dir)



def _q_order_type_diversity(sf_dir: str):
    """Basket diversity histogram: distinct part types per order."""
    from deepkg_ray.pipelines.relational import order_type_diversity
    return order_type_diversity(sf_dir)


def _q_brand_hhi(sf_dir: str):
    """Brand revenue concentration (Herfindahl index) per product type."""
    from deepkg_ray.pipelines.relational import brand_hhi
    return brand_hhi(sf_dir)


def _q_order_line_histogram(sf_dir: str):
    """Order-size count-of-counts over lineitem (join-planning shape)."""
    from deepkg_ray.pipelines.relational import order_line_histogram
    return order_line_histogram(sf_dir)


def _q_revenue_concentration(sf_dir: str):
    """Revenue-concentration audit: Gini + top-10%/1% customer shares
    over per-customer lifetime revenue (value-count histogram plan)."""
    from deepkg_ray.pipelines.relational import revenue_concentration
    return revenue_concentration(sf_dir)


def _q_latest_order_per_customer(sf_dir: str):
    """Keep-latest-row-per-key compaction (SCD-1): per customer the most
    recent order via an associative row-wise argmax merge tree."""
    from deepkg_ray.pipelines.relational import latest_order_per_customer
    return latest_order_per_customer(sf_dir)



def _q_cheapest_supplier(sf_dir: str):
    """TPC-H Q2-shaped correlated-min join: per eligible part, every
    region supplier tying the minimum sale price, Q2-ordered top-k."""
    from deepkg_ray.pipelines.relational import cheapest_supplier_per_part
    return cheapest_supplier_per_part(sf_dir)


def _q_upsert_snapshot(sf_dir: str):
    """MERGE/upsert application: derived D/U/I change set applied to the
    orders base through a left_outer hash join, snapshot per status."""
    from deepkg_ray.stages.diff import upsert_snapshot
    return upsert_snapshot(sf_dir)


def _q_embedding_isotropy(sf_dir: str):
    """Embedding-space isotropy (common-direction collapse diagnostic):
    ||mean vec||^2 over mean ||v||^2 from d-bounded moment folds."""
    from deepkg_ray.sources.readers import read_embeddings
    from deepkg_ray.stages.similarity import embedding_isotropy
    return embedding_isotropy(read_embeddings(sf_dir, ["embedding"]))


def _q_embedding_norms(sf_dir: str):
    """Per-label embedding squared-norm stats in exact integer micros^2
    (encoder-health check)."""
    from deepkg_ray.sources.readers import read_embeddings
    from deepkg_ray.stages.similarity import embedding_norms
    return embedding_norms(read_embeddings(sf_dir, ["label", "embedding"]))



def _q_type_cooccurrence(sf_dir: str):
    """Audience-overlap set op: per event-type pair the user-set
    intersection/union cardinalities and Jaccard via a bitmask
    histogram (users counted, never listed)."""
    from deepkg_ray.sources.readers import read_events
    from deepkg_ray.stages.events import type_cooccurrence_jaccard
    return type_cooccurrence_jaccard(
        read_events(sf_dir, ["user_id", "event_type"]))



def _q_events_winsorized(sf_dir: str):
    """Winsorized mean per event type (discrete-quantile clip bounds,
    exact integer clipped sums)."""
    from deepkg_ray.sources.readers import read_events
    from deepkg_ray.stages.quantiles import grouped_winsorized_mean
    return grouped_winsorized_mean(
        read_events(sf_dir, ["event_type", "value"]))



def _q_partitioned_prune(sf_dir: str):
    """Hive-partitioned parquet sink + partition-pruned read-back
    (only one partition directory leaves storage)."""
    from deepkg_ray.sources.readers import partitioned_prune_counts
    return partitioned_prune_counts(sf_dir)



def _q_embedding_dim_stats(sf_dir: str):
    """Per-dimension embedding moments (the (x-mu)/sigma standardization
    pre-pass), d-bounded merge tree, exact integer moments."""
    from deepkg_ray.sources.readers import read_embeddings
    from deepkg_ray.stages.similarity import embedding_dim_stats
    return embedding_dim_stats(read_embeddings(sf_dir, ["embedding"]))



def _q_dataset_split(sf_dir: str):
    """Deterministic md5 train/val/test split assignment with
    per-(split, lang) accounting."""
    from deepkg_ray.sources.readers import read_documents
    from deepkg_ray.stages.curation import dataset_split_assign
    return dataset_split_assign(read_documents(sf_dir, ["doc_id", "lang"]))



def _q_weighted_median_price(sf_dir: str):
    """Quantity-weighted price median (weighted quantile_disc over the
    price histogram)."""
    from deepkg_ray.stages.quantiles import weighted_median_price
    return weighted_median_price(sf_dir, qs=(0.25, 0.5, 0.75))


def _q_events_harmonic_mean(sf_dir: str):
    """Harmonic mean of positive values per event type (reciprocal-micros
    integer sums)."""
    from deepkg_ray.sources.readers import read_events
    from deepkg_ray.stages.quantiles import grouped_harmonic_mean
    return grouped_harmonic_mean(
        read_events(sf_dir, ["event_type", "value"]))



def _q_configured_mention_counts(sf_dir: str):
    """The declarative extension surface under the driver gate: the SAME
    mention-count result as kg_mention_counts, but assembled through the
    config.build_pipeline spec (normalize -> mentions from STAGE_REGISTRY,
    $-resolved context params) instead of direct calls — hash-equality
    against the kg_mention_counts oracle proves the registry path is
    semantics-preserving."""
    import pyarrow as pa

    from deepkg_ray import synth
    from deepkg_ray.config import build_pipeline
    from deepkg_ray.sources.readers import read_transcripts
    from deepkg_ray.stages.treeagg import merge_partials

    ds = read_transcripts(synth.transcripts_path(sf_dir),
                          columns=["conv_id", "turn_idx", "text"])
    mentions = build_pipeline(
        ds,
        [{"stage": "normalize"},
         {"stage": "mentions", "params": {"dictionary_path": "$dict"}}],
        context={"dict": synth.dictionary_path(sf_dir)})
    keys = ["conv_id", "turn_idx", "surface", "entity_id", "type"]

    def combine(b: pa.Table) -> pa.Table:
        g = b.select(keys).to_pandas().groupby(keys, as_index=False).size()
        return pa.Table.from_pandas(g.rename(columns={"size": "n_occ"}),
                                    preserve_index=False)

    partial = mentions.map_batches(combine, batch_format="pyarrow")
    return merge_partials(partial, keys, {"n_occ": "sum"})



def _q_salted_type_stats(sf_dir: str):
    """Hot-key-safe salted two-phase aggregation, hash-equal to the plain
    GROUP BY oracle (the skew mitigation itself is gate-checked)."""
    from deepkg_ray.sources.readers import read_events
    from deepkg_ray.stages.events import salted_type_stats
    return salted_type_stats(read_events(sf_dir, ["event_id",
                                                  "event_type", "value"]))



def _q_session_stats(sf_dir: str):
    """Session-grain histogram: per session-length bucket the session
    count, total duration and purchase-revenue attribution."""
    from deepkg_ray.sources.readers import read_events
    from deepkg_ray.stages.windows import session_stats
    return session_stats(read_events(sf_dir, ["user_id", "event_id", "ts",
                                              "event_type", "value"]))



def _q_revenue_cohorts(sf_dir: str):
    """Revenue cohort triangle: first-order month x months-since-first
    with exact micros revenue."""
    from deepkg_ray.pipelines.relational import revenue_cohorts
    return revenue_cohorts(sf_dir)



def _q_dedup_keep_longest(sf_dir: str):
    """Exact dedup with keep-longest survivorship (normalized content,
    associative argmax merge tree)."""
    from deepkg_ray.sources.readers import read_documents
    from deepkg_ray.stages.dedup import dedup_keep_longest
    return dedup_keep_longest(read_documents(sf_dir, ["doc_id", "text"]))



def _q_lang_top_tokens(sf_dir: str):
    """Per-language top-5 tokens (grouped heavy hitters, exact)."""
    from deepkg_ray.sources.readers import read_documents
    from deepkg_ray.stages.textstats import lang_top_tokens
    return lang_top_tokens(read_documents(sf_dir, ["lang", "text"]))


def _q_events_value_histogram(sf_dir: str):
    """Equal-width value histogram per event type (2-key bincount
    combiner, fixed micros edges)."""
    from deepkg_ray.sources.readers import read_events
    from deepkg_ray.stages.windows import value_histogram_by_type
    return value_histogram_by_type(
        read_events(sf_dir, ["event_type", "value"]))



def _q_events_heatmap(sf_dir: str):
    """Usage heatmap: event counts per (day-of-week, hour) 7x24 grid."""
    from deepkg_ray.sources.readers import read_events
    from deepkg_ray.stages.windows import dow_hour_heatmap
    return dow_hour_heatmap(read_events(sf_dir, ["ts"]))



def _q_training_manifest(sf_dir: str):
    """End-to-end training-set manifest: curate -> exact-dedup survivors
    -> md5 split -> per-split doc/token accounting, one composed check."""
    from deepkg_ray.sources.readers import read_documents
    from deepkg_ray.stages.curation import training_manifest
    return training_manifest(read_documents(sf_dir, ["doc_id", "text"]))



def _q_source_dup_rates(sf_dir: str):
    """Per-source exact-duplication breakdown (docs, distinct contents,
    dup fraction)."""
    from deepkg_ray.sources.readers import read_documents
    from deepkg_ray.stages.dedup import source_dup_rates
    return source_dup_rates(
        read_documents(sf_dir, ["doc_id", "text", "source"]))



def _q_brand_price_summary(sf_dir: str):
    """Per-brand five-number price summary (interpolated grouped
    quantiles incl. exact min/max at q=0/1)."""
    import ray.data as _rd
    from deepkg_ray.stages.quantiles import grouped_quantiles_cont
    ds = _rd.read_parquet(f"{sf_dir}/part.parquet",
                          columns=["p_brand", "p_retailprice"])
    out = grouped_quantiles_cont(ds, "p_brand", "p_retailprice",
                                 [0.0, 0.25, 0.5, 0.75, 1.0])
    import pyarrow as _pa
    return out.map_batches(
        lambda b: _pa.table({"p_brand": b["p_brand"], "q": b["q"],
                             "value": b["value"]}),
        batch_format="pyarrow")


def _q_daily_type_mix(sf_dir: str):
    """Per-day event-type counts and within-day shares (category drift
    monitor)."""
    from deepkg_ray.sources.readers import read_events
    from deepkg_ray.stages.windows import daily_type_mix
    return daily_type_mix(read_events(sf_dir, ["ts", "event_type"]))



def _q_rollup_segment_priority(sf_dir: str):
    """ROLLUP subtotals derived once from the merged leaf grid — the
    fact table is scanned exactly once for all three grouping levels."""
    from deepkg_ray.pipelines.relational import rollup_segment_priority
    return rollup_segment_priority(sf_dir)


def _q_segment_priority_counts(sf_dir: str):
    """Cross-table crosstab: orders per (market segment, priority) via a
    broadcast customer dimension (join fallback above 2M)."""
    from deepkg_ray.pipelines.relational import segment_priority_counts
    return segment_priority_counts(sf_dir)



def _q_event_context_pairs(sf_dir: str):
    """Behavioral skip-grams: (type_a -> type_b) counts within the next
    3 events per user (vectorized shifted-mask pass)."""
    from deepkg_ray.sources.readers import read_events
    from deepkg_ray.stages.windows import event_context_pairs
    return event_context_pairs(
        read_events(sf_dir, ["user_id", "ts", "event_id", "event_type"]))



def _q_weekly_active_users(sf_dir: str):
    """DAU/WAU/stickiness per day with the rolling distinct computed
    exactly via window-day explosion (no sketch, no driver user lists)."""
    from deepkg_ray.sources.readers import read_events
    from deepkg_ray.stages.windows import weekly_active_users
    return weekly_active_users(read_events(sf_dir, ["ts", "user_id"]))



def _q_value_autocorr(sf_dir: str):
    """Pooled lag-1 autocorrelation of values over same-user consecutive
    pairs (persistence diagnostic)."""
    from deepkg_ray.sources.readers import read_events
    from deepkg_ray.stages.windows import value_autocorr
    return value_autocorr(
        read_events(sf_dir, ["user_id", "ts", "event_id", "value"]))



def _q_pair_lift(sf_dir: str):
    """Association-rule lift for the top-50 co-occurring part pairs in
    order baskets (exact big-int numerator, one round6 division)."""
    from deepkg_ray.sources.readers import read_table
    from deepkg_ray.stages.basket import pair_lift
    return pair_lift(read_table(sf_dir, "lineitem",
                                ["l_orderkey", "l_partkey"]),
                     basket_col="l_orderkey", item_col="l_partkey")



def _q_shipping_delay_quantiles(sf_dir: str):
    """Order-to-ship latency quantiles per priority (whole-day delays,
    interpolated type-7)."""
    from deepkg_ray.pipelines.relational import shipping_delay_quantiles
    return shipping_delay_quantiles(sf_dir)



def _q_distinct_ngram_diversity(sf_dir: str):
    """Distinct-1/distinct-2 diversity per source (Li et al. 2016) —
    the templatedness diagnostic; open-vocab gram distinct groupby with
    combiner-folded counts."""
    from deepkg_ray.sources.readers import read_documents
    from deepkg_ray.stages.textstats import distinct_ngram_diversity
    return distinct_ngram_diversity(
        read_documents(sf_dir, ["source", "text"]))


def _q_neyman_allocation(sf_dir: str):
    """Neyman-optimal stratified sample allocation (n_h proportional to
    N_h*S_h over doc length) with largest-remainder integer seats."""
    from deepkg_ray.sources.readers import read_documents
    from deepkg_ray.stages.curation import neyman_allocation
    return neyman_allocation(read_documents(sf_dir, ["source", "text"]),
                             k=1000)


def _q_neyman_sample(sf_dir: str):
    """Plan-driven stratified sample: exactly the Neyman seats per
    source, deterministic md5-rank order."""
    from deepkg_ray.sources.readers import read_documents
    from deepkg_ray.stages.curation import neyman_sample
    return neyman_sample(read_documents(sf_dir,
                                        ["source", "doc_id", "text"]),
                         k=200)


def _q_compression_ratio(sf_dir: str):
    """Per-doc zlib compression ratio (the repetition filter); checked
    against a sequential driver-side gold pass (plumbing-gold)."""
    from deepkg_ray.sources.readers import read_documents
    from deepkg_ray.stages.textstats import compression_ratio
    return compression_ratio(read_documents(sf_dir, ["doc_id", "text"]))


def _q_split_leakage(sf_dir: str):
    """Cross-split exact-dup contamination audit: duplicate texts that
    straddle the train/val/test md5 split — the eval-integrity gate."""
    from deepkg_ray.sources.readers import read_documents
    from deepkg_ray.stages.curation import split_leakage_audit
    return split_leakage_audit(read_documents(sf_dir,
                                              ["doc_id", "text"]))


def _q_near_dup_leakage(sf_dir: str):
    """Near-duplicate cross-split contamination: MinHash-verified pairs
    (Jaccard >= 0.8) rolled up by endpoint split pair."""
    from deepkg_ray.stages.curation import near_dup_leakage_audit
    return near_dup_leakage_audit(_docs(sf_dir, ["doc_id", "text"]),
                                  f"{sf_dir}/documents.parquet")


def _q_quarantine_leaked(sf_dir: str):
    """Remediation list: val/test docs near-duplicating any train doc
    (the quarantine subtraction before an eval export ships)."""
    from deepkg_ray.stages.curation import quarantine_leaked_docs
    return quarantine_leaked_docs(_docs(sf_dir, ["doc_id", "text"]),
                                  f"{sf_dir}/documents.parquet")


def _q_pack_conversations(sf_dir: str):
    """Conversation-boundary-respecting context packing: whole-conv
    assignment by exclusive token prefix // window (distributed via
    lexicographic prefix buckets of conv_id)."""
    import ray.data as rd
    from deepkg_ray import synth
    from deepkg_ray.stages.packing import pack_conversations
    ds = rd.read_parquet(synth.transcripts_path(sf_dir),
                         columns=["conv_id", "text"])
    return pack_conversations(ds, window=2048)


def _q_conv_packing_stats(sf_dir: str):
    """Conversation-packing utilization: pack count, oversized convs,
    mean fill — the padding-waste budget for dialogue training."""
    import ray.data as rd
    from deepkg_ray import synth
    from deepkg_ray.stages.packing import conv_packing_stats
    ds = rd.read_parquet(synth.transcripts_path(sf_dir),
                         columns=["conv_id", "text"])
    return conv_packing_stats(ds, window=2048)


def _q_mann_whitney(sf_dir: str):
    """Mann-Whitney U rank-sum test of weekend vs weekday values — the
    nonparametric twin of weekend_effect, assembled without a global sort
    via ordered value-range buckets (stages/windows.py)."""
    from deepkg_ray.sources.readers import read_events
    from deepkg_ray.stages.windows import mann_whitney_weekend
    return mann_whitney_weekend(read_events(sf_dir, ["ts", "value"]))


def _q_weekend_effect(sf_dir: str):
    """Welch t statistic for weekend-vs-weekday value shift (mirrored
    DOUBLE chain over exact millis moments)."""
    from deepkg_ray.sources.readers import read_events
    from deepkg_ray.stages.windows import weekend_effect
    return weekend_effect(read_events(sf_dir, ["ts", "value"]))



def _q_user_value_bands(sf_dir: str):
    """Per-user p10/p90 value bands (grouped interpolated quantiles keyed
    by user — the per-entity personalization cut)."""
    from deepkg_ray.sources.readers import read_events
    from deepkg_ray.stages.quantiles import grouped_quantiles_cont
    return grouped_quantiles_cont(
        read_events(sf_dir, ["user_id", "value"]), "user_id", "value",
        [0.1, 0.9])



def _q_pricing_charge(sf_dir: str):
    """TPC-H Q1's full measure set: charge aggregate + micros-exact
    averages per (returnflag, linestatus)."""
    from deepkg_ray.pipelines.relational import pricing_charge_summary
    return pricing_charge_summary(sf_dir)


def _q_order_priority_counts(sf_dir: str):
    """TPC-H Q4-shaped EXISTS semi-join: late-shipped order counts per
    priority (lineitem collapsed to max-shipdate per order before the join)."""
    from deepkg_ray.pipelines.relational import order_priority_counts
    return order_priority_counts(sf_dir)


def _q_join_size_audit(sf_dir: str):
    """Exact join-size audit (orders x lineitem on orderkey): per-side
    row/key counts + sum-of-products output cardinality, computed from
    the per-key count tables without materializing the join."""
    from deepkg_ray.pipelines.relational import join_size_audit
    return join_size_audit(sf_dir)


def _q_promo_revenue(sf_dir: str):
    """TPC-H Q14-shaped conditional-aggregation join: PROMO-part revenue
    share for one shipdate month, exact micros sums, one final division."""
    from deepkg_ray.pipelines.relational import promo_revenue
    return promo_revenue(sf_dir)


def _q_large_volume_customers(sf_dir: str):
    """TPC-H Q18-shaped HAVING semi-join: heavy-quantity orders joined back
    to orders+customer, deterministic top-100 by totalprice."""
    from deepkg_ray.pipelines.relational import large_volume_customers
    return large_volume_customers(sf_dir)


def _q_events_regression(sf_dir: str):
    """Per-type OLS fit value ~ hour-of-day (mergeable integer moments,
    fixed-op-chain DOUBLE finish)."""
    from deepkg_ray.sources.readers import read_events
    from deepkg_ray.stages.windows import regression_events
    return regression_events(read_events(
        sf_dir, ["event_type", "ts", "value"]))


def _q_top_with_ties(sf_dir: str):
    """Per-type top-2 DISTINCT values WITH TIES (dense_rank ≤ 2)."""
    from deepkg_ray.sources.readers import read_events
    from deepkg_ray.stages.windows import top_events_with_ties
    return top_events_with_ties(read_events(
        sf_dir, ["event_type", "event_id", "value"]))


def _q_events_retention(sf_dir: str):
    """Daily cohort retention matrix (user-complete coarse partitions →
    per-cell partial counts → calendar-bounded merge)."""
    from deepkg_ray.sources.readers import read_events
    from deepkg_ray.stages.windows import cohort_retention
    return cohort_retention(read_events(sf_dir, ["user_id", "ts"]))


def _q_events_rank(sf_dir: str):
    """Per-type percent_rank + ntile(4) ranking window functions
    (deterministic (value, id) composite order)."""
    from deepkg_ray.sources.readers import read_events
    from deepkg_ray.stages.windows import rank_events
    return rank_events(read_events(
        sf_dir, ["event_id", "event_type", "value"]))


def _q_dsir_sample(sf_dir: str):
    """Execute the DSIR importance-resampling plan: deterministic
    Gumbel-top-k over dsir scores (inclusion probability ∝ exp(score),
    stages/curation.dsir_sample)."""
    from deepkg_ray.sources.readers import read_documents
    from deepkg_ray.stages.curation import dsir_sample
    return dsir_sample(read_documents(sf_dir, ["doc_id", "text", "lang"]))


def _q_weighted_sample(sf_dir: str):
    """Deterministic ppswor sample (Efraimidis-Spirakis) of 100 docs
    weighted by n_chars."""
    from deepkg_ray.sources.readers import read_documents
    from deepkg_ray.stages.textstats import weighted_sample_k
    return weighted_sample_k(read_documents(sf_dir, ["doc_id", "n_chars"]))


def _q_grid_quantiles(sf_dir: str):
    """Fixed-grid histogram approximate quantiles over the continuous
    events.value column (deterministic, n_bins-bounded shuffle)."""
    from deepkg_ray.sources.readers import read_events
    from deepkg_ray.stages.quantiles import grid_quantiles
    return grid_quantiles(read_events(sf_dir, ["value"]), "value",
                          [0.05, 0.25, 0.5, 0.75, 0.95, 0.99])


def _q_events_moving_avg(sf_dir: str):
    """Trailing 3-row per-user moving average (windowed aggregate over
    user-complete hash partitions)."""
    from deepkg_ray.sources.readers import read_events
    from deepkg_ray.stages.windows import moving_average
    return moving_average(read_events(
        sf_dir, ["user_id", "event_id", "ts", "value"]), k=3)


def _q_pricing_cube(sf_dir: str):
    """CUBE(l_returnflag, l_linestatus): all grouping sets folded from the
    one-scan finest-level aggregate."""
    from deepkg_ray.pipelines.relational import pricing_cube
    return pricing_cube(sf_dir)


def _q_column_profile(sf_dir: str):
    """Single-pass per-column profiling (count/nulls/min/max/micros mean)
    of the lineitem numeric columns."""
    from deepkg_ray.pipelines.relational import column_profile
    return column_profile(sf_dir)


def _q_pricing_rollup(sf_dir: str):
    """ROLLUP(l_returnflag, l_linestatus) derived from one finest-level
    distributed aggregate (micros-exact at every level)."""
    from deepkg_ray.pipelines.relational import pricing_rollup
    return pricing_rollup(sf_dir)


def _q_kg_cooccurrence(sf_dir: str):
    """Same-turn entity co-occurrence edges over the mention stream
    (batch-local pair explosion, dictionary-bounded count merge)."""
    from deepkg_ray.pipelines import kg
    from deepkg_ray.stages.mention import cooccurrence_counts
    return cooccurrence_counts(kg.mentions_dataset(sf_dir))


def _q_kg_linkpred(sf_dir: str):
    """Common-neighbor + resource-allocation link prediction over the KG
    (wedge pairs per center vertex, left_anti join removes existing
    edges)."""
    from deepkg_ray.pipelines import kg
    from deepkg_ray.stages.graph import link_prediction
    return link_prediction(kg.adjacency_dataset(sf_dir), min_cn=2)



def _q_kg_linkpred_scores(sf_dir: str):
    """Full structural link-prediction score family over the KG: common
    neighbors, resource allocation, Adamic-Adar, endpoint-degree Jaccard —
    degree table joined distributed, no driver state."""
    from deepkg_ray.pipelines import kg
    from deepkg_ray.stages.graph import link_prediction_scores
    return link_prediction_scores(kg.adjacency_dataset(sf_dir), min_cn=2)



def _q_kg_temporal_linkpred(sf_dir: str):
    """Temporal KG link-prediction eval: split canonical pairs at the
    midpoint of first-observation time, score train-graph non-edges with
    common neighbors, exact doubled-rank AUC against appeared-after
    labels."""
    from deepkg_ray import synth
    from deepkg_ray.pipelines import kg
    from deepkg_ray.sources.readers import read_transcripts
    from deepkg_ray.stages.canonical import edge_spans
    from deepkg_ray.stages.graph import temporal_linkpred_eval
    turns = read_transcripts(synth.transcripts_path(sf_dir),
                             columns=["conv_id", "turn_idx", "ts"])
    spans = edge_spans(kg.linked_triples_dataset(sf_dir), turns)
    return temporal_linkpred_eval(spans, min_cn=2)


def _q_kg_temporal_ranking(sf_dir: str):
    """KG-completion ranking eval over the temporal split: MRR and
    Hits@1/5/10 of the common-neighbor scorer against appeared-after
    pairs (Bordes et al. ranking protocol)."""
    from deepkg_ray import synth
    from deepkg_ray.pipelines import kg
    from deepkg_ray.sources.readers import read_transcripts
    from deepkg_ray.stages.canonical import edge_spans
    from deepkg_ray.stages.graph import temporal_linkpred_ranking
    turns = read_transcripts(synth.transcripts_path(sf_dir),
                             columns=["conv_id", "turn_idx", "ts"])
    spans = edge_spans(kg.linked_triples_dataset(sf_dir), turns)
    return temporal_linkpred_ranking(spans, min_cn=1)


def _q_kg_temporal_calibration(sf_dir: str):
    """Reliability curve of the common-neighbor scorer: per cn value,
    candidate count and appeared-after rate over the temporal split."""
    from deepkg_ray import synth
    from deepkg_ray.pipelines import kg
    from deepkg_ray.sources.readers import read_transcripts
    from deepkg_ray.stages.canonical import edge_spans
    from deepkg_ray.stages.graph import temporal_linkpred_calibration
    turns = read_transcripts(synth.transcripts_path(sf_dir),
                             columns=["conv_id", "turn_idx", "ts"])
    spans = edge_spans(kg.linked_triples_dataset(sf_dir), turns)
    return temporal_linkpred_calibration(spans, min_cn=2)


def _q_kg_edge_proposals(sf_dir: str):
    """Calibrated KG-completion proposals: train-graph non-edges whose
    common-neighbor count carries an appeared-after rate >= 25%,
    annotated with the rate and confirmation flag (threshold 0.8% —
    the synth KG's appeared-rates top out near 1.2%; production graphs
    pass a higher bar)."""
    from deepkg_ray import synth
    from deepkg_ray.pipelines import kg
    from deepkg_ray.sources.readers import read_transcripts
    from deepkg_ray.stages.canonical import edge_spans
    from deepkg_ray.stages.graph import kg_edge_proposals
    turns = read_transcripts(synth.transcripts_path(sf_dir),
                             columns=["conv_id", "turn_idx", "ts"])
    spans = edge_spans(kg.linked_triples_dataset(sf_dir), turns)
    return kg_edge_proposals(spans, min_cn=2, min_rate_micros=8000)


def _q_kg_two_hop(sf_dir: str):
    """Ego-net reach per KG node: degree and distinct <=2-hop neighbor
    count (2-path self-join + dedup)."""
    from deepkg_ray.pipelines import kg
    from deepkg_ray.stages.graph import two_hop_sizes
    return two_hop_sizes(kg.adjacency_dataset(sf_dir))



def _q_kg_degree_distribution(sf_dir: str):
    """Degree distribution of the KG (power-law / hub diagnostic)."""
    from deepkg_ray.pipelines import kg
    from deepkg_ray.stages.graph import degree_distribution
    return degree_distribution(kg.adjacency_dataset(sf_dir))



def _q_kg_assortativity(sf_dir: str):
    """Degree assortativity of the KG (Newman r over bidirected edges,
    big-int exact moments)."""
    from deepkg_ray.pipelines import kg
    from deepkg_ray.stages.graph import degree_assortativity
    return degree_assortativity(kg.adjacency_dataset(sf_dir))



def _q_kg_clustering(sf_dir: str):
    """Local clustering coefficient per KG node (closed-wedge membership
    probes against the broadcast packed edge set)."""
    from deepkg_ray.pipelines import kg
    from deepkg_ray.stages.graph import clustering_coefficients
    return clustering_coefficients(kg.adjacency_dataset(sf_dir))



def _q_kg_metapaths(sf_dir: str):
    """Typed meta-path profile: directed 2-path counts per (subj_type,
    mid_type, obj_type) over the canonical adjacency."""
    from deepkg_ray.pipelines import kg
    from deepkg_ray.stages.graph import metapath_counts
    return metapath_counts(kg.adjacency_dataset(sf_dir))


def _q_kg_linkpred_truncated(sf_dir: str):
    """The 100-TB posture of link prediction: hub centers above
    max_degree emit no wedge pairs (the standard LP truncation — caps the
    deg²/2 wedge fan-out of super-hubs).  The oracle applies the SAME
    degree cap, so the truncation semantics are themselves
    oracle-checked, not just documented."""
    from deepkg_ray.pipelines import kg
    from deepkg_ray.stages.graph import link_prediction
    return link_prediction(kg.adjacency_dataset(sf_dir), min_cn=2,
                           max_degree=60)


def _q_kg_edge_spans(sf_dir: str):
    """Temporal KG edges: first/last observation timestamp per canonical
    edge via one distributed hash join (triples x turn timestamps)."""
    from deepkg_ray import synth
    from deepkg_ray.pipelines import kg
    from deepkg_ray.sources.readers import read_transcripts
    from deepkg_ray.stages.canonical import edge_spans
    turns = read_transcripts(synth.transcripts_path(sf_dir),
                             columns=["conv_id", "turn_idx", "ts"])
    return edge_spans(kg.linked_triples_dataset(sf_dir), turns)


def _q_kg_growth(sf_dir: str):
    """KG growth curve: new canonical edges per day + running total
    (construction saturation monitor)."""
    from deepkg_ray import synth
    from deepkg_ray.pipelines import kg
    from deepkg_ray.sources.readers import read_transcripts
    from deepkg_ray.stages.canonical import kg_growth_curve
    turns = read_transcripts(synth.transcripts_path(sf_dir),
                             columns=["conv_id", "turn_idx", "ts"])
    return kg_growth_curve(kg.linked_triples_dataset(sf_dir), turns)


def _q_dsir_scores(sf_dir: str):
    """DSIR hashed-ngram importance scores toward the English subset
    (bucket-count reduction + broadcast log-ratio scoring map)."""
    from deepkg_ray.sources.readers import read_documents
    from deepkg_ray.stages.curation import dsir_scores
    return dsir_scores(read_documents(
        sf_dir, ["doc_id", "text", "lang"]))


def _q_embedding_centroids(sf_dir: str):
    """Per-label mean embedding (class prototypes) — label-bounded
    (labels x d) partial-sum reduction, micros-exact."""
    from deepkg_ray.sources.readers import read_embeddings
    from deepkg_ray.stages.similarity import embedding_centroids
    return embedding_centroids(read_embeddings(sf_dir,
                                               ["label", "embedding"]))


def _q_knn_accuracy(sf_dir: str):
    """Leave-one-out 1-NN accuracy per label (embedding-space quality
    probe; broadcast reference, one matmul per batch)."""
    from deepkg_ray.sources.readers import read_embeddings
    from deepkg_ray.stages.similarity import knn_accuracy
    return knn_accuracy(read_embeddings(sf_dir,
                                        ["vec_id", "embedding", "label"]))


def _q_centroid_similarity(sf_dir: str):
    """Pairwise cosine between class-prototype centroids (exact integer
    dots over micros centroids, one round6 double per pair)."""
    from deepkg_ray.sources.readers import read_embeddings
    from deepkg_ray.stages.similarity import centroid_similarity
    return centroid_similarity(read_embeddings(sf_dir,
                                               ["label", "embedding"]))


def _q_embedding_gram(sf_dir: str):
    """One-pass Gram-matrix reduction over the embedding column (the
    covariance/PCA building block), micros-exact."""
    from deepkg_ray.sources.readers import read_embeddings
    from deepkg_ray.stages.similarity import embedding_gram
    return embedding_gram(read_embeddings(sf_dir, ["embedding"]))


def _q_doc_len_quantiles(sf_dir: str):
    """Per-language document-length quantiles — fully distributed grouped
    histogram + per-group pick (nothing driver-side)."""
    from deepkg_ray.sources.readers import read_documents
    from deepkg_ray.stages.quantiles import grouped_quantiles_disc
    return grouped_quantiles_disc(
        read_documents(sf_dir, ["lang", "n_chars"]), "lang", "n_chars",
        [0.25, 0.5, 0.75, 0.9])


def _q_stratified_sample(sf_dir: str):
    """Per-source deterministic sampling counts (corpus-mixing primitive)."""
    from deepkg_ray.sources.readers import read_documents
    from deepkg_ray.stages.textstats import stratified_sample_counts
    return stratified_sample_counts(read_documents(sf_dir, ["doc_id", "source"]))


def _q_conv_weighted_sample(sf_dir: str):
    """Whole-conversation A-ES weighted sample (inclusion probability
    rises with conversation token count) — intact-dialogue eval-set
    construction (stages/packing.conv_weighted_sample)."""
    import ray.data as rd
    from deepkg_ray import synth
    from deepkg_ray.stages.packing import conv_weighted_sample
    return conv_weighted_sample(rd.read_parquet(
        synth.transcripts_path(sf_dir), columns=["conv_id", "text"]))


def _q_conv_sentences(sf_dir: str):
    """Sentence explode over transcripts (1-based sent_idx, '.'-stripped)."""
    import ray.data as rd
    from deepkg_ray import synth
    from deepkg_ray.stages.textstats import explode_sentences
    ds = rd.read_parquet(synth.transcripts_path(sf_dir),
                         columns=["conv_id", "turn_idx", "text"])
    return explode_sentences(ds)


def _q_snli_triplets(sf_dir: str):
    """SNLI premise → (entailment, contradiction) triplet build (reference
    SimCSE data_process.py:24-53 last-wins dict semantics)."""
    import ray.data as rd
    from deepkg_ray import synth
    from deepkg_ray.stages.snli import snli_triplets
    return snli_triplets(rd.read_parquet(synth.snli_path(sf_dir)))


def _q_ck_tokens(sf_dir: str):
    """.ck noisy-corpus reader parity: parse the synthesized AutoNER-format
    corpus back into token rows (oracle = the generation-time gold parquet)."""
    from deepkg_ray import synth
    from deepkg_ray.sources.readers import read_ck_corpus
    ck, _ = synth.ck_paths(sf_dir)
    return read_ck_corpus(ck)


def queries() -> dict[str, Callable[[str], Any]]:
    return {
        # KG pipeline family (synthesized transcripts)
        "kg_mention_counts": _q_kg_mention_counts,
        "kg_mention_counts_sharded": _q_kg_mention_counts_sharded,
        "kg_mention_counts_delta": _q_kg_mention_counts_delta,
        "kg_triples": _q_kg_triples,
        "kg_adjacency": _q_kg_adjacency,
        "kg_incremental": _q_kg_incremental,
        "kg_entities": _q_kg_entities,
        "kg_predicates": _q_kg_predicates,
        "kg_schema": _q_kg_schema,
        "kg_pred_cardinality": _q_kg_pred_cardinality,
        "transcript_stats": _q_transcript_stats,
        "key_skew_stats": _q_key_skew,
        "turn_latency": _q_turn_latency,
        "conv_turn_taking": _q_conv_turn_taking,
        "context_budget": _q_context_budget,
        "conv_sessions": _q_conv_sessions,
        "tool_usage": _q_tool_usage,
        "conv_cumulative_triples": _q_conv_cumulative_triples,
        "conv_context": _q_conv_context,
        "conv_transcripts": _q_conv_transcripts,
        # text analysis / dedup over documents
        "doc_stats": _q_doc_stats,
        "lang_id": _q_lang_id,
        "bpe_token_counts": _q_bpe_token_counts,
        "source_fertility": _q_source_fertility,
        "bpe_merge_token_counts": _q_bpe_merge_token_counts,
        "sequence_packing": _q_sequence_packing,
        "pack_conversations": _q_pack_conversations,
        "conv_packing_stats": _q_conv_packing_stats,
        "substring_dup_spans": _q_substring_dup_spans,
        "doc_dup_fraction": _q_doc_dup_fraction,
        "cdc_chunk_stats": _q_cdc_chunk_stats,
        "chunk_documents": _q_chunk_documents,
        "gopher_repetition": _q_gopher_repetition,
        "sample_exact_k": _q_sample_exact_k,
        "weighted_sample": _q_weighted_sample,
        "dsir_sample": _q_dsir_sample,
        "global_shuffle_positions": _q_global_shuffle,
        "stratified_exact_k": _q_stratified_exact_k,
        "containment_pairs": _q_containment_pairs,
        "packing_stats": _q_packing_stats,
        "doc_fingerprints": _q_doc_fingerprints,
        "dedup_exact": _q_dedup_exact,
        "dedup_stats": _q_dedup_stats,
        "dedup_minhash": _q_dedup_minhash,
        "dedup_simhash": _q_dedup_simhash,
        "ngram_jaccard": _q_ngram_jaccard,
        "token_quantiles": _q_token_quantiles,
        "token_quantiles_cont": _q_token_quantiles_cont,
        "flag_quantiles_cont": _q_flag_quantiles_cont,
        "doc_len_quantiles": _q_doc_len_quantiles,
        "heavy_hitter_tokens": _q_heavy_hitters,
        "cms_state": _q_cms_state,
        "cms_estimates": _q_cms_estimates,
        "bootstrap_means": _q_bootstrap_means,
        "bootstrap_ci": _q_bootstrap_ci,
        "bootstrap_diff_ci": _q_bootstrap_diff_ci,
        "vocab_coverage": _q_vocab_coverage,
        "length_bucketing": _q_length_bucketing,
        "cuped": _q_cuped,
        "diff_in_diff": _q_diff_in_diff,
        "srm_check": _q_srm_check,
        "events_perm_test": _q_events_perm_test,
        "markov_entropy_rate": _q_markov_entropy_rate,
        "psi_drift": _q_psi_drift,
        "shard_plan": _q_shard_plan,
        "domain_stats": _q_domain_stats,
        "rake_keywords": _q_rake_keywords,
        "dedup_clusters": _q_dedup_clusters,
        "dedup_cluster_sizes": _q_dedup_cluster_sizes,
        "editdist_pairs": _q_editdist_pairs,
        "fs_weights": _q_fs_weights,
        "fs_scores": _q_fs_scores,
        "er_canonical": _q_er_canonical,
        "editdist_clusters": _q_editdist_clusters,
        # graph analytics over the built KG
        "kg_degrees": _q_kg_degrees,
        "kg_kcore": _q_kg_kcore,
        "kg_bfs": _q_kg_bfs,
        "kg_labelprop": _q_kg_labelprop,
        "kg_modularity": _q_kg_modularity,
        "kg_components": _q_kg_components,
        "kg_mis": _q_kg_mis,
        "kg_negatives": _q_kg_negatives,
        "kg_walks": _q_kg_walks,
        "kg_triangles": _q_kg_triangles,
        "kg_pagerank": _q_kg_pagerank,
        "kg_ppr": _q_kg_ppr,
        "kg_truss": _q_kg_truss,
        "kg_sssp": _q_kg_sssp,
        "kg_scc": _q_kg_scc,
        "kg_hits": _q_kg_hits,
        "kg_eigenvector": _q_kg_eigenvector,
        "kg_katz": _q_kg_katz,
        "kg_embeddedness": _q_kg_embeddedness,
        "kg_avg_nbr_degree": _q_kg_avg_nbr_degree,
        "kg_robustness": _q_kg_robustness,
        # phrase-mining stats
        "bigram_counts": _q_bigram_counts,
        "word_idf": _q_word_idf,
        "inverted_index": _q_inverted_index,
        "tfidf_top_terms": _q_tfidf_top_terms,
        "pmi_bigrams": _q_pmi_bigrams,
        "llr_collocations": _q_llr_collocations,
        "textrank_words": _q_textrank_words,
        "neighbor_entropy": _q_neighbor_entropy,
        # similarity search
        "ann_topk": _q_ann_topk,
        "mmr_select": _q_mmr_select,
        "knn_graph": _q_knn_graph,
        "knn_mutuality": _q_knn_mutuality,
        "hard_negatives": _q_hard_negatives,
        "pq_codes": _q_pq_codes,
        "pq_distortion": _q_pq_distortion,
        "sq8_audit": _q_sq8_audit,
        "truncation_recall": _q_truncation_recall,
        "pq_adc_topk": _q_pq_adc_topk,
        "embedding_kmeans": _q_embedding_kmeans,
        "kmeans_silhouette": _q_silhouette,
        "cluster_purity": _q_cluster_purity,
        "cluster_nmi": _q_cluster_nmi,
        "cluster_ari": _q_cluster_ari,
        "semantic_dedup": _q_semantic_dedup,
        "ann_ivf": _q_ann_ivf,
        "ann_recall": _q_ann_recall,
        "embedding_near_dup": _q_embedding_near_dup,
        "embedding_near_dup_lsh": _q_embedding_near_dup_lsh,
        # events / windows
        "events_window": _q_events_window,
        "events_hopping": _q_events_hopping,
        "events_sessionize": _q_events_sessionize,
        "events_watermark": _q_events_watermark,
        "user_streaks": _q_user_streaks,
        "session_type_pairs": _q_session_type_pairs,
        "events_expfit": _q_events_expfit,
        "events_changepoint": _q_events_changepoint,
        "events_dow_anomaly": _q_events_dow_anomaly,
        "user_survival": _q_user_survival,
        "seasonality_strength": _q_seasonality_strength,
        "user_regularity": _q_user_regularity,
        "events_dup_audit": _q_events_dup_audit,
        "user_twa": _q_user_twa,
        "events_first_touch": _q_events_first_touch,
        "channel_ltv": _q_channel_ltv,
        "session_paths": _q_session_paths,
        "events_geometric_mean": _q_events_geometric_mean,
        "events_emd": _q_events_emd,
        "benford_digits": _q_benford,
        "trending_types": _q_trending,
        "events_asof_orders": _q_events_asof_orders,
        "events_range_join": _q_events_range_join,
        "users_without_orders": _q_users_without_orders,
        "native_join_revenue": _q_native_join_revenue,
        "nation_revenue": _q_nation_revenue,
        "top_events_per_type": _q_top_events_per_type,
        "approx_distinct": _q_approx_distinct,
        "distinct_event_types": _q_distinct_event_types,
        # relational primitives
        "pricing_summary": _q_pricing_summary,
        "top_revenue_orders": _q_top_revenue_orders,
        "segment_revenue": _q_segment_revenue,
        "segment_revenue_share": _q_segment_share,
        "frequent_phrases": _q_frequent_phrases,
        "autophrase_selftrain": _q_autophrase_selftrain,
        "kg_triples_via_sel": _q_kg_triples_via_sel,
        "uie_model_generate": _q_uie_model_generate,
        "uie_trained_extract": _q_uie_trained_extract,
        "kg_events": _q_kg_events,
        "transcript_sample": _q_transcript_sample,
        "duplicate_turn_groups": _q_duplicate_turn_groups,
        "pruned_token_counts": _q_pruned_token_counts,
        "ner_span_model": _q_ner_span_model,
        "ner_biaffine_model": _q_ner_biaffine_model,
        "distant_label": _q_distant_label,
        # aux-format readers / pair builders
        "snli_triplets": _q_snli_triplets,
        "stratified_sample": _q_stratified_sample,
        "doc_repetition": _q_doc_repetition,
        "pii_scrub": _q_pii_scrub,
        "source_pii_rates": _q_source_pii_rates,
        "quality_filter": _q_quality_filter,
        "quality_lr_weights": _q_quality_lr_weights,
        "quality_lr_scores": _q_quality_lr_scores,
        "quality_lr_accuracy": _q_quality_lr_accuracy,
        "quality_lr_holdout": _q_quality_lr_holdout,
        "decontaminate": _q_decontaminate,
        "doc_logprob": _q_doc_logprob,
        "doc_logprob_bigram": _q_doc_logprob_bigram,
        "doc_logprob_kn": _q_doc_logprob_kn,
        "sentence_dedup": _q_sentence_dedup,
        "boilerplate_stats": _q_boilerplate_stats,
        "budget_select": _q_budget_select,
        "corpus_curate": _q_corpus_curate,
        "embedding_gram": _q_embedding_gram,
        "embedding_pca": _q_embedding_pca,
        "events_moving_avg": _q_events_moving_avg,
        "grid_quantiles": _q_grid_quantiles,
        "events_funnel": _q_events_funnel,
        "events_cep": _q_events_cep,
        "events_cep_absence": _q_events_cep_absence,
        "events_zscore": _q_events_zscore,
        "windowed_distinct": _q_windowed_distinct,
        "events_time_window": _q_events_time_window,
        "events_retention": _q_events_retention,
        "events_rank": _q_events_rank,
        "events_interarrival": _q_events_interarrival,
        "events_pivot": _q_events_pivot,
        "events_corr": _q_events_corr,
        "events_regression": _q_events_regression,
        "running_distinct": _q_running_distinct,
        "shipping_priority": _q_shipping_priority,
        "order_priority_counts": _q_order_priority_counts,
        "pricing_charge": _q_pricing_charge,
        "user_value_bands": _q_user_value_bands,
        "weekend_effect": _q_weekend_effect,
        "mann_whitney": _q_mann_whitney,
        "distinct_ngram_diversity": _q_distinct_ngram_diversity,
        "neyman_allocation": _q_neyman_allocation,
        "neyman_sample": _q_neyman_sample,
        "compression_ratio": _q_compression_ratio,
        "split_leakage": _q_split_leakage,
        "near_dup_leakage": _q_near_dup_leakage,
        "quarantine_leaked": _q_quarantine_leaked,
        "shipping_delay_quantiles": _q_shipping_delay_quantiles,
        "pair_lift": _q_pair_lift,
        "value_autocorr": _q_value_autocorr,
        "weekly_active_users": _q_weekly_active_users,
        "event_context_pairs": _q_event_context_pairs,
        "segment_priority_counts": _q_segment_priority_counts,
        "rollup_segment_priority": _q_rollup_segment_priority,
        "brand_price_summary": _q_brand_price_summary,
        "daily_type_mix": _q_daily_type_mix,
        "source_dup_rates": _q_source_dup_rates,
        "training_manifest": _q_training_manifest,
        "events_heatmap": _q_events_heatmap,
        "lang_top_tokens": _q_lang_top_tokens,
        "events_value_histogram": _q_events_value_histogram,
        "dedup_keep_longest": _q_dedup_keep_longest,
        "revenue_cohorts": _q_revenue_cohorts,
        "session_stats": _q_session_stats,
        "salted_type_stats": _q_salted_type_stats,
        "configured_mention_counts": _q_configured_mention_counts,
        "weighted_median_price": _q_weighted_median_price,
        "events_harmonic_mean": _q_events_harmonic_mean,
        "dataset_split": _q_dataset_split,
        "embedding_dim_stats": _q_embedding_dim_stats,
        "partitioned_prune": _q_partitioned_prune,
        "events_winsorized": _q_events_winsorized,
        "type_cooccurrence": _q_type_cooccurrence,
        "upsert_snapshot": _q_upsert_snapshot,
        "embedding_norms": _q_embedding_norms,
        "embedding_isotropy": _q_embedding_isotropy,
        "latest_order_per_customer": _q_latest_order_per_customer,
        "revenue_concentration": _q_revenue_concentration,
        "order_line_histogram": _q_order_line_histogram,
        "brand_hhi": _q_brand_hhi,
        "order_type_diversity": _q_order_type_diversity,
        "forecast_revenue": _q_forecast_revenue,
        "nation_market_share": _q_nation_market_share,
        "heavy_part_suppliers": _q_heavy_part_suppliers,
        "cheapest_supplier_per_part": _q_cheapest_supplier,
        "conjunctive_search": _q_conjunctive_search,
        "kwic_search": _q_kwic_search,
        "source_length_gini": _q_source_length_gini,
        "rfm_scores": _q_rfm_scores,
        "events_mad_outliers": _q_events_mad_outliers,
        "part_size_histogram": _q_part_size_histogram,
        "json_roundtrip": _q_json_roundtrip,
        "timed_conversions": _q_timed_conversions,
        "monthly_revenue_growth": _q_monthly_revenue_growth,
        "conversion_lag": _q_conversion_lag,
        "csv_roundtrip": _q_csv_roundtrip,
        "orc_roundtrip": _q_orc_roundtrip,
        "user_event_entropy": _q_user_event_entropy,
        "returned_item_customers": _q_returned_item_customers,
        "top_supplier_revenue": _q_top_supplier_revenue,
        "brand_supplier_counts": _q_brand_supplier_counts,
        "disjunctive_revenue": _q_disjunctive_revenue,
        "token_zipf_fit": _q_token_zipf_fit,
        "heaps_fit": _q_heaps_fit,
        "bigram_entropy": _q_bigram_entropy,
        "token_burstiness": _q_token_burstiness,
        "source_kl": _q_source_kl,
        "source_js": _q_source_js,
        "chi2_tokens": _q_chi2_tokens,
        "source_vocab_overlap": _q_source_vocab_overlap,
        "cross_source_dups": _q_cross_source_dups,
        "hapax_by_source": _q_hapax_by_source,
        "source_weighted_jaccard": _q_source_weighted_jaccard,
        "readability_scores": _q_readability,
        "char_entropy": _q_char_entropy,
        "events_mad": _q_events_mad,
        "events_ks": _q_events_ks,
        "events_auc": _q_events_auc,
        "events_pr_auc": _q_events_pr_auc,
        "events_drawdown": _q_events_drawdown,
        "customer_order_distribution": _q_customer_order_distribution,
        "local_supplier_volume": _q_local_supplier_volume,
        "volume_shipping": _q_volume_shipping,
        "product_type_profit": _q_product_type_profit,
        "shipmode_priority_counts": _q_shipmode_priority_counts,
        "waiting_suppliers": _q_waiting_suppliers,
        "semantic_contamination": _q_semantic_contamination,
        "mixture_plan": _q_mixture_plan,
        "dormant_rich_customers": _q_dormant_rich_customers,
        "small_lot_revenue": _q_small_lot_revenue,
        "supplier_share_nations": _q_supplier_share_nations,
        "promo_revenue": _q_promo_revenue,
        "join_size_audit": _q_join_size_audit,
        "large_volume_customers": _q_large_volume_customers,
        "kg_closeness": _q_kg_closeness,
        "kg_harmonic": _q_kg_harmonic,
        "kg_stress": _q_kg_stress,
        "kg_node_profiles": _q_kg_node_profiles,
        "kg_rich_club": _q_kg_rich_club,
        "kg_walk_counts": _q_kg_walk_counts,
        "kg_pagerank_weighted": _q_kg_pagerank_weighted,
        "kg_diameter": _q_kg_diameter,
        "events_iqr_outliers": _q_events_iqr_outliers,
        "events_chi_square": _q_events_chi_square,
        "events_props_extract": _q_events_props_extract,
        "events_cume_dist": _q_events_cume_dist,
        "mode_event_type": _q_mode_event_type,
        "part_unpivot": _q_part_unpivot,
        "events_resample": _q_events_resample,
        "snapshot_diff": _q_snapshot_diff,
        "fk_audit": _q_fk_audit,
        "state_history": _q_state_history,
        "markov_transitions": _q_markov_transitions,
        "markov_stationary": _q_markov_stationary,
        "frequent_pairs": _q_frequent_pairs,
        "part_skyline": _q_part_skyline,
        "top_events_with_ties": _q_top_with_ties,
        "kg_reciprocity": _q_kg_reciprocity,
        "pricing_rollup": _q_pricing_rollup,
        "pricing_cube": _q_pricing_cube,
        "column_profile": _q_column_profile,
        "kg_cooccurrence": _q_kg_cooccurrence,
        "kg_cooccurrence_pmi": _q_kg_cooccurrence_pmi,
        "kg_linkpred": _q_kg_linkpred,
        "kg_linkpred_truncated": _q_kg_linkpred_truncated,
        "kg_metapaths": _q_kg_metapaths,
        "kg_clustering": _q_kg_clustering,
        "kg_assortativity": _q_kg_assortativity,
        "kg_degree_distribution": _q_kg_degree_distribution,
        "kg_two_hop": _q_kg_two_hop,
        "kg_linkpred_scores": _q_kg_linkpred_scores,
        "kg_temporal_linkpred": _q_kg_temporal_linkpred,
        "kg_temporal_ranking": _q_kg_temporal_ranking,
        "kg_temporal_calibration": _q_kg_temporal_calibration,
        "kg_edge_proposals": _q_kg_edge_proposals,
        "kg_edge_spans": _q_kg_edge_spans,
        "kg_growth": _q_kg_growth,
        "kg_entity_spans": _q_entity_spans,
        "kg_entity_lifespan": _q_entity_lifespan,
        "role_entity_affinity": _q_role_entity_affinity,
        "kg_entity_introducer": _q_kg_entity_introducer,
        "kg_decayed_adjacency": _q_decayed_adjacency,
        "kg_entity_timeseries": _q_entity_timeseries,
        "conv_profile": _q_conv_profile,
        "kg_entity_transitions": _q_entity_transitions,
        "kg_alias_usage": _q_alias_usage,
        "kg_mention_gini": _q_mention_gini,
        "conv_entity_entropy": _q_conv_entity_entropy,
        "kg_entity_relatedness": _q_kg_entity_relatedness,
        "kg_edge_provenance": _q_edge_provenance,
        "kg_entity_burst": _q_entity_burst,
        "lang_confusion": _q_lang_confusion,
        "dsir_scores": _q_dsir_scores,
        "embedding_centroids": _q_embedding_centroids,
        "centroid_similarity": _q_centroid_similarity,
        "knn_accuracy": _q_knn_accuracy,
        "conv_sentences": _q_conv_sentences,
        "conv_weighted_sample": _q_conv_weighted_sample,
        "ck_tokens": _q_ck_tokens,
        # rows-only (non-SQL-expressible)
        "linking_candidates": _q_linking_candidates,
        "bm25_topn": _q_bm25_topn,
        "bm25_topn_sharded": _q_bm25_topn_sharded,
        "similarity_join": _q_similarity_join,
        "linking_recall": _q_linking_recall,
        "linking_coherence": _q_linking_coherence,
        "linking_sem_coherence": _q_linking_sem_coherence,
        "linking_fused": _q_linking_fused,
        "linking_mrr": _q_linking_mrr,
        "linking_ndcg": _q_linking_ndcg,
        "extraction_prf": _q_extraction_prf,
        "multimodal_features": _q_multimodal_features,
        "audio_silence": _q_audio_silence,
        "audio_spectral": _q_audio_spectral,
        "image_exposure": _q_image_exposure,
        "media_phash": _q_media_phash,
        "phash_near_dups": _q_phash_near_dups,
        "video_frame_sample": _q_video_frame_sample,
    }


def oracle_sql() -> dict[str, str]:
    from deepkg_ray import oracle, synth
    synth.ensure_synth(SF_ORACLE)   # transcript SQL reads the synth parquet
    return {
        "kg_mention_counts": oracle.mention_counts_sql(SF_ORACLE),
        "kg_mention_counts_sharded": oracle.mention_counts_sql(SF_ORACLE),
        "kg_mention_counts_delta": oracle.mention_counts_sql(SF_ORACLE),
        "kg_triples": oracle.triples_sql(SF_ORACLE),
        "kg_adjacency": oracle.adjacency_sql(SF_ORACLE),
        "kg_incremental": oracle.adjacency_sql(SF_ORACLE),
        "kg_entities": oracle.entities_sql(SF_ORACLE),
        "kg_predicates": oracle.predicates_sql(SF_ORACLE),
        "kg_schema": oracle.kg_schema_oracle(SF_ORACLE),
        "kg_pred_cardinality":
            oracle.predicate_cardinality_oracle(SF_ORACLE),
        "transcript_stats": oracle.transcript_stats_sql(SF_ORACLE),
        "key_skew_stats": oracle.key_skew_stats_oracle(SF_ORACLE),
        "turn_latency": oracle.turn_latency_oracle(SF_ORACLE),
        "conv_turn_taking": oracle.conv_turn_taking_oracle(SF_ORACLE),
        "context_budget": oracle.context_budget_oracle(SF_ORACLE),
        "conv_sessions": oracle.conv_sessions_oracle(SF_ORACLE),
        "tool_usage": oracle.tool_usage_oracle(SF_ORACLE),
        "conv_cumulative_triples": oracle.conv_cumulative_triples_sql(SF_ORACLE),
        "conv_context": oracle.conv_context_oracle(SF_ORACLE),
        "conv_transcripts": oracle.conv_transcripts_oracle(SF_ORACLE),
        "extraction_prf": oracle.prf_sql(SF_ORACLE),
        "doc_stats": oracle.doc_stats_oracle(),
        "lang_id": oracle.lang_id_oracle(),
        "bpe_token_counts": oracle.bpe_token_counts_oracle(),
        "source_fertility": oracle.source_fertility_oracle(),
        "bpe_merge_token_counts": oracle.bpe_merge_counts_oracle(SF_ORACLE),
        "sequence_packing": oracle.sequence_packing_oracle(),
        "substring_dup_spans": oracle.substring_dup_spans_oracle(),
        "doc_dup_fraction": oracle.doc_dup_fraction_oracle(),
        "cdc_chunk_stats": oracle.cdc_chunk_stats_oracle(),
        "chunk_documents": oracle.chunk_documents_oracle(),
        "gopher_repetition": oracle.gopher_repetition_oracle(),
        "sample_exact_k": oracle.sample_exact_k_oracle(),
        "weighted_sample": oracle.weighted_sample_oracle(),
        "dsir_sample": oracle.dsir_sample_oracle(),
        "global_shuffle_positions": oracle.global_shuffle_positions_oracle(),
        "stratified_exact_k": oracle.stratified_exact_k_oracle(),
        "containment_pairs": oracle.containment_pairs_oracle(),
        "packing_stats": oracle.packing_stats_oracle(),
        "dedup_exact": oracle.dedup_exact_oracle(),
        "dedup_stats": oracle.dedup_stats_oracle(),
        "ngram_jaccard": oracle.ngram_jaccard_pairs_oracle(),
        "token_quantiles": oracle.token_quantiles_oracle(),
        "token_quantiles_cont": oracle.token_quantiles_cont_oracle(),
        "flag_quantiles_cont": oracle.flag_quantiles_cont_oracle(),
        "doc_len_quantiles": oracle.grouped_quantiles_oracle(),
        "heavy_hitter_tokens": oracle.heavy_hitter_tokens_oracle(),
        "cms_state": oracle.cms_state_oracle(),
        "cms_estimates": oracle.cms_estimates_oracle(),
        "bootstrap_means": oracle.bootstrap_means_oracle(),
        "bootstrap_ci": oracle.bootstrap_ci_oracle(),
        "bootstrap_diff_ci": oracle.bootstrap_diff_ci_oracle(),
        "vocab_coverage": oracle.vocab_coverage_oracle(),
        "length_bucketing": oracle.length_bucketing_oracle(),
        "cuped": oracle.cuped_adjustment_oracle(),
        "diff_in_diff": oracle.diff_in_diff_oracle(),
        "srm_check": oracle.srm_check_oracle(),
        "events_perm_test": oracle.permutation_test_weekend_oracle(),
        "markov_entropy_rate": oracle.markov_entropy_rate_oracle(),
        "psi_drift": oracle.psi_drift_oracle(),
        "shard_plan": oracle.shard_plan_oracle(),
        "domain_stats": oracle.domain_stats_oracle(),
        "rake_keywords": oracle.rake_keywords_oracle(),
        "dedup_clusters": oracle.dedup_clusters_oracle(),
        "dedup_cluster_sizes": oracle.dedup_cluster_sizes_oracle(),
        "editdist_pairs": oracle.editdist_pairs_oracle(),
        "fs_weights": oracle.fs_weight_table_oracle(),
        "fs_scores": oracle.fs_match_scores_oracle(),
        "er_canonical": oracle.er_canonical_oracle(),
        "editdist_clusters": oracle.editdist_clusters_oracle(),
        "kg_degrees": oracle.kg_degrees_oracle(SF_ORACLE),
        "kg_kcore": oracle.kg_kcore_oracle(SF_ORACLE, k=3, rounds=8),
        "kg_bfs": oracle.kg_bfs_oracle(SF_ORACLE, sources=(0,), rounds=8),
        "kg_labelprop": oracle.kg_labelprop_oracle(SF_ORACLE, rounds=4),
        "kg_modularity": oracle.kg_modularity_oracle(SF_ORACLE, rounds=4),
        "kg_components": oracle.kg_components_oracle(SF_ORACLE),
        "kg_mis": oracle.kg_mis_oracle(SF_ORACLE),
        "kg_negatives": oracle.kg_negatives_oracle(SF_ORACLE, ks=(1, 7)),
        "kg_walks": oracle.kg_walks_oracle(SF_ORACLE, steps=4, start_mod=3),
        "kg_triangles": oracle.kg_triangles_oracle(SF_ORACLE),
        "kg_pagerank": oracle.kg_pagerank_oracle(SF_ORACLE),
        "kg_ppr": oracle.kg_ppr_oracle(SF_ORACLE, n_seeds=2),
        "kg_truss": oracle.kg_truss_oracle(SF_ORACLE, k=3, n_rounds=8),
        "kg_sssp": oracle.kg_sssp_oracle(SF_ORACLE, rounds=16),
        "kg_scc": oracle.kg_scc_oracle(SF_ORACLE),
        "kg_hits": oracle.kg_hits_oracle(SF_ORACLE, n_iters=3),
        "kg_eigenvector": oracle.kg_eigenvector_oracle(SF_ORACLE,
                                                       n_iters=3),
        "kg_katz": oracle.kg_katz_oracle(SF_ORACLE, n_iters=3),
        "kg_embeddedness": oracle.edge_embeddedness_oracle(SF_ORACLE),
        "kg_avg_nbr_degree":
            oracle.avg_neighbor_degree_oracle(SF_ORACLE),
        "kg_robustness": oracle.robustness_profile_oracle(SF_ORACLE),
        "bigram_counts": oracle.bigram_counts_oracle(),
        "word_idf": oracle.word_idf_oracle(),
        "inverted_index": oracle.inverted_index_oracle(),
        "tfidf_top_terms": oracle.tfidf_top_terms_oracle(k=5),
        "pmi_bigrams": oracle.pmi_bigrams_oracle(),
        "llr_collocations": oracle.llr_collocations_oracle(),
        "textrank_words": oracle.textrank_words_oracle(n_iters=5),
        "neighbor_entropy": oracle.neighbor_entropy_oracle(),
        "ann_topk": oracle.ann_topk_oracle(),
        "knn_graph": oracle.knn_graph_oracle(),
        "knn_mutuality": oracle.knn_mutuality_oracle(),
        "hard_negatives": oracle.hard_negatives_oracle(),
        "boilerplate_stats": oracle.boilerplate_stats_oracle(),
        "pq_codes": oracle.pq_codes_oracle(),
        "pq_distortion": oracle.pq_distortion_oracle(),
        "sq8_audit": oracle.sq8_audit_oracle(),
        "truncation_recall": oracle.truncation_recall_oracle(),
        "pq_adc_topk": oracle.pq_adc_topk_oracle(),
        "ann_ivf": oracle.ann_topk_oracle(),   # nprobe=all → exact
        "embedding_kmeans": oracle.kmeans_oracle(k=8, iters=4),
        "kmeans_silhouette": oracle.silhouette_oracle(k=8, iters=4),
        "cluster_purity": oracle.cluster_purity_oracle(k=8, iters=4),
        "cluster_nmi": oracle.cluster_nmi_oracle(k=8, iters=4),
        "cluster_ari": oracle.cluster_ari_oracle(k=8, iters=4),
        "semantic_dedup": oracle.semantic_dedup_oracle(k=8, iters=4, tau=0.4),
        "embedding_near_dup": oracle.embedding_near_dup_oracle(),
        "embedding_near_dup_lsh": oracle.embedding_near_dup_lsh_oracle(),
        "events_window": oracle.events_window_oracle(),
        "events_hopping": oracle.hopping_window_oracle(),
        "events_sessionize": oracle.sessionize_oracle(),
        "events_watermark": oracle.watermark_late_oracle(),
        "user_streaks": oracle.user_activity_streaks_oracle(),
        "session_type_pairs": oracle.session_type_pairs_oracle(),
        "events_expfit": oracle.expfit_ks_oracle(),
        "events_changepoint": oracle.cusum_changepoint_oracle(),
        "events_dow_anomaly": oracle.dow_daily_anomaly_oracle(),
        "user_survival": oracle.survival_curve_oracle(),
        "seasonality_strength": oracle.seasonality_strength_oracle(),
        "user_regularity": oracle.user_regularity_oracle(),
        "events_dup_audit": oracle.duplicate_event_audit_oracle(),
        "user_twa": oracle.user_time_weighted_avg_oracle(),
        "events_first_touch": oracle.first_touch_attribution_oracle(),
        "channel_ltv": oracle.channel_ltv_quantiles_oracle(),
        "session_paths": oracle.session_paths_oracle(),
        "events_geometric_mean": oracle.grouped_geometric_mean_oracle(),
        "events_emd": oracle.events_emd_1d_oracle(),
        "benford_digits": oracle.benford_digits_oracle(),
        "trending_types": oracle.trending_per_window_oracle(),
        "events_asof_orders": oracle.asof_join_oracle(),
        "events_range_join": oracle.range_join_oracle(),
        "users_without_orders": oracle.users_without_orders_oracle(),
        "native_join_revenue": oracle.segment_revenue_oracle(),
        "nation_revenue": oracle.nation_revenue_oracle(),
        "top_events_per_type": oracle.top_events_per_type_oracle(),
        "bm25_topn": oracle.bm25_topn_oracle(SF_ORACLE, top_n=5),
        "bm25_topn_sharded": oracle.bm25_topn_oracle(SF_ORACLE, top_n=5),
        "linking_candidates": oracle.bm25_topn_oracle(SF_ORACLE, top_n=10),
        "linking_recall": oracle.linking_recall_oracle(SF_ORACLE),
        "linking_coherence": oracle.coherence_link_oracle(SF_ORACLE),
        "linking_sem_coherence":
            oracle.semantic_coherence_oracle(SF_ORACLE),
        "linking_fused": oracle.fused_link_oracle(SF_ORACLE),
        "linking_mrr": oracle.linking_mrr_oracle(SF_ORACLE),
        "linking_ndcg": oracle.linking_ndcg_oracle(SF_ORACLE),
        "similarity_join": oracle.similarity_join_oracle(threshold=0.8),
        "distinct_event_types": oracle.distinct_event_types_oracle(),
        "pricing_summary": oracle.pricing_summary_oracle(),
        "frequent_phrases": oracle.frequent_phrases_oracle(),
        "autophrase_selftrain": oracle.autophrase_selftrain_oracle(),
        "kg_triples_via_sel": oracle.triples_sql(SF_ORACLE),
        "mmr_select": oracle.mmr_select_oracle(),
        "distinct_ngram_diversity": oracle.distinct_ngram_diversity_oracle(),
        "neyman_allocation": oracle.neyman_allocation_oracle(),
        "neyman_sample": oracle.neyman_sample_oracle(k=200),
        "compression_ratio": oracle.compression_ratio_oracle(SF_ORACLE),
        "split_leakage": oracle.split_leakage_oracle(),
        "near_dup_leakage": oracle.near_dup_leakage_oracle(),
        "quarantine_leaked": oracle.quarantine_leaked_oracle(),
        "pack_conversations": oracle.pack_conversations_oracle(SF_ORACLE),
        "conv_packing_stats": oracle.conv_packing_stats_oracle(SF_ORACLE),
        "uie_model_generate": oracle.uie_model_generate_oracle(SF_ORACLE),
        "kg_events": oracle.events_sql(SF_ORACLE),
        "transcript_sample": oracle.transcript_sample_oracle(SF_ORACLE),
        "duplicate_turn_groups": oracle.duplicate_turn_groups_oracle(SF_ORACLE),
        "pruned_token_counts": oracle.pruned_token_counts_oracle(),
        "ner_span_model": oracle.mention_counts_sql(SF_ORACLE),
        "ner_biaffine_model": oracle.mention_counts_sql(SF_ORACLE),
        "distant_label": oracle.distant_label_oracle(SF_ORACLE),
        "top_revenue_orders": oracle.top_revenue_orders_oracle(),
        "segment_revenue": oracle.segment_revenue_oracle(),
        "segment_revenue_share": oracle.segment_revenue_share_oracle(),
        "snli_triplets": oracle.snli_triplets_oracle(SF_ORACLE),
        "ck_tokens": oracle.ck_tokens_oracle(SF_ORACLE),
        "stratified_sample": oracle.stratified_sample_oracle(),
        "doc_repetition": oracle.doc_repetition_oracle(),
        "pii_scrub": oracle.pii_scrub_oracle(),
        "source_pii_rates": oracle.source_pii_rates_oracle(),
        "quality_filter": oracle.quality_filter_oracle(),
        "quality_lr_weights": oracle.quality_lr_weights_oracle(),
        "quality_lr_scores": oracle.quality_lr_scores_oracle(),
        "quality_lr_accuracy": oracle.quality_lr_accuracy_oracle(),
        "quality_lr_holdout": oracle.quality_lr_holdout_oracle(),
        "decontaminate": oracle.decontaminate_oracle(n=4, bench_mod=17),
        "doc_logprob": oracle.doc_logprob_oracle(),
        "doc_logprob_bigram": oracle.doc_logprob_bigram_oracle(),
        "doc_logprob_kn": oracle.doc_logprob_kn_oracle(),
        "sentence_dedup": oracle.sentence_dedup_oracle(),
        "budget_select": oracle.budget_select_oracle(frac=0.6),
        "corpus_curate": oracle.corpus_curate_oracle(frac=0.6),
        "embedding_gram": oracle.embedding_gram_oracle(dim=64),
        "embedding_pca": oracle.embedding_pca_oracle(dim=64, n_iters=6),
        "events_moving_avg": oracle.moving_average_oracle(k=3),
        "grid_quantiles": oracle.grid_quantiles_oracle(),
        "events_funnel": oracle.funnel_oracle(),
        "events_zscore": oracle.zscore_oracle(),
        "windowed_distinct": oracle.windowed_hll_oracle(),
        "events_time_window": oracle.time_window_sum_oracle(),
        "events_retention": oracle.cohort_retention_oracle(),
        "events_rank": oracle.rank_events_oracle(),
        "events_interarrival": oracle.interarrival_oracle(),
        "events_pivot": oracle.pivot_counts_oracle(),
        "events_corr": oracle.corr_events_oracle(),
        "events_regression": oracle.regression_events_oracle(),
        "running_distinct": oracle.running_distinct_oracle(),
        "shipping_priority": oracle.shipping_priority_oracle(),
        "order_priority_counts": oracle.order_priority_counts_oracle(),
        "pricing_charge": oracle.pricing_charge_summary_oracle(),
        "user_value_bands": oracle.user_value_bands_oracle(),
        "weekend_effect": oracle.weekend_effect_oracle(),
        "mann_whitney": oracle.mann_whitney_weekend_oracle(),
        "shipping_delay_quantiles": oracle.shipping_delay_quantiles_oracle(),
        "pair_lift": oracle.pair_lift_oracle(),
        "value_autocorr": oracle.value_autocorr_oracle(),
        "weekly_active_users": oracle.weekly_active_users_oracle(),
        "event_context_pairs": oracle.event_context_pairs_oracle(),
        "segment_priority_counts": oracle.segment_priority_counts_oracle(),
        "rollup_segment_priority": oracle.rollup_segment_priority_oracle(),
        "brand_price_summary": oracle.brand_price_summary_oracle(),
        "daily_type_mix": oracle.daily_type_mix_oracle(),
        "source_dup_rates": oracle.source_dup_rates_oracle(),
        "training_manifest": oracle.training_manifest_oracle(),
        "events_heatmap": oracle.dow_hour_heatmap_oracle(),
        "lang_top_tokens": oracle.lang_top_tokens_oracle(),
        "events_value_histogram": oracle.value_histogram_by_type_oracle(),
        "dedup_keep_longest": oracle.dedup_keep_longest_oracle(),
        "revenue_cohorts": oracle.revenue_cohorts_oracle(),
        "session_stats": oracle.session_stats_oracle(),
        "salted_type_stats": oracle.salted_type_stats_oracle(),
        "configured_mention_counts": oracle.mention_counts_sql(SF_ORACLE),
        "weighted_median_price": oracle.weighted_median_price_oracle(qs=(0.25, 0.5, 0.75)),
        "events_harmonic_mean": oracle.grouped_harmonic_mean_oracle(),
        "dataset_split": oracle.dataset_split_assign_oracle(),
        "embedding_dim_stats": oracle.embedding_dim_stats_oracle(),
        "partitioned_prune": oracle.partitioned_prune_counts_oracle(),
        "events_winsorized": oracle.grouped_winsorized_mean_oracle(),
        "type_cooccurrence": oracle.type_cooccurrence_jaccard_oracle(),
        "upsert_snapshot": oracle.upsert_snapshot_oracle(),
        "embedding_norms": oracle.embedding_norms_oracle(),
        "embedding_isotropy": oracle.embedding_isotropy_oracle(),
        "latest_order_per_customer": oracle.latest_order_per_customer_oracle(),
        "revenue_concentration": oracle.revenue_concentration_oracle(),
        "order_line_histogram": oracle.order_line_histogram_oracle(),
        "brand_hhi": oracle.brand_hhi_oracle(),
        "order_type_diversity": oracle.order_type_diversity_oracle(),
        "forecast_revenue": oracle.forecast_revenue_oracle(),
        "nation_market_share": oracle.nation_market_share_oracle(),
        "heavy_part_suppliers": oracle.heavy_part_suppliers_oracle(),
        "cheapest_supplier_per_part":
            oracle.cheapest_supplier_per_part_oracle(),
        "conjunctive_search": oracle.conjunctive_search_oracle(),
        "kwic_search": oracle.kwic_search_oracle(),
        "source_length_gini": oracle.source_length_gini_oracle(),
        "rfm_scores": oracle.rfm_scores_oracle(),
        "events_mad_outliers": oracle.grouped_mad_outliers_oracle(),
        "part_size_histogram": oracle.part_size_histogram_oracle(),
        "json_roundtrip": oracle.csv_roundtrip_counts_oracle(),
        "timed_conversions": oracle.timed_conversions_oracle(),
        "monthly_revenue_growth": oracle.monthly_revenue_growth_oracle(),
        "conversion_lag": oracle.conversion_lag_quantiles_oracle(),
        "csv_roundtrip": oracle.csv_roundtrip_counts_oracle(),
        "orc_roundtrip": oracle.csv_roundtrip_counts_oracle(),
        "user_event_entropy": oracle.user_event_entropy_oracle(),
        "returned_item_customers": oracle.returned_item_customers_oracle(),
        "top_supplier_revenue": oracle.top_supplier_revenue_oracle(),
        "brand_supplier_counts": oracle.brand_supplier_counts_oracle(),
        "disjunctive_revenue": oracle.disjunctive_revenue_oracle(),
        "token_zipf_fit": oracle.token_zipf_fit_oracle(),
        "heaps_fit": oracle.heaps_fit_oracle(),
        "bigram_entropy": oracle.bigram_cond_entropy_oracle(),
        "token_burstiness": oracle.token_burstiness_oracle(),
        "source_kl": oracle.source_kl_divergence_oracle(),
        "source_js": oracle.source_js_divergence_oracle(),
        "chi2_tokens": oracle.chi2_tokens_oracle(),
        "source_vocab_overlap": oracle.source_vocab_overlap_oracle(),
        "cross_source_dups": oracle.cross_source_dups_oracle(),
        "hapax_by_source": oracle.hapax_by_source_oracle(),
        "source_weighted_jaccard": oracle.source_weighted_jaccard_oracle(),
        "readability_scores": oracle.readability_scores_oracle(),
        "char_entropy": oracle.char_entropy_oracle(),
        "events_mad": oracle.grouped_mad_oracle(),
        "events_ks": oracle.ks_two_sample_oracle(),
        "events_auc": oracle.roc_auc_oracle(),
        "events_pr_auc": oracle.pr_auc_oracle(),
        "events_drawdown": oracle.max_drawdown_oracle(),
        "customer_order_distribution": oracle.customer_order_distribution_oracle(),
        "local_supplier_volume": oracle.local_supplier_volume_oracle(),
        "volume_shipping": oracle.volume_shipping_oracle(),
        "product_type_profit": oracle.product_type_profit_oracle(),
        "shipmode_priority_counts": oracle.shipmode_priority_counts_oracle(),
        "waiting_suppliers": oracle.waiting_suppliers_oracle(),
        "semantic_contamination": oracle.semantic_contamination_oracle(tau=0.3),
        "mixture_plan": oracle.mixture_plan_oracle(),
        "dormant_rich_customers": oracle.dormant_rich_customers_oracle(),
        "small_lot_revenue": oracle.small_lot_revenue_oracle(),
        "supplier_share_nations": oracle.supplier_share_nations_oracle(),
        "promo_revenue": oracle.promo_revenue_oracle(),
        "large_volume_customers": oracle.large_volume_customers_oracle(),
        "kg_diameter": oracle.diameter_2sweep_oracle(SF_ORACLE, rounds=10),
        "events_iqr_outliers": oracle.grouped_iqr_outliers_oracle(),
        "events_chi_square": oracle.chi_square_independence_oracle(),
        "events_props_extract": oracle.events_props_extract_oracle(),
        "kg_closeness": oracle.closeness_centrality_oracle(SF_ORACLE,
                                                           k_seeds=4,
                                                           rounds=8),
        "kg_harmonic": oracle.harmonic_centrality_oracle(SF_ORACLE,
                                                         k_seeds=4,
                                                         rounds=8),
        "kg_stress": oracle.stress_centrality_oracle(SF_ORACLE, rounds=8),
        "kg_pagerank_weighted": oracle.weighted_pagerank_oracle(SF_ORACLE),
        "kg_node_profiles": oracle.node_bfs_profiles_oracle(SF_ORACLE,
                                                            rounds=8),
        "kg_rich_club": oracle.rich_club_oracle(SF_ORACLE),
        "kg_walk_counts": oracle.walk_counts_oracle(SF_ORACLE, max_len=4),
        "events_cume_dist": oracle.cume_dist_events_oracle(),
        "mode_event_type": oracle.mode_per_user_oracle(),
        "part_unpivot": oracle.part_unpivot_oracle(),
        "events_resample": oracle.events_resample_oracle(window_sec=300),
        "snapshot_diff": oracle.snapshot_diff_oracle(),
        "fk_audit": oracle.fk_audit_oracle(),
        "state_history": oracle.state_history_oracle(),
        "markov_transitions": oracle.markov_transitions_oracle(),
        "markov_stationary": oracle.markov_stationary_oracle(),
        "frequent_pairs": oracle.frequent_pairs_oracle(min_support=2),
        "part_skyline": oracle.skyline_oracle(),
        "top_events_with_ties": oracle.top_with_ties_oracle(k=2),
        "kg_reciprocity": oracle.kg_reciprocity_oracle(SF_ORACLE),
        "pricing_rollup": oracle.pricing_rollup_oracle(),
        "pricing_cube": oracle.pricing_cube_oracle(),
        "column_profile": oracle.column_profile_oracle(),
        "kg_cooccurrence": oracle.kg_cooccurrence_oracle(SF_ORACLE),
        "kg_cooccurrence_pmi": oracle.cooccurrence_pmi_oracle(SF_ORACLE),
        "kg_linkpred": oracle.kg_linkpred_oracle(SF_ORACLE, min_cn=2),
        "kg_linkpred_truncated": oracle.kg_linkpred_oracle(
            SF_ORACLE, min_cn=2, max_degree=60),
        "kg_linkpred_scores": oracle.kg_linkpred_scores_oracle(SF_ORACLE),
        "kg_temporal_linkpred": oracle.kg_temporal_linkpred_oracle(SF_ORACLE),
        "kg_temporal_ranking": oracle.kg_temporal_ranking_oracle(SF_ORACLE),
        "kg_temporal_calibration": oracle.kg_temporal_calibration_oracle(SF_ORACLE),
        "kg_edge_proposals": oracle.kg_edge_proposals_oracle(SF_ORACLE, min_rate_micros=8000),
        "join_size_audit": oracle.join_size_audit_oracle(),
        "events_cep": oracle.cep_pattern_oracle(),
        "events_cep_absence": oracle.cep_absence_oracle(),
        "kg_two_hop": oracle.kg_two_hop_sizes_oracle(SF_ORACLE),
        "kg_metapaths": oracle.kg_metapaths_oracle(SF_ORACLE),
        "kg_clustering": oracle.kg_clustering_oracle(SF_ORACLE),
        "kg_assortativity": oracle.kg_degree_assortativity_oracle(SF_ORACLE),
        "kg_degree_distribution": oracle.kg_degree_distribution_oracle(SF_ORACLE),
        "kg_edge_spans": oracle.kg_edge_spans_oracle(SF_ORACLE),
        "kg_growth": oracle.kg_growth_curve_oracle(SF_ORACLE),
        "kg_entity_spans": oracle.entity_spans_oracle(SF_ORACLE),
        "kg_entity_lifespan": oracle.entity_lifespan_sql(SF_ORACLE),
        "role_entity_affinity": oracle.role_entity_affinity_sql(SF_ORACLE),
        "kg_entity_introducer": oracle.entity_introducer_sql(SF_ORACLE),
        "kg_decayed_adjacency": oracle.decayed_adjacency_sql(SF_ORACLE),
        "kg_entity_timeseries": oracle.entity_timeseries_sql(SF_ORACLE),
        "conv_profile": oracle.conv_profile_sql(SF_ORACLE),
        "kg_entity_transitions": oracle.entity_transitions_sql(SF_ORACLE),
        "kg_alias_usage": oracle.alias_usage_sql(SF_ORACLE),
        "kg_mention_gini": oracle.mention_gini_sql(SF_ORACLE),
        "conv_entity_entropy": oracle.conv_entity_entropy_sql(SF_ORACLE),
        "kg_entity_relatedness": oracle.entity_relatedness_sql(SF_ORACLE),
        "kg_edge_provenance": oracle.edge_provenance_sql(SF_ORACLE),
        "kg_entity_burst": oracle.entity_burst_sql(SF_ORACLE),
        "lang_confusion": oracle.lang_confusion_oracle(),
        "dsir_scores": oracle.dsir_scores_oracle(),
        "embedding_centroids": oracle.embedding_centroids_oracle(dim=64),
        "centroid_similarity": oracle.centroid_similarity_oracle(dim=64),
        "knn_accuracy": oracle.knn_accuracy_oracle(),
        "conv_sentences": oracle.conv_sentences_oracle(SF_ORACLE),
        "conv_weighted_sample":
            oracle.conv_weighted_sample_oracle(SF_ORACLE),
        "approx_distinct": oracle.hll_registers_oracle(),
        "doc_fingerprints": oracle.doc_fingerprints_oracle(),
        "dedup_simhash": oracle.dedup_simhash_oracle(),
        "dedup_minhash": oracle.dedup_minhash_oracle(),
        "multimodal_features": oracle.multimodal_features_oracle(),
        "audio_silence": oracle.audio_silence_oracle(),
        "audio_spectral": oracle.audio_spectral_oracle(),
        "image_exposure": oracle.image_exposure_oracle(),
        "media_phash": oracle.media_phash_oracle(),
        "phash_near_dups": oracle.phash_near_dups_oracle(),
        "video_frame_sample": oracle.video_frame_sample_oracle(),
        # rows-only (no SQL): uie_model_generate (neural generation),
        # uie_trained_extract (trained-model scoring, accuracy-asserted
        # in-query instead)
    }
