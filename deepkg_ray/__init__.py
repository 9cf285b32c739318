"""deepkg_ray — a Ray-Data-native knowledge-graph construction engine.

A brand-new engine with the query/data-processing capabilities of
powerycy/DeepKg (reference analyzed in SURVEY.md), re-expressed as
``ray.data.Dataset`` pipelines over zero-copy Arrow batches:

- transcript normalization      (stages/normalize.py)
- mention detection             (stages/mention.py   — trie/regex dictionary matcher,
                                 semantics of reference AutoNER/src/string_match.h:21-99)
- relation extraction           (stages/relation.py  — mention-anchored pattern matcher,
                                 record shapes of reference UIE_torch sel2record.py:405-519)
- SEL record parsing            (stages/selparse.py — parity kernel for
                                 reference sel2record.py:888-992,1029-1187)
- entity linking                (stages/linking.py   — BM25 / char-ngram candidate gen,
                                 reference Normalization/recall/model/BM25_Model.py)
- canonicalization + dedup      (stages/canonical.py — normalized-key groupby,
                                 reference process_data.py:506-556)
- graph materialization         (stages/materialize.py)
- dedup family                  (stages/dedup.py     — exact / minhash-LSH / simhash /
                                 ngram-jaccard / embedding near-dup)
- similarity search             (stages/similarity.py — brute-force + IVF cosine top-k)
- text analysis                 (stages/textstats.py — lang-id, quality, token counts)
- phrase-mining stats           (stages/phrasemine.py — ngram freq / IDF / PMI / entropy,
                                 reference AutoPhraseX-main/autophrasex/extractors.py)
- windowed event aggregates     (stages/windows.py)
- multimodal plumbing           (stages/multimodal.py — binary columns, stubbed decode)

No code is copied from the reference; citations in docstrings are for
semantic parity only. Nothing in this package calls ``ray.init`` — the
caller owns the Ray session.
"""

__version__ = "0.1.0"
