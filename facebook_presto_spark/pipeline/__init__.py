"""Large-scale training-data pipeline operators (north-star extension).

The reference has the *primitives* for this work — SetDigest/MinHash
(presto-main/.../type/setdigest/SetDigestFunctions.java: make_set_digest,
jaccard_index), HLL sketches, ngrams() (operator/scalar/ArrayNgramsFunction),
string/array functions — but not the assembled pipelines.  This package
assembles them Spark-first for 100 TB-scale corpus work:

- ``dedup``      — exact, MinHash+LSH banding, SimHash, n-gram Jaccard,
                   embedding-cosine near-dup
- ``similarity`` — brute-force cosine top-k; LSH-bucketed ANN scale path
- ``text``       — token stats, quality scoring, language-ID heuristic,
                   document fingerprinting
- ``multimodal`` — opaque-binary columns with typed metadata; Arrow-batched
                   decode/feature plumbing (decode itself stubbed — no image
                   libs in this container)

Everything is declarative DataFrame ops (explode/groupBy/join/HOFs) so
Catalyst handles shuffle planning; no Python in the hot path except the
multimodal decode stub, which is an Arrow-batched mapInPandas by design.
"""

from facebook_presto_spark.pipeline import dedup, similarity, text, multimodal

__all__ = ["dedup", "similarity", "text", "multimodal"]
