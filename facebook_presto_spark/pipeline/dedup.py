"""Deduplication operators over the ``documents`` corpus.

Reference primitives: SetDigest MinHash (presto-main/.../type/setdigest/
SetDigestFunctions.java — make_set_digest / jaccard_index), ngrams
(operator/scalar/ArrayNgramsFunction.java), checksum
(operator/aggregation/ChecksumAggregationFunction.java).  The assembled
dedup pipelines below are the standard large-corpus constructions
(Broder MinHash-LSH; Charikar SimHash) expressed as pure DataFrame ops.

Scale design (the point of each construction):

- **exact**: one shuffle on a 128-bit content hash — never on the text
  itself, so shuffle bytes are O(rows·16B) not O(corpus).
- **MinHash-LSH**: signature computation is a zero-shuffle per-row
  transform/aggregate fold (each doc's k running mins computed inside
  its scan split; the only shuffle anywhere is the (band, key) bucket
  grouping); banding turns the O(n²) pair problem into bucket grouping
  on band keys, which AQE handles for skew (a degenerate band key = a
  pile of near-identical docs).  The per-row fold assumes ``doc_id`` is
  unique per row (true of every generator here); duplicate doc_id rows
  would emit one signature per ROW while the oracle's GROUP BY doc_id
  merges them — tests/test_pipeline.py asserts the uniqueness.
- **SimHash**: 64 independent bit-weight sums per doc — a single groupBy,
  no joins until the (cheap) bucket comparison.
- **n-gram Jaccard**: exact verification for *candidate pairs only* —
  the default entry point consumes a candidate-pair DataFrame (MinHash-
  LSH pairs unless the caller provides one); the quadratic
  blocked-by-``source`` spelling survives only as the oracle twin
  (ngram_jaccard_blocked).
- **embedding near-dup**: the default consumes sign-LSH bucket
  candidates whose bit width scales with corpus size (bucket occupancy
  stays O(1), so candidate pairs grow linearly); the
  blocked-by-``label`` all-pairs spelling survives only as the oracle
  twin (embedding_neardup_blocked).

Cross-engine determinism: hashes are md5 hex strings (identical in any
engine); MinHash takes the *lexicographic* min over md5 strings — no
integer conversion, no float arithmetic.  Cosine similarity is computed
on fixed-point integers (inputs rounded to round(x·1e6), so every dot
product is exact int64 — the same kernel pipeline/similarity.py scores
with); see plans/tpch.py for the rationale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from facebook_presto_spark.plans.tpch import _t

K_MINHASH = 8  # signature length
BAND_ROWS = 2  # minhashes per LSH band → 4 bands
_BUCKET_SALTS = 16  # two-level bucket pre-aggregation fan-out (§2.5)


def _tokens(col: Column) -> Column:
    return F.split(col, " ")


# Overlapping token-aligned 3-gram extraction as a single Java-regex scan:
# zero-width lookbehind anchors each match to a token boundary, the
# lookahead group captures the 3-token window without consuming it.
_SHINGLE_RX = r"(?<=^|\s)(?=(\S+ \S+ \S+))"


def _shingles(text: Column) -> Column:
    """Distinct 3-token shingles (w-shingling, w=3).

    Single codegen-friendly regex scan (see ``_SHINGLE_RX`` below) instead
    of a transform/sequence higher-order chain — HOFs are CodegenFallback
    and destabilize whole-stage codegen in shingle-heavy stages.
    """
    return F.array_distinct(F.regexp_extract_all(text, F.lit(_SHINGLE_RX), 1))


def exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup on content hash: keep the smallest doc_id per identical
    (lowercased) text; report group size.  At scale: shuffle on md5 only."""
    docs = _t(spark, sf_dir, "documents")
    h = F.md5(F.lower(F.col("text")))
    return (
        docs.groupBy(h.alias("content_hash"))
        .agg(
            F.min("doc_id").alias("keep_doc_id"),
            F.count(F.lit(1)).alias("group_size"),
        )
        .select("keep_doc_id", "group_size", "content_hash")
    )


EXACT_DEDUP_SQL = """
SELECT min(doc_id) AS keep_doc_id, count(*) AS group_size,
       md5(lower(text)) AS content_hash
FROM documents GROUP BY md5(lower(text))
"""


def _signatures(docs: DataFrame) -> DataFrame:
    """doc_id → h0..h7 lexicographic-min md5 MinHash signature.

    Computed entirely per row: one ``transform`` hashes every shingle
    once, and one ``aggregate`` fold keeps 8 running string-mins (the 8
    seed orderings are cyclic nibble rotations of the single md5 digest —
    a bijection on digests, so min-over-rotated is a valid min-hash per
    seed; 8 salted md5 calls measured ~6× more CPU).  No ``array_distinct``:
    min() is insensitive to duplicate shingles.

    This replaced an explode + groupBy(doc_id).agg(min×8) pipeline
    (round 11).  ``min`` over strings cannot use HashAggregate's
    fixed-width buffer, so that shape planned as Sort → SortAggregate →
    Exchange → Sort → SortAggregate: the whole exploded shingle stream
    (docs × shingles rows) was sorted twice and shuffled once.  The
    per-row fold needs zero shuffle and zero sort — at 100 TB the
    signature pass is now embarrassingly parallel over scan splits.
    Measured at sf0.1 (noop sink, min over 5 runs on a steal-noisy box):
    0.63s explode+SortAggregate → 0.37s fold, with identical output
    verified row-for-row at sf0.01.

    Plumbing notes, all load-bearing:

    - Document tables arrive in few parquet splits (small files, wide
      text rows), so the CPU-heavy md5 fold would inherit single-split
      scan parallelism; the round-robin repartition to the core count
      spreads it.
    - ``explode(array(sig))`` is a projection barrier: selecting the 8
      struct fields straight off the fold expression lets Catalyst's
      CollapseProject inline the whole fold into each of the 8 field
      extractions (8× the md5 work).  A Generate node cannot be
      collapsed into, so the fold runs once and field extraction is
      free.  (An earlier attempt that kept a HOF *inside* the
      whole-stage-codegen'd explode stage was JIT-unstable — 12s → 914s
      swings; this shape keeps the HOFs in their own interpreted
      projection and benched flat across repeated runs.)
    - Docs with < 3 tokens have no shingles and must vanish, exactly as
      they did when explode produced no rows for them: the fold's init
      is a sentinel above every 32-char hex digest, and a NULL text
      yields a NULL fold result, so one filter on h0 drops both.
    """
    n_parts = docs.sparkSession.sparkContext.defaultParallelism
    sentinel = "z" * 33  # lexicographically above any md5 hex digest

    def rot(m: Column, s: int) -> Column:
        if s == 0:
            return m
        return F.concat(
            F.substring(m, 4 * s + 1, 32 - 4 * s), F.substring(m, 1, 4 * s)
        )

    init = F.struct(*[F.lit(sentinel).alias(f"h{s}") for s in range(K_MINHASH)])
    hashes = F.transform(
        F.regexp_extract_all(F.col("text"), F.lit(_SHINGLE_RX), 1),
        lambda sh: F.md5(sh),
    )
    sig = F.aggregate(
        hashes,
        init,
        lambda acc, m: F.struct(
            *[F.least(acc[f"h{s}"], rot(m, s)).alias(f"h{s}") for s in range(K_MINHASH)]
        ),
    )
    return (
        docs.repartition(n_parts)
        .select("doc_id", F.explode(F.array(sig)).alias("sig"))
        .select(
            "doc_id", *[F.col(f"sig.h{s}").alias(f"h{s}") for s in range(K_MINHASH)]
        )
        .filter(F.col("h0") != sentinel)
    )


def minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH near-duplicate candidate pairs with estimated Jaccard.

    shingle → k minhashes → band keys → equi-join per band → distinct pairs
    with signature agreement as the Jaccard estimate.  The band join
    replaces the all-pairs comparison: only docs sharing a full band
    collide.

    Plan shape — no self-join: docs sharing a band key are *grouped into a
    bucket* (one shuffle by (band, key)), and candidate pairs are
    enumerated within each bucket from the collected (doc_id, signature)
    structs.  The expensive signature relation is therefore computed
    exactly once, and the pair Jaccard estimate is a zip_with over arrays
    already in the bucket — no re-join.  Bucket sizes are capped: an LSH
    bucket that collects half the corpus (degenerate key) would otherwise
    go quadratic; real pipelines treat such buckets as "everything here
    is identical" and sample.  At 100 TB: one signature pass + one narrow
    (band, key) shuffle of 5-number structs, nothing quadratic.
    """
    max_bucket = 256  # pair-enumeration cap per LSH bucket
    docs = _t(spark, sf_dir, "documents")
    sig = _signatures(docs)
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.concat(
                    *[F.col(f"h{b * BAND_ROWS + r}") for r in range(BAND_ROWS)]
                ).alias("key"),
            )
            for b in range(K_MINHASH // BAND_ROWS)
        ]
    )
    member = F.struct("doc_id", *[f"h{s}" for s in range(K_MINHASH)])
    bands = sig.select(member.alias("m"), F.explode(band_structs).alias("bk")).select(
        "m", F.col("bk.band").alias("band"), F.col("bk.key").alias("key")
    )
    # Two-level (band, key, salt) pre-bucket (guide §2.5 two-level
    # aggregation): collect_list's partial aggregation still ships every
    # member struct of a degenerate bucket (a pile of identical docs) to
    # ONE reducer before the slice caps it.  Salting by doc_id first
    # bounds any single task's collected state to max_bucket structs per
    # salt; the merge level keeps the max_bucket smallest doc_ids
    # overall — identical to the unsalted slice, because each salt
    # retains at least its members among the global smallest max_bucket.
    # Costs one extra narrow exchange of ≤ max_bucket·_BUCKET_SALTS rows
    # per bucket.
    salted = (
        bands.groupBy("band", "key", F.pmod(F.xxhash64("m.doc_id"), F.lit(_BUCKET_SALTS)).alias("salt"))
        .agg(F.slice(F.sort_array(F.collect_list("m")), 1, max_bucket).alias("pms"))
    )
    buckets = (
        salted.groupBy("band", "key")
        .agg(
            F.slice(
                F.array_sort(F.flatten(F.collect_list("pms"))), 1, max_bucket
            ).alias("ms")
        )
        .filter(F.size("ms") >= 2)
    )
    # all i<j pairs within the bucket (members sorted by doc_id, so the
    # (a, b) orientation is doc_a < doc_b by construction).  The pair
    # structs carry only plain fields — NO per-pair arithmetic inside the
    # interpreted HOF: the signature-agreement sum runs *after* the
    # distinct as a codegen'd 8-column comparison.  (Computing the
    # agreement per in-bucket pair with zip_with/aggregate was a 30×
    # blowup on a 10× duplicate-heavy scale probe: duplicate corpora fill
    # every bucket with copies, and each pre-distinct pair paid an
    # interpreted 8-element fold.)
    pair_list = F.flatten(
        F.transform(
            F.col("ms"),
            lambda a, i: F.transform(
                F.slice(F.col("ms"), i + 2, F.size(F.col("ms"))),
                lambda b: F.struct(
                    a["doc_id"].alias("doc_a"),
                    b["doc_id"].alias("doc_b"),
                    *[a[f"h{s}"].alias(f"a{s}") for s in range(K_MINHASH)],
                    *[b[f"h{s}"].alias(f"b{s}") for s in range(K_MINHASH)],
                ),
            ),
        )
    )
    agreement = sum(
        F.when(F.col(f"pr.a{s}") == F.col(f"pr.b{s}"), 1).otherwise(0)
        for s in range(K_MINHASH)
    )
    return (
        buckets.select(F.explode(pair_list).alias("pr"))
        .select(
            F.col("pr.doc_a").alias("doc_a"),
            F.col("pr.doc_b").alias("doc_b"),
            (agreement.cast("double") / F.lit(float(K_MINHASH))).alias("est_jaccard"),
        )
        .distinct()
    )


_SIG_CTE = """
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
), shingles AS (
  SELECT doc_id,
         unnest(list_distinct(list_transform(
           generate_series(1, len(t) - 2),
           i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))) AS sh
  FROM toks WHERE len(t) >= 3
), hashed AS (
  SELECT doc_id, md5(sh) AS m FROM shingles
), sig AS (
  SELECT doc_id,
    min(m) AS h0,
    min(substr(m,  5, 28) || substr(m, 1,  4)) AS h1,
    min(substr(m,  9, 24) || substr(m, 1,  8)) AS h2,
    min(substr(m, 13, 20) || substr(m, 1, 12)) AS h3,
    min(substr(m, 17, 16) || substr(m, 1, 16)) AS h4,
    min(substr(m, 21, 12) || substr(m, 1, 20)) AS h5,
    min(substr(m, 25,  8) || substr(m, 1, 24)) AS h6,
    min(substr(m, 29,  4) || substr(m, 1, 28)) AS h7
  FROM hashed GROUP BY doc_id
)
"""

_MINHASH_BODY = """
, bands AS (
  SELECT doc_id, 0 AS band, h0||h1 AS key FROM sig
  UNION ALL SELECT doc_id, 1, h2||h3 FROM sig
  UNION ALL SELECT doc_id, 2, h4||h5 FROM sig
  UNION ALL SELECT doc_id, 3, h6||h7 FROM sig
), pairs AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
)"""

_MINHASH_SELECT = """
SELECT doc_a, doc_b,
       ((CASE WHEN sa.h0=sb.h0 THEN 1 ELSE 0 END) + (CASE WHEN sa.h1=sb.h1 THEN 1 ELSE 0 END) +
        (CASE WHEN sa.h2=sb.h2 THEN 1 ELSE 0 END) + (CASE WHEN sa.h3=sb.h3 THEN 1 ELSE 0 END) +
        (CASE WHEN sa.h4=sb.h4 THEN 1 ELSE 0 END) + (CASE WHEN sa.h5=sb.h5 THEN 1 ELSE 0 END) +
        (CASE WHEN sa.h6=sb.h6 THEN 1 ELSE 0 END) + (CASE WHEN sa.h7=sb.h7 THEN 1 ELSE 0 END)
       ) / CAST(8 AS DOUBLE) AS est_jaccard
FROM pairs
JOIN sig sa ON pairs.doc_a = sa.doc_id
JOIN sig sb ON pairs.doc_b = sb.doc_id
"""

MINHASH_LSH_SQL = _SIG_CTE + _MINHASH_BODY + _MINHASH_SELECT


def exact_jaccard_for_pairs(
    docs: DataFrame, pairs: DataFrame, threshold: float,
    keep: tuple[str, ...] = (),
) -> DataFrame:
    """Exact shingle-Jaccard for an explicit candidate-pair set — the
    O(candidates) verification primitive every blocking scheme feeds.
    ``pairs`` needs (doc_a, doc_b); extra columns named in ``keep`` pass
    through.  O(shingles) per pair via array_intersect on the two
    (small) shingle sets; the joins are candidate-sized, never corpus²."""
    sh = docs.select("doc_id", _shingles(F.col("text")).alias("sh"))
    a = sh.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a"))
    b = sh.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    return (
        pairs.join(a, "doc_a")
        .join(b, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            *keep,
            (inter.cast("double") / union).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def lsh_verified_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full production dedup pipeline: MinHash-LSH candidate pairs →
    exact shingle-Jaccard verification on the candidates only.

    This is the composition the other operators exist for: the band join
    bounds the candidate set (nothing quadratic), and the exact check
    runs on candidates alone, never all pairs.  At 100 TB this is one
    signature pass, one narrow band shuffle, and a candidate-sized join
    back to the shingle relation.
    """
    docs = _t(spark, sf_dir, "documents")
    cand = minhash_lsh_pairs(spark, sf_dir)
    return exact_jaccard_for_pairs(docs, cand, 0.6, keep=("est_jaccard",))


LSH_VERIFIED_SQL = (
    _SIG_CTE
    + _MINHASH_BODY
    + ", cand AS ("
    + _MINHASH_SELECT
    + """
), shset AS (
  SELECT doc_id, list_distinct(list_transform(
           generate_series(1, len(t) - 2),
           i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS sh
  FROM toks WHERE len(t) >= 3
)
SELECT c.doc_a, c.doc_b, c.est_jaccard,
       CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
         / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) AS jaccard
FROM cand c
JOIN shset a ON c.doc_a = a.doc_id
JOIN shset b ON c.doc_b = b.doc_id
WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
        / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) >= 0.6
"""
)


def ngram_jaccard_pairs(
    spark: SparkSession, sf_dir: str,
    candidates: DataFrame | None = None, threshold: float = 0.1,
) -> DataFrame:
    """Exact 3-gram Jaccard over a candidate-pair set.

    The default candidate set is MinHash-LSH banding — the composition a
    100 TB corpus requires (nothing quadratic anywhere); pass
    ``candidates`` (doc_a, doc_b) to verify pairs from any other
    blocking scheme.  The all-pairs-within-``source`` spelling this
    operator used to default to lives on as ngram_jaccard_blocked, the
    O(block²) oracle twin.
    """
    docs = _t(spark, sf_dir, "documents")
    if candidates is None:
        candidates = minhash_lsh_pairs(spark, sf_dir).select("doc_a", "doc_b")
    return exact_jaccard_for_pairs(docs, candidates, threshold)


def ngram_jaccard_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-gram Jaccard for pairs blocked by ``source`` — the oracle
    twin of ngram_jaccard_pairs (O(pairs-within-block): verification
    semantics stated without LSH recall, at a cost only test scale can
    afford).

    |A∩B| via shingle equi-join, |A∪B| = |A|+|B|−|A∩B| — set sizes are
    exact integers so the similarity is cross-engine deterministic.
    """
    docs = _t(spark, sf_dir, "documents")
    sh = docs.select(
        "doc_id", "source", F.explode(_shingles(F.col("text"))).alias("sh")
    )
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.select(F.col("doc_id").alias("doc_a"), "source", "sh")
    b = sh.select(F.col("doc_id").alias("doc_b"), F.col("source").alias("source_b"), F.col("sh").alias("sh_b"))
    inter = (
        a.join(b, (F.col("source") == F.col("source_b")) & (F.col("sh") == F.col("sh_b")))
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("nb"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            (
                F.col("n_inter").cast("double")
                / (F.col("na") + F.col("nb") - F.col("n_inter"))
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= 0.1)
    )


NGRAM_JACCARD_SQL = (
    _SIG_CTE.replace(", sig AS (", ", _unused_sig AS (")  # reuse toks/shingles CTEs
    + """
, sh2 AS (
  SELECT s.doc_id, d.source, s.sh FROM shingles s JOIN documents d USING (doc_id)
), sizes AS (
  SELECT doc_id, count(*) AS n_sh FROM sh2 GROUP BY doc_id
), inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
  FROM sh2 a JOIN sh2 b ON a.source = b.source AND a.sh = b.sh AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b,
       CAST(n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - n_inter) AS jaccard
FROM inter
JOIN sizes sa ON doc_a = sa.doc_id
JOIN sizes sb ON doc_b = sb.doc_id
WHERE CAST(n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - n_inter) >= 0.1
"""
)


NGRAM_LSH_VERIFIED_SQL = (
    _SIG_CTE
    + _MINHASH_BODY
    + ", cand AS ("
    + _MINHASH_SELECT
    + """
), shset AS (
  SELECT doc_id, list_distinct(list_transform(
           generate_series(1, len(t) - 2),
           i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS sh
  FROM toks WHERE len(t) >= 3
)
SELECT c.doc_a, c.doc_b,
       CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
         / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) AS jaccard
FROM cand c
JOIN shset a ON c.doc_a = a.doc_id
JOIN shset b ON c.doc_b = b.doc_id
WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
        / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) >= 0.1
"""
)


SIMHASH_BITS = 60  # 15 md5 hex chars — representable exactly in both engines


def simhash64(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash per document (Charikar): per-token hash, sum signed bit
    contributions, sign → fingerprint bits; plus the 16-bit prefix bucket
    used for near-dup blocking.

    The token hash is the first 15 hex chars of md5 read as a 60-bit int
    (``conv(substr(md5(t),1,15),16,10)``) — identical in any engine, so
    the whole fingerprint is oracle-checkable (DuckDB folds the same hex
    digits).  Pure built-ins: explode → bit ops → groupBy with map-side
    combine; one shuffle of 60 small ints per doc.
    """
    docs = _t(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(F.array_distinct(_tokens(F.col("text")))).alias("tok"))
    h = F.conv(F.substring(F.md5("tok"), 1, 15), 16, 10).cast("long")
    bit_contribs = [
        F.sum(
            F.when(F.shiftright(h, b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"b{b}")
        for b in range(SIMHASH_BITS)
    ]
    per_doc = tok.groupBy("doc_id").agg(*bit_contribs)
    fingerprint = sum(
        F.when(F.col(f"b{b}") > 0, F.lit(2 ** b).cast("long")).otherwise(F.lit(0).cast("long"))
        for b in range(SIMHASH_BITS)
    )
    return per_doc.select(
        "doc_id",
        fingerprint.alias("simhash"),
        F.shiftrightunsigned(fingerprint, SIMHASH_BITS - 16).alias("bucket16"),
    )


def _simhash_oracle_sql() -> str:
    bit_sums = ",\n         ".join(
        f"sum(CASE WHEN (hv >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS b{b}"
        for b in range(SIMHASH_BITS)
    )
    fingerprint = " + ".join(
        f"(CASE WHEN b{b} > 0 THEN CAST({2 ** b} AS BIGINT) ELSE 0 END)"
        for b in range(SIMHASH_BITS)
    )
    return f"""
WITH tok AS (
  SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS tok
  FROM documents
), h AS (
  SELECT doc_id,
         CAST(list_reduce(list_transform(generate_series(1, 15),
              i -> CAST(strpos('0123456789abcdef', substr(md5(tok), i, 1)) - 1 AS BIGINT)),
              (a, b) -> a * 16 + b) AS BIGINT) AS hv
  FROM tok
), bits AS (
  SELECT doc_id,
         {bit_sums}
  FROM h GROUP BY doc_id
), fp AS (
  SELECT doc_id, {fingerprint} AS simhash FROM bits
)
SELECT doc_id, simhash, simhash >> {SIMHASH_BITS - 16} AS bucket16 FROM fp
"""


def cosine_for_pairs(
    emb: DataFrame, pairs: DataFrame, threshold: float,
    keep: tuple[str, ...] = (),
) -> DataFrame:
    """Exact fixed-point cosine for an explicit candidate-pair set — the
    O(candidates) verification primitive every embedding blocking scheme
    feeds.  ``pairs`` needs (vec_a, vec_b); extra columns in ``keep``
    pass through.  Scoring is one Arrow batch of elementwise int64
    products per partition (the pipeline/similarity.py kernel) — no
    CodegenFallback HOFs, candidate embeddings cross Arrow once."""
    import numpy as np
    import pandas as pd

    from facebook_presto_spark.pipeline.similarity import _fixed_point

    # no annotations: `from __future__ import annotations` turns them
    # into strings pandas_udf can't resolve — returnType says it all
    @F.pandas_udf("double")
    def cos(ea, eb):
        if not len(ea):
            return pd.Series([], dtype="float64")
        XA = _fixed_point(np.stack(ea.to_numpy()))
        XB = _fixed_point(np.stack(eb.to_numpy()))
        dots = (XA * XB).sum(axis=1)                # exact int64
        na = np.sqrt((XA * XA).sum(axis=1).astype(np.float64))
        nb = np.sqrt((XB * XB).sum(axis=1).astype(np.float64))
        return pd.Series(dots.astype(np.float64) / (na * nb))

    a = emb.select(F.col("vec_id").alias("vec_a"), F.col("embedding").alias("emb_a"))
    b = emb.select(F.col("vec_id").alias("vec_b"), F.col("embedding").alias("emb_b"))
    return (
        pairs.join(a, "vec_a")
        .join(b, "vec_b")
        .select("vec_a", "vec_b", *keep, cos("emb_a", "emb_b").alias("cosine"))
        .filter(F.col("cosine") >= threshold)
    )


EMB_DEDUP_TABLES = 6       # sign-LSH hash tables for corpus-wide near-dup
EMB_NEARDUP_THRESHOLD = 0.4


def _lsh_bits(n_rows: int) -> int:
    """Sign bits per hash table for corpus size ``n_rows``: enough that
    expected bucket occupancy stays ~8, so candidate pairs per row are
    O(1) and total candidates grow *linearly* with the corpus (a fixed
    width goes quadratic as buckets saturate — the 10× scale probe
    catches exactly that)."""
    import math

    return max(4, math.ceil(math.log2(max(2.0, n_rows / 8))))


def embedding_neardup_pairs(
    spark: SparkSession, sf_dir: str,
    candidates: DataFrame | None = None,
    threshold: float = EMB_NEARDUP_THRESHOLD,
) -> DataFrame:
    """Embedding-cosine near-duplicates over a candidate-pair set.

    The default candidate set is corpus-wide sign-LSH: bands whose bit
    width scales with corpus size (see _lsh_bits), self-joined on
    (table, bucket) — candidates grow linearly, never corpus².  Pass
    ``candidates`` (vec_a, vec_b) to verify pairs from any other
    blocking scheme (IVF lists, an ANN index, …).  The all-pairs-within-
    ``label`` spelling this operator used to default to lives on as
    embedding_neardup_blocked, the O(block²) oracle twin."""
    from facebook_presto_spark.pipeline.similarity import sign_lsh_bands

    emb = _t(spark, sf_dir, "embeddings")
    if candidates is None:
        bits = _lsh_bits(emb.count())
        bands = sign_lsh_bands(emb, EMB_DEDUP_TABLES, bits)
        a = bands.select(F.col("vec_id").alias("vec_a"), "t", "bucket")
        b = bands.select(F.col("vec_id").alias("vec_b"), "t", "bucket")
        candidates = (
            a.join(b, ["t", "bucket"])
            .filter(F.col("vec_a") < F.col("vec_b"))
            .select("vec_a", "vec_b")
            .distinct()
        )
    return cosine_for_pairs(emb, candidates, threshold)


def embedding_neardup_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicates, all pairs within a ``label``
    block — the oracle twin of embedding_neardup_pairs (exact semantics
    without LSH recall, at a cost only test scale can afford)."""
    emb = _t(spark, sf_dir, "embeddings")
    a = emb.select(F.col("vec_id").alias("vec_a"), "label")
    b = emb.select(F.col("vec_id").alias("vec_b"), F.col("label").alias("label_b"))
    pairs = (
        a.join(b, (F.col("label") == F.col("label_b")) & (F.col("vec_a") < F.col("vec_b")))
        .select("vec_a", "vec_b", "label")
    )
    return cosine_for_pairs(emb, pairs, 0.25, keep=("label",))


_EMB_NORM_CTES = f"""ei AS (
  SELECT vec_id, label, list_transform(embedding,
         x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS xi
  FROM embeddings
), e AS (
  SELECT vec_id, label, xi,
         CAST(list_sum(list_transform(xi, v -> v * v)) AS BIGINT) AS norm_int
  FROM ei
)"""

_PAIR_COSINE = """CAST(list_sum(list_transform(generate_series(1, len(a.xi)),
            i -> a.xi[i] * b.xi[i])) AS BIGINT)
         / (sqrt(a.norm_int) * sqrt(b.norm_int))"""


EMBEDDING_NEARDUP_SQL = f"""
WITH {_EMB_NORM_CTES}
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, a.label AS label,
       {_PAIR_COSINE} AS cosine
FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
WHERE {_PAIR_COSINE} >= 0.25
"""


def _embedding_lsh_oracle_sql() -> str:
    """Mirror of embedding_neardup_pairs' default path at the driver's
    sf0.01 corpus size (n=500 → _lsh_bits=6); the literal hyperplane
    family is shared with pipeline/similarity.py."""
    from facebook_presto_spark.pipeline.similarity import sign_lsh_bands_sql

    bits = _lsh_bits(500)
    return f"""
WITH {sign_lsh_bands_sql(EMB_DEDUP_TABLES, bits)}, pairs AS (
  SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
  FROM bands a JOIN bands b
    ON a.t = b.t AND a.bucket = b.bucket AND a.vec_id < b.vec_id
), {_EMB_NORM_CTES}
SELECT p.vec_a, p.vec_b, {_PAIR_COSINE} AS cosine
FROM pairs p JOIN e a ON p.vec_a = a.vec_id JOIN e b ON p.vec_b = b.vec_id
WHERE {_PAIR_COSINE} >= {EMB_NEARDUP_THRESHOLD}
"""


def connected_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-cluster resolution: connected components over the LSH
    near-duplicate pair graph, by iterative min-label propagation.

    The pair list from MinHash-LSH is a *graph*; production dedup keeps
    one canonical document per connected component, not per pair.  Labels
    start as each vertex's own id; each round every vertex takes the min
    of its label and its neighbors' labels; at fixpoint the label is the
    component's minimum doc_id — a deterministic canonical
    representative.

    Scale shape: each round is ONE shuffle (edges ⋈ labels, groupBy
    min) and converges in O(graph diameter) rounds — near-dup graphs are
    unions of small cliques, so diameter is tiny; the loop is bounded and
    exits early via an aggregated changed-count (never collects data to
    the driver).  Labels persist per round and unpersist after, keeping
    lineage flat.  (The alternating large-star/small-star variant halves
    rounds on adversarial chains; unnecessary for clique-like graphs.)
    """
    pairs = (
        minhash_lsh_pairs(spark, sf_dir)
        .filter(F.col("est_jaccard") >= 0.5)
        .select("doc_a", "doc_b")
        .distinct()
    )
    edges = pairs.union(
        pairs.select(F.col("doc_b").alias("doc_a"), F.col("doc_a").alias("doc_b"))
    ).persist()
    labels = (
        edges.select(F.col("doc_a").alias("id"))
        .distinct()
        .select("id", F.col("id").alias("comp"))
        .persist()
    )
    prev_sum = labels.agg(F.sum("comp")).first()[0]
    for _ in range(20):
        nb_min = (
            edges.join(
                labels.select(
                    F.col("id").alias("doc_b"), F.col("comp").alias("nb_comp")
                ),
                "doc_b",
            )
            .groupBy("doc_a")
            .agg(F.min("nb_comp").alias("nb_min"))
            .select(F.col("doc_a").alias("id"), "nb_min")
        )
        new_labels = (
            labels.join(nb_min, "id", "left")
            .select(
                "id",
                F.least(F.col("comp"), F.coalesce("nb_min", F.col("comp"))).alias("comp"),
            )
            .persist()
        )
        # labels only ever decrease, so the label sum is strictly
        # monotone until fixpoint — one aggregate action per round
        # instead of a self-join diff
        new_sum = new_labels.agg(F.sum("comp")).first()[0]
        labels.unpersist()
        labels = new_labels
        if new_sum == prev_sum:
            break
        prev_sum = new_sum
    sizes = labels.groupBy("comp").agg(F.count(F.lit(1)).alias("comp_size"))
    return (
        labels.join(sizes, "comp")
        .select(F.col("id").alias("doc_id"), F.col("comp").alias("component"), "comp_size")
    )


CONNECTED_COMPONENTS_SQL = (
    # the trailing `reach` CTE is recursive; DuckDB requires the WITH
    # chain to be declared RECURSIVE up front
    _SIG_CTE.replace("WITH toks", "WITH RECURSIVE toks", 1)
    + _MINHASH_BODY
    + ", cand AS ("
    + _MINHASH_SELECT
    + """
), fpairs AS (
  SELECT doc_a, doc_b FROM cand WHERE est_jaccard >= 0.5
), edges AS (
  SELECT doc_a AS s, doc_b AS d FROM fpairs
  UNION SELECT doc_b, doc_a FROM fpairs
), verts AS (
  SELECT DISTINCT s AS id FROM edges
), reach(id, r) AS (
  SELECT id, id FROM verts
  UNION
  SELECT e.s, reach.r FROM edges e JOIN reach ON reach.id = e.d
), comp AS (
  SELECT id AS doc_id, min(r) AS component FROM reach GROUP BY id
), sizes AS (
  SELECT component, count(*) AS comp_size FROM comp GROUP BY component
)
SELECT c.doc_id, c.component, s.comp_size
FROM comp c JOIN sizes s USING (component)
"""
)



def canonical_pick(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup end-game: per near-duplicate cluster, keep the best document.

    Composes the connected-components clusters with the text quality
    score and picks each component's survivor by (quality DESC, doc_id
    ASC) — the canonical-selection step a production dedup pipeline runs
    after cluster resolution (docs outside any cluster survive
    trivially, so only the graph's components are decided here).

    Scale shape: clusters and scores are both per-doc relations; the
    pick is a window group-limit (per-group heap), so nothing beyond
    (doc, component, score) ever shuffles.
    """
    from facebook_presto_spark.pipeline.text import quality_score

    comps = connected_components(spark, sf_dir)
    quality = quality_score(spark, sf_dir).select("doc_id", "quality")
    w = Window.partitionBy("component").orderBy(
        F.col("quality").desc(), F.col("doc_id").asc()
    )
    return (
        comps.join(quality, "doc_id")
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "component",
            F.col("doc_id").alias("survivor"),
            "comp_size",
            (F.col("comp_size") - 1).alias("n_dropped"),
        )
        .orderBy("component")
    )


CANONICAL_PICK_SQL = (
    CONNECTED_COMPONENTS_SQL.rsplit("SELECT c.doc_id", 1)[0]
    + """, q AS (
  SELECT doc_id,
         0.4 * (CASE WHEN len(string_split(text, ' ')) BETWEEN 20 AND 1000
                THEN 1.0 ELSE 0.0 END)
         + 0.3 * least(CAST(len(list_filter(string_split(text, ' '),
                    x -> list_contains(['the','a','of','to','and','in','is'], x))) AS DOUBLE)
                       / len(string_split(text, ' ')) * 5, 1.0)
         + 0.3 * (CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
                  / len(string_split(text, ' '))) AS quality
  FROM documents
), ranked AS (
  SELECT c.component, c.doc_id, s.comp_size,
         row_number() OVER (PARTITION BY c.component
                            ORDER BY q.quality DESC, c.doc_id ASC) AS rn
  FROM comp c JOIN sizes s USING (component) JOIN q USING (doc_id)
)
SELECT component, doc_id AS survivor, comp_size,
       comp_size - 1 AS n_dropped
FROM ranked WHERE rn = 1
ORDER BY component
"""
)

# --------------------------------------------------------------------------
# Semantic dedup (SemDeDup — Abbas et al., "SemDeDup: Data-efficient
# learning at web-scale through semantic deduplication", 2023):
# k-means-cluster the corpus embeddings, then search for near-duplicates
# only WITHIN each cluster — the pairwise work drops from corpus² to
# Σ cluster², and with k scaled ∝ N/target_cluster_size (same policy as
# `_lsh_bits`) it stays linear.  Survivor rule: lowest vec_id per
# near-dup neighborhood (deterministic, oracle-replayable).

SEM_SCALE = 127   # pair-test quantization: keeps 25·dot² and 4·na·nb
                  # exactly inside int64 at dim 64 (both engines compare
                  # the SAME integers — no float threshold ambiguity)
SEM_TAU_NUM, SEM_TAU_DEN = 4, 25   # τ² = 4/25 → τ = 0.4, the corpus's
                                   # planted near-dup threshold


def semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-cluster dedup summary: n_points / n_dup / n_kept, where a
    vector is a duplicate iff a LOWER-id vector in its k-means cluster
    has exact fixed-point cosine ≥ τ.  The within-cluster pair scoring
    is one int64 Gram matrix per cluster (vectorized matmul inside
    applyInPandas) — no pair explosion through a shuffle; the DuckDB
    oracle replays the identical Lloyd iterations (ml.kmeans_assign_ctes)
    and the identical integer cosine test."""
    import numpy as np
    import pandas as pd

    from facebook_presto_spark.pipeline.ml import _quantized, kmeans_fit
    from facebook_presto_spark.plans.tpch import _t

    emb = _t(spark, sf_dir, "embeddings")
    q = emb.select("vec_id", _quantized(F.col("embedding")).alias("qv"))
    assign = kmeans_fit(q).select("vec_id", "cluster")
    qs = emb.select(
        "vec_id",
        F.transform(
            "embedding",
            lambda v: F.round(v.cast("double") * SEM_SCALE).cast("long"),
        ).alias("qs"),
    )
    data = assign.join(qs, "vec_id").select("cluster", "vec_id", "qs")

    def per_cluster(pdf):
        order = np.argsort(pdf["vec_id"].to_numpy())
        ids = pdf["vec_id"].to_numpy()[order]
        X = np.array(pdf["qs"].tolist(), dtype=np.int64)[order]
        G = X @ X.T                       # ≤ 64·127² per cell — exact
        norms = (X * X).sum(axis=1)
        good = (G > 0) & (
            SEM_TAU_DEN * G * G >= SEM_TAU_NUM * np.outer(norms, norms)
        )
        dup = np.tril(good, -1).any(axis=1)   # lower-id neighbor exists
        return pd.DataFrame({
            "cluster": [int(pdf["cluster"].iloc[0])],
            "n_points": [len(ids)],
            "n_dup": [int(dup.sum())],
            "n_kept": [int(len(ids) - dup.sum())],
        })

    out = data.groupBy("cluster").applyInPandas(
        per_cluster, "cluster long, n_points long, n_dup long, n_kept long"
    )
    return out.orderBy("cluster")


def _semantic_dedup_oracle_sql() -> str:
    from facebook_presto_spark.pipeline.ml import _KM_DIM, kmeans_assign_ctes

    ctes, assign = kmeans_assign_ctes()
    return ctes + f""", qsmall AS (
  SELECT vec_id, CAST(i AS INTEGER) AS i,
         CAST(round(CAST(embedding[i+1] AS DOUBLE) * {SEM_SCALE}) AS BIGINT) AS v
  FROM embeddings, range({_KM_DIM}) t(i)
), nrm AS (
  SELECT vec_id, sum(v*v) AS nn FROM qsmall GROUP BY vec_id
), pr AS (
  SELECT a.cluster, a.vec_id AS ida, b.vec_id AS idb,
         sum(qa.v * qb.v) AS dot
  FROM {assign} a
  JOIN {assign} b ON a.cluster = b.cluster AND a.vec_id < b.vec_id
  JOIN qsmall qa ON qa.vec_id = a.vec_id
  JOIN qsmall qb ON qb.vec_id = b.vec_id AND qb.i = qa.i
  GROUP BY 1, 2, 3
), dup AS (
  SELECT DISTINCT p.cluster, p.idb
  FROM pr p
  JOIN nrm na ON na.vec_id = p.ida
  JOIN nrm nb ON nb.vec_id = p.idb
  WHERE p.dot > 0
    AND {SEM_TAU_DEN} * p.dot * p.dot >= {SEM_TAU_NUM} * na.nn * nb.nn
)
SELECT s.cluster, count(*) AS n_points,
       count(d.idb) AS n_dup,
       count(*) - count(d.idb) AS n_kept
FROM {assign} s
LEFT JOIN dup d ON d.cluster = s.cluster AND d.idb = s.vec_id
GROUP BY s.cluster ORDER BY s.cluster
"""


# --------------------------------------------------------------------------
# Exact substring dedup at every offset (the sliding-window form of
# Lee et al., "Deduplicating Training Data Makes Language Models
# Better", ACL 2022: mark any k-token span that occurs elsewhere in the
# corpus, at ANY alignment — the fixed-segment dedup above only catches
# block-aligned repeats).  Spark shape: per-token xxhash64, then every
# window's signature is a 31-polynomial fold over the k token hashes —
# pure codegen'd arithmetic, no window strings materialized (a k-token
# string blowup is a k× write amplification at 100 TB) — then ONE
# shuffle keyed by signature where row_number marks every non-first
# occurrence.  The DuckDB oracle groups by the actual window STRING, so
# the counts agree unless the 64-bit signature collides (2⁻⁶⁴·pairs).

SUBSTR_WINDOW = 12  # tokens per window


def substring_window_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    th = F.transform(F.split(F.col("text"), " "), lambda t: F.xxhash64(t))
    k = SUBSTR_WINDOW
    # sequence(1, 0) counts DOWN in Spark — short docs need an explicit
    # empty offset list, not a greatest() clamp
    offsets = F.when(
        F.size(th) >= k, F.sequence(F.lit(1), F.size(th) - (k - 1))
    ).otherwise(F.array().cast("array<int>"))
    wins = F.transform(
        offsets,
        lambda i: F.struct(
            i.alias("off"),
            F.aggregate(
                F.slice(th, i, k),
                F.lit(0).cast("long"),
                lambda acc, x: acc * 31 + x,
            ).alias("sig"),
        ),
    )
    exploded = docs.select(
        "doc_id", F.explode(wins).alias("w")
    ).select("doc_id", F.col("w.off").alias("off"), F.col("w.sig").alias("sig"))
    rn = F.row_number().over(
        Window.partitionBy("sig").orderBy("doc_id", "off")
    )
    marked = exploded.select("doc_id", "off", rn.alias("rn"))
    return (
        marked.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_windows"),
            F.count(F.when(F.col("rn") > 1, F.lit(1))).alias("n_dup_windows"),
        )
        .orderBy("doc_id")
    )


SUBSTRING_WINDOW_SQL = f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
), wins AS (
  SELECT doc_id,
         unnest(list_transform(
           generate_series(1, greatest(len(t) - {SUBSTR_WINDOW - 1}, 0)),
           i -> {{'off': i,
                  'w': array_to_string(list_slice(t, i, i + {SUBSTR_WINDOW - 1}), ' ')}}
         )) AS u
  FROM toks
), ranked AS (
  SELECT doc_id, u.off AS off,
         row_number() OVER (PARTITION BY u.w ORDER BY doc_id, u.off) AS rn
  FROM wins
)
SELECT doc_id, count(*) AS n_windows,
       count(*) FILTER (rn > 1) AS n_dup_windows
FROM ranked GROUP BY doc_id ORDER BY doc_id
"""


def substring_dedup_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The transformation form of sliding-window substring dedup (Lee
    et al. remove one copy of each duplicated span, keeping the first
    occurrence): every token covered by a non-first duplicate window is
    dropped and the document re-assembled from the survivors.  Plan:
    the same signature shuffle as the counting query, the dup windows
    explode to covered token positions (≤ k rows per dup window), one
    anti-join on (doc, pos), and a per-doc ordered re-assembly — two
    shuffles total, both keyed fine-grained.  Documents shorter than
    the window pass through untouched."""
    docs = _t(spark, sf_dir, "documents")
    k = SUBSTR_WINDOW
    th = F.transform(F.split(F.col("text"), " "), lambda t: F.xxhash64(t))
    offsets = F.when(
        F.size(th) >= k, F.sequence(F.lit(1), F.size(th) - (k - 1))
    ).otherwise(F.array().cast("array<int>"))
    wins = F.transform(
        offsets,
        lambda i: F.struct(
            i.alias("off"),
            F.aggregate(
                F.slice(th, i, k),
                F.lit(0).cast("long"),
                lambda acc, x: acc * 31 + x,
            ).alias("sig"),
        ),
    )
    exploded = docs.select("doc_id", F.explode(wins).alias("w")).select(
        "doc_id", F.col("w.off").alias("off"), F.col("w.sig").alias("sig")
    )
    rn = F.row_number().over(Window.partitionBy("sig").orderBy("doc_id", "off"))
    dup_positions = (
        exploded.select("doc_id", "off", rn.alias("rn"))
        .filter(F.col("rn") > 1)
        .select(
            "doc_id",
            F.explode(F.sequence(F.col("off"), F.col("off") + (k - 1))).alias(
                "pos"
            ),
        )
        .distinct()
    )
    tokens = docs.select(
        "doc_id", F.posexplode(F.split(F.col("text"), " ")).alias("p0", "tok")
    ).select("doc_id", (F.col("p0") + 1).alias("pos"), "tok")
    kept = tokens.join(dup_positions, ["doc_id", "pos"], "left_anti")
    return (
        kept.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens_after"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct(F.col("pos"), F.col("tok")))
                    ),
                    lambda s: s["tok"],
                ),
                " ",
            ).alias("cleaned"),
        )
        .orderBy("doc_id")
    )


SUBSTRING_CLEAN_SQL = f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
), wins AS (
  SELECT doc_id,
         unnest(list_transform(
           generate_series(1, greatest(len(t) - {SUBSTR_WINDOW - 1}, 0)),
           i -> {{'off': i,
                  'w': array_to_string(list_slice(t, i, i + {SUBSTR_WINDOW - 1}), ' ')}}
         )) AS u
  FROM toks
), ranked AS (
  SELECT doc_id, u.off AS off,
         row_number() OVER (PARTITION BY u.w ORDER BY doc_id, u.off) AS rn
  FROM wins
), dup_pos AS (
  SELECT DISTINCT doc_id, unnest(generate_series(off, off + {SUBSTR_WINDOW - 1})) AS pos
  FROM ranked WHERE rn > 1
), tokens AS (
  SELECT doc_id, i AS pos, t[i] AS tok
  FROM toks, LATERAL (SELECT unnest(generate_series(1, len(t))) AS i) g
), kept AS (
  SELECT tk.doc_id, tk.pos, tk.tok
  FROM tokens tk
  WHERE NOT EXISTS (
    SELECT 1 FROM dup_pos d WHERE d.doc_id = tk.doc_id AND d.pos = tk.pos
  )
)
SELECT doc_id, count(*) AS n_tokens_after,
       string_agg(tok, ' ' ORDER BY pos) AS cleaned
FROM kept GROUP BY doc_id ORDER BY doc_id
"""


QUERIES = {
    "dedup_exact": exact_dedup,
    "dedup_substring_windows": substring_window_dedup,
    "dedup_substring_clean": substring_dedup_clean,
    "dedup_semantic": semantic_dedup,
    "dedup_minhash_lsh": minhash_lsh_pairs,
    "dedup_connected_components": connected_components,
    "dedup_canonical_pick": canonical_pick,
    "dedup_lsh_verified": lsh_verified_pairs,
    "dedup_ngram_jaccard": ngram_jaccard_blocked,
    "dedup_ngram_lsh_verified": ngram_jaccard_pairs,
    "dedup_simhash": simhash64,
    "dedup_embedding_cosine": embedding_neardup_blocked,
    "dedup_embedding_lsh_verified": embedding_neardup_pairs,
}

ORACLE = {
    "dedup_exact": EXACT_DEDUP_SQL,
    "dedup_substring_windows": SUBSTRING_WINDOW_SQL,
    "dedup_substring_clean": SUBSTRING_CLEAN_SQL,
    "dedup_semantic": _semantic_dedup_oracle_sql(),
    "dedup_minhash_lsh": MINHASH_LSH_SQL,
    "dedup_connected_components": CONNECTED_COMPONENTS_SQL,
    "dedup_canonical_pick": CANONICAL_PICK_SQL,
    "dedup_lsh_verified": LSH_VERIFIED_SQL,
    "dedup_ngram_jaccard": NGRAM_JACCARD_SQL,
    "dedup_ngram_lsh_verified": NGRAM_LSH_VERIFIED_SQL,
    "dedup_simhash": _simhash_oracle_sql(),
    "dedup_embedding_cosine": EMBEDDING_NEARDUP_SQL,
    "dedup_embedding_lsh_verified": _embedding_lsh_oracle_sql(),
}
