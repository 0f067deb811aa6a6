"""Corpus-curation operators — the training-data pipeline stages between
raw documents and a tokenized training mix.

The reference stops at SQL analytics; these are the extension operators a
100 TB LLM-data pipeline runs after text analysis (pipeline/text.py) and
dedup (pipeline/dedup.py):

- Gopher-style repetition quality gates (Rae et al. 2021 §A1.1 — the
  public "fraction of characters in the most common 2-gram / in
  duplicated 3-grams" rules)
- deterministic mixture (stratified per-source) sampling
- concat-and-chunk sequence packing (the pretraining batch layout:
  documents concatenated per stream, cut into fixed token windows)
- segment-level exact dedup (paragraph dedup specialized to fixed
  8-token segments, the corpus having no newlines)
- PII scrubbing (email / IPv4 / phone redaction)

Everything is built-in expressions + window functions — whole-stage
codegen, no Python in the data path.  Shuffle inventory per operator is
stated in its docstring; nothing here is quadratic and every shuffle key
is high-cardinality (doc_id / n-gram / segment hash / source stream).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from facebook_presto_spark.plans.tpch import _t

# ---------------------------------------------------------------------------
# Gopher repetition gates
# ---------------------------------------------------------------------------

GOPHER_TOP2_MAX = 0.20   # Gopher table A1: top-2-gram char fraction
GOPHER_DUP3_MAX = 0.30   # duplicated-3-gram char fraction (their 0.18 is
                         # for 5-grams; 0.30 keeps the synthetic corpus split)


def gopher_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document repetition metrics + keep flag.

    Plan: posexplode tokens (narrow), n-grams via window ``lead`` keyed by
    doc_id, then one shuffle keyed by (doc_id, n, gram) for the gram
    counts and one window + final agg keyed by (doc_id, n) — all
    high-cardinality keys, linear in corpus token count.  The lead-window
    form (rather than a transform/sequence higher-order chain) keeps the
    n-gram build inside whole-stage codegen: HOF expressions are
    CodegenFallback and measured 20× slower here (cf. the identical
    finding in pipeline/dedup.py::_signatures).  Map-side partial
    aggregation absorbs within-partition duplicates, so the count shuffle
    carries ~distinct-gram rows, not token rows.
    """
    docs = _t(spark, sf_dir, "documents")
    tok_rows = docs.select(
        "doc_id", F.posexplode(F.split(F.col("text"), " ")).alias("idx", "tok")
    )
    w = W.partitionBy("doc_id").orderBy("idx")
    t1 = F.lead("tok", 1).over(w)
    t2 = F.lead("tok", 2).over(w)
    with_leads = tok_rows.select(
        "doc_id",
        F.when(
            t1.isNotNull(),
            F.struct(F.lit(2).alias("n"),
                     F.concat_ws(" ", F.col("tok"), t1).alias("gram")),
        ).alias("g2"),
        F.when(
            t2.isNotNull(),
            F.struct(F.lit(3).alias("n"),
                     F.concat_ws(" ", F.col("tok"), t1, t2).alias("gram")),
        ).alias("g3"),
    )
    exploded = (
        with_leads.select(
            "doc_id", F.explode(F.array("g2", "g3")).alias("g")
        )
        .filter(F.col("g").isNotNull())
        .select("doc_id", F.col("g.n").alias("n"), F.col("g.gram").alias("gram"))
    )

    counts = exploded.groupBy("doc_id", "n", "gram").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    rn = F.row_number().over(
        W.partitionBy("doc_id", "n").orderBy(F.desc("cnt"), F.desc("gram"))
    )
    mass = F.col("cnt") * F.length("gram")
    per = (
        counts.withColumn("rn", rn)
        .groupBy("doc_id", "n")
        .agg(
            F.sum(mass).alias("mass"),
            F.sum(F.when(F.col("cnt") > 1, mass).otherwise(0)).alias("dup_mass"),
            F.sum(F.when(F.col("rn") == 1, mass).otherwise(0)).alias("top_mass"),
        )
    )
    top2 = F.max(F.when(F.col("n") == 2, F.col("top_mass") / F.col("mass")))
    dup3 = F.max(F.when(F.col("n") == 3, F.col("dup_mass") / F.col("mass")))
    return (
        per.groupBy("doc_id")
        .agg(top2.alias("top_bigram_frac"), dup3.alias("dup_trigram_frac"))
        .select(
            "doc_id",
            "top_bigram_frac",
            "dup_trigram_frac",
            (
                (F.col("top_bigram_frac") <= GOPHER_TOP2_MAX)
                & (F.col("dup_trigram_frac") <= GOPHER_DUP3_MAX)
            ).alias("keep"),
        )
    )


GOPHER_REPETITION_SQL = f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
), grams AS (
  SELECT doc_id, 2 AS n,
         unnest(list_transform(generate_series(1, len(t) - 1),
                               i -> t[i] || ' ' || t[i+1])) AS gram
  FROM toks
  UNION ALL
  SELECT doc_id, 3,
         unnest(list_transform(generate_series(1, len(t) - 2),
                               i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))
  FROM toks
), counts AS (
  SELECT doc_id, n, gram, count(*) AS cnt FROM grams GROUP BY 1, 2, 3
), ranked AS (
  SELECT *, row_number() OVER (PARTITION BY doc_id, n
                               ORDER BY cnt DESC, gram DESC) AS rn
  FROM counts
), per AS (
  SELECT doc_id, n,
         sum(cnt * length(gram)) AS mass,
         sum(CASE WHEN cnt > 1 THEN cnt * length(gram) ELSE 0 END) AS dup_mass,
         sum(CASE WHEN rn = 1 THEN cnt * length(gram) ELSE 0 END) AS top_mass
  FROM ranked GROUP BY 1, 2
)
SELECT doc_id,
       max(CASE WHEN n = 2 THEN CAST(top_mass AS DOUBLE) / mass END) AS top_bigram_frac,
       max(CASE WHEN n = 3 THEN CAST(dup_mass AS DOUBLE) / mass END) AS dup_trigram_frac,
       (max(CASE WHEN n = 2 THEN CAST(top_mass AS DOUBLE) / mass END) <= {GOPHER_TOP2_MAX}
        AND max(CASE WHEN n = 3 THEN CAST(dup_mass AS DOUBLE) / mass END) <= {GOPHER_DUP3_MAX}) AS keep
FROM per GROUP BY doc_id
"""

# ---------------------------------------------------------------------------
# Mixture sampling
# ---------------------------------------------------------------------------

# target sampling rate per source stream (the "data mixture" spec);
# unlisted sources fall back to the default rate.
MIXTURE_RATES = {"src0": 1.0, "src1": 0.75, "src2": 0.5, "src3": 0.25}
MIXTURE_DEFAULT = 0.10
_KNUTH = 2654435761


def mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified mixture sampling by ``source``.

    The per-row keep test is the same key-mod trick as
    ``deterministic_sample`` (ImplementBernoulliSampleAsFilter.java
    rewrites sampling as a per-row filter) with a per-stratum threshold —
    a narrow filter, zero shuffles until the tiny per-source audit
    aggregate.  At 100 TB this is the whole job: no repartition, no
    collect, the mixture spec is a literal CASE expression.
    """
    docs = _t(spark, sf_dir, "documents")
    rate = F.lit(MIXTURE_DEFAULT)
    for src, r in sorted(MIXTURE_RATES.items()):
        rate = F.when(F.col("source") == src, F.lit(r)).otherwise(rate)
    keep = (F.col("doc_id") * _KNUTH % 1000) < (rate * 1000).cast("bigint")
    return (
        docs.select("doc_id", "source", keep.alias("keep"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.sum(F.col("keep").cast("bigint")).alias("n_kept"),
            F.sum(F.when(F.col("keep"), F.col("doc_id")).otherwise(0)).alias(
                "kept_id_sum"
            ),
        )
    )


_RATE_SQL = "CASE " + " ".join(
    f"WHEN source = '{s}' THEN {r}" for s, r in sorted(MIXTURE_RATES.items())
) + f" ELSE {MIXTURE_DEFAULT} END"

MIXTURE_SAMPLE_SQL = f"""
WITH flagged AS (
  SELECT doc_id, source,
         (doc_id * {_KNUTH}) % 1000 < CAST(({_RATE_SQL}) * 1000 AS BIGINT) AS keep
  FROM documents
)
SELECT source, count(*) AS n_total,
       CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       CAST(sum(CASE WHEN keep THEN doc_id ELSE 0 END) AS BIGINT) AS kept_id_sum
FROM flagged GROUP BY source
"""

# ---------------------------------------------------------------------------
# Sequence packing
# ---------------------------------------------------------------------------

PACK_BUDGET = 2048  # tokens per training window


def pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk packing: per source stream, documents are laid out
    end-to-end in doc_id order and cut into ``PACK_BUDGET``-token windows
    — the pretraining batch layout (each window may span document
    boundaries; attention masking handles the seams downstream).

    Plan: one window function per source stream (running token offset),
    then pure projection.  Streams are independent, so at scale this is
    embarrassingly parallel across sources; within a source the running
    sum is Spark's single-partition window — by design, because a
    *stream* is ordered.  For very large single sources, split the stream
    key (source, doc_id DIV N) first.
    """
    docs = _t(spark, sf_dir, "documents")
    n = F.size(F.split(F.col("text"), " ")).cast("bigint")
    w = W.partitionBy("source").orderBy("doc_id")
    end = F.sum(n).over(w)  # inclusive running total
    start = (end - n).alias("start_offset")
    return docs.select(
        "doc_id",
        "source",
        n.alias("n_tokens"),
        start,
        F.floor((end - n) / PACK_BUDGET).alias("chunk_first"),
        F.floor((end - 1) / PACK_BUDGET).alias("chunk_last"),
        (F.floor((end - 1) / PACK_BUDGET) - F.floor((end - n) / PACK_BUDGET) + 1).alias(
            "n_chunks"
        ),
    )


PACK_SEQUENCES_SQL = f"""
WITH sized AS (
  SELECT doc_id, source,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
  FROM documents
), laid AS (
  SELECT doc_id, source, n_tokens,
         sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                             ROWS UNBOUNDED PRECEDING) AS e
  FROM sized
)
SELECT doc_id, source, n_tokens,
       CAST(e - n_tokens AS BIGINT) AS start_offset,
       CAST(floor((e - n_tokens) / {PACK_BUDGET}.0) AS BIGINT) AS chunk_first,
       CAST(floor((e - 1) / {PACK_BUDGET}.0) AS BIGINT) AS chunk_last,
       CAST(floor((e - 1) / {PACK_BUDGET}.0)
            - floor((e - n_tokens) / {PACK_BUDGET}.0) + 1 AS BIGINT) AS n_chunks
FROM laid
"""

# ---------------------------------------------------------------------------
# Segment-level exact dedup
# ---------------------------------------------------------------------------

SEG_LEN = 8  # tokens per segment


def segment_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Paragraph-style exact dedup at fixed 8-token segments (the corpus
    has no newlines): every segment is hashed, and only its first
    occurrence — ordered by (doc_id, seg_idx) — is kept.  This is the C4
    / RefinedWeb "repeated span removal" primitive.

    Plan: narrow segment explode, one shuffle keyed by segment hash for
    the first-occurrence window — high-cardinality key, linear volume.
    Output keeps every segment row with its verdict so the caller can
    either drop segments or score documents.
    """
    docs = _t(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    nseg = F.floor(F.size(toks) / SEG_LEN).cast("int")
    segs = F.transform(
        F.sequence(F.lit(0), nseg - 1),
        lambda i: F.concat_ws(" ", F.slice(toks, i * SEG_LEN + 1, SEG_LEN)),
    )
    rows = docs.filter(nseg >= 1).select(
        "doc_id", F.posexplode(segs).alias("seg_idx", "seg")
    )
    first = F.row_number().over(
        W.partitionBy("seg_hash").orderBy("doc_id", "seg_idx")
    )
    return (
        rows.select("doc_id", "seg_idx", F.md5("seg").alias("seg_hash"))
        .withColumn("kept", first == 1)
    )


SEGMENT_DEDUP_SQL = f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
), segs AS (
  SELECT doc_id,
         unnest(generate_series(0, CAST(len(t) // {SEG_LEN} AS INT) - 1)) AS seg_idx,
         t
  FROM toks WHERE len(t) >= {SEG_LEN}
), hashed AS (
  SELECT doc_id, seg_idx,
         md5(array_to_string(
           list_transform(generate_series(1, {SEG_LEN}),
                          j -> t[seg_idx * {SEG_LEN} + j]), ' ')) AS seg_hash
  FROM segs
)
SELECT doc_id, seg_idx, seg_hash,
       row_number() OVER (PARTITION BY seg_hash ORDER BY doc_id, seg_idx) = 1
         AS kept
FROM hashed
"""

# ---------------------------------------------------------------------------
# PII scrubbing
# ---------------------------------------------------------------------------

_EMAIL_RX = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z][A-Za-z]+"
_IPV4_RX = "[0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}"
_PHONE_RX = "[+][0-9][0-9 -]{7,}[0-9]"


def pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Email / IPv4 / phone redaction: counts + redacted-text fingerprint.

    Pure regexp expressions (codegen'd, streaming-friendly — each row is
    independent).  The regexes use the lookahead-free [0-9] subset so the
    Java and RE2 engines agree byte-for-byte; replacement order is fixed
    (email → ip → phone) so overlapping matches resolve identically.
    The synthetic corpus contains no PII, so counts are zero here —
    tests/test_curation.py exercises the patterns on crafted rows.
    """
    docs = _t(spark, sf_dir, "documents")
    cleaned = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("text"), _EMAIL_RX, "<EMAIL>"),
            _IPV4_RX,
            "<IP>",
        ),
        _PHONE_RX,
        "<PHONE>",
    )
    return docs.select(
        "doc_id",
        F.regexp_count(F.col("text"), F.lit(_EMAIL_RX)).cast("bigint").alias("n_email"),
        F.regexp_count(F.col("text"), F.lit(_IPV4_RX)).cast("bigint").alias("n_ip"),
        F.regexp_count(F.col("text"), F.lit(_PHONE_RX)).cast("bigint").alias("n_phone"),
        F.md5(cleaned).alias("scrubbed_md5"),
    )


PII_SCRUB_SQL = f"""
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '{_EMAIL_RX}')) AS BIGINT) AS n_email,
       CAST(len(regexp_extract_all(text, '{_IPV4_RX}')) AS BIGINT) AS n_ip,
       CAST(len(regexp_extract_all(text, '{_PHONE_RX}')) AS BIGINT) AS n_phone,
       md5(regexp_replace(regexp_replace(regexp_replace(text,
             '{_EMAIL_RX}', '<EMAIL>', 'g'),
             '{_IPV4_RX}', '<IP>', 'g'),
             '{_PHONE_RX}', '<PHONE>', 'g')) AS scrubbed_md5
FROM documents
"""


# ---------------------------------------------------------------------------
# Benchmark decontamination
# ---------------------------------------------------------------------------

CONTAM_N = 8         # token n-gram length for overlap detection (13 for
                     # real corpora; 8 fits the synthetic ~50-token docs)
BENCH_SOURCE = "src0"  # stand-in benchmark/eval source

# overlapping token-aligned 8-gram as a single codegen'd regex scan
# (lookahead capture; cf. dedup._SHINGLE_RX for the rationale)
_CONTAM_RX = r"(?<=^|\s)(?=(" + r" ".join([r"\S+"] * CONTAM_N) + r"))"


def decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/benchmark overlap detection (decontamination): flag training
    documents sharing any token 8-gram with the benchmark source.

    The standard eval-leakage gate (GPT-3 appendix C / PaLM: 13-gram
    overlap against test sets).  Scale shape: the benchmark set is tiny
    relative to the corpus, so its distinct n-gram hashes BROADCAST — the
    training corpus is scanned once, map-side hash-probed, and only the
    per-doc hit counts aggregate (shuffle keyed by doc_id).  The 100 TB
    corpus is never shuffled on n-grams.
    """
    docs = _t(spark, sf_dir, "documents")
    grams = F.regexp_extract_all(F.col("text"), F.lit(_CONTAM_RX), 1)
    bench_grams = (
        docs.filter(F.col("source") == BENCH_SOURCE)
        .select(F.explode(grams).alias("g"))
        .select(F.md5("g").alias("gh"))
        .distinct()
    )
    train = docs.filter(F.col("source") != BENCH_SOURCE)
    train_grams = train.select(
        "doc_id", F.explode(F.array_distinct(grams)).alias("g")
    ).select("doc_id", F.md5("g").alias("gh"))
    hits = (
        train_grams.join(F.broadcast(bench_grams), "gh")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_contaminated_ngrams"))
    )
    return (
        train.select("doc_id", "source")
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            "source",
            F.coalesce("n_contaminated_ngrams", F.lit(0)).alias("n_contaminated_ngrams"),
            (F.coalesce("n_contaminated_ngrams", F.lit(0)) > 0).alias("contaminated"),
        )
    )


DECONTAMINATE_SQL = f"""
WITH toks AS (
  SELECT doc_id, source, string_split(text, ' ') AS t FROM documents
), grams AS (
  SELECT doc_id, source,
         unnest(list_distinct(list_transform(
           generate_series(1, len(t) - {CONTAM_N - 1}),
           i -> array_to_string(t[i:i+{CONTAM_N - 1}], ' ')))) AS g
  FROM toks WHERE len(t) >= {CONTAM_N}
), bench AS (
  SELECT DISTINCT md5(g) AS gh FROM grams WHERE source = '{BENCH_SOURCE}'
), train_grams AS (
  SELECT doc_id, md5(g) AS gh FROM grams WHERE source <> '{BENCH_SOURCE}'
), hits AS (
  SELECT doc_id, count(*) AS n FROM train_grams JOIN bench USING (gh)
  GROUP BY doc_id
)
SELECT d.doc_id, d.source,
       COALESCE(h.n, 0) AS n_contaminated_ngrams,
       COALESCE(h.n, 0) > 0 AS contaminated
FROM documents d LEFT JOIN hits h ON d.doc_id = h.doc_id
WHERE d.source <> '{BENCH_SOURCE}'
"""



STRATIFIED_N = 40


def stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-n-per-stratum deterministic sampling (reservoir semantics).

    Where mixture_sample keeps a RATE per stratum, training-data
    curation also needs exact COUNTS per stratum ("40 documents per
    language").  The deterministic spelling of a uniform reservoir:
    rank every document inside its stratum by a cryptographic hash of
    its id (md5 hex — order is uniform and engine-independent) and keep
    the first n.  Spark executes the rank<=n filter as a per-group
    heap (InferWindowGroupLimit), so memory is O(n) per stratum and the
    corpus is scanned once — the 100 TB reservoir without an RNG.
    """
    docs = _t(spark, sf_dir, "documents")
    key = F.md5(F.col("doc_id").cast("string"))
    w = W.partitionBy("lang").orderBy(key, "doc_id")
    return (
        docs.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= STRATIFIED_N)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            F.sum("doc_id").alias("sample_id_sum"),
            F.min("doc_id").alias("min_id"),
            F.max("doc_id").alias("max_id"),
        )
        .orderBy("lang")
    )


STRATIFIED_SAMPLE_SQL = f"""
WITH ranked AS (
  SELECT lang, doc_id,
         row_number() OVER (PARTITION BY lang
                            ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
  FROM documents
)
SELECT lang, count(*) AS n_sampled, CAST(sum(doc_id) AS BIGINT) AS sample_id_sum,
       min(doc_id) AS min_id, max(doc_id) AS max_id
FROM ranked WHERE rn <= {STRATIFIED_N}
GROUP BY lang
ORDER BY lang
"""

QUERIES = {
    "curation_gopher_repetition": gopher_repetition,
    "curation_decontaminate": decontaminate,
    "curation_mixture_sample": mixture_sample,
    "curation_stratified_sample": stratified_sample,
    "curation_pack_sequences": pack_sequences,
    "curation_segment_dedup": segment_dedup,
    "curation_pii_scrub": pii_scrub,
}

ORACLE = {
    "curation_gopher_repetition": GOPHER_REPETITION_SQL,
    "curation_decontaminate": DECONTAMINATE_SQL,
    "curation_mixture_sample": MIXTURE_SAMPLE_SQL,
    "curation_stratified_sample": STRATIFIED_SAMPLE_SQL,
    "curation_pack_sequences": PACK_SEQUENCES_SQL,
    "curation_segment_dedup": SEGMENT_DEDUP_SQL,
    "curation_pii_scrub": PII_SCRUB_SQL,
}
