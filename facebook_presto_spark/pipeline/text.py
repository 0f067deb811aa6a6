"""Text-analysis operators over the ``documents`` corpus.

Reference primitives: StringFunctions.java (840 LoC), WordStemFunction.java,
ngrams (ArrayNgramsFunction).  These queries assemble them into the
standard training-data quality stack: token statistics, quality scoring,
language-ID heuristic, content fingerprinting.

All pure built-in expressions (split/HOFs/regexp) — whole-stage codegen'd,
no Python in the path, trivially scale-out (narrow maps + one groupBy at
most)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from facebook_presto_spark.plans.tpch import _t

STOPWORDS = ("the", "a", "of", "to", "and", "in", "is")


def _tokens(col: Column) -> Column:
    return F.split(col, " ")


# BPE-style pre-tokenizer segments (GPT-2 pattern family, simplified to
# the lookahead-free subset both Java regex and RE2 — the oracle's engine —
# agree on): optional leading space + letter run | digit run | punct run.
BPE_RX = r" ?[a-zA-Z]+| ?[0-9]+| ?[^ a-zA-Z0-9]+"


def token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: whitespace tokens, BPE-ish regex pre-tokens,
    distinct tokens, type-token ratio, mean token length — the cheap
    pre-filter signals."""
    docs = _t(spark, sf_dir, "documents")
    toks = _tokens(F.col("text"))
    n = F.size(toks).cast("bigint")
    nd = F.size(F.array_distinct(toks)).cast("bigint")
    return docs.select(
        "doc_id",
        "lang",
        n.alias("n_tokens"),
        F.regexp_count(F.col("text"), F.lit(BPE_RX)).cast("bigint").alias("n_bpe_tokens"),
        nd.alias("n_distinct"),
        (nd.cast("double") / n).alias("ttr"),
        (
            F.aggregate(
                F.transform(toks, lambda t: F.length(t).cast("long")),
                F.lit(0).cast("long"),
                lambda acc, v: acc + v,
            ).cast("double")
            / n
        ).alias("mean_token_len"),
    )


TOKEN_STATS_SQL = """
SELECT doc_id, lang,
       CAST(len(string_split(text,' ')) AS BIGINT) AS n_tokens,
       CAST(len(regexp_extract_all(text, ' ?[a-zA-Z]+| ?[0-9]+| ?[^ a-zA-Z0-9]+')) AS BIGINT) AS n_bpe_tokens,
       CAST(len(list_distinct(string_split(text,' '))) AS BIGINT) AS n_distinct,
       CAST(len(list_distinct(string_split(text,' '))) AS DOUBLE)
         / len(string_split(text,' ')) AS ttr,
       CAST(list_sum(list_transform(string_split(text,' '), t -> length(t))) AS DOUBLE)
         / len(string_split(text,' ')) AS mean_token_len
FROM documents
"""


def quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring: length / stopword-ratio / repetition signals folded
    into one [0,1] score (exact integer ratios → deterministic)."""
    docs = _t(spark, sf_dir, "documents")
    toks = _tokens(F.col("text"))
    n = F.size(toks).cast("bigint")
    nd = F.size(F.array_distinct(toks)).cast("bigint")
    stop_hits = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS))).cast("bigint")
    stop_ratio = stop_hits.cast("double") / n
    ttr = nd.cast("double") / n
    len_ok = F.when((n >= 20) & (n <= 1000), 1.0).otherwise(0.0)
    score = (
        F.lit(0.4) * len_ok
        + F.lit(0.3) * F.least(stop_ratio * 5, F.lit(1.0))
        + F.lit(0.3) * ttr
    )
    return docs.select(
        "doc_id",
        n.alias("n_tokens"),
        stop_ratio.alias("stopword_ratio"),
        ttr.alias("ttr"),
        score.alias("quality"),
    )


_STOP_LIST_SQL = "['" + "','".join(STOPWORDS) + "']"

QUALITY_SCORE_SQL = f"""
WITH t AS (
  SELECT doc_id, string_split(text,' ') AS toks FROM documents
)
SELECT doc_id,
       CAST(len(toks) AS BIGINT) AS n_tokens,
       CAST(len(list_filter(toks, x -> list_contains({_STOP_LIST_SQL}, x))) AS DOUBLE)
         / len(toks) AS stopword_ratio,
       CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) AS ttr,
       0.4 * (CASE WHEN len(toks) BETWEEN 20 AND 1000 THEN 1.0 ELSE 0.0 END)
       + 0.3 * least(CAST(len(list_filter(toks, x -> list_contains({_STOP_LIST_SQL}, x))) AS DOUBLE)
                     / len(toks) * 5, 1.0)
       + 0.3 * (CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks)) AS quality
FROM t
"""


def lang_id_heuristic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """n-gram/stopword language-ID heuristic, scored against the corpus
    ``lang`` label.  (The driver's synthetic text is English-like filler
    for every label, so agreement is a data property, not a target —
    the operator contract is the deterministic guess.)"""
    docs = _t(spark, sf_dir, "documents")
    toks = _tokens(F.col("text"))
    en_hits = F.size(F.filter(toks, lambda t: t.isin("the", "a", "of", "and", "is")))
    vowels = F.length(F.regexp_replace(F.col("text"), "[^aeiou]", ""))
    ratio = vowels.cast("double") / F.length("text")
    guess = (
        F.when(en_hits >= 3, "en")
        .when(ratio >= 0.40, "es")
        .when(ratio >= 0.34, "fr")
        .when(ratio >= 0.30, "de")
        .otherwise("zh")
    )
    return docs.select(
        "doc_id",
        "lang",
        guess.alias("lang_guess"),
        (guess == F.col("lang")).alias("agree"),
    )


LANG_ID_SQL = """
WITH t AS (
  SELECT doc_id, lang, text, string_split(text,' ') AS toks,
         CAST(length(regexp_replace(text, '[^aeiou]', '', 'g')) AS DOUBLE) / length(text) AS vratio
  FROM documents
)
SELECT doc_id, lang,
       CASE WHEN len(list_filter(toks, x -> list_contains(['the','a','of','and','is'], x))) >= 3 THEN 'en'
            WHEN vratio >= 0.40 THEN 'es'
            WHEN vratio >= 0.34 THEN 'fr'
            WHEN vratio >= 0.30 THEN 'de'
            ELSE 'zh' END AS lang_guess,
       (CASE WHEN len(list_filter(toks, x -> list_contains(['the','a','of','and','is'], x))) >= 3 THEN 'en'
            WHEN vratio >= 0.40 THEN 'es'
            WHEN vratio >= 0.34 THEN 'fr'
            WHEN vratio >= 0.30 THEN 'de'
            ELSE 'zh' END) = lang AS agree
FROM t
"""


def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical content fingerprint: md5 over the sorted distinct token
    set — invariant to token order/repetition (the cheap shuffle-key for
    fuzzy-exact dedup).  Plus a 2-hex-char shard id showing how the
    fingerprint doubles as a balanced partition key at scale."""
    docs = _t(spark, sf_dir, "documents")
    canon = F.array_join(F.array_sort(F.array_distinct(_tokens(F.lower(F.col("text"))))), " ")
    fp = F.md5(canon)
    return docs.select(
        "doc_id",
        fp.alias("fingerprint"),
        F.substring(fp, 1, 2).alias("shard"),
    )


DOC_FINGERPRINT_SQL = """
SELECT doc_id,
       md5(array_to_string(list_sort(list_distinct(string_split(lower(text),' '))), ' ')) AS fingerprint,
       substr(md5(array_to_string(list_sort(list_distinct(string_split(lower(text),' '))), ' ')), 1, 2) AS shard
FROM documents
"""


def lm_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style LM quality scoring: a corpus-trained bigram language
    model with add-one smoothing, scored as mean negative log-likelihood
    per document (lower = more ordinary text; the standard perplexity
    quality filter, trained and applied in one distributed pass).

    Model: c2(w1,w2) bigram counts, c1(w1) context counts, V = distinct
    successor vocabulary; per-bigram NLL = -ln((c2+1)/(c1+V)).

    Determinism-by-construction for the float path: the per-document sum
    folds an array SORTED BY TOKEN POSITION, so Spark and the oracle add
    the same doubles in the same order (never an unordered SQL avg —
    partial-agg order would change the bits).

    Scale: one narrow explode, two model aggregations, one
    (w1,w2)-shuffled count join, one per-doc regroup.  At 100 TB the
    model gets a frequency floor (drop hapax bigrams — the add-one term
    already dominates them) and is trained once and reused; both knobs
    are plain filters on the `big`/`uni` frames."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    toks = _tokens(F.col("text"))
    bigrams = F.transform(
        F.slice(toks, 1, F.size(toks) - 1),
        lambda w, i: F.struct(
            w.alias("w1"), F.element_at(toks, i + 2).alias("w2")
        ),
    )
    ex = docs.select(
        "doc_id", F.posexplode(bigrams).alias("pos", "bg")
    ).select("doc_id", "pos", F.col("bg.w1").alias("w1"),
             F.col("bg.w2").alias("w2"))
    big = ex.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c2"))
    uni = ex.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    v = ex.agg(F.countDistinct("w2").alias("v"))
    lp = -F.log(
        (F.col("c2") + F.lit(1)).cast("double")
        / (F.col("c1") + F.col("v")).cast("double")
    )
    scored = (
        ex.join(big, ["w1", "w2"]).join(uni, ["w1"]).crossJoin(F.broadcast(v))
        .select("doc_id", "pos", lp.alias("lp"))
    )
    arr = F.sort_array(F.collect_list(F.struct(
        F.col("pos").alias("pos"), F.col("lp").alias("lp")
    )))
    total = F.aggregate(
        arr, F.lit(0.0), lambda acc, x: acc + x["lp"]
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.size(arr).cast("bigint").alias("n_bigrams"),
            # round to 9 decimals: JVM Math.log and libm ln legitimately
            # differ in the last ulp for some inputs (transcendentals are
            # not IEEE bit-standardized); 9 digits keeps full filtering
            # power while absorbing the 1-ulp divergence
            F.round(total / F.size(arr), 9).alias("avg_nll"),
        )
        .orderBy("doc_id")
    )


LM_PERPLEXITY_SQL = """
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
ex AS (
    SELECT doc_id, i AS pos, t[i] AS w1, t[i + 1] AS w2
    FROM toks, unnest(generate_series(1, len(t) - 1)) AS r(i)
),
big AS (SELECT w1, w2, count(*) AS c2 FROM ex GROUP BY w1, w2),
uni AS (SELECT w1, count(*) AS c1 FROM ex GROUP BY w1),
v AS (SELECT count(DISTINCT w2) AS v FROM ex),
lps AS (
    SELECT e.doc_id, e.pos,
           -ln(CAST(b.c2 + 1 AS DOUBLE) / CAST(u.c1 + v.v AS DOUBLE)) AS lp
    FROM ex e JOIN big b USING (w1, w2) JOIN uni u USING (w1) CROSS JOIN v
),
per AS (SELECT doc_id, list(lp ORDER BY pos) AS lst FROM lps GROUP BY doc_id)
SELECT doc_id, CAST(len(lst) AS BIGINT) AS n_bigrams,
       round(list_reduce(lst, (a, b) -> a + b) / len(lst), 9) AS avg_nll
FROM per ORDER BY doc_id
"""


QUERIES = {
    "text_token_stats": token_stats,
    "text_quality_score": quality_score,
    "text_lang_id": lang_id_heuristic,
    "text_fingerprint": doc_fingerprint,
    "text_lm_perplexity": lm_perplexity,
}

ORACLE = {
    "text_token_stats": TOKEN_STATS_SQL,
    "text_quality_score": QUALITY_SCORE_SQL,
    "text_lang_id": LANG_ID_SQL,
    "text_fingerprint": DOC_FINGERPRINT_SQL,
    "text_lm_perplexity": LM_PERPLEXITY_SQL,
}
