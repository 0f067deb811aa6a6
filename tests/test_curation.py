"""Unit tests for pipeline/curation.py on crafted literal rows.

The driver-facing oracle checks (tools/selfcheck.py) verify the operators
on the synthetic corpus; these tests pin the per-operator semantics on
inputs small enough to verify by hand — including PII patterns, which the
synthetic corpus never contains.
"""

import pytest
from pyspark.sql import functions as F

from facebook_presto_spark.pipeline import curation


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    )


@pytest.fixture()
def patch_t(monkeypatch):
    """Route curation's table loader to a literal DataFrame."""

    def install(df):
        monkeypatch.setattr(
            "facebook_presto_spark.pipeline.curation._t",
            lambda spark, sf_dir, name: df,
        )

    return install


def test_pii_scrub_patterns(spark, patch_t):
    df = _docs(
        spark,
        [
            (1, "mail me at bob.smith+x@example.org today", "en", "s", 0),
            (2, "server 10.0.255.3 and 192.168.1.1 up", "en", "s", 0),
            (3, "call +1 555-123-4567 now", "en", "s", 0),
            (4, "clean text no pii", "en", "s", 0),
        ],
    )
    patch_t(df)
    rows = {
        r["doc_id"]: r
        for r in curation.pii_scrub(spark, "unused").collect()
    }
    assert rows[1]["n_email"] == 1 and rows[1]["n_ip"] == 0
    assert rows[2]["n_ip"] == 2
    assert rows[3]["n_phone"] == 1
    assert rows[4]["n_email"] == rows[4]["n_ip"] == rows[4]["n_phone"] == 0


def test_pack_sequences_chunks(spark, patch_t):
    # budget 2048: doc sizes 1000/1500/2000 in one stream →
    # offsets 0/1000/2500; the 1500-token doc spans the 2048 boundary
    df = _docs(
        spark,
        [
            (1, " ".join(["w"] * 1000), "en", "s1", 0),
            (2, " ".join(["w"] * 1500), "en", "s1", 0),
            (3, " ".join(["w"] * 2000), "en", "s1", 0),
            (10, " ".join(["w"] * 5), "en", "s2", 0),
        ],
    )
    patch_t(df)
    out = {
        r["doc_id"]: r for r in curation.pack_sequences(spark, "unused").collect()
    }
    assert (out[1]["start_offset"], out[1]["chunk_first"], out[1]["chunk_last"]) == (0, 0, 0)
    assert (out[2]["start_offset"], out[2]["chunk_first"], out[2]["chunk_last"]) == (1000, 0, 1)
    assert out[2]["n_chunks"] == 2
    assert (out[3]["start_offset"], out[3]["chunk_first"], out[3]["chunk_last"]) == (2500, 1, 2)
    # independent stream restarts at offset 0
    assert out[10]["start_offset"] == 0


def test_segment_dedup_first_occurrence(spark, patch_t):
    seg_a = "a b c d e f g h"
    seg_b = "p q r s t u v w"
    df = _docs(
        spark,
        [
            (1, seg_a + " " + seg_b, "en", "s", 0),   # segs 0,1
            (2, seg_a + " " + seg_a, "en", "s", 0),   # both dup of doc1 seg0
            (3, "short text", "en", "s", 0),          # < 8 tokens → dropped
        ],
    )
    patch_t(df)
    rows = curation.segment_dedup(spark, "unused").collect()
    verdicts = {(r["doc_id"], r["seg_idx"]): r["kept"] for r in rows}
    assert verdicts == {
        (1, 0): True,
        (1, 1): True,
        (2, 0): False,
        (2, 1): False,
    }


def test_gopher_repetition_fractions(spark, patch_t):
    # "x y x y x": bigrams = [x y, y x, x y, y x] → top 'x y' cnt=2 len=3
    # → top mass 6 of total 12 = 1/2; trigrams = [x y x, y x y, x y x] →
    # 'x y x' duplicated → dup mass 10 of 15 = 2/3 → keep fails
    df = _docs(spark, [(1, "x y x y x", "en", "s", 0)])
    patch_t(df)
    r = curation.gopher_repetition(spark, "unused").collect()[0]
    assert r["top_bigram_frac"] == pytest.approx(1 / 2)
    assert r["dup_trigram_frac"] == pytest.approx(2 / 3)
    assert not r["keep"]


def test_gopher_keep_on_diverse_text(spark, patch_t):
    text = " ".join(f"tok{i}" for i in range(50))  # all n-grams unique
    df = _docs(spark, [(1, text, "en", "s", 0)])
    patch_t(df)
    r = curation.gopher_repetition(spark, "unused").collect()[0]
    assert r["dup_trigram_frac"] == 0.0
    assert r["keep"]  # top bigram fraction 1/49 of mass


def test_mixture_rates_applied(spark, patch_t):
    # 40 docs in src0 (rate 1.0) → all kept; 40 in src9 (default 0.1) → few
    rows = [(i, "t", "en", "src0", 0) for i in range(40)] + [
        (100 + i, "t", "en", "src9", 0) for i in range(40)
    ]
    patch_t(_docs(spark, rows))
    out = {r["source"]: r for r in curation.mixture_sample(spark, "unused").collect()}
    assert out["src0"]["n_kept"] == 40
    assert out["src9"]["n_kept"] < 40 * 0.35


def test_gopher_plan_has_no_codegen_fallback(spark, patch_t):
    """The n-gram build must stay in whole-stage codegen (the lead-window
    form) — a transform/sequence HOF chain here measured 20× slower."""
    df = _docs(spark, [(1, "a b c d", "en", "s", 0)])
    patch_t(df)
    q = curation.gopher_repetition(spark, "unused")
    q.collect()
    plan = q._jdf.queryExecution().executedPlan().toString()
    # '*(n)' prefixes mark whole-stage-codegen'd operators in the final
    # adaptive plan; the n-gram projection must carry one
    assert "*(" in plan


def test_decontaminate_flags_benchmark_overlap(spark, patch_t):
    # doc 2 shares an 8-token span with the benchmark doc; doc 3 doesn't
    span = "a b c d e f g h"
    df = _docs(
        spark,
        [
            (1, f"bench prefix {span} bench suffix", "en", curation.BENCH_SOURCE, 0),
            (2, f"train start {span} train end", "en", "srcX", 0),
            (3, "totally different words with no overlap at all here now", "en", "srcX", 0),
        ],
    )
    patch_t(df)
    rows = {r["doc_id"]: r for r in curation.decontaminate(spark, "unused").collect()}
    assert set(rows) == {2, 3}  # benchmark doc excluded from output
    assert rows[2]["contaminated"] and rows[2]["n_contaminated_ngrams"] >= 1
    assert not rows[3]["contaminated"] and rows[3]["n_contaminated_ngrams"] == 0
