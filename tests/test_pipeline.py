"""Property tests for the pipeline operators whose hashes are Spark-side
only (no DuckDB oracle): SimHash, ANN LSH — plus MinHash estimate sanity
against exact Jaccard on constructed near-duplicates."""

from pyspark.sql import functions as F

from facebook_presto_spark.pipeline import dedup, similarity


def _hamming64(a: int, b: int) -> int:
    return bin((a ^ b) & 0xFFFFFFFFFFFFFFFF).count("1")


def test_simhash_near_dup_distance(spark, tmp_path):
    """Near-identical docs must get near-identical simhashes; unrelated
    docs must not."""
    base = " ".join(f"tok{i}" for i in range(200))
    near = base.replace("tok3 ", "tokX ")  # 1 of 200 tokens changed
    other = " ".join(f"zzz{i}" for i in range(200))
    df = spark.createDataFrame(
        [(0, base, "en", "s", len(base)), (1, near, "en", "s", len(near)),
         (2, other, "en", "s", len(other))],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    p = str(tmp_path / "documents.parquet")
    df.write.mode("overwrite").parquet(p)
    out = {r.doc_id: r.simhash for r in dedup.simhash64(spark, str(tmp_path)).collect()}
    d_near = _hamming64(out[0], out[1])
    d_far = _hamming64(out[0], out[2])
    # ~1/200 tokens changed flips only low-margin bits (expected ≈7 of 64);
    # unrelated docs land at ≈32.  Wide gap, stable for a fixed hash.
    assert d_near <= 16, f"near-dup hamming {d_near} too large"
    assert d_far >= 20, f"unrelated hamming {d_far} too small"
    assert d_near < d_far


def test_minhash_estimates_match_exact_jaccard(spark, tmp_path):
    """Construct docs with known overlap; LSH must surface the near-dup pair
    and the signature estimate must be in a sane band around true Jaccard."""
    words_a = [f"w{i}" for i in range(50)]
    words_b = words_a[:45] + [f"x{i}" for i in range(5)]  # ~82% shingle overlap
    words_c = [f"y{i}" for i in range(50)]
    rows = [
        (0, " ".join(words_a)), (1, " ".join(words_b)), (2, " ".join(words_c)),
    ]
    df = spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in rows],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    pairs = {
        (r.doc_a, r.doc_b): r.est_jaccard
        for r in dedup.minhash_lsh_pairs(spark, str(tmp_path)).collect()
    }
    assert (0, 1) in pairs, "near-dup pair not surfaced by LSH banding"
    assert pairs[(0, 1)] >= 0.5
    assert (0, 2) not in pairs, "unrelated pair should not share a band"


def test_ann_recall_against_brute_force(spark, sf_dir):
    sf = "/root/testdata/sf0.01"
    brute = {
        (r.q_id, r.c_id) for r in similarity.cosine_topk(spark, sf).collect()
    }
    ann = {(r.q_id, r.c_id) for r in similarity.ann_lsh_topk(spark, sf).collect()}
    recall = len(brute & ann) / len(brute)
    assert recall >= 0.5, f"ANN recall {recall} below floor"


def test_ivf_recall_against_brute_force(spark, sf_dir):
    sf = "/root/testdata/sf0.01"
    brute = {
        (r.q_id, r.c_id) for r in similarity.cosine_topk(spark, sf).collect()
    }
    ivf = {(r.q_id, r.c_id) for r in similarity.ann_ivf_topk(spark, sf).collect()}
    recall = len(brute & ivf) / len(brute)
    # nprobe=4 of 16 lists searches ~25% of the corpus; near neighbors
    # cluster into the same coarse lists, so recall must beat that floor
    assert recall >= 0.5, f"IVF recall {recall} below floor"
    # every IVF result is a real vector pair with a valid cosine
    rows = similarity.ann_ivf_topk(spark, sf).collect()
    assert all(-1.0001 <= r.cosine <= 1.0001 for r in rows)


def test_exact_dedup_collapses_duplicates(spark, tmp_path):
    df = spark.createDataFrame(
        [(0, "Same Text", "en", "s", 9), (1, "same text", "en", "s", 9),
         (2, "different", "en", "s", 9)],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    out = dedup.exact_dedup(spark, str(tmp_path)).collect()
    groups = {r.keep_doc_id: r.group_size for r in out}
    assert groups == {0: 2, 2: 1}  # case-insensitive collapse keeps doc 0


def test_substring_window_dedup_unaligned(spark, tmp_path, monkeypatch):
    """A 12-token run copied at a DIFFERENT alignment is caught (the
    fixed-segment dedup cannot see it); short docs yield no windows."""
    run = " ".join(f"tok{i}" for i in range(12))
    doc_a = run + " tail0 tail1 tail2"          # run at offset 1
    doc_b = "head0 head1 " + run + " x y"       # run at offset 3
    doc_c = " ".join(f"uniq{i}" for i in range(16))
    doc_d = "too short"                          # < 12 tokens → no rows
    df = spark.createDataFrame(
        [(0, doc_a, "en", "s", len(doc_a)), (1, doc_b, "en", "s", len(doc_b)),
         (2, doc_c, "en", "s", len(doc_c)), (3, doc_d, "en", "s", len(doc_d))],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    out = {r.doc_id: (r.n_windows, r.n_dup_windows)
           for r in dedup.substring_window_dedup(spark, str(tmp_path)).collect()}
    assert out[0] == (4, 0)   # 15 tokens → 4 windows, all first occurrences
    assert out[1][0] == 5     # 16 tokens → 5 windows
    assert out[1][1] == 1     # exactly the copied run, despite the shift
    assert out[2] == (5, 0)
    assert 3 not in out       # too short for any window


def test_connected_components_chain(spark, monkeypatch):
    """A chain a-b-c plus an isolated pair d-e: min-label propagation must
    traverse the chain (multiple rounds) and keep the pair separate."""
    from facebook_presto_spark.pipeline import dedup

    pairs = spark.createDataFrame(
        [(1, 2, 1.0), (2, 3, 1.0), (3, 4, 1.0), (10, 11, 1.0)],
        "doc_a bigint, doc_b bigint, est_jaccard double",
    )
    monkeypatch.setattr(dedup, "minhash_lsh_pairs", lambda s, d: pairs)
    rows = {r["doc_id"]: (r["component"], r["comp_size"])
            for r in dedup.connected_components(spark, "unused").collect()}
    assert rows == {
        1: (1, 4), 2: (1, 4), 3: (1, 4), 4: (1, 4),
        10: (10, 2), 11: (10, 2),
    }


def test_canonical_pick_survivor_is_best_in_component(spark, sf_dir):
    from facebook_presto_spark.pipeline.dedup import (
        canonical_pick, connected_components)
    from facebook_presto_spark.pipeline.text import quality_score

    picks = canonical_pick(spark, sf_dir)
    comps = connected_components(spark, sf_dir)
    quality = quality_score(spark, sf_dir).select("doc_id", "quality")
    # the survivor's quality is the component max (ties broken by min id)
    best = (
        comps.join(quality, "doc_id")
        .groupBy("component")
        .agg(F.max("quality").alias("qmax"))
    )
    j = (
        picks.join(quality, picks.survivor == quality.doc_id)
        .join(best, "component")
    )
    assert j.filter(F.col("quality") != F.col("qmax")).count() == 0
    # one survivor per component, sizes consistent
    rows = picks.collect()
    assert len({r.component for r in rows}) == len(rows)
    assert all(r.n_dropped == r.comp_size - 1 for r in rows)


def test_stratified_sample_exact_n_and_deterministic(spark, sf_dir):
    from facebook_presto_spark.pipeline.curation import (
        STRATIFIED_N, stratified_sample)

    out = stratified_sample(spark, sf_dir).collect()
    totals = {
        r.lang: r.n
        for r in spark.read.parquet(sf_dir + "/documents.parquet")
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    for r in out:
        assert r.n_sampled == min(STRATIFIED_N, totals[r.lang])
    assert out == stratified_sample(spark, sf_dir).collect()


def test_media_codecs_byte_level():
    """Real BMP/WAV layouts: header fields, row padding, bottom-up BGR
    rows, RIFF chunk walk; compressed magics raise loudly."""
    import struct

    import numpy as np
    import pytest as _pytest

    from facebook_presto_spark.pipeline import multimodal as mm

    bmp = mm._encode_bmp(7)   # w = 11, h = 9 → row padded 33 → 36
    assert bmp[:2] == b"BM"
    assert struct.unpack_from("<I", bmp, 10)[0] == 54          # pixel offset
    w, h = struct.unpack_from("<ii", bmp, 18)
    assert (w, h) == (11, 9)
    assert struct.unpack_from("<H", bmp, 28)[0] == 24          # bpp
    assert len(bmp) == 54 + 36 * 9                             # padded rows
    fmt, dw, dh, mr, mg, mb = mm.decode_media(bmp)
    assert (fmt, dw, dh) == ("bmp", 11, 9)
    x = np.arange(11)[None, :]
    y = np.arange(9)[:, None]
    assert mr == _pytest.approx(((7 + x + y) % 256).mean())
    assert mg == _pytest.approx(((14 + x + 0 * y) % 256).mean())
    assert mb == _pytest.approx(((21 + 0 * x + y) % 256).mean())
    # top-left pixel of the decoded image is the LAST stored row (bottom-up)
    row_last = bmp[54 + 36 * 8: 54 + 36 * 8 + 3]
    assert row_last == bytes([(21 + 0) % 256, (14 + 0) % 256, (7 + 0) % 256])

    wav = mm._encode_wav(5)   # n = 55, sr = 16000
    assert wav[:4] == b"RIFF" and wav[8:12] == b"WAVE"
    fmt, n, sr, rms = mm.decode_media(wav)
    assert (fmt, n, sr) == ("wav", 55, 16000)
    i = np.arange(55)
    s = ((5 * 31 + i * 17) % 65536 - 32768).astype(float)
    assert rms == _pytest.approx(float(np.sqrt((s * s).mean())))

    with _pytest.raises(NotImplementedError, match="JPEG"):
        mm.decode_media(b"\xff\xd8\xff\xe0rest")
    with _pytest.raises(NotImplementedError, match="PNG"):
        mm.decode_media(b"\x89PNG\r\n")
    with _pytest.raises(ValueError, match="unknown media format"):
        mm.decode_media(b"\x00\x01\x02\x03")


def test_bmp_resize_nearest_neighbor_real():
    """NN downscale of decoded BMP pixels, re-encoded as a real BMP:
    round-tripping the thumbnail must reproduce the sampled pixels."""
    import numpy as np

    from facebook_presto_spark.pipeline import multimodal as mm

    px = mm._bmp_pixels(mm._encode_bmp(7))       # (h, w, 3) RGB, top-down
    h, w = px.shape[0], px.shape[1]
    small = mm._resize_nn(px, 8)
    longest = max(w, h)
    assert max(small.shape[0], small.shape[1]) <= 8 or longest <= 8
    # hand-check one sampled pixel: dst (x, y) ← src (x*w//ow, y*h//oh)
    ow, oh = small.shape[1], small.shape[0]
    assert (small[1, 2] == px[1 * h // oh, 2 * w // ow]).all()
    # re-encode through the real layout and decode back
    again = mm._bmp_pixels(mm._encode_bmp_array(small))
    assert (again == small).all()
    # tiny images are never upscaled
    tiny = np.zeros((2, 3, 3), dtype=np.uint8)
    assert mm._resize_nn(tiny, 8).shape == (2, 3, 3)


def test_wav_frame_sample_windows_real():
    """PCM frame windows: every 2nd complete 16-sample frame, RMS from
    the decoded samples."""
    import numpy as np

    from facebook_presto_spark.pipeline import multimodal as mm

    payload = mm._encode_wav(5)
    n, sr, _ = mm._decode_wav(payload)
    samples = mm._wav_samples(payload)
    assert len(samples) == n == 5 % 100 + 50
    win = samples[0:16]
    expect = float(np.sqrt((win * win).mean()))
    # the generating arithmetic matches the decoded window
    i = np.arange(16)
    gen = ((5 * 31 + i * 17) % 65536 - 32768).astype(float)
    assert (win == gen).all()
    assert expect > 0


def test_substring_dedup_clean_removes_second_copy(spark, tmp_path):
    run = " ".join(f"tok{i}" for i in range(12))
    uniq = " ".join(f"uniq{i}" for i in range(5))
    doc_a = run + " " + uniq                      # first occurrence kept
    doc_b = "head0 head1 " + run + " tail0"       # copy dropped, rest kept
    doc_c = run                                   # nothing but the dup → gone
    doc_d = "too short"
    df = spark.createDataFrame(
        [(0, doc_a, "en", "s", 1), (1, doc_b, "en", "s", 1),
         (2, doc_c, "en", "s", 1), (3, doc_d, "en", "s", 1)],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    out = {r.doc_id: (r.n_tokens_after, r.cleaned)
           for r in dedup.substring_dedup_clean(spark, str(tmp_path)).collect()}
    assert out[0] == (17, doc_a)                  # first occurrence untouched
    assert out[1] == (3, "head0 head1 tail0")     # span excised exactly
    assert 2 not in out                           # fully-duplicate doc removed
    assert out[3] == (2, "too short")             # short doc passes through


def test_documents_doc_id_unique_and_salted_bucket_cap(spark, sf_dir):
    """The per-row MinHash fold assumes doc_id is unique per row (a
    duplicate doc_id row would emit one signature per ROW while the
    oracle's GROUP BY doc_id merges them); pin that invariant on the
    driver's corpus.  Also pin the salted band-bucket equivalence: the
    two-level (band, key, salt) pre-aggregation must keep exactly the
    max_bucket smallest members, i.e. the same candidate pairs as an
    unsalted bucket."""
    docs = dedup._t(spark, sf_dir, "documents")
    n, n_ids = docs.select(
        F.count(F.lit(1)), F.countDistinct("doc_id")
    ).first()
    assert n == n_ids, f"documents has duplicate doc_ids ({n} rows, {n_ids} ids)"

    # salted-vs-unsalted bucket equivalence on a corpus with a
    # degenerate bucket (many identical docs share every band key)
    text = " ".join(f"tok{i}" for i in range(30))
    rows = [(i, text, "en", "s", len(text)) for i in range(40)]
    df = spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    )
    import tempfile, os
    with tempfile.TemporaryDirectory() as d:
        df.write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
        pairs = dedup.minhash_lsh_pairs(spark, d).collect()
    got = {(r.doc_a, r.doc_b) for r in pairs}
    want = {(a, b) for a in range(40) for b in range(40) if a < b}
    assert got == want  # all 40 identical docs pair up, est_jaccard aside
    assert all(r.est_jaccard == 1.0 for r in pairs)
