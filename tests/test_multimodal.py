"""Byte-level checks for the media plumbing (frames/resize) — the oracle
verifies the offset/size arithmetic; these verify the actual slices."""

from __future__ import annotations

from pyspark.sql import functions as F


def _payloads(spark, sf_dir, n=5):
    from clickhouse_mergetree_spark.operators.multimodal import media_table

    rows = media_table(spark, sf_dir).orderBy("doc_id").limit(n).collect()
    return {r["doc_id"]: bytes(r["payload"]) for r in rows}


def test_frame_slices_match_python(spark, sf_dir):
    from clickhouse_mergetree_spark.operators.multimodal import (
        FRAME_BYTES, N_FRAMES, sampled_frames,
    )

    payloads = _payloads(spark, sf_dir)
    got = {
        (r["doc_id"], r["frame_idx"]): bytes(r["frame"])
        for r in sampled_frames(spark, sf_dir)
        .filter(F.col("doc_id").isin(list(payloads)))
        .collect()
    }
    assert len(got) == len(payloads) * N_FRAMES
    for doc_id, payload in payloads.items():
        n = len(payload)
        for i in range(N_FRAMES):
            off = (i * n) // N_FRAMES
            assert got[(doc_id, i)] == payload[off:off + FRAME_BYTES]


def test_resize_bytes_match_python(spark, sf_dir):
    from clickhouse_mergetree_spark.operators.multimodal import (
        RESIZE_BYTES, resized_media,
    )

    payloads = _payloads(spark, sf_dir)
    got = {
        r["doc_id"]: bytes(r["resized"])
        for r in resized_media(spark, sf_dir)
        .filter(F.col("doc_id").isin(list(payloads)))
        .collect()
    }
    for doc_id, payload in payloads.items():
        n = len(payload)
        if n <= RESIZE_BYTES:
            want = payload
        else:
            stride = n / RESIZE_BYTES
            want = bytes(payload[int(j * stride)] for j in range(RESIZE_BYTES))
        assert got[doc_id] == want


def test_real_decode_path_raises_not_implemented(spark, sf_dir):
    """The production wiring (real_decode=True) routes payloads through the
    decode step, which must surface its NotImplementedError from inside the
    Arrow worker — proving the decode hook is actually reachable, not dead
    code next to the byte-stat stand-in."""
    import pytest
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import PythonException

    from clickhouse_mergetree_spark.operators.multimodal import (
        FEATURES_SCHEMA, make_extractor, media_table)

    media = media_table(spark, sf_dir)
    feats = media.limit(3).mapInPandas(
        make_extractor(real_decode=True), schema=FEATURES_SCHEMA)
    with pytest.raises((PythonException, Py4JJavaError)) as exc:
        feats.collect()
    assert "NotImplementedError" in str(exc.value)
    assert "media decoding" in str(exc.value)


def test_real_decode_with_pil_when_available():
    """When the worker environment has PIL, real_decode=True must produce
    actual decoded-image features (import-guarded production path). Skipped
    in containers without the library — the test above pins the fallback
    contract there."""
    import pytest

    pytest.importorskip("PIL")
    import io

    import pandas as pd
    from PIL import Image

    from clickhouse_mergetree_spark.operators.multimodal import make_extractor

    buf = io.BytesIO()
    Image.new("L", (4, 4), color=128).save(buf, format="PNG")
    batch = pd.DataFrame({
        "doc_id": [1],
        "media_type": ["image/png"],
        "payload": [buf.getvalue()],
    })
    out = pd.concat(list(make_extractor(real_decode=True)([batch])))
    feats = out["features"].iloc[0]
    assert len(feats) == 8
    assert feats[0] == 64.0          # 8×8 resized pixel count
    assert abs(feats[6] - 128 / 255) < 1e-9  # mean gray level

def test_auto_decode_falls_back_per_payload(spark, sf_dir):
    """real_decode="auto" must produce byte-stat features in a container
    without PIL (per-payload fallback), keeping the full Arrow pipeline
    runnable on any worker image. With PIL present it would decode
    image/* payloads instead — covered by the PIL test above."""
    from clickhouse_mergetree_spark.operators.multimodal import (
        FEATURES_SCHEMA, make_extractor, media_table)

    media = media_table(spark, sf_dir).limit(5)
    auto = media.mapInPandas(
        make_extractor(real_decode="auto"), schema=FEATURES_SCHEMA).collect()
    stub = media.mapInPandas(
        make_extractor(), schema=FEATURES_SCHEMA).collect()
    assert len(auto) == 5
    by_id = {r["doc_id"]: r["features"] for r in stub}
    try:
        import PIL  # noqa: F401
        has_pil = True
    except ImportError:
        has_pil = False
    if not has_pil:
        for r in auto:
            assert r["features"] == by_id[r["doc_id"]]


def test_real_pgm_decode_roundtrip():
    """The PGM decoder recovers the exact pixel bytes written into a
    synthesized P5 payload (no Spark needed — the decoder is the same
    closure the workers run)."""
    import numpy as np

    from clickhouse_mergetree_spark.operators.multimodal import (
        _PGM_HEADER, make_decoder)
    import pandas as pd

    pixels = bytes(range(256))
    payload = _PGM_HEADER + pixels
    run = make_decoder()
    [out] = list(run(iter([pd.DataFrame({
        "doc_id": [1], "media_type": ["image/x-portable-graymap"],
        "payload": [payload]})])))
    r = out.iloc[0]
    assert r["n_samples"] == 256
    assert r["first_v"] == 0.0 and r["last_v"] == 1.0
    assert r["min_v"] == 0.0 and r["max_v"] == 1.0
    assert abs(r["mean_v"] - np.arange(256).mean() / 255.0) < 1e-9


def test_real_wav_decode_roundtrip():
    """The WAV decoder reads back the exact PCM samples through the
    stdlib reader (a genuinely parsed RIFF container, not byte slicing)."""
    import pandas as pd

    from clickhouse_mergetree_spark.operators.multimodal import (
        _WAV_HEADER, make_decoder)

    samples = bytes([0, 51, 102, 153, 204, 255] * 42 + [0, 51, 102, 153])
    assert len(samples) == 256
    payload = _WAV_HEADER + samples
    run = make_decoder()
    [out] = list(run(iter([pd.DataFrame({
        "doc_id": [2], "media_type": ["audio/wav"],
        "payload": [payload]})])))
    r = out.iloc[0]
    assert r["n_samples"] == 256
    assert r["first_v"] == 0.0
    assert r["last_v"] == round(153 / 255.0, 9)
    assert r["max_v"] == 1.0


def test_decoder_rejects_unknown_type():
    import pandas as pd
    import pytest as _pytest

    from clickhouse_mergetree_spark.operators.multimodal import make_decoder

    run = make_decoder()
    with _pytest.raises(NotImplementedError):
        list(run(iter([pd.DataFrame({
            "doc_id": [3], "media_type": ["video/mp4"],
            "payload": [b"\x00" * 16]})])))


def test_phash_banded_pairs_equal_brute_force(spark, sf_dir):
    """Pigeonhole exactness: at Hamming <= 3 with four 16-bit bands the
    band-bucket join must produce EXACTLY the brute-force pair set."""
    from pyspark.sql import functions as F

    from clickhouse_mergetree_spark.operators.multimodal import (
        PHASH_MAX_HAMMING, _phash_table, q_media_phash_dedup)

    got = {(r["doc_a"], r["doc_b"]): r["hamming"]
           for r in q_media_phash_dedup(spark, sf_dir).collect()}
    hs = _phash_table(spark, sf_dir).collect()
    brute = {}
    for i, x in enumerate(hs):
        for y in hs[i + 1:]:
            a, b = sorted((x, y), key=lambda r: r["doc_id"])
            d = (bin((a["hi"] ^ b["hi"])).count("1")
                 + bin((a["lo"] ^ b["lo"])).count("1"))
            if d <= PHASH_MAX_HAMMING:
                brute[(a["doc_id"], b["doc_id"])] = d
    assert got == brute and len(got) > 0


def test_audio_fp_banded_pairs_equal_brute_force(spark, sf_dir):
    from clickhouse_mergetree_spark.operators.multimodal import (
        AUDIO_FP_MAX_HAMMING, _audio_fp_table, q_media_audio_dedup)

    got = {(r["doc_a"], r["doc_b"]): r["hamming"]
           for r in q_media_audio_dedup(spark, sf_dir).collect()}
    hs = _audio_fp_table(spark, sf_dir).collect()
    brute = {}
    for i, x in enumerate(hs):
        for y in hs[i + 1:]:
            a, b = sorted((x, y), key=lambda r: r["doc_id"])
            d = (bin((a["hi"] ^ b["hi"])).count("1")
                 + bin((a["lo"] ^ b["lo"])).count("1"))
            if d <= AUDIO_FP_MAX_HAMMING:
                brute[(a["doc_id"], b["doc_id"])] = d
    assert got == brute and len(got) > 0


def test_covariance_partition_order_invariant(spark, sf_dir):
    """VERDICT r8: a plain double sum made q_embed_covariance's 6-dp
    rounding flip with partitioning (cell (43,55) at sf0.01 sits 2.5e-11
    below the round boundary). The DECIMAL(38,18) product sums must make
    the result identical across shuffle-partition counts."""
    from clickhouse_mergetree_spark.operators.multimodal import (
        q_embed_covariance,
    )

    prev = spark.conf.get("spark.sql.shuffle.partitions")
    results = []
    try:
        for n in ("1", "7", "32"):
            spark.conf.set("spark.sql.shuffle.partitions", n)
            rows = sorted(
                (r["i"], r["j"], r["cov"])
                for r in q_embed_covariance(spark, sf_dir).collect()
            )
            results.append(rows)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert results[0] == results[1] == results[2]
    assert len(results[0]) > 0
