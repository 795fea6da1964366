"""Multimodal operator tests: decode, features, thumbnails, frame
sampling over the media sidecar table."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

CORPUS_ROOT = "/tmp/ocrs_ray_mm_corpus"


@pytest.fixture(scope="module")
def media_path(ray_session):
    from ocrs_ray.corpus import ensure_corpus

    return ensure_corpus(CORPUS_ROOT, n_docs=50)["media"]


def test_media_features_match_numpy(media_path):
    from ocrs_ray.ops.multimodal import media_features
    from ocrs_ray.pipeline import decode_media, load_media_store

    out = media_features(media_path).to_pandas().set_index("media_ref")
    store = load_media_store(media_path)
    assert len(out) == len(store)
    for ref in list(store)[:5]:
        img = decode_media(store[ref]).astype(np.float32)
        grey = img.mean(axis=2) if img.ndim == 3 else img
        assert out.loc[ref, "mean_intensity"] == pytest.approx(float(grey.mean()))
        assert out.loc[ref, "n_pixels"] == grey.size


def test_thumbnails_roundtrip(media_path):
    from ocrs_ray.ops.multimodal import media_thumbnails
    from ocrs_ray.pipeline import decode_media, load_media_store
    from ocrs_ray.resize import resize_bilinear

    out = media_thumbnails(media_path, out_h=16, out_w=24).to_pandas()
    assert (out.height == 16).all() and (out.width == 24).all()
    store = load_media_store(media_path)
    row = out.iloc[0]
    img = decode_media(store[row.media_ref])
    plane = img if img.ndim == 2 else img[:, :, 0]
    expected = np.clip(
        np.rint(resize_bilinear(plane.astype(np.float32), 16, 24)), 0, 255
    ).astype(np.uint8)
    got = np.frombuffer(row.image, dtype=np.uint8).reshape(16, 24)
    assert np.array_equal(got, expected)


def test_video_frame_fanout(media_path):
    from ocrs_ray.ops.multimodal import video_frame_sample
    from ocrs_ray.pipeline import decode_media, load_media_store

    out = video_frame_sample(media_path, n_frames=3).to_pandas()
    store = load_media_store(media_path)
    assert len(out) == 3 * len(store)
    assert set(out.frame_index) == {0, 1, 2}
    # Frame t is the image rolled by t rows (fake decoder contract).
    g = out[out.media_ref == out.media_ref.iloc[0]].sort_values("frame_index")
    img = decode_media(store[g.media_ref.iloc[0]])
    f1 = np.frombuffer(g.iloc[1].frame, dtype=np.uint8).reshape(
        g.iloc[1].height, g.iloc[1].width, -1
    )
    assert np.array_equal(f1, np.roll(img, 1, axis=0))


def test_audio_features_match_pre_encode_golden(ray_session, tmp_path):
    """The distributed op (WAV bytes -> ocrs_ray.wav decode -> feature
    kernel) reproduces the golden computed from the PRE-encode
    quantized samples — value-exact across all five container formats,
    which pins the decoder end to end (the sweep repeats this at the
    driver's corpus key; this is the self-contained no-cache variant)."""
    import pyarrow.parquet as pq

    from ocrs_ray.corpus import gen_audio_clips
    from ocrs_ray.ops.multimodal import audio_features

    audio, goldens = gen_audio_clips(32, seed=5)
    path = str(tmp_path / "audio.parquet")
    pq.write_table(audio, path)
    out = (
        audio_features(path)
        .to_pandas()
        .sort_values("media_ref")
        .reset_index(drop=True)
    )
    exp = (
        goldens["expected_audio_features"]
        .to_pandas()
        .sort_values("media_ref")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(out[exp.columns.tolist()], exp, check_dtype=False)
    # every format family is present in the pool (the parametrization
    # is inside the seeded generator, so assert it really varied)
    rates = set(out.sample_rate)
    assert len(rates) >= 3 and set(out.n_channels) == {1, 2}


def test_resample_linear_kernel():
    """No Ray: identity at equal rates; exact output length; values
    match the np.interp reference at rational positions."""
    from ocrs_ray.ops.multimodal import resample_linear

    rng = np.random.default_rng(9)
    x = rng.uniform(-1, 1, size=(101, 2))
    same = resample_linear(x, 8000, 8000)
    np.testing.assert_array_equal(same, x)
    up = resample_linear(x, 8000, 16000)
    assert up.shape == ((101 - 1) * 2 + 1, 2)
    # even output frames hit source samples exactly
    np.testing.assert_array_equal(up[::2], x)
    # reference positions via np.interp per channel
    k = np.arange(up.shape[0])
    pos = k * 8000 / 16000
    for c in range(2):
        np.testing.assert_allclose(
            up[:, c], np.interp(pos, np.arange(101), x[:, c]), atol=1e-12
        )
    down = resample_linear(x, 16000, 8000)
    assert down.shape == (51, 2)
    np.testing.assert_array_equal(down, x[::2])


def test_audio_content_key_cross_container():
    """No Ray: the same samples as PCM16 and as IEEE float32 collide;
    a one-sample perturbation does not."""
    from ocrs_ray.ops.multimodal import audio_content_key

    rng = np.random.default_rng(4)
    q = rng.integers(-32768, 32768, size=(300, 2)).astype(np.int16)
    twin = (q.astype(np.float64) / 32768.0).astype(np.float32)
    assert audio_content_key(q, 16000, 16) == audio_content_key(twin, 16000, 32)
    q2 = q.copy()
    q2[7, 0] += 1
    assert audio_content_key(q, 16000, 16) != audio_content_key(q2, 16000, 16)
    assert audio_content_key(q, 16000, 16) != audio_content_key(q, 8000, 16)


def test_audio_dedup_and_resample_match_goldens(ray_session, tmp_path):
    """The distributed dedup/resample ops reproduce the generator's
    ground-truth goldens — the dedup golden is built from the KNOWN
    duplicate structure (not the kernel), so this pins decode +
    fingerprint + exchange end to end."""
    import pyarrow.parquet as pq

    from ocrs_ray.corpus import gen_audio_clips
    from ocrs_ray.ops.multimodal import audio_content_dedup, audio_resample

    audio, goldens = gen_audio_clips(48, seed=6)
    assert audio.num_rows > 48  # twins actually present
    path = str(tmp_path / "audio.parquet")
    pq.write_table(audio, path)

    out = (
        audio_content_dedup(path)
        .to_pandas()
        .sort_values("media_ref")
        .reset_index(drop=True)
    )
    exp = (
        goldens["expected_audio_dedup"]
        .to_pandas()
        .sort_values("media_ref")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(out[exp.columns.tolist()], exp, check_dtype=False)
    assert (exp.n_copies > 1).any()  # the dup vector is exercised

    res = (
        audio_resample(path)
        .to_pandas()
        .sort_values("media_ref")
        .reset_index(drop=True)
    )
    rexp = (
        goldens["expected_audio_resample"]
        .to_pandas()
        .sort_values("media_ref")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(res[rexp.columns.tolist()], rexp, check_dtype=False)


def test_audio_features_reject_non_wav(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ocrs_ray.ops.multimodal import audio_features

    bad = pa.table(
        {
            "media_ref": ["x"],
            "audio": pa.array([b"not a wav"], type=pa.binary()),
        }
    )
    path = str(tmp_path / "bad.parquet")
    pq.write_table(bad, path)
    # Ray wraps WavError in RayTaskError/UserCodeException layers;
    # assert the stage fails loudly rather than emitting rows.
    with pytest.raises(Exception):
        audio_features(path).count()


def test_broadcast_join_matches_pandas(ray_session):
    import pyarrow.parquet as pq

    from ocrs_ray.ops.relational import orders_customer_join

    sf = "/root/testdata/sf0.001"
    out = orders_customer_join(sf).to_pandas().sort_values("c_nationkey")
    orders = pq.read_table(sf + "/orders.parquet").to_pandas()
    cust = pq.read_table(sf + "/customer.parquet").to_pandas()
    joined = orders.merge(cust, left_on="o_custkey", right_on="c_custkey")
    exp = joined.groupby("c_nationkey").size()
    assert dict(zip(out.c_nationkey, out.n_orders)) == exp.to_dict()


def test_media_ahash_neardup(ray_session, tmp_path):
    """Identical images pair at hamming 0; a structurally different
    image pairs with neither; banding finds the pair without a
    quadratic scan. Exactness vs brute force pinned on the kernel."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ocrs_ray.ops.multimodal import MediaAHasher, media_ahash_neardup

    rng = np.random.default_rng(7)
    base = (rng.integers(0, 2, size=(32, 32)) * 255).astype(np.uint8)
    other = np.zeros((32, 32), dtype=np.uint8)
    other[:, 16:] = 255
    rows = [
        ("m0", base), ("m1", base.copy()), ("m2", other),
    ]
    tbl = pa.table(
        {
            "media_ref": [r[0] for r in rows],
            "image": [r[1].tobytes() for r in rows],
            "height": pa.array([32] * 3, type=pa.int32()),
            "width": pa.array([32] * 3, type=pa.int32()),
            "channels": pa.array([1] * 3, type=pa.int32()),
            "format": ["raw8-hwc"] * 3,
        }
    )
    path = str(tmp_path / "media.parquet")
    pq.write_table(tbl, path)

    out = media_ahash_neardup(path, max_hamming=2).to_pandas()
    got = set(zip(out["media_a"], out["media_b"], out["hamming"]))
    assert got == {("m0", "m1", 0)}

    # Kernel brute-force agreement: every pair <= 2 found by banding.
    h = MediaAHasher()
    hs = {r[0]: h.hash_one((r[1].tobytes(), 32, 32, 1, "raw8-hwc")) for r in rows}
    brute = {
        (a, b, bin(hs[a] ^ hs[b]).count("1"))
        for i, a in enumerate(sorted(hs))
        for b in sorted(hs)[i + 1:]
        if bin(hs[a] ^ hs[b]).count("1") <= 2
    }
    assert got == brute


def test_media_ahash_survivors(ray_session, tmp_path):
    """One keeper per aHash component: identical pair keeps the
    lexicographic min; singleton keeps itself."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ocrs_ray.ops.multimodal import media_ahash_survivors

    rng = np.random.default_rng(7)
    base = (rng.integers(0, 2, size=(32, 32)) * 255).astype(np.uint8)
    other = np.zeros((32, 32), dtype=np.uint8)
    other[:, 16:] = 255
    rows = [("m0", base), ("m1", base.copy()), ("m2", other)]
    tbl = pa.table(
        {
            "media_ref": [r[0] for r in rows],
            "image": [r[1].tobytes() for r in rows],
            "height": pa.array([32] * 3, type=pa.int32()),
            "width": pa.array([32] * 3, type=pa.int32()),
            "channels": pa.array([1] * 3, type=pa.int32()),
            "format": ["raw8-hwc"] * 3,
        }
    )
    path = str(tmp_path / "media.parquet")
    pq.write_table(tbl, path)
    surv = sorted(media_ahash_survivors(path, max_hamming=2).to_pandas()["media_ref"])
    assert surv == ["m0", "m2"]
    # Distributed (hash-encoded cogroup) path pinned equal to the
    # broadcast dict path.
    surv_dist = sorted(
        media_ahash_survivors(path, max_hamming=2, broadcast_limit_bytes=0)
        .to_pandas()["media_ref"]
    )
    assert surv_dist == surv


def test_media_webdataset_roundtrip_exact(media_path):
    # Full value pin for the binary-payload tar sink/source: the
    # roundtrip digest table must equal the digest of the source media
    # table row-for-row (payload bytes, metadata, and sample count).
    import hashlib

    import pandas as pd
    import pyarrow.parquet as pq

    from ocrs_ray.ops.multimodal import media_webdataset_roundtrip

    got = (
        media_webdataset_roundtrip(media_path)
        .to_pandas()
        .sort_values("media_ref")
        .reset_index(drop=True)
    )
    src = pq.read_table(media_path).to_pandas()
    exp = pd.DataFrame(
        {
            "media_ref": src["media_ref"],
            "image_md5": [hashlib.md5(b).hexdigest() for b in src["image"]],
            "height": src["height"],
            "width": src["width"],
            "channels": src["channels"],
            "format": src["format"],
        }
    ).sort_values("media_ref").reset_index(drop=True)
    pd.testing.assert_frame_equal(got[exp.columns.tolist()], exp, check_dtype=False)


def test_media_webp_transcode_exact(media_path):
    """Full value pin for the lossy-WebP normalization stage: the
    distributed transcode must equal a single-process recompute
    row-for-row (payload bytes, sizes, ratio, PSNR) — the codec is
    pure-integer deterministic, so equality is exact."""
    import pyarrow.parquet as pq

    from ocrs_ray.ops.multimodal import media_webp_transcode
    from ocrs_ray.pipeline import decode_media
    from ocrs_ray.vp8 import encode_webp_lossy
    from ocrs_ray.webp import decode_webp

    got = (
        media_webp_transcode(media_path, q_index=8)
        .to_pandas()
        .sort_values("media_ref")
        .reset_index(drop=True)
    )
    src = pq.read_table(media_path).to_pandas()
    assert len(got) == len(src) > 0
    by_ref = {r["media_ref"]: r for _, r in got.iterrows()}
    n_checked = 0
    for _, s in src.iterrows():
        img = decode_media(
            (s["image"], s["height"], s["width"], s["channels"], s["format"])
        )
        if img.ndim == 2:
            img = img[:, :, None]
        blob = encode_webp_lossy(img, q_index=8)
        row = by_ref[s["media_ref"]]
        assert bytes(row["image"]) == blob
        assert row["orig_bytes"] == len(s["image"])
        assert row["webp_bytes"] == len(blob)
        assert row["compression_ratio_milli"] == 1000 * len(s["image"]) // len(blob)
        back = decode_webp(blob)
        srcp = img if img.shape[2] == 3 else np.repeat(img[:, :, :1], 3, 2)
        mse = float(np.mean((back.astype(np.float64) - srcp.astype(np.float64)) ** 2))
        psnr = 99_000 if mse == 0 else int(round(10_000 * np.log10(255 * 255 / mse)))
        assert row["psnr_milli_db"] == psnr
        assert row["psnr_milli_db"] > 20_000  # sane fidelity at q=8
        n_checked += 1
    assert n_checked == len(src)
    # the output is itself a valid media table: payloads decode
    first = got.iloc[0]
    dec = decode_media(
        (bytes(first["image"]), first["height"], first["width"],
         first["channels"], first["format"])
    )
    assert dec.shape == (first["height"], first["width"], 3)
