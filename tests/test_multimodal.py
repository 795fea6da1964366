"""Multimodal operator tests: decode, features, thumbnails, frame
sampling over the media sidecar table."""

from __future__ import annotations

import numpy as np
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


def test_audio_stub_raises(media_path):
    from ocrs_ray.ops.multimodal import audio_features

    # Ray wraps the stub's NotImplementedError in RayTaskError /
    # UserCodeException layers; assert the stage fails rather than
    # silently emitting rows.
    with pytest.raises(Exception):
        audio_features(media_path).count()


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
