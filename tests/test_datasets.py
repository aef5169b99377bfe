"""Data pipeline tests against a synthetic reference-layout workspace."""

import os
import pickle

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from artist_style_transfer_tpu.data import (
    get_avg_dataset,
    get_content_dataset,
    get_painting_dataset,
    load_artist_names,
    rescale_image,
)


@pytest.fixture()
def workspace(tmp_path):
    """Synthetic images/ + dicts/ in the reference layout (dataset.py:10-13)."""
    rng = np.random.default_rng(0)
    archive = tmp_path / "images" / "archive"
    content = tmp_path / "images" / "content"
    dicts = tmp_path / "dicts"
    for d in (archive, content, dicts):
        d.mkdir(parents=True)
    (archive / "resized" / "resized").mkdir(parents=True)

    with open(archive / "artists.csv", "w") as f:
        f.write("id,name,paintings\n0,Artist One,2\n1,Artist Two,1\n")

    for name, n in (("Artist_One", 2), ("Artist_Two", 1)):
        for i in range(1, n + 1):
            img = (rng.random((40 + 8 * i, 52, 3)) * 255).astype(np.uint8)
            cv2.imwrite(str(archive / "resized" / "resized" / f"{name}_{i}.jpg"), img)

    for i in range(5):
        img = (rng.random((36, 44, 3)) * 255).astype(np.uint8)
        cv2.imwrite(str(content / f"c{i}.jpg"), img)
    # one unreadable file, as the reference tolerates (dataset.py:98-99)
    (content / "junk.jpg").write_bytes(b"nope")

    return tmp_path


def test_load_artist_names(workspace):
    names, counts = load_artist_names(str(workspace / "images" / "archive") + "/")
    assert names == ["Artist_One", "Artist_Two"]
    assert counts == [2, 1]


def test_content_dataset(workspace):
    images = get_content_dataset(4, 24, 24, content_dir=str(workspace / "images" / "content"), seed=1)
    assert images.shape == (4, 24, 24, 3)
    # deterministic under the same seed
    again = get_content_dataset(4, 24, 24, content_dir=str(workspace / "images" / "content"), seed=1)
    np.testing.assert_array_equal(images, again)


def test_painting_dataset_decode_and_cache(workspace):
    kwargs = dict(
        rescale_height=16,
        rescale_width=16,
        archive_dir=str(workspace / "images" / "archive") + "/",
        cache_dir=str(workspace / "dicts") + "/",
    )
    d = get_painting_dataset(for_classifier=False, load_pickle=False, save_pickle=True, **kwargs)
    assert set(d) == {"Artist_One", "Artist_Two"}
    assert d["Artist_One"].shape == (2, 16, 16, 3)
    assert d["Artist_Two"].shape == (1, 16, 16, 3)

    # reload via the npz cache (exact to uint8 quantization of the cache)
    d2 = get_painting_dataset(for_classifier=False, load_pickle=True, **kwargs)
    assert np.abs(d2["Artist_One"] - d["Artist_One"]).max() <= 1.0


def test_painting_dataset_cache_is_shape_stable_across_round_trips(workspace):
    """The npz cache stores already-rescaled images: reloading with default
    dims must NOT re-derive (and halve) the target shape, and re-saving must
    leave the cache unchanged — no shrink-per-round-trip."""
    kwargs = dict(
        archive_dir=str(workspace / "images" / "archive") + "/",
        cache_dir=str(workspace / "dicts") + "/",
    )
    d = get_painting_dataset(
        for_classifier=False, load_pickle=False, save_pickle=True,
        rescale_height=16, rescale_width=16, **kwargs,
    )
    # default dims (-1): the cached shape is authoritative, not avg//2 of it
    d2 = get_painting_dataset(for_classifier=False, load_pickle=True, save_pickle=True, **kwargs)
    assert d2["Artist_One"].shape == (2, 16, 16, 3)
    np.testing.assert_array_equal(d2["Artist_One"], d["Artist_One"].astype(np.uint8))
    # third round trip: still byte-identical (no cumulative warp drift)
    d3 = get_painting_dataset(for_classifier=False, load_pickle=True, **kwargs)
    np.testing.assert_array_equal(d3["Artist_One"], d2["Artist_One"])
    # matching explicit dims reuse the cache directly too
    d4 = get_painting_dataset(
        for_classifier=False, load_pickle=True, rescale_height=16, rescale_width=16, **kwargs
    )
    np.testing.assert_array_equal(d4["Artist_One"], d2["Artist_One"])
    # explicit differing dims re-rescale from the cached corpus
    d5 = get_painting_dataset(
        for_classifier=False, load_pickle=True, rescale_height=8, rescale_width=8, **kwargs
    )
    assert d5["Artist_One"].shape == (2, 8, 8, 3)


def test_painting_dataset_reads_reference_pickles(workspace):
    rng = np.random.default_rng(3)
    data = {"Artist_One": [(rng.random((20, 20, 3)) * 255).astype(np.uint8)],
            "Artist_Two": [(rng.random((24, 20, 3)) * 255).astype(np.uint8)]}
    with open(workspace / "dicts" / "full_int_0.pkl", "wb") as f:
        pickle.dump(data, f)
    d = get_painting_dataset(
        for_classifier=False,
        rescale_height=12,
        rescale_width=12,
        archive_dir=str(workspace / "images" / "archive") + "/",
        cache_dir=str(workspace / "dicts") + "/",
    )
    assert d["Artist_One"].shape == (1, 12, 12, 3)
    ref = rescale_image(data["Artist_One"][0], 12, 12)
    np.testing.assert_allclose(d["Artist_One"][0], ref, atol=1e-3)


def test_painting_dataset_classifier_mode(workspace):
    images, labels = get_painting_dataset(
        for_classifier=True,
        rescale_height=16,
        rescale_width=16,
        load_pickle=False,
        archive_dir=str(workspace / "images" / "archive") + "/",
        cache_dir=str(workspace / "dicts") + "/",
    )
    assert images.shape == (3, 16, 16, 3)
    assert labels.tolist() == [0, 0, 1]
    # torchvision-normalized RGB: roughly centered
    assert abs(float(images.mean())) < 3.0


def test_avg_dataset(workspace):
    avg = get_avg_dataset(
        rescale_height=16,
        rescale_width=16,
        archive_dir=str(workspace / "images" / "archive") + "/",
        cache_dir=str(workspace / "dicts") + "/",
    )
    assert avg["Artist_One"].shape == (16, 16, 3)
    assert avg["Artist_One"].dtype == np.float32
    assert 0 <= avg["Artist_One"].min() and avg["Artist_One"].max() <= 255


def test_classifier_cache_fast_path(workspace):
    """dicts/in_tensors.npz + out_tensors.npz short-circuit the corpus build
    (reference dataset.py:183-188); NCHW cache -> NHWC canonical layout."""
    rng = np.random.default_rng(4)
    ins = rng.standard_normal((5, 3, 16, 16)).astype(np.float32)
    outs = np.array([0, 0, 1, 1, 1], np.int64)
    np.savez(workspace / "dicts" / "in_tensors.npz", ins)
    np.savez(workspace / "dicts" / "out_tensors.npz", outs)
    images, labels = get_painting_dataset(
        for_classifier=True,
        archive_dir=str(workspace / "images" / "archive") + "/",
        cache_dir=str(workspace / "dicts") + "/",
    )
    assert images.shape == (5, 16, 16, 3)
    np.testing.assert_allclose(images, ins.transpose(0, 2, 3, 1))
    assert labels.dtype == np.int32
    np.testing.assert_array_equal(labels, outs)
