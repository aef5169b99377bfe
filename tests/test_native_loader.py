"""Native (C++) data-loader: build, cv2 parity, batch decode, pipeline wiring."""

import os

import numpy as np
import pytest

from artist_style_transfer_tpu.data import native_loader as nl

pytestmark = pytest.mark.skipif(
    not nl.available(), reason="native toolchain unavailable"
)

REF_IMAGES = "/root/reference/cuteimages"


def test_resample_resize_matches_cv2():
    import cv2

    rng = np.random.default_rng(0)
    img = (rng.random((48, 80, 3)) * 255).astype(np.uint8)
    ours = nl.resample(img, 24, 31, nl.MODE_RESIZE)
    theirs = cv2.resize(img, (31, 24), interpolation=cv2.INTER_LINEAR).astype(np.float32)
    assert np.abs(ours - theirs).max() < 1.0  # cv2 fixed-point LSB


def test_resample_rescale_matches_cv2_warp():
    import cv2

    rng = np.random.default_rng(1)
    img = (rng.random((48, 80, 3)) * 255).astype(np.uint8)
    th, tw = 32, 56
    h_s, w_s = th / 48, tw / 80
    M = np.array([[w_s, 0, tw / 2 - w_s * 80 / 2], [0, h_s, th / 2 - h_s * 48 / 2]])
    theirs = cv2.warpAffine(img, M, (tw, th)).astype(np.float32)
    ours = nl.resample(img, th, tw, nl.MODE_RESCALE)
    assert np.abs(ours - theirs).max() < 1.0


@pytest.mark.skipif(not os.path.isdir(REF_IMAGES), reason="demo images not mounted")
def test_decode_batch_matches_cv2():
    import cv2

    paths = sorted(
        os.path.join(REF_IMAGES, f) for f in os.listdir(REF_IMAGES) if f.endswith((".jpg", ".jpeg"))
    )[:4]
    out, ok = nl.decode_batch(paths, 64, 64)
    assert ok.all()
    for i, p in enumerate(paths):
        ref = cv2.resize(cv2.imread(p), (64, 64)).astype(np.float32)
        assert np.abs(out[i] - ref).max() < 1.0, p


def test_decode_batch_bad_files(tmp_path):
    good = os.path.join(REF_IMAGES, "landscape.jpg")
    bad = str(tmp_path / "junk.jpg")
    with open(bad, "wb") as f:
        f.write(b"not a jpeg at all")
    missing = str(tmp_path / "missing.jpg")
    out, ok = nl.decode_batch([good, bad, missing], 32, 32)
    assert ok.tolist() == [True, False, False]
    assert np.all(out[1] == 0) and np.all(out[2] == 0)  # failures zeroed


@pytest.mark.skipif(not os.path.isdir(REF_IMAGES), reason="demo images not mounted")
def test_content_dataset_uses_native_path():
    from artist_style_transfer_tpu.data import get_content_dataset

    images = get_content_dataset(4, 48, 48, content_dir=REF_IMAGES, seed=0)
    assert images.shape == (4, 48, 48, 3)
    assert images.dtype == np.float32
    assert images.max() > 1.0  # [0,255] scale


def test_native_reject_falls_back_to_cv2_per_file(tmp_path):
    """A file the native JPEG decoder rejects (here: a PNG named .jpg) must
    still enter the corpus via the per-file cv2 fallback (ADVICE r1 —
    cv2.imread handles CMYK JPEGs and other formats the fast path doesn't)."""
    import cv2

    from artist_style_transfer_tpu.data import get_content_dataset

    rng = np.random.default_rng(0)
    for i in range(2):
        img = (rng.random((30, 30, 3)) * 255).astype(np.uint8)
        cv2.imwrite(str(tmp_path / f"good{i}.jpg"), img)
    png = (rng.random((30, 30, 3)) * 255).astype(np.uint8)
    ok = cv2.imwrite(str(tmp_path / "sneaky.jpg.png"), png)
    assert ok
    os.rename(tmp_path / "sneaky.jpg.png", tmp_path / "sneaky.jpg")

    images = get_content_dataset(3, 24, 24, content_dir=str(tmp_path), seed=0)
    assert images.shape == (3, 24, 24, 3), "PNG-in-.jpg must not be dropped"
    # and the fallback content matches a direct cv2 decode+resize
    want = cv2.resize(cv2.imread(str(tmp_path / "sneaky.jpg")), (24, 24)).astype(np.float32)
    assert min(float(np.abs(im - want).max()) for im in images) == 0.0
