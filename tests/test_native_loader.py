"""Native C++ host-staging runtime (native/asr_host.cc) vs the PIL path.

The component is new-by-design (the reference has no native code, SURVEY.md
§2); its contract is data.io.load_image's: identical decode + TF-semantics
resize, delivered in order by a decode-ahead worker ring.
"""

import os

import numpy as np
import pytest

from deeplabv3plus_augmented_superresolution_tpu.data import load_image
from deeplabv3plus_augmented_superresolution_tpu.data import native_loader

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
JPG = os.path.join(REPO, "test_images", "smoke_input.jpg")
PNG = os.path.join(REPO, "test_images", "smoke_gt.png")

pytestmark = pytest.mark.skipif(
    not native_loader.available(),
    reason=f"native loader unavailable: {native_loader.build_error()}")


def test_jpeg_decode_matches_pil():
    ours = native_loader.load_image_native(JPG, (512, 512))
    ref = load_image(JPG, image_size=(512, 512), normalize=True)
    assert ours.shape == ref.shape == (512, 512, 3)
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_jpeg_bilinear_resize_matches_tf_semantics():
    ours = native_loader.load_image_native(JPG, (384, 256))
    ref = load_image(JPG, image_size=(384, 256), normalize=True)
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_label_png_nearest_resize_exact():
    for size in [(512, 512), (128, 128), (100, 300)]:
        ours = native_loader.load_image_native(PNG, size, normalize=False,
                                               is_label=True)
        ref = load_image(PNG, image_size=size, normalize=False, is_png=True,
                         resize_method="nearest")
        np.testing.assert_array_equal(ours, ref)
        assert set(np.unique(ours)) <= {0.0, 8.0, 255.0}


def test_ring_in_order_and_bitwise_equal(tmp_path):
    import shutil

    paths = []
    for i in range(7):
        p = tmp_path / f"img{i}.jpg"
        shutil.copy(JPG, p)
        paths.append(str(p))
    want = native_loader.load_image_native(JPG, (256, 256))
    ring = native_loader.ImageRing(paths, (256, 256), n_threads=3, capacity=3)
    seen = []
    for idx, arr in ring:
        seen.append(idx)
        np.testing.assert_array_equal(arr, want)
    ring.close()
    assert seen == list(range(7))


def test_decode_error_raises(tmp_path):
    bad = tmp_path / "bad.jpg"
    bad.write_bytes(b"this is not a jpeg")
    with pytest.raises(IOError):
        native_loader.load_image_native(str(bad), (64, 64))


def test_ring_ordering_under_contention(tmp_path):
    """Regression for the slot-claim race: with more workers than in-window
    indices, a worker finishing image idx+capacity early must NOT write its
    slot before image idx's occupant is consumed. Distinct solid-color
    images make any index/content swap detectable (JPEG keeps solid colors
    within ~2/255)."""
    from PIL import Image

    n = 48
    paths = []
    for i in range(n):
        val = int(255 * (i + 1) / (n + 1))
        img = np.full((32, 32, 3), val, np.uint8)
        p = tmp_path / f"img_{i:03d}.jpg"
        Image.fromarray(img).save(p, quality=95)
        paths.append(str(p))

    for repeat in range(3):  # races are probabilistic — hammer it a little
        ring = native_loader.ImageRing(paths, (32, 32), normalize=True,
                                       n_threads=4, capacity=2)
        try:
            got = 0
            for i, frame in ring:
                expect = (i + 1) / (n + 1)
                mean = float(frame.mean())
                assert abs(mean - expect) < 0.02, (
                    f"repeat {repeat}: index {i} delivered content with mean "
                    f"{mean:.4f}, expected ~{expect:.4f} — index/content swap")
                assert i == got, f"out-of-order delivery: {i} after {got - 1}"
                got += 1
            assert got == n
        finally:
            ring.close()


@pytest.mark.skipif(
    not native_loader.available(),
    reason=f"native loader unavailable: {native_loader.build_error()}")
def test_ring_bf16_matches_numpy_rounding():
    """dtype="bfloat16" frames equal the float ring's output rounded to bf16
    with round-to-nearest-even (XLA convert semantics) — the serving path
    feeds these straight to the device."""
    import ml_dtypes

    ring = native_loader.ImageRing([JPG], (128, 128), dtype="float32")
    _, f32 = next(iter(ring))
    ring.close()
    ring = native_loader.ImageRing([JPG], (128, 128), dtype="bfloat16")
    _, bf = next(iter(ring))
    ring.close()
    assert bf.dtype == ml_dtypes.bfloat16
    want = f32.astype(ml_dtypes.bfloat16)
    np.testing.assert_array_equal(np.asarray(want).view(np.uint16),
                                  np.asarray(bf).view(np.uint16))
