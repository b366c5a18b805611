"""Golden tests: ops.resize must match tf.image.resize bit-for-bit-ish.

The reference relies on tf.image.resize defaults (half-pixel centers, no
antialias) — reference superresolution.py:67-68, model.py:108-111. TF (CPU)
is available in this image, so we test against it directly.
"""

import numpy as np
import pytest

from deeplabv3plus_augmented_superresolution_tpu.ops import resize

tf = pytest.importorskip("tensorflow")


@pytest.mark.parametrize("in_size,out_size", [
    ((128, 128), (512, 512)),   # SR init / max-mean upsample path
    ((512, 512), (128, 128)),   # SR downsampling operator D
    ((32, 32), (128, 128)),     # decoder x4 upsample
    ((1, 1), (32, 32)),         # ASPP image-pooling broadcast
    ((37, 53), (64, 48)),       # odd sizes
])
def test_bilinear_matches_tf(in_size, out_size):
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, *in_size, 3), dtype=np.float32)
    ours = np.asarray(resize(x, out_size, method="bilinear"))
    theirs = tf.image.resize(x, out_size, method="bilinear").numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("in_size,out_size", [
    ((512, 512), (128, 128)),
    ((100, 100), (512, 512)),
    ((37, 53), (64, 48)),
])
def test_nearest_matches_tf(in_size, out_size):
    rng = np.random.default_rng(1)
    x = rng.integers(0, 255, size=(1, *in_size, 1)).astype(np.float32)
    ours = np.asarray(resize(x, out_size, method="nearest"))
    theirs = tf.image.resize(x, out_size, method="nearest").numpy()
    np.testing.assert_array_equal(ours, theirs)


def test_nearest_preserves_integer_dtype():
    x = np.arange(16, dtype=np.int32).reshape(1, 4, 4, 1)
    y = resize(x, (8, 8), method="nearest")
    assert y.dtype == np.int32


def test_identity_resize_is_noop():
    x = np.random.default_rng(2).standard_normal((1, 64, 64, 3), dtype=np.float32)
    np.testing.assert_array_equal(np.asarray(resize(x, (64, 64))), x)
