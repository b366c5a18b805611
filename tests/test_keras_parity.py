"""Full-network logits parity against the reference Keras model.

The zero-egress substitute for pretrained-weight parity: build the reference
builder's network (reference model.py:16-147) with healthy random weights,
port those exact weights into our JAX param dict through the same
load_keras_h5_weights path used for the real bonlime checkpoint, and assert
the 512x512 logits agree. A wiring divergence anywhere in the 100+ named
layers (BN epsilons, atrous rates, padding quirks, resize semantics) fails
this test.
"""

import os
import sys

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

REFERENCE_ROOT = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.exists(os.path.join(REFERENCE_ROOT, "model.py")),
    reason="reference checkout not mounted")

if REFERENCE_ROOT not in sys.path:
    sys.path.insert(0, REFERENCE_ROOT)


def _build_reference(backbone, os_, final_upsample):
    from model import DeeplabV3Plus as RefModel

    tf.keras.utils.set_random_seed(0)
    builder = RefModel(weights="pascal_voc", load_weights=False,
                       backbone=backbone, OS=os_, input_shape=(512, 512, 3))
    kmodel = builder.build_model(final_upsample=final_upsample)

    # Keras initializers decay activations to ~1e-11 through the deep stack
    # (BN is identity at init), which would make the comparison vacuous.
    # He-ish kernels + near-identity-but-nontrivial BN keep every layer's
    # output at a meaningful scale so a real wiring bug shows up.
    wrng = np.random.default_rng(42)
    for layer in kmodel.layers:
        for wvar in layer.weights:
            shape = tuple(wvar.shape)
            name = wvar.name if isinstance(wvar.name, str) else wvar.name.decode()
            if "variance" in name:
                val = wrng.uniform(0.8, 1.2, shape)
            elif "gamma" in name:
                val = wrng.uniform(1.0, 1.4, shape)
            elif "mean" in name or "beta" in name or "bias" in name:
                val = wrng.normal(0.0, 0.05, shape)
            else:
                fan_in = int(np.prod(shape[:-1])) if len(shape) >= 2 else shape[0]
                val = wrng.normal(0.0, 1.6 * np.sqrt(2.0 / fan_in), shape)
            wvar.assign(val.astype(np.float32))
    return kmodel


def _export_legacy_h5(kmodel, path):
    """Write the Keras weights in the legacy topological .h5 layout — the
    same layout as the bonlime release file — so the test exercises the real
    loader end-to-end."""
    import h5py

    with h5py.File(path, "w") as f:
        f.attrs["layer_names"] = np.array(
            [l.name.encode() for l in kmodel.layers])
        for layer in kmodel.layers:
            g = f.create_group(layer.name)
            names = []
            is_dw = layer.__class__.__name__ == "DepthwiseConv2D"
            for attr in ("kernel", "depthwise_kernel", "bias", "gamma",
                         "beta", "moving_mean", "moving_variance"):
                wvar = getattr(layer, attr, None)
                if wvar is None:
                    continue
                suffix = "depthwise_kernel" if (is_dw and attr == "kernel") else attr
                wname = f"{layer.name}/{suffix}:0"
                names.append(wname.encode())
                g.create_dataset(wname, data=np.asarray(wvar))
            g.attrs["weight_names"] = np.array(names)


@pytest.mark.parametrize("backbone,os_,final_upsample", [
    ("mobilenet", 8, False),
    ("xception", 16, False),
    ("xception", 8, False),
    ("mobilenet", 8, True),
])
def test_full_network_logits_parity(tmp_path, backbone, os_, final_upsample):
    from deeplabv3plus_augmented_superresolution_tpu.models import (
        DeepLabConfig,
        build_model,
    )
    from deeplabv3plus_augmented_superresolution_tpu.models.weights import (
        load_keras_h5_weights,
    )

    kmodel = _build_reference(backbone, os_, final_upsample)
    h5_path = str(tmp_path / "ref_weights.h5")
    _export_legacy_h5(kmodel, h5_path)

    cfg = DeepLabConfig(input_shape=(512, 512, 3), backbone=backbone, os=os_,
                        final_upsample=final_upsample)
    params, apply_fn = build_model(cfg, seed=1)

    keras_names = {l.name for l in kmodel.layers if l.weights}
    missing = sorted(keras_names - set(params))
    assert not missing, f"keras layers missing from our params: {missing}"
    extra = sorted(set(params) - {l.name for l in kmodel.layers})
    assert not extra, f"our params have no keras counterpart: {extra}"

    # strict=True: any shape mismatch anywhere is a wiring failure.
    params = load_keras_h5_weights(params, h5_path, strict=True)

    rng = np.random.default_rng(0)
    img = rng.uniform(0, 1, (1, 512, 512, 3)).astype(np.float32)
    ref = kmodel.predict(img, verbose=0)
    got = np.asarray(apply_fn(params, img))

    assert got.shape == ref.shape
    scale = float(np.abs(ref).max())
    assert scale > 1e-2, f"degenerate reference output scale {scale}"
    np.testing.assert_allclose(got, ref, atol=2e-5 * scale)
    assert (got.argmax(-1) == ref.argmax(-1)).mean() > 0.999
