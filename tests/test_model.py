"""Model tests: layer numerics vs TF primitives, architecture shapes, h5 loading."""

import numpy as np
import pytest

from deeplabv3plus_augmented_superresolution_tpu.models import (
    DeepLabConfig,
    build_model,
    init_params,
    head_layer_name,
    load_keras_h5_weights,
)
from deeplabv3plus_augmented_superresolution_tpu.models.layers import (
    ParamStore,
    batch_norm,
    conv2d,
    depthwise_conv2d,
    manual_same_padding,
    make_divisible,
    sepconv_bn,
)

tf = pytest.importorskip("tensorflow")


# ---------------------------------------------------------------------------
# Layer numerics vs TF
# ---------------------------------------------------------------------------

def test_conv2d_same_stride2_matches_keras():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, 16, 16, 3), dtype=np.float32)
    k = rng.standard_normal((3, 3, 3, 8), dtype=np.float32)
    store = ParamStore({"c": {"kernel": k}})
    ours = np.asarray(conv2d(store, "c", x, 8, kernel_size=3, stride=2))
    theirs = tf.nn.conv2d(x, k, strides=2, padding="SAME").numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)


def test_depthwise_dilated_matches_tf():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((1, 20, 20, 6), dtype=np.float32)
    k_keras = rng.standard_normal((3, 3, 6, 1), dtype=np.float32)
    store = ParamStore({"d": {"depthwise_kernel": np.transpose(k_keras, (0, 1, 3, 2))}})
    ours = np.asarray(depthwise_conv2d(store, "d", x, kernel_size=3, rate=2))
    theirs = tf.nn.depthwise_conv2d(x, k_keras, strides=[1, 1, 1, 1],
                                    padding="SAME", dilations=[2, 2]).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)


def test_batch_norm_matches_tf():
    rng = np.random.default_rng(2)
    x = rng.standard_normal((2, 8, 8, 4), dtype=np.float32)
    g, b = rng.standard_normal((2, 4), dtype=np.float32)
    mean = rng.standard_normal(4).astype(np.float32)
    var = rng.uniform(0.5, 2.0, 4).astype(np.float32)
    store = ParamStore({"bn": {"gamma": g, "beta": b,
                               "moving_mean": mean, "moving_variance": var}})
    ours = np.asarray(batch_norm(store, "bn", x, epsilon=1e-5))
    theirs = tf.nn.batch_normalization(x, mean, var, b, g, 1e-5).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)


def test_manual_same_padding_values():
    # k=3, rate=1 -> (1, 1); k=3, rate=2 -> (2, 2) (reference model.py:477-484)
    assert manual_same_padding(3, 1) == (1, 1)
    assert manual_same_padding(3, 2) == (2, 2)
    assert manual_same_padding(1, 1) == (0, 0)


def test_strided_sepconv_uses_symmetric_padding():
    """The reference pads (1,1) manually then uses VALID for stride-2 sepconvs,
    which differs from TF SAME's (0,1) by a 1px alignment — reproduce it."""
    rng = np.random.default_rng(3)
    x = rng.standard_normal((1, 8, 8, 2), dtype=np.float32)
    kd_keras = rng.standard_normal((3, 3, 2, 1), dtype=np.float32)
    kp = rng.standard_normal((1, 1, 2, 4), dtype=np.float32)
    bn_id = {"gamma": np.ones(2, np.float32), "beta": np.zeros(2, np.float32),
             "moving_mean": np.zeros(2, np.float32),
             "moving_variance": np.ones(2, np.float32) - 1e-3}
    bn_id4 = {k: np.resize(v, 4) for k, v in bn_id.items()}
    store = ParamStore({
        "p_depthwise": {"depthwise_kernel": np.transpose(kd_keras, (0, 1, 3, 2))},
        "p_depthwise_BN": bn_id,
        "p_pointwise": {"kernel": kp},
        "p_pointwise_BN": bn_id4,
    })
    ours = np.asarray(sepconv_bn(store, x, 4, "p", stride=2, depth_activation=True))
    x_pad = tf.pad(x, [[0, 0], [1, 1], [1, 1], [0, 0]])
    t = tf.nn.depthwise_conv2d(x_pad, kd_keras, strides=[1, 2, 2, 1], padding="VALID")
    t = tf.nn.relu(t)
    t = tf.nn.conv2d(t, kp, strides=1, padding="SAME")
    theirs = tf.nn.relu(t).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)


def test_make_divisible():
    assert make_divisible(32, 8) == 32
    assert make_divisible(16, 8) == 16
    assert make_divisible(12, 8) == 16  # rounds up when >10% drop


# ---------------------------------------------------------------------------
# Architecture shapes (small inputs to keep CPU runtime sane)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("os_,feat", [(16, 8), (8, 16)])
def test_xception_output_shapes(os_, feat):
    cfg = DeepLabConfig(input_shape=(128, 128, 3), os=os_,
                        final_upsample=False)
    params, apply_fn = build_model(cfg, seed=0)
    x = np.zeros((1, 128, 128, 3), np.float32)
    out = apply_fn(params, x)
    # decoder output is at the entry_flow_block2 skip resolution (x4 of OS16)
    assert out.shape == (1, 32, 32, 21)


def test_xception_final_upsample_shape():
    cfg = DeepLabConfig(input_shape=(128, 128, 3), final_upsample=True)
    params, apply_fn = build_model(cfg, seed=0)
    out = apply_fn(params, np.zeros((1, 128, 128, 3), np.float32))
    assert out.shape == (1, 128, 128, 21)


def test_mobilenet_shapes_and_os8():
    cfg = DeepLabConfig(input_shape=(128, 128, 3), backbone="mobilenet",
                        os=16, final_upsample=False)
    assert cfg.os == 8  # forced (reference model.py:53-55)
    params, apply_fn = build_model(cfg, seed=0)
    out = apply_fn(params, np.zeros((1, 128, 128, 3), np.float32))
    # mobilenet output stays at OS8 (no decoder): 128/8 = 16
    assert out.shape == (1, 16, 16, 21)


def test_decoder_variants():
    for kwargs in ({"only_dcnn_output": True}, {"only_aspp_output": True}):
        cfg = DeepLabConfig(input_shape=(128, 128, 3), final_upsample=False,
                            first_upsample_size=(32, 32), **kwargs)
        params, apply_fn = build_model(cfg, seed=0)
        out = apply_fn(params, np.zeros((1, 128, 128, 3), np.float32))
        assert out.shape == (1, 32, 32, 21)


def test_head_name_switching():
    assert head_layer_name(DeepLabConfig()) == "logits_semantic"
    assert head_layer_name(DeepLabConfig(classes=5)) == "custom_logits_semantic"
    assert head_layer_name(DeepLabConfig(weights=None)) == "custom_logits_semantic"


def test_last_activation_and_reshape():
    cfg = DeepLabConfig(input_shape=(64, 64, 3), last_activation="softmax",
                        reshape_outputs=True)
    params, apply_fn = build_model(cfg, seed=0)
    out = np.asarray(apply_fn(params, np.zeros((1, 64, 64, 3), np.float32)))
    assert out.shape == (1, 64 * 64, 21)
    np.testing.assert_allclose(out.sum(-1), 1.0, rtol=1e-5)


def test_bfloat16_forward_runs():
    cfg = DeepLabConfig(input_shape=(64, 64, 3), compute_dtype="bfloat16",
                        final_upsample=False)
    params, apply_fn = build_model(cfg, seed=0)
    out = apply_fn(params, np.zeros((1, 64, 64, 3), np.float32))
    assert out.dtype == np.float32  # logits cast back for downstream parity


# ---------------------------------------------------------------------------
# Keras-h5 weight loading
# ---------------------------------------------------------------------------

def test_h5_weight_loading_roundtrip(tmp_path):
    import h5py

    cfg = DeepLabConfig(input_shape=(64, 64, 3), backbone="mobilenet",
                        final_upsample=False)
    params = init_params(cfg, seed=0)

    # Write a Keras-style weights file covering two layers + the head.
    path = str(tmp_path / "w.h5")
    rng = np.random.default_rng(0)
    with h5py.File(path, "w") as f:
        f.attrs["layer_names"] = [b"Conv", b"Conv_BN", b"expanded_conv_depthwise",
                                  b"logits_semantic"]
        g = f.create_group("Conv")
        conv_kernel = rng.standard_normal(params["Conv"]["kernel"].shape).astype(np.float32)
        g.attrs["weight_names"] = [b"Conv/kernel:0"]
        g.create_dataset("Conv/kernel:0", data=conv_kernel)

        g = f.create_group("Conv_BN")
        names = ["gamma", "beta", "moving_mean", "moving_variance"]
        g.attrs["weight_names"] = [f"Conv_BN/{n}:0".encode() for n in names]
        for n in names:
            g.create_dataset(f"Conv_BN/{n}:0",
                             data=rng.standard_normal(32).astype(np.float32))

        g = f.create_group("expanded_conv_depthwise")
        dw = rng.standard_normal((3, 3, 32, 1)).astype(np.float32)
        g.attrs["weight_names"] = [b"expanded_conv_depthwise/depthwise_kernel:0"]
        g.create_dataset("expanded_conv_depthwise/depthwise_kernel:0", data=dw)

        # Mismatched head (as when classes != 21): must be skipped silently.
        g = f.create_group("logits_semantic")
        g.attrs["weight_names"] = [b"logits_semantic/kernel:0", b"logits_semantic/bias:0"]
        g.create_dataset("logits_semantic/kernel:0",
                         data=np.zeros((1, 1, 256, 99), np.float32))
        g.create_dataset("logits_semantic/bias:0", data=np.zeros(99, np.float32))

    loaded = load_keras_h5_weights(params, path)
    np.testing.assert_array_equal(np.asarray(loaded["Conv"]["kernel"]), conv_kernel)
    # depthwise transposed to grouped-HWIO
    np.testing.assert_array_equal(
        np.asarray(loaded["expanded_conv_depthwise"]["depthwise_kernel"]),
        np.transpose(dw, (0, 1, 3, 2)))
    # mismatched head kept the random init
    np.testing.assert_array_equal(
        np.asarray(loaded["logits_semantic"]["kernel"]),
        np.asarray(params["logits_semantic"]["kernel"]))
    # untouched layers identical
    np.testing.assert_array_equal(
        np.asarray(loaded["expanded_conv_1_expand"]["kernel"]),
        np.asarray(params["expanded_conv_1_expand"]["kernel"]))
