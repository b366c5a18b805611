"""DeepLabV3+ (Xception / MobileNetV2 backbones) as a pure JAX function.

Re-implements the architecture constructed by the reference's Keras builder
(reference model.py:16-461) as a functional NHWC forward pass over a flat
param dict keyed by the same Keras layer names. Everything is static-shaped
and jit-friendly; the whole network is one XLA program (convs on the MXU,
BN/ReLU fused by XLA).

Capabilities mirrored:
  * Xception backbone with OS 8/16 (entry/middle/exit flows, atrous rates;
    reference model.py:42-52, 149-190)
  * MobileNetV2 backbone, OS forced to 8 (reference model.py:53-55, 308-379)
  * ASPP with image-level pooling branch (reference model.py:192-233)
  * standard decoder plus the only_DCNN / only_ASPP variants
    (reference model.py:235-294)
  * class-prediction head with pretrained-name switching
    (reference model.py:296-306)
  * optional final bilinear upsample / reshape / activation
    (reference model.py:102-125)
"""

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops.resize import resize
from .layers import (
    ParamStore,
    Params,
    batch_norm,
    conv2d,
    conv2d_same,
    depthwise_conv2d,
    global_average_pool,
    make_divisible,
    relu,
    relu6,
    sepconv_bn,
)


@dataclasses.dataclass(frozen=True)
class DeepLabConfig:
    input_shape: Tuple[int, int, int] = (512, 512, 3)
    classes: int = 21
    os: int = 16
    backbone: str = "xception"  # "xception" | "mobilenet"
    alpha: float = 1.0          # mobilenet width multiplier
    weights: Optional[str] = "pascal_voc"
    last_activation: Optional[str] = None  # None | "softmax" | "sigmoid"
    reshape_outputs: bool = False
    final_upsample: bool = True
    final_class_prediction: bool = True
    only_dcnn_output: bool = False
    only_aspp_output: bool = False
    first_upsample_size: Tuple[int, int] = (128, 128)
    compute_dtype: str = "float32"  # "float32" | "bfloat16"

    def __post_init__(self):
        if self.backbone not in ("xception", "mobilenet"):
            raise ValueError("Backbone must be either xception or mobilenet")
        if self.last_activation not in (None, "softmax", "sigmoid"):
            raise ValueError("last_activation must be None, softmax or sigmoid")
        if self.weights not in (None, "pascal_voc"):
            raise ValueError("weights must be None or 'pascal_voc'")
        if self.only_dcnn_output and self.only_aspp_output:
            raise ValueError("only_dcnn_output and only_aspp_output are exclusive")
        if self.backbone == "mobilenet":
            object.__setattr__(self, "os", 8)

    @property
    def xception_rates(self):
        """(entry_block3_stride, middle_block_rate, exit_block_rates, atrous_rates)
        per reference model.py:42-52."""
        if self.os == 8:
            return 1, 2, (2, 4), (12, 24, 36)
        return 2, 1, (1, 2), (6, 12, 18)


# ---------------------------------------------------------------------------
# Xception backbone
# ---------------------------------------------------------------------------

def _xception_block(store, x, filters, prefix, skip_type, last_stride,
                    rate=1, depth_activation=False, return_skip=False):
    """3 SepConv_BN + conv/sum/no shortcut (reference model.py:381-424)."""
    residual = x
    skip = None
    for i in range(3):
        residual = sepconv_bn(store, residual, filters[i],
                              f"{prefix}_separable_conv{i + 1}",
                              stride=last_stride if i == 2 else 1,
                              rate=rate, depth_activation=depth_activation)
        if i == 1:
            skip = residual
    if skip_type == "conv":
        shortcut = conv2d_same(store, x, filters[-1], prefix + "_shortcut",
                               kernel_size=1, stride=last_stride)
        shortcut = batch_norm(store, prefix + "_shortcut_BN", shortcut)
        out = residual + shortcut
    elif skip_type == "sum":
        out = residual + x
    else:
        out = residual
    return (out, skip) if return_skip else out


def _xception_backbone(store, x, cfg: DeepLabConfig):
    entry_stride, middle_rate, exit_rates, _ = cfg.xception_rates

    x = conv2d(store, "entry_flow_conv1_1", x, 32, kernel_size=3, stride=2)
    x = batch_norm(store, "entry_flow_conv1_1_BN", x)
    x = relu(x)
    x = conv2d(store, "entry_flow_conv1_2", x, 64, kernel_size=3, stride=1)
    x = batch_norm(store, "entry_flow_conv1_2_BN", x)
    x = relu(x)

    x = _xception_block(store, x, [128, 128, 128], "entry_flow_block1",
                        "conv", last_stride=2)
    x, skip = _xception_block(store, x, [256, 256, 256], "entry_flow_block2",
                              "conv", last_stride=2, return_skip=True)
    x = _xception_block(store, x, [728, 728, 728], "entry_flow_block3",
                        "conv", last_stride=entry_stride)

    for i in range(16):
        x = _xception_block(store, x, [728, 728, 728], f"middle_flow_unit_{i + 1}",
                            "sum", last_stride=1, rate=middle_rate)

    x = _xception_block(store, x, [728, 1024, 1024], "exit_flow_block1",
                        "conv", last_stride=1, rate=exit_rates[0])
    x = _xception_block(store, x, [1536, 1536, 2048], "exit_flow_block2",
                        None, last_stride=1, rate=exit_rates[1],
                        depth_activation=True)
    return x, skip


# ---------------------------------------------------------------------------
# MobileNetV2 backbone
# ---------------------------------------------------------------------------

def _inverted_res_block(store, x, expansion, stride, alpha, filters, block_id,
                        skip_connection, rate=1):
    in_ch = x.shape[-1]
    pointwise = make_divisible(int(filters * alpha), 8)
    prefix = f"expanded_conv_{block_id}_"
    inputs = x
    x = conv2d(store, prefix + "expand", x, expansion * in_ch, kernel_size=1)
    x = batch_norm(store, prefix + "expand_BN", x, epsilon=1e-3)
    x = relu6(x)
    x = depthwise_conv2d(store, prefix + "depthwise", x, kernel_size=3,
                         stride=stride, rate=rate, padding="SAME")
    x = batch_norm(store, prefix + "depthwise_BN", x, epsilon=1e-3)
    x = relu6(x)
    x = conv2d(store, prefix + "project", x, pointwise, kernel_size=1)
    x = batch_norm(store, prefix + "project_BN", x, epsilon=1e-3)
    if skip_connection:
        return inputs + x
    return x


def _mobilenet_backbone(store, x, cfg: DeepLabConfig):
    alpha = cfg.alpha
    first_filters = make_divisible(32 * alpha, 8)
    x = conv2d(store, "Conv" if cfg.input_shape[2] == 3 else "Conv_", x,
               first_filters, kernel_size=3, stride=2)
    x = batch_norm(store, "Conv_BN", x, epsilon=1e-3)
    x = relu6(x)
    x = depthwise_conv2d(store, "expanded_conv_depthwise", x, kernel_size=3,
                         stride=1, padding="SAME")
    x = batch_norm(store, "expanded_conv_depthwise_BN", x, epsilon=1e-3)
    x = relu6(x)
    x = conv2d(store, "expanded_conv_project", x,
               make_divisible(int(16 * alpha), 8), kernel_size=1)
    x = batch_norm(store, "expanded_conv_project_BN", x, epsilon=1e-3)

    # (filters, stride, rate, skip) per block, reference model.py:339-379.
    blocks = [
        (24, 2, 1, False), (24, 1, 1, True),
        (32, 2, 1, False), (32, 1, 1, True), (32, 1, 1, True),
        (64, 1, 1, False), (64, 1, 2, True), (64, 1, 2, True), (64, 1, 2, True),
        (96, 1, 2, False), (96, 1, 2, True), (96, 1, 2, True),
        (160, 1, 2, False), (160, 1, 4, True), (160, 1, 4, True),
        (320, 1, 4, False),
    ]
    for block_id, (filters, stride, rate, skip) in enumerate(blocks, start=1):
        x = _inverted_res_block(store, x, expansion=6, stride=stride,
                                alpha=alpha, filters=filters, block_id=block_id,
                                skip_connection=skip, rate=rate)
    return x


# ---------------------------------------------------------------------------
# ASPP / decoder / head
# ---------------------------------------------------------------------------

def _aspp(store, x, cfg: DeepLabConfig):
    feat_h, feat_w = x.shape[-3], x.shape[-2]
    _, _, _, atrous_rates = cfg.xception_rates

    pool = global_average_pool(x)
    pool = conv2d(store, "image_pooling", pool, 256, kernel_size=1)
    pool = batch_norm(store, "image_pooling_BN", pool, epsilon=1e-5)
    pool = relu(pool)
    pool = resize(pool, (feat_h, feat_w), method="bilinear").astype(x.dtype)

    b0 = conv2d(store, "aspp0", x, 256, kernel_size=1)
    b0 = batch_norm(store, "aspp0_BN", b0, epsilon=1e-5)
    b0 = relu(b0)

    if cfg.backbone == "xception":
        branches = [pool, b0]
        for i, rate in enumerate(atrous_rates, start=1):
            branches.append(sepconv_bn(store, x, 256, f"aspp{i}", stride=1,
                                       rate=rate, depth_activation=True))
        out = jnp.concatenate(branches, axis=-1)
    else:
        out = jnp.concatenate([pool, b0], axis=-1)

    out = conv2d(store, "concat_projection", out, 256, kernel_size=1)
    out = batch_norm(store, "concat_projection_BN", out, epsilon=1e-5)
    return relu(out)


def _decoder(store, x, skip, cfg: DeepLabConfig):
    skip_h, skip_w = skip.shape[-3], skip.shape[-2]
    x = resize(x, (skip_h, skip_w), method="bilinear").astype(skip.dtype)
    dec_skip = conv2d(store, "feature_projection0", skip, 48, kernel_size=1)
    dec_skip = batch_norm(store, "feature_projection0_BN", dec_skip, epsilon=1e-5)
    dec_skip = relu(dec_skip)
    x = jnp.concatenate([x, dec_skip], axis=-1)
    x = sepconv_bn(store, x, 256, "decoder_conv0", depth_activation=True, epsilon=1e-5)
    x = sepconv_bn(store, x, 256, "decoder_conv1", depth_activation=True, epsilon=1e-5)
    return x


def _decoder_only_dcnn(store, skip, cfg: DeepLabConfig):
    x = conv2d(store, "feature_projection0", skip, 48, kernel_size=1)
    x = batch_norm(store, "feature_projection0_BN", x, epsilon=1e-5)
    x = relu(x)
    x = resize(x, cfg.first_upsample_size, method="bilinear").astype(skip.dtype)
    x = sepconv_bn(store, x, 256, "decoder_conv0", depth_activation=True, epsilon=1e-5)
    x = sepconv_bn(store, x, 256, "decoder_conv1", depth_activation=True, epsilon=1e-5)
    return x


def _decoder_only_aspp(store, x, cfg: DeepLabConfig):
    x = resize(x, cfg.first_upsample_size, method="bilinear").astype(x.dtype)
    x = sepconv_bn(store, x, 256, "decoder_conv0", depth_activation=True, epsilon=1e-5)
    x = sepconv_bn(store, x, 256, "decoder_conv1", depth_activation=True, epsilon=1e-5)
    return x


def head_layer_name(cfg: DeepLabConfig) -> str:
    """'logits_semantic' only when the pretrained head is loadable by name
    (reference model.py:296-301)."""
    if cfg.classes == 21 and cfg.weights == "pascal_voc":
        return "logits_semantic"
    return "custom_logits_semantic"


# ---------------------------------------------------------------------------
# Public API
# ---------------------------------------------------------------------------

def forward(params: Params, image: jnp.ndarray, cfg: DeepLabConfig) -> jnp.ndarray:
    """Forward pass over a batch (B, H, W, 3) -> (B, h, w, classes) logits."""
    store = ParamStore(params)
    return _forward(store, image, cfg)


def _forward(store: ParamStore, image: jnp.ndarray, cfg: DeepLabConfig) -> jnp.ndarray:
    dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
    x = image.astype(dtype)

    if cfg.backbone == "xception":
        encoder_out, skip = _xception_backbone(store, x, cfg)
        aspp_out = _aspp(store, encoder_out, cfg)
        if cfg.only_dcnn_output:
            out = _decoder_only_dcnn(store, encoder_out, cfg)
        elif cfg.only_aspp_output:
            out = _decoder_only_aspp(store, aspp_out, cfg)
        else:
            out = _decoder(store, aspp_out, skip, cfg)
    else:
        encoder_out = _mobilenet_backbone(store, x, cfg)
        # No decoder for mobilenet: ASPP output used directly
        # (reference model.py:93-100).
        out = _aspp(store, encoder_out, cfg)

    if cfg.final_class_prediction:
        out = conv2d(store, head_layer_name(cfg), out, cfg.classes,
                     kernel_size=1, use_bias=True)

    out = out.astype(jnp.float32)

    if cfg.final_upsample:
        out = resize(out, cfg.input_shape[:2], method="bilinear")

    if cfg.reshape_outputs:
        out = out.reshape(out.shape[0], -1, cfg.classes)

    if cfg.last_activation == "softmax":
        out = jax.nn.softmax(out, axis=-1)
    elif cfg.last_activation == "sigmoid":
        out = jax.nn.sigmoid(out)

    return out


def init_params(cfg: DeepLabConfig, seed: int = 0) -> Params:
    """Create a randomly-initialized param dict by tracing one tiny forward.

    Uses jax.eval_shape so no FLOPs are spent; shapes depend only on channel
    counts, so a small spatial size suffices and matches the full-size model.
    """
    store = ParamStore(params=None, seed=seed)
    small_hw = 64 if cfg.backbone == "xception" else 32
    small_cfg = dataclasses.replace(
        cfg, input_shape=(small_hw, small_hw, cfg.input_shape[2]))
    dummy = jnp.zeros((1, small_hw, small_hw, cfg.input_shape[2]), jnp.float32)
    jax.eval_shape(lambda d: _forward(store, d, small_cfg), dummy)
    return jax.tree.map(jnp.asarray, store.params)


def build_model(cfg: DeepLabConfig, seed: int = 0, params: Optional[Params] = None,
                weights_path: Optional[str] = None):
    """Returns (params, apply_fn) — the functional analogue of the reference's
    DeeplabV3Plus(...).build_model(...) (reference model.py:64-147)."""
    if params is None:
        params = init_params(cfg, seed=seed)
    if weights_path is not None and weights_path.endswith(".npz"):
        # Own-format checkpoint (save_params_npz — e.g. a model trained from
        # scratch with models/train.py). Tolerate the head-name switch
        # between pascal_voc and scratch configs (head_layer_name).
        from .weights import load_params_npz
        loaded = load_params_npz(weights_path)
        want = head_layer_name(cfg)
        for other in ("logits_semantic", "custom_logits_semantic"):
            if other != want and other in loaded and want not in loaded:
                loaded[want] = loaded.pop(other)
        params = loaded
    elif cfg.weights == "pascal_voc" and weights_path is not None:
        from .weights import load_keras_h5_weights
        params = load_keras_h5_weights(params, weights_path)

    def apply_fn(p, image):
        return forward(p, image, cfg)

    return params, apply_fn
