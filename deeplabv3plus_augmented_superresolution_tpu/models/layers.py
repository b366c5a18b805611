"""Functional NHWC layer primitives + a tiny two-phase param store.

Parameters live in a flat dict keyed by the Keras layer names of the bonlime
DeepLabV3+ checkpoint (reference model.py:149-507 is the naming contract), so
the pretrained-.h5 loader in weights.py is a direct name lookup. Apply
functions are pure; ``ParamStore`` in *build* mode creates parameters with
Keras-default initializers, in *apply* mode it only reads them.

TPU notes: convs run through lax.conv_general_dilated (NHWC/HWIO), which XLA
tiles onto the MXU; BatchNorm is inference-only and folded to a single
scale/shift in f32 so bf16 forward passes keep BN math in full precision.
"""

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, Dict[str, jnp.ndarray]]

_DN = ("NHWC", "HWIO", "NHWC")


class ParamStore:
    """Two-phase parameter registry.

    build mode (params=None): layer calls create numpy params with Keras
      default initializers (glorot_uniform kernels, BN gamma=1/beta=0,
      zeros bias) using a numpy Generator for determinism.
    apply mode: layer calls read existing params; unknown names raise.
    """

    def __init__(self, params: Optional[Params] = None, seed: int = 0,
                 bn_mode: str = "inference"):
        self.building = params is None
        self.params: Params = {} if params is None else params
        self._rng = np.random.default_rng(seed)
        # "inference": BN folds the stored moving stats to one scale/shift.
        # "batch": BN normalizes with the current batch's statistics and
        # records them in bn_batch_stats (layer -> (mean, var)) so a train
        # step can EMA-update the moving stats functionally (models/train.py).
        if bn_mode not in ("inference", "batch"):
            raise ValueError(bn_mode)
        self.bn_mode = bn_mode
        self.bn_batch_stats: Dict[str, Tuple[jnp.ndarray, jnp.ndarray]] = {}

    def conv_accum_dtype(self, x: jnp.ndarray):
        """preferred_element_type for convs. Inference folds BN in f32, so
        bf16 forwards keep f32 conv outputs. In batch (training) mode the
        conv VJP transposes with a cotangent of the OUTPUT dtype — a f32
        preferred type under bf16 operands makes that transpose a mixed
        bf16/f32 conv, which lax rejects; the MXU accumulates bf16 in f32
        internally either way, so training uses the operand dtype and BN's
        f32 batch statistics restandardize right after."""
        return None if self.bn_mode == "batch" else jnp.float32

    def _glorot(self, shape):
        fan_in = np.prod(shape[:-1])
        fan_out = shape[-1] * np.prod(shape[:-2]) if len(shape) > 1 else shape[-1]
        limit = float(np.sqrt(6.0 / (fan_in + fan_out)))
        return self._rng.uniform(-limit, limit, size=shape).astype(np.float32)

    def get(self, layer: str, name: str, shape, init: str = "glorot"):
        entry = self.params.setdefault(layer, {}) if self.building else self.params.get(layer)
        if self.building:
            # Plain numpy during build: init_params traces the forward with
            # jax.eval_shape, and jnp array creation inside that trace would
            # produce (leaking) tracers.
            if name not in entry:
                if init == "glorot":
                    entry[name] = self._glorot(tuple(shape))
                elif init == "zeros":
                    entry[name] = np.zeros(shape, np.float32)
                elif init == "ones":
                    entry[name] = np.ones(shape, np.float32)
                else:
                    raise ValueError(init)
            return entry[name]
        if entry is None or name not in entry:
            raise KeyError(f"Missing parameter {layer}/{name}")
        return entry[name]


def conv2d(store: ParamStore, name: str, x: jnp.ndarray, filters: int,
           kernel_size: int = 1, stride: int = 1, rate: int = 1,
           padding="SAME", use_bias: bool = False) -> jnp.ndarray:
    in_ch = x.shape[-1]
    kernel = store.get(name, "kernel", (kernel_size, kernel_size, in_ch, filters))
    if isinstance(padding, str):
        pad = padding
    else:
        pad = [(int(padding[0][0]), int(padding[0][1])),
               (int(padding[1][0]), int(padding[1][1]))]
    y = jax.lax.conv_general_dilated(
        x, kernel.astype(x.dtype),
        window_strides=(stride, stride),
        padding=pad,
        rhs_dilation=(rate, rate),
        dimension_numbers=_DN,
        preferred_element_type=store.conv_accum_dtype(x),
    )
    if use_bias:
        bias = store.get(name, "bias", (filters,), init="zeros")
        y = y + bias.astype(jnp.float32)
    return y.astype(x.dtype)


def depthwise_conv2d(store: ParamStore, name: str, x: jnp.ndarray,
                     kernel_size: int = 3, stride: int = 1, rate: int = 1,
                     padding="SAME") -> jnp.ndarray:
    in_ch = x.shape[-1]
    # Stored in HWIO-with-groups layout (k, k, 1, C); weights.py transposes
    # Keras's (k, k, C, 1) depthwise layout into this on load.
    kernel = store.get(name, "depthwise_kernel", (kernel_size, kernel_size, 1, in_ch))
    if isinstance(padding, str):
        pad = padding
    else:
        pad = [(int(padding[0][0]), int(padding[0][1])),
               (int(padding[1][0]), int(padding[1][1]))]
    y = jax.lax.conv_general_dilated(
        x, kernel.astype(x.dtype),
        window_strides=(stride, stride),
        padding=pad,
        rhs_dilation=(rate, rate),
        dimension_numbers=_DN,
        feature_group_count=in_ch,
        preferred_element_type=store.conv_accum_dtype(x),
    )
    return y.astype(x.dtype)


def batch_norm(store: ParamStore, name: str, x: jnp.ndarray,
               epsilon: float = 1e-3) -> jnp.ndarray:
    ch = x.shape[-1]
    gamma = store.get(name, "gamma", (ch,), init="ones")
    beta = store.get(name, "beta", (ch,), init="zeros")
    mean = store.get(name, "moving_mean", (ch,), init="zeros")
    var = store.get(name, "moving_variance", (ch,), init="ones")
    if getattr(store, "bn_mode", "inference") == "batch":
        # Training mode: normalize with the current batch's statistics over
        # (N, H, W) and record them for the EMA moving-stat update
        # (models/train.py). Stats in f32 regardless of compute dtype.
        xf = x.astype(jnp.float32)
        axes = tuple(range(x.ndim - 1))
        b_mean = jnp.mean(xf, axis=axes)
        b_var = jnp.var(xf, axis=axes)
        store.bn_batch_stats[name] = (b_mean, b_var)
        scale = jnp.asarray(gamma, jnp.float32) / jnp.sqrt(b_var + epsilon)
        shift = jnp.asarray(beta, jnp.float32) - b_mean * scale
        return (xf * scale + shift).astype(x.dtype)
    # Inference-only BN, folded to scale/shift in f32 (precision-sensitive
    # when the forward runs in bf16).
    scale = (gamma / jnp.sqrt(var + epsilon)).astype(jnp.float32)
    shift = (beta - mean * scale).astype(jnp.float32)
    return (x.astype(jnp.float32) * scale + shift).astype(x.dtype)


def relu(x):
    return jnp.maximum(x, 0)


def relu6(x):
    return jnp.clip(x, 0, 6)


def manual_same_padding(kernel_size: int, rate: int) -> Tuple[int, int]:
    """The reference's explicit ZeroPadding2D for strided convs
    (reference model.py:477-485, :529-535): symmetric (beg, end) split of the
    effective kernel's total padding, unlike TF 'SAME' which biases padding
    to the bottom/right for even totals."""
    effective = kernel_size + (kernel_size - 1) * (rate - 1)
    pad_total = effective - 1
    pad_beg = pad_total // 2
    pad_end = pad_total - pad_beg
    return pad_beg, pad_end


def sepconv_bn(store: ParamStore, x: jnp.ndarray, filters: int, prefix: str,
               stride: int = 1, kernel_size: int = 3, rate: int = 1,
               depth_activation: bool = False, epsilon: float = 1e-3) -> jnp.ndarray:
    """Depthwise-separable conv with BN, mirroring reference model.py:463-508:
    optional pre-ReLU (when depth_activation is False), manual symmetric
    padding for stride>1, ReLU between depthwise and pointwise otherwise."""
    if stride == 1:
        padding = "SAME"
    else:
        pb, pe = manual_same_padding(kernel_size, rate)
        padding = ((pb, pe), (pb, pe))

    if not depth_activation:
        x = relu(x)
    x = depthwise_conv2d(store, prefix + "_depthwise", x, kernel_size=kernel_size,
                         stride=stride, rate=rate, padding=padding)
    x = batch_norm(store, prefix + "_depthwise_BN", x, epsilon=epsilon)
    if depth_activation:
        x = relu(x)
    x = conv2d(store, prefix + "_pointwise", x, filters, kernel_size=1)
    x = batch_norm(store, prefix + "_pointwise_BN", x, epsilon=epsilon)
    if depth_activation:
        x = relu(x)
    return x


def conv2d_same(store: ParamStore, x: jnp.ndarray, filters: int, name: str,
                stride: int = 1, kernel_size: int = 3, rate: int = 1) -> jnp.ndarray:
    """Conv with the reference's symmetric 'same' padding for stride>1
    (reference model.py:510-541)."""
    if stride == 1:
        return conv2d(store, name, x, filters, kernel_size=kernel_size,
                      stride=1, rate=rate, padding="SAME")
    pb, pe = manual_same_padding(kernel_size, rate)
    return conv2d(store, name, x, filters, kernel_size=kernel_size,
                  stride=stride, rate=rate, padding=((pb, pe), (pb, pe)))


def global_average_pool(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(x.astype(jnp.float32), axis=(-3, -2), keepdims=True).astype(x.dtype)


def make_divisible(value: float, divisor: int, min_value: Optional[int] = None) -> int:
    """Channel rounding used by MobileNetV2 (reference model.py:543-556)."""
    if min_value is None:
        min_value = divisor
    new_v = max(min_value, int(value + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * value:
        new_v += divisor
    return new_v
