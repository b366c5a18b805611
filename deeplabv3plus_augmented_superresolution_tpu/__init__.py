"""TPU-native Augmented Super-Resolution (ASR) framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of
nicoloalbergoni/DeepLabV3Plus-Augmented-SuperResolution (reference mounted at
/root/reference): test-time-augmentation super-resolution of semantic
segmentation masks produced by a pretrained DeepLabV3+ (Xception or
MobileNetV2 backbone).

Design differences vs the reference (TF2 + tensorflow-addons, single GPU):
  * the whole pipeline (augmented copies -> model forward -> OPM extraction
    -> SR inverse solve -> threshold) is one jitted XLA program per image
    batch instead of three scripts staged through hdf5 files;
  * image warps are a single affine resample (XLA gather reference impl +
    Pallas TPU kernel) instead of tfa.image.rotate/translate kernels;
  * the SR solve is a lax.scan over optax updates instead of a Python loop
    of GradientTape steps;
  * scaling is jax.sharding over a ("data", "aug") device mesh instead of a
    single pinned device.
"""

__version__ = "0.1.0"


def _guard_xla_cpu_fusion_emitters():
    """Disable XLA:CPU's fusion emitters before the CPU backend initializes.

    Measured miscompile (jaxlib in this image, diagnosed by flag bisection;
    NOTES.md "XLA:CPU fusion-emitter miscompile"): when a reduction consumes
    the 3-pass shear warp inside one jit program, one copy's boundary row is
    silently zero-filled — max error 0.36 on a [0,1] image, deterministic
    per program, insensitive to optimization_barrier / while_loop
    materialization, and healed only by exposing the warped stack as a
    program output or by --xla_cpu_use_fusion_emitters=false. The TPU
    backend is unaffected (verified against an eager/scipy referee). The
    flag only alters the CPU client, so setting it unconditionally is safe
    for TPU runs; if the backend is already live we warn instead of lying.
    """
    import os

    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_cpu_use_fusion_emitters" in flags:
        return
    # An UNKNOWN flag in XLA_FLAGS is a fatal parse error at backend init, so
    # only apply the guard on jaxlibs where the flag is known to exist (this
    # image ships 0.9.0; fusion emitters and their flag are older than that).
    # A future jaxlib that RETIRES the flag keeps parsing it with a warning
    # (observed with xla_cpu_use_thunk_runtime), so no upper bound is needed.
    try:
        import jaxlib

        version = tuple(int(p) for p in jaxlib.__version__.split(".")[:2])
    except Exception:
        return
    if version < (0, 5):
        return
    initialized = False
    try:
        from jax._src import xla_bridge as _xb

        if hasattr(_xb, "backends_are_initialized"):
            initialized = bool(_xb.backends_are_initialized())
        else:
            initialized = bool(getattr(_xb, "_backends", None))
    except Exception:
        pass
    if initialized:
        import warnings

        warnings.warn(
            "deeplabv3plus_augmented_superresolution_tpu: the JAX backend "
            "was initialized before this package could set "
            "--xla_cpu_use_fusion_emitters=false. On XLA:CPU the fusion "
            "emitters miscompile the shear warp under reductions (see "
            "NOTES.md); set the flag in XLA_FLAGS yourself for CPU runs.")
        return
    os.environ["XLA_FLAGS"] = (flags +
                               " --xla_cpu_use_fusion_emitters=false").strip()


_guard_xla_cpu_fusion_emitters()
del _guard_xla_cpu_fusion_emitters
