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
