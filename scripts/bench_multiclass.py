"""Multi-class ASR on-chip benchmark: K classes in one program.

Measures asr_step_multiclass at production shape (512 px, 100 copies, cg
solver, serving stencil) for K = 1, 3, 20 on the real chip. Results in
NOTES.md ("Multi-class ASR"). Timing is value-fetch based (one combined
checksum fetch per program) per the tunnel rules in NOTES.md."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from deeplabv3plus_augmented_superresolution_tpu.models import (
    DeepLabConfig, build_model)
from deeplabv3plus_augmented_superresolution_tpu.pipeline import (
    asr_step, asr_step_multiclass, sample_augmentations)
from deeplabv3plus_augmented_superresolution_tpu.sr import (
    OptimizerConfig, SRConfig, precompute_gram_stencil)
from deeplabv3plus_augmented_superresolution_tpu.data import load_image

print("devices:", jax.devices())

cfg = DeepLabConfig(input_shape=(512, 512, 3), final_upsample=False,
                    compute_dtype="bfloat16")
params, _ = build_model(cfg, seed=0)
sr_cfg = SRConfig(num_iter=300, num_aug=100, feature_size=(128, 128),
                  output_size=(512, 512), angle_max=0.15,
                  solver_impl="cg",
                  optimizer=OptimizerConfig(learning_rate=1e-3, amsgrad=True))
image = jnp.asarray(np.asarray(
    load_image("test_images/smoke_input.jpg", image_size=(512, 512),
               normalize=True)))
angles, shifts = sample_augmentations(jax.random.key(1234), 100, 0.15, 80.0)

t0 = time.time()
coeffs = jax.jit(precompute_gram_stencil, static_argnames=("cfg",))(
    angles, shifts, sr_cfg)
print("stencil sum:", float(jnp.sum(coeffs)), f"({time.time()-t0:.1f}s)")


def run(k_classes, label, repeats=3):
    ids = tuple(range(1, 1 + k_classes))
    if k_classes == 1:
        fn = lambda: asr_step(params, image, angles, shifts, cfg, sr_cfg,
                              class_id=8, mode="argmax", th_factor=0.2,
                              sr_types=("aug", "max", "mean"),
                              gram_coeffs=coeffs)
    else:
        fn = lambda: asr_step_multiclass(
            params, image, angles, shifts, cfg, sr_cfg, class_ids=ids,
            mode="argmax", th_factor=0.2, sr_types=("aug", "max", "mean"),
            gram_coeffs=coeffs)
    t0 = time.time()
    out = fn()
    s = float(sum(jnp.sum(v) for v in out.values()))  # value fetch
    t_compile = time.time() - t0
    times = []
    for _ in range(repeats):
        t0 = time.time()
        out = fn()
        s = float(sum(jnp.sum(v) for v in out.values()))
        times.append(time.time() - t0)
    print(f"{label}: first {t_compile:.1f}s, steady {min(times)*1000:.0f} ms "
          f"({min(times)/k_classes*1000:.0f} ms/class), checksum {s:.1f}")


run(1, "single-class (baseline)")
run(3, "3-class")
run(20, "20-class (all)")
