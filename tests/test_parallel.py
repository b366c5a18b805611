"""Multi-device sharding tests on the 8-device fake-CPU mesh (conftest)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from deeplabv3plus_augmented_superresolution_tpu.models import DeepLabConfig, build_model
from deeplabv3plus_augmented_superresolution_tpu.parallel import (
    make_asr_batch_fn,
    make_mesh,
    shard_batch,
)
from deeplabv3plus_augmented_superresolution_tpu.pipeline import (
    asr_step,
    sample_augmentations,
)
from deeplabv3plus_augmented_superresolution_tpu.sr import OptimizerConfig, SRConfig


@pytest.fixture(scope="module")
def small_setup():
    cfg = DeepLabConfig(input_shape=(64, 64, 3), backbone="mobilenet",
                        final_upsample=False)
    params, _ = build_model(cfg, seed=0)
    sr_cfg = SRConfig(num_iter=4, num_aug=8, feature_size=(8, 8),
                      output_size=(64, 64), angle_max=0.2,
                      optimizer=OptimizerConfig(learning_rate=1e-2))
    return cfg, params, sr_cfg


def test_mesh_construction():
    mesh = make_mesh(shape=(2, 4))
    assert mesh.shape == {"data": 2, "aug": 4}
    mesh = make_mesh()
    assert mesh.shape == {"data": 1, "aug": 8}
    with pytest.raises(ValueError):
        make_mesh(shape=(3, 3))


def test_sharded_batch_asr_runs_and_matches_single_device(small_setup):
    cfg, params, sr_cfg = small_setup
    mesh = make_mesh(shape=(2, 4))
    batch = 4
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.uniform(0, 1, (batch, 64, 64, 3)).astype(np.float32))
    keys = jax.random.split(jax.random.key(0), batch)
    angles = jnp.stack([sample_augmentations(k, 8, 0.2, 4.0)[0] for k in keys])
    shifts = jnp.stack([sample_augmentations(k, 8, 0.2, 4.0)[1] for k in keys])

    fn = make_asr_batch_fn(mesh, cfg, sr_cfg, class_id=8, mode="argmax",
                           th_factor=0.2)
    p, im, a, s = shard_batch(mesh, params, images, angles, shifts)
    out = fn(p, im, a, s)
    assert set(out) == {"aug", "max", "mean", "standard"}
    for v in out.values():
        assert v.shape == (batch, 64, 64, 1)

    # Cross-check against the unsharded single-image path.
    single = asr_step(params, images[1], angles[1], shifts[1], cfg, sr_cfg,
                      class_id=8, mode="argmax", th_factor=0.2)
    for k in single:
        np.testing.assert_allclose(np.asarray(out[k][1]), np.asarray(single[k]),
                                   atol=2e-2, err_msg=k)


def test_aug_axis_only_mesh(small_setup):
    """All 8 devices on the aug axis (the single-image serving layout)."""
    cfg, params, sr_cfg = small_setup
    mesh = make_mesh(shape=(1, 8))
    rng = np.random.default_rng(1)
    images = jnp.asarray(rng.uniform(0, 1, (1, 64, 64, 3)).astype(np.float32))
    a, s = sample_augmentations(jax.random.key(1), 8, 0.2, 4.0)
    fn = make_asr_batch_fn(mesh, cfg, sr_cfg, class_id=8, sr_types=("mean",))
    p, im, a_, s_ = shard_batch(mesh, params, images, a[None], s[None])
    out = fn(p, im, a_, s_)
    assert out["mean"].shape == (1, 64, 64, 1)


def test_aug_sharding_distributes_not_replicates(small_setup):
    """Guard against GSPMD silently replicating the per-copy warp work: the
    compiled program on an aug=8 mesh must contain cross-device reductions
    (the psum over copies in the df grad) and its per-device temp footprint
    must shrink by ~the shard count vs the same program on one device."""
    cfg, params, sr_cfg = small_setup
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.uniform(0, 1, (1, 64, 64, 3)).astype(np.float32))
    a, s = sample_augmentations(jax.random.key(0), 8, 0.2, 4.0)
    a, s = a[None], s[None]

    def compiled_on(mesh_shape, ndev):
        mesh = make_mesh(jax.devices()[:ndev], shape=mesh_shape)
        fn = make_asr_batch_fn(mesh, cfg, sr_cfg, class_id=8, sr_types=("aug",))
        args = shard_batch(mesh, params, images, a, s)
        return fn.lower(*args).compile()

    comp8 = compiled_on((1, 8), 8)
    comp1 = compiled_on((1, 1), 1)

    txt = comp8.as_text()
    n_collectives = txt.count("all-reduce") + txt.count("reduce-scatter")
    assert n_collectives > 0, "no cross-device reduction in the aug-sharded program"

    temp8 = comp8.memory_analysis().temp_size_in_bytes
    temp1 = comp1.memory_analysis().temp_size_in_bytes
    assert temp8 < 0.3 * temp1, (
        f"per-device temp {temp8} vs single-device {temp1}: aug work appears "
        "replicated, not sharded")


@pytest.mark.parametrize("mesh_shape", [(1, 8), (2, 4)])
def test_uneven_aug_shards_at_production_copy_count(small_setup, mesh_shape):
    """num_aug=100 does not divide the aug axis (100/8, 100/4): GSPMD pads the
    shards; results must still match the unsharded path."""
    import dataclasses

    cfg, params, sr_cfg = small_setup
    sr_cfg = dataclasses.replace(sr_cfg, num_aug=100, num_iter=2)
    batch = mesh_shape[0]
    rng = np.random.default_rng(3)
    images = jnp.asarray(rng.uniform(0, 1, (batch, 64, 64, 3)).astype(np.float32))
    keys = jax.random.split(jax.random.key(11), batch)
    angles = jnp.stack([sample_augmentations(k, 100, 0.2, 4.0)[0] for k in keys])
    shifts = jnp.stack([sample_augmentations(k, 100, 0.2, 4.0)[1] for k in keys])

    mesh = make_mesh(shape=mesh_shape)
    fn = make_asr_batch_fn(mesh, cfg, sr_cfg, class_id=8,
                           sr_types=("aug", "mean"), return_targets=True)
    out = fn(*shard_batch(mesh, params, images, angles, shifts))

    single = asr_step(params, images[0], angles[0], shifts[0], cfg, sr_cfg,
                      class_id=8, mode="argmax", th_factor=0.15,
                      sr_types=("aug", "mean"), return_targets=True)
    for k in single:
        if k.endswith("_target"):
            # Pre-threshold SR targets must agree numerically (loose atol for
            # f32 reassociation across the shards) — catches systematic
            # operator drift the mask-level bound below would hide.
            np.testing.assert_allclose(
                np.asarray(out[k][0]), np.asarray(single[k]), atol=2e-2,
                err_msg=f"{k} @ mesh {mesh_shape}")
            continue
        # Padded-aug sharded solve vs unsharded solve: identical in exact
        # arithmetic, but f32 reassociation can flip isolated threshold-
        # marginal pixels of the binarized masks — compare at mask level.
        disagree = np.mean(np.asarray(out[k][0]) != np.asarray(single[k]))
        assert disagree < 0.005, (
            f"{k} @ mesh {mesh_shape}: mask disagreement {disagree:.4f}")


def test_sharded_batch_with_precomputed_stencil(small_setup):
    """The serving-mode stencil (fixed TTA set) rides the mesh path: results
    must match the inline-extraction sharded run exactly, including when the
    copy count needs aug-axis padding (the stencil of zero-weighted identity
    pads equals the unpadded stencil)."""
    import dataclasses

    from deeplabv3plus_augmented_superresolution_tpu.parallel import (
        padded_sr_cfg,
    )
    from deeplabv3plus_augmented_superresolution_tpu.sr import (
        precompute_gram_stencil,
    )

    cfg, params, sr_cfg = small_setup
    sr_cfg = dataclasses.replace(sr_cfg, solver_impl="gram", num_aug=10)
    mesh = make_mesh(shape=(2, 4))  # 10 copies pad to 12
    rng = np.random.default_rng(7)
    images = jnp.asarray(rng.uniform(0, 1, (2, 64, 64, 3)).astype(np.float32))
    a, s = sample_augmentations(jax.random.key(5), 10, 0.2, 4.0)
    angles = jnp.broadcast_to(a, (2,) + a.shape)
    shifts = jnp.broadcast_to(s, (2,) + s.shape)

    coeffs = precompute_gram_stencil(a, s, padded_sr_cfg(sr_cfg, mesh))
    fn = make_asr_batch_fn(mesh, cfg, sr_cfg, class_id=8, sr_types=("aug",),
                           gram_coeffs=coeffs, return_targets=True)
    out = fn(*shard_batch(mesh, params, images, angles, shifts))

    fn_inline = make_asr_batch_fn(mesh, cfg, sr_cfg, class_id=8,
                                  sr_types=("aug",), return_targets=True)
    want = fn_inline(*shard_batch(mesh, params, images, angles, shifts))
    # The stencils agree to ~1e-5 (f32 reassociation differs between the
    # sharded inline extraction and the standalone precompute), which can
    # flip a handful of threshold-marginal pixels after the Adam solve —
    # require mask-level agreement plus a loose numeric bound on the
    # pre-threshold targets (so systematic drift can't hide in the margin).
    np.testing.assert_allclose(np.asarray(out["aug_target"]),
                               np.asarray(want["aug_target"]), atol=2e-2)
    disagree = np.mean(np.asarray(out["aug"]) != np.asarray(want["aug"]))
    assert disagree < 0.005, f"mask disagreement {disagree:.4f}"


def test_production_shape_sharded_lowering():
    """Shape-true sharding evidence for the v5e-8 projection: lower+compile
    (no execution) the REAL production program — 512 px, 100 copies,
    xception, batch 2 on a (2,4) data x aug mesh — and assert collectives are
    present and the per-device temp footprint is ~1/8 of the single-device
    compile. Also covers the stencil-serving variant (precomputed Gram
    coefficients replicated across the mesh)."""
    import dataclasses

    from deeplabv3plus_augmented_superresolution_tpu.pipeline import (
        sample_augmentations,
    )

    cfg = DeepLabConfig(input_shape=(512, 512, 3), backbone="xception",
                        final_upsample=False)
    params, _ = build_model(cfg, seed=0)
    sr_cfg = SRConfig(num_iter=2, num_aug=100, feature_size=(128, 128),
                      output_size=(512, 512), angle_max=0.16,
                      solver_impl="gram",
                      optimizer=OptimizerConfig(learning_rate=1e-3))
    a, s = sample_augmentations(jax.random.key(0), 100, 0.15, 80)
    angles = jnp.broadcast_to(a, (2,) + a.shape)
    shifts = jnp.broadcast_to(s, (2,) + s.shape)
    images = jnp.zeros((2, 512, 512, 3), jnp.float32)

    def compiled_on(mesh_shape, ndev, **kw):
        mesh = make_mesh(jax.devices()[:ndev], shape=mesh_shape)
        fn = make_asr_batch_fn(mesh, cfg, sr_cfg, class_id=8,
                               sr_types=("aug",), **kw)
        args = shard_batch(mesh, params, images, angles, shifts)
        return fn.lower(*args).compile()

    comp8 = compiled_on((2, 4), 8)
    txt = comp8.as_text()
    n_coll = txt.count("all-reduce") + txt.count("reduce-scatter")
    assert n_coll > 0, "no collectives in the production sharded program"

    temp8 = comp8.memory_analysis().temp_size_in_bytes
    temp1 = compiled_on((1, 1), 1).memory_analysis().temp_size_in_bytes
    assert temp8 < 0.2 * temp1, (
        f"per-device temp {temp8 / 2**30:.2f}G vs single-device "
        f"{temp1 / 2**30:.2f}G: production aug/data work appears replicated")

    # Serving variant: precomputed stencil rides the mesh path at shape.
    from deeplabv3plus_augmented_superresolution_tpu.parallel import (
        padded_sr_cfg,
    )
    from deeplabv3plus_augmented_superresolution_tpu.sr import (
        precompute_gram_stencil,
    )

    mesh = make_mesh(shape=(2, 4))
    coeffs_shape = jax.eval_shape(
        lambda aa, ss: precompute_gram_stencil(aa, ss,
                                               padded_sr_cfg(sr_cfg, mesh)),
        a, s)
    coeffs = jnp.zeros(coeffs_shape.shape, coeffs_shape.dtype)
    comp_srv = compiled_on((2, 4), 8, gram_coeffs=coeffs)
    temp_srv = comp_srv.memory_analysis().temp_size_in_bytes
    assert temp_srv < 0.2 * temp1, (
        f"serving-variant per-device temp {temp_srv / 2**30:.2f}G not sharded")


def test_sharded_batch_with_gram_solver(small_setup):
    """The gram solver's probe extraction composes with vmap + mesh sharding."""
    import dataclasses

    cfg, params, sr_cfg = small_setup
    sr_cfg = dataclasses.replace(sr_cfg, solver_impl="gram")
    mesh = make_mesh(shape=(2, 4))
    rng = np.random.default_rng(5)
    images = jnp.asarray(rng.uniform(0, 1, (2, 64, 64, 3)).astype(np.float32))
    keys = jax.random.split(jax.random.key(9), 2)
    angles = jnp.stack([sample_augmentations(k, 8, 0.2, 4.0)[0] for k in keys])
    shifts = jnp.stack([sample_augmentations(k, 8, 0.2, 4.0)[1] for k in keys])
    fn = make_asr_batch_fn(mesh, cfg, sr_cfg, class_id=8, sr_types=("aug",))
    p, im, a, s = shard_batch(mesh, params, images, angles, shifts)
    out = fn(p, im, a, s)
    assert out["aug"].shape == (2, 64, 64, 1)
    assert np.isfinite(np.asarray(out["aug"])).all()


def test_multichip_projection_hlo_accounting():
    """scripts/multichip_projection.py HLO byte accounting, pure unit: the
    collective regex must catch plain, tuple-shaped, and async (-start)
    collectives exactly once each, and the ring model must apply
    2(n-1)/n to all-reduce and (n-1)/n to gather/scatter payloads."""
    import importlib.util
    import os

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "mcp", os.path.join(root, "scripts", "multichip_projection.py"))
    # Loading executes only module-level code (arg parsing lives in main);
    # it forces jax_platforms=cpu, which the test env already uses.
    mcp = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mcp)

    hlo = """
  %all-reduce.1 = f32[100,128,128]{2,1,0} all-reduce(%x), replica_groups={}
  %ar2 = (f32[64]{0}, bf16[32]{0}) all-reduce(%a, %b), to_apply=%sum
  %ag = f32[8,16]{1,0} all-gather-start(%y), dimensions={0}
  %done = f32[8,16]{1,0} all-gather-done(%ag)
  %noise = f32[4,4]{1,0} add(%p, %q)
"""
    stats = mcp.collective_stats(hlo)
    assert stats["all-reduce"]["count"] == 2
    assert stats["all-reduce"]["payload_bytes"] == (
        100 * 128 * 128 * 4 + 64 * 4 + 32 * 2)
    # -start counted once; -done (no "= shape all-gather(" form) not doubled
    assert stats["all-gather"]["count"] == 1
    assert stats["all-gather"]["payload_bytes"] == 8 * 16 * 4

    only_ar = {"all-reduce": {"count": 1, "payload_bytes": 800}}
    only_ag = {"all-gather": {"count": 1, "payload_bytes": 800}}
    assert mcp.ring_ici_bytes(only_ar, 8) == int(2 * 7 / 8 * 800)
    assert mcp.ring_ici_bytes(only_ag, 8) == int(7 / 8 * 800)


@pytest.mark.slow
def test_multichip_projection_end_to_end_small(tmp_path, monkeypatch):
    """The projection script end to end at CI size: the throughput regime
    (whole images per chip) must compile with ZERO collectives — the
    HLO-level proof behind the linear-scaling claim — and the latency
    regime must show loop-invariant aug collectives."""
    import json
    import runpy
    import sys
    import os

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = str(tmp_path / "proj.json")
    monkeypatch.setattr(sys, "argv", [
        "multichip_projection.py", "--size", "128", "--num_aug", "16",
        "--backbone", "mobilenet", "--out", out])
    runpy.run_path(os.path.join(root, "scripts", "multichip_projection.py"),
                   run_name="__main__")

    d = json.loads(open(out).read())
    thr = d["regimes"]["throughput_data_parallel"]
    assert thr["collectives"] == {}, thr
    assert thr["ici_bytes_per_image"] == 0
    assert thr["scaling_model"]["45GBps"]["efficiency"] == 1.0
    lat = d["regimes"]["latency_aug_sharded"]
    assert lat["ici_bytes_per_image"] > 0, lat
    assert lat["collectives_invariant_to_num_iter"] is True
    assert lat["scaling_model"]["45GBps"]["comm_overhead_fraction"] < 0.05
