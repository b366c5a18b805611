"""Aux subsystems: profiling timer, checkpoint round-trip, image/hdf5 io."""

import numpy as np

import jax.numpy as jnp

from deeplabv3plus_augmented_superresolution_tpu.data.io import load_image, save_img
from deeplabv3plus_augmented_superresolution_tpu.models import (
    load_params_npz,
    save_params_npz,
)
from deeplabv3plus_augmented_superresolution_tpu.utils import (
    StageTimer,
    device_summary,
    restore_checkpoint,
    save_checkpoint,
)


def test_stage_timer():
    timer = StageTimer()
    with timer.stage("a"):
        _ = jnp.ones(8).sum()
    with timer.stage("a"):
        pass
    with timer.stage("b") as r:
        r["out"] = jnp.ones(4)
    assert timer.counts["a"] == 2 and timer.counts["b"] == 1
    assert "a" in timer.summary() and "ms/call" in timer.summary()


def test_stage_timer_steady_rate_separates_compile_call():
    import time

    timer = StageTimer()
    with timer.stage("fetch"):
        time.sleep(0.05)  # the compile-dominated first call
    for _ in range(4):
        with timer.stage("fetch"):
            time.sleep(0.005)
    d = timer.as_dict()["fetch"]
    assert d["calls"] == 5
    # max_s captures the slow first call; steady excludes exactly it
    assert d["max_s"] >= 0.045
    assert d["steady_ms_per_call"] < d["ms_per_call"]
    assert 3.0 <= d["steady_ms_per_call"] <= 30.0
    # single-call stages report no steady rate (nothing to separate)
    with timer.stage("once"):
        pass
    assert "steady_ms_per_call" not in timer.as_dict()["once"]


def test_device_summary_runs():
    assert "device" in device_summary()


def test_orbax_checkpoint_roundtrip(tmp_path):
    pytree = {"layer": {"kernel": jnp.arange(6.0).reshape(2, 3),
                        "bias": jnp.zeros(3)}}
    path = save_checkpoint(str(tmp_path / "ckpt"), pytree)
    restored = restore_checkpoint(path)
    np.testing.assert_array_equal(np.asarray(restored["layer"]["kernel"]),
                                  np.asarray(pytree["layer"]["kernel"]))


def test_npz_params_roundtrip(tmp_path):
    params = {"conv": {"kernel": jnp.ones((3, 3, 2, 4))},
              "bn": {"gamma": jnp.full((4,), 2.0)}}
    path = str(tmp_path / "params.npz")
    save_params_npz(params, path)
    loaded = load_params_npz(path)
    np.testing.assert_array_equal(np.asarray(loaded["bn"]["gamma"]),
                                  np.asarray(params["bn"]["gamma"]))
    assert loaded["conv"]["kernel"].shape == (3, 3, 2, 4)


def test_save_img_and_load_image_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    mask = rng.integers(0, 21, (32, 32, 1)).astype(np.float32)
    path = str(tmp_path / "mask.png")
    save_img(path, mask, scale=False)
    loaded = load_image(path, normalize=False, is_png=True)
    np.testing.assert_array_equal(loaded, mask)

    rgb = rng.integers(0, 255, (16, 16, 3)).astype(np.float32)
    path = str(tmp_path / "img.png")
    save_img(path, rgb, scale=False)
    # jpg loader path expects RGB; use PIL-decoded png via is_png=False works
    # since load_image converts to RGB
    loaded = load_image(path, normalize=True, is_png=False)
    np.testing.assert_allclose(loaded, rgb / 255.0, atol=1e-6)


def test_device_resilient_retries_runtime_errors():
    import jax
    from deeplabv3plus_augmented_superresolution_tpu.utils import (
        device_healthy,
        device_resilient,
    )

    calls = {"n": 0}

    @device_resilient(max_retries=2, max_wait_s=0.01,
                      on_retry=lambda a, e: None)
    def flaky():
        calls["n"] += 1
        if calls["n"] < 3:
            raise jax.errors.JaxRuntimeError("UNAVAILABLE: fake worker crash")
        return 42

    assert flaky() == 42
    assert calls["n"] == 3
    assert device_healthy()

    @device_resilient(max_retries=1, max_wait_s=0.01,
                      on_retry=lambda a, e: None)
    def always_fails():
        raise jax.errors.JaxRuntimeError("UNAVAILABLE: persistent")

    import pytest as _pytest
    with _pytest.raises(jax.errors.JaxRuntimeError):
        always_fails()

    @device_resilient()
    def type_error():
        raise TypeError("bug, not flakiness")

    with _pytest.raises(TypeError):
        type_error()


def test_robustness_compare_aggregate_both_schemas(tmp_path):
    """scripts/robustness_compare.py reads BOTH grid schemas: this repo's
    check_robustness output (Angle,Shift_x,Shift_y,Mean_IoU) and the
    reference's published robustness_data CSVs (Angle,Shift_X,Shift_Y,mIoU
    — reference check_robustness.py:101-141), case-insensitively."""
    import importlib.util
    import os

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "rc", os.path.join(root, "scripts", "robustness_compare.py"))
    rc = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(rc)

    ours = tmp_path / "robustness_ours.csv"
    ours.write_text(
        "Angle,Shift_x,Shift_y,Mean_IoU\n"
        "0.0,0,0,0.9\n"
        "0.1,0,0,0.8\n"
        "0.6,10,-10,0.4\n")
    ref = tmp_path / "robustness_ref.csv"
    ref.write_text(
        "Angle,Shift_X,Shift_Y,mIoU\n"
        "0.0,0,0,0.7\n"
        "-0.5,5,5,0.3\n")

    a = rc.aggregate(str(ours))
    assert a["rows"] == 3 and a["identity"] == 0.9
    assert abs(a["mean"] - (0.9 + 0.8 + 0.4) / 3) < 1e-12
    assert abs(a["mean_small_rot"] - (0.9 + 0.8) / 2) < 1e-12
    assert a["mean_large_rot"] == 0.4

    b = rc.aggregate(str(ref))
    assert b["rows"] == 2 and b["identity"] == 0.7
    assert b["mean_large_rot"] == 0.3


_CANNED_HLO = """
HloModule jit_step, entry_computation_layout={...}

%fused_computation (param_0: bf16[4,64,64,32], param_1: bf16[3,3,32,64]) -> bf16[4,64,64,64] {
  %param_0 = bf16[4,64,64,32]{3,2,1,0:T(8,128)(2,1)} parameter(0)
  %param_1 = bf16[3,3,32,64]{3,2,1,0:T(8,128)(2,1)} parameter(1)
  ROOT %convolution.1 = bf16[4,64,64,64]{3,2,1,0:T(8,128)(2,1)} convolution(%param_0, %param_1), window={size=3x3 pad=1_1x1_1}, dim_labels=b01f_01io->b01f, metadata={op_name="conv"}
}

ENTRY %main (p0: bf16[4,64,64,32]) -> f32[8,256] {
  %p0 = bf16[4,64,64,32]{3,2,1,0:T(8,128)(2,1)} parameter(0)
  %k_dense = bf16[3,3,32,64]{3,2,1,0} parameter(1)
  %fusion.1 = bf16[4,64,64,64]{3,2,1,0:T(8,128)(2,1)} fusion(%p0, %k_dense), kind=kOutput, calls=%fused_computation
  %k_dw = bf16[3,3,1,64]{3,2,1,0} parameter(2)
  %convolution.2 = bf16[4,64,64,64]{3,2,1,0:T(8,128)(2,1)S(1)} convolution(%fusion.1, %k_dw), window={size=3x3 pad=1_1x1_1}, dim_labels=b01f_01io->b01f, feature_group_count=64, metadata={op_name="dw"}
  %lhs = f32[8,128]{1,0} parameter(3)
  %rhs = f32[128,256]{1,0} parameter(4)
  ROOT %dot.1 = f32[8,256]{1,0:T(8,128)} dot(%lhs, %rhs), lhs_contracting_dims={1}, rhs_contracting_dims={0}, metadata={op_name="mm"}
}
"""


def test_roofline_hlo_flop_classes():
    """The SOL accounting's FLOP split (utils/roofline.py) must reproduce
    the analytic conv/dot counts from real TPU-style HLO text: dense convs
    and dots -> MXU, feature_group_count>1 (depthwise) convs -> VPU."""
    from deeplabv3plus_augmented_superresolution_tpu.utils import (
        parse_hlo_flop_classes,
    )

    cls = parse_hlo_flop_classes(_CANNED_HLO)
    dense = 2 * (4 * 64 * 64 * 64) * 9 * 32
    dw = 2 * (4 * 64 * 64 * 64) * 9 * 1
    dot = 2 * (8 * 256) * 128
    assert cls["n_conv"] == 2 and cls["n_dot"] == 1
    assert cls["mxu_flops"] == dense + dot
    assert cls["dw_flops"] == dw


def test_roofline_sol_summary_composed_bound():
    """sol = max(sum of per-class compute times, bytes/BW); unattributed
    flops (cost_analysis total minus parsed conv/dot) land in the
    elementwise-VPU class so the compute side never undercounts."""
    from deeplabv3plus_augmented_superresolution_tpu.utils import roofline
    from deeplabv3plus_augmented_superresolution_tpu.utils import sol_summary

    cls = roofline.parse_hlo_flop_classes(_CANNED_HLO)
    extra_elementwise = 5e9
    total = cls["mxu_flops"] + cls["dw_flops"] + extra_elementwise
    measured = 0.05
    out = sol_summary(_CANNED_HLO, total, total_bytes=1e9,
                      measured_seconds=measured, xla_optimal_seconds=0.001)
    t_expected = (cls["mxu_flops"] / roofline.MXU_PEAK_FLOPS
                  + cls["dw_flops"] / roofline.VPU_PEAK_FLOPS
                  + extra_elementwise / roofline.VPU_PEAK_FLOPS)
    t_expected = max(t_expected, 1e9 / roofline.HBM_BYTES_PER_S)
    assert abs(out["sol_ms"] - t_expected * 1e3) < 0.01
    assert abs(out["sol_fraction"] - t_expected / measured) < 1e-3
    assert out["sol_lb_ms"] <= out["sol_ms"]
    assert out["bound_by"] in ("mxu", "depthwise_vpu", "elementwise_vpu",
                               "hbm")
    assert out["xla_optimal_seconds"] == 0.001
    # A memory-bound program flips the binding constraint.
    mem = sol_summary(_CANNED_HLO, total, total_bytes=1e12,
                      measured_seconds=measured)
    assert mem["bound_by"] == "hbm"


def test_roofline_parses_live_compiled_module():
    """End-to-end against a really-compiled jit program (whatever backend
    the test session uses): parsing must not crash, and any conv the
    backend kept as an HLO convolution must be classified."""
    import jax
    from jax import lax

    from deeplabv3plus_augmented_superresolution_tpu.utils import (
        parse_hlo_flop_classes,
    )

    def f(x, w):
        return lax.conv_general_dilated(
            x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))

    x = jnp.zeros((1, 8, 8, 4), jnp.float32)
    w = jnp.zeros((3, 3, 4, 8), jnp.float32)
    compiled = jax.jit(f).lower(x, w).compile()
    cls = parse_hlo_flop_classes(compiled.as_text())
    assert cls["mxu_flops"] >= 0 and cls["dw_flops"] >= 0
    if cls["n_conv"]:
        assert cls["mxu_flops"] == 2 * (1 * 8 * 8 * 8) * 9 * 4


def test_sweep_compare_noop_anchor_detection():
    """scripts/sweep_compare.py must flag trials whose aug_iou repeats
    bit-identically (a weak optimizer/lr draw leaves the SR initialization
    untouched, so the metric is the init's IoU) and recompute the optimizer
    ordering without them — otherwise 'adadelta wins' would really mean
    'doing nothing wins'."""
    import importlib.util
    import os

    import pandas as pd

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "sc", os.path.join(root, "scripts", "sweep_compare.py"))
    sc = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(sc)

    noop = 0.794022246748209
    df = pd.DataFrame({
        "aug_iou": [noop, noop, noop, 0.789, 0.781, 0.785],
        "optimizer": ["sgd", "adadelta", "adadelta", "adam", "sgd", "adam"],
        "copy_dropout": [0.0, 0.1, 0.2, 0.1, 0.0, 0.2],
        "use_BTV": [False, False, True, False, True, False],
        "lambda_tv": [0.5] * 6, "lambda_L2": [0.5] * 6,
        "lambda_L1": [0.5] * 6,
    })
    anchor, real = sc.noop_anchor(df)
    assert anchor["n_trials"] == 3 and abs(anchor["aug_iou"] - 0.794) < 1e-9
    assert len(real) == 3 and noop not in set(real["aug_iou"])

    out = sc.wide_findings(df, "unit")
    assert out["noop_anchor"]["n_trials"] == 3
    # Including no-ops, adadelta 'wins' at the anchor value; excluding them
    # the real ordering is adam (0.789) > sgd (0.781).
    assert out["by_optimizer_excl_noop"]["adam"]["max"] == 0.789
    assert out["finding_adam_family_best_excl_noop"] is True

    # No anchor when every value is distinct.
    df2 = df.assign(aug_iou=[0.79, 0.791, 0.792, 0.793, 0.794, 0.795])
    anchor2, real2 = sc.noop_anchor(df2)
    assert anchor2 is None and len(real2) == 6
