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
