"""Quantify the v5e-8 scaling projection from the compiled sharded HLO.

The multi-chip story so far rests on (a) fake-mesh lowering tests
(tests/test_parallel.py: collectives present, per-device temp ~1/8) and
(b) prose ("~40 img/s at ideal scaling"). This script replaces the prose
with an ANALYTIC model derived from the program XLA actually builds:

  1. Compile the REAL production serving program (512 px, 100 copies,
     xception, gram stencil) on a fake 8-device mesh in both scaling
     regimes:
       * throughput: (data=8, aug=1) — batch 8, one image per chip;
       * latency:    (data=1, aug=8) — one image, copies sharded.
  2. Parse every collective in the compiled HLO (all-reduce, all-gather,
     reduce-scatter, collective-permute) and sum its payload bytes.
  3. Prove the collectives are OUTSIDE the solver's lax.scan by compiling
     at two iteration counts and checking byte-for-byte invariance
     (a collective inside the 300-iter loop would make the projection
     iteration-dependent; the gram-serving design keeps the aug-reduction
     in the one-time extraction, sr/solver.py + ops/gram.py).
  4. Model per-image ICI time with a ring all-reduce (2(n-1)/n x payload)
     against a RANGE of ICI bandwidths, next to the measured single-chip
     compute time (BENCH_r03: 5.29 img/s -> 189 ms/image), and emit
     scaling efficiency + the break-even ICI bandwidth as JSON.

Caveats stated in the artifact: the HLO is the CPU backend's SPMD
partition (GSPMD runs the same partitioner for every backend, but TPU
fusion differs), and ICI bandwidth is parameterized, not measured — no
multi-chip hardware exists in this container (PARITY.md).

Usage:
    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python scripts/multichip_projection.py --out MULTICHIP_PROJECTION.json
"""

import argparse
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The container presets JAX_PLATFORMS=axon (one real chip); this analysis
# needs the 8-device fake CPU mesh. The env var alone does not displace the
# axon plugin once it is registered, so force the platform through
# jax.config (same pattern as per_class_validation --quick).
if "xla_force_host_platform_device_count" not in os.environ.get(
        "XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=8")
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

_DTYPE_BYTES = {"f64": 8, "f32": 4, "bf16": 2, "f16": 2, "s64": 8, "u64": 8,
                "s32": 4, "u32": 4, "s16": 2, "u16": 2, "s8": 1, "u8": 1,
                "pred": 1}

# %all-reduce.3 = f32[100,128,128]{2,1,0} all-reduce(...)
# also matches tuple-shaped variadic collectives: (f32[..], f32[..]) all-reduce
_COLL_RE = re.compile(
    r"=\s*(\(?[a-z0-9]+\[[^=]*?)\s*"
    r"(all-reduce|all-gather|reduce-scatter|collective-permute)"
    r"(?:-start)?\(")
_SHAPE_RE = re.compile(r"([a-z0-9]+)\[([0-9,]*)\]")


def _shape_bytes(shapes_txt: str) -> int:
    total = 0
    for dt, dims in _SHAPE_RE.findall(shapes_txt):
        if dt not in _DTYPE_BYTES:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * _DTYPE_BYTES[dt]
    return total


def collective_stats(hlo_text: str):
    """Payload bytes per collective kind from compiled HLO text. -start ops
    are counted once (-done carries no shape payload of its own)."""
    stats = {}
    for shapes_txt, kind in _COLL_RE.findall(hlo_text):
        b = _shape_bytes(shapes_txt)
        d = stats.setdefault(kind, {"count": 0, "payload_bytes": 0})
        d["count"] += 1
        d["payload_bytes"] += b
    return stats


def ring_ici_bytes(stats, n_dev: int) -> int:
    """Per-device ICI traffic under ring algorithms: all-reduce moves
    2(n-1)/n x payload, all-gather / reduce-scatter / permute (n-1)/n x."""
    total = 0.0
    for kind, d in stats.items():
        f = 2.0 if kind == "all-reduce" else 1.0
        total += f * (n_dev - 1) / n_dev * d["payload_bytes"]
    return int(total)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--num_aug", type=int, default=100)
    ap.add_argument("--backbone", default="xception")
    ap.add_argument("--single_chip_img_s", type=float, default=5.29,
                    help="measured single-chip serving rate (BENCH_r03)")
    ap.add_argument("--ici_gbps", type=float, nargs="+",
                    default=[45.0, 90.0, 180.0],
                    help="candidate per-chip ICI bandwidths, GB/s")
    ap.add_argument("--out", default="MULTICHIP_PROJECTION.json")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from deeplabv3plus_augmented_superresolution_tpu.models import (
        DeepLabConfig, build_model,
    )
    from deeplabv3plus_augmented_superresolution_tpu.parallel import (
        make_asr_batch_fn, make_mesh, padded_sr_cfg, shard_batch,
    )
    from deeplabv3plus_augmented_superresolution_tpu.pipeline import (
        sample_augmentations,
    )
    from deeplabv3plus_augmented_superresolution_tpu.sr import (
        OptimizerConfig, SRConfig, precompute_gram_stencil,
    )

    size, n_aug = args.size, args.num_aug
    feat = size // (4 if args.backbone == "xception" else 8)
    cfg = DeepLabConfig(input_shape=(size, size, 3), backbone=args.backbone,
                        weights=None, final_upsample=False,
                        compute_dtype="bfloat16")
    params, _ = build_model(cfg, seed=0)
    a, s = sample_augmentations(jax.random.key(0), n_aug, 0.15,
                                80.0 * size / 512.0)

    def compiled(mesh_shape, batch, num_iter, serving=True):
        mesh = make_mesh(jax.devices()[:mesh_shape[0] * mesh_shape[1]],
                         shape=mesh_shape)
        sr_cfg = SRConfig(
            lambda_df=1.0, lambda_tv=0.3, lambda_L2=0.7, num_iter=num_iter,
            num_aug=n_aug, feature_size=(feat, feat),
            output_size=(size, size), angle_max=0.16, solver_impl="gram",
            optimizer=OptimizerConfig(learning_rate=1e-3))
        coeffs = None
        if serving:
            pc = padded_sr_cfg(sr_cfg, mesh)
            sh = jax.eval_shape(
                lambda aa, ss: precompute_gram_stencil(aa, ss, pc), a, s)
            coeffs = jnp.zeros(sh.shape, sh.dtype)
        fn = make_asr_batch_fn(mesh, cfg, sr_cfg, class_id=8,
                               sr_types=("aug", "max", "mean"),
                               gram_coeffs=coeffs)
        images = jnp.zeros((batch, size, size, 3), jnp.float32)
        angles = jnp.broadcast_to(a, (batch,) + a.shape)
        shifts = jnp.broadcast_to(s, (batch,) + s.shape)
        sargs = shard_batch(mesh, params, images, angles, shifts)
        return fn.lower(*sargs).compile()

    n_dev = 8
    t_img_ms = 1000.0 / args.single_chip_img_s
    result = {
        "n_devices": n_dev,
        "program": {"size": size, "num_aug": n_aug,
                    "backbone": args.backbone,
                    "sr_types": ["aug", "max", "mean"], "solver": "gram",
                    "serving_stencil": True},
        "single_chip": {"img_per_s": args.single_chip_img_s,
                        "ms_per_image": round(t_img_ms, 1),
                        "source": "BENCH_r03.json serving row"},
        "model": ("ring collectives: all-reduce 2(n-1)/n x payload, "
                  "gather/scatter/permute (n-1)/n x; comm/compute overlap "
                  "NOT assumed (worst case: serial)"),
        "caveats": [
            "HLO from the CPU backend's GSPMD partition (the partitioner "
            "is backend-shared; TPU fusion may merge or split collectives)",
            "ICI bandwidth parameterized, not measured: no multi-chip "
            "hardware in this container (PARITY.md)",
        ],
        "regimes": {},
    }

    for name, mesh_shape, batch in (("throughput_data_parallel", (8, 1), 8),
                                    ("latency_aug_sharded", (1, 8), 1)):
        comp2 = compiled(mesh_shape, batch, num_iter=2)
        comp4 = compiled(mesh_shape, batch, num_iter=4)
        s2 = collective_stats(comp2.as_text())
        s4 = collective_stats(comp4.as_text())
        loop_invariant = s2 == s4
        ici = ring_ici_bytes(s4, n_dev)
        per_image = ici / batch
        mem = comp4.memory_analysis()
        regime = {
            "mesh": {"data": mesh_shape[0], "aug": mesh_shape[1]},
            "global_batch": batch,
            "collectives": s4,
            "collectives_invariant_to_num_iter": loop_invariant,
            "ici_bytes_per_device": ici,
            "ici_bytes_per_image": int(per_image),
            "per_device_temp_gb": round(mem.temp_size_in_bytes / 2**30, 3),
            "scaling_model": {},
        }
        for bw in args.ici_gbps:
            comm_ms = per_image / (bw * 1e9) * 1000.0
            eff = t_img_ms / (t_img_ms + comm_ms)
            entry = {
                "comm_ms_per_image": round(comm_ms, 3),
                "comm_overhead_fraction": round(comm_ms / t_img_ms, 6),
            }
            if name == "throughput_data_parallel":
                # Each chip owns whole images: throughput multiplies.
                entry["efficiency"] = round(eff, 4)
                entry["cluster_img_per_s"] = round(
                    n_dev * args.single_chip_img_s * eff, 2)
                entry["vs_reference_0.392"] = round(
                    n_dev * args.single_chip_img_s * eff / 0.392, 1)
            regime["scaling_model"][f"{bw:g}GBps"] = entry
        # Break-even bandwidth for 90% efficiency: comm <= t/9.
        regime["ici_gbps_for_90pct_eff"] = round(
            per_image / (t_img_ms / 9.0 / 1000.0) / 1e9, 3)
        if name == "latency_aug_sharded":
            regime["note"] = (
                "aug-sharding accelerates the pre-solve stages (copies, "
                "forward, OPM, Gram extraction: the aug axis shards them "
                "8-way) and replicates the tiny b/G solve scan on every "
                "device — the collectives above are the one-time psum of "
                "b and the probe responses, OUTSIDE the iteration loop "
                "(invariance check). This regime bounds the ICI cost of "
                "single-image latency; it is not a throughput multiplier.")
        result["regimes"][name] = regime
        print(f"[projection] {name}: {sum(d['count'] for d in s4.values())} "
              f"collectives, {per_image / 1e6:.2f} MB/image over ICI, "
              f"loop-invariant={loop_invariant}", flush=True)

    with open(args.out, "w") as f:
        json.dump(result, f, indent=2, allow_nan=False)
    print(f"[projection] -> {args.out}")


if __name__ == "__main__":
    main()
