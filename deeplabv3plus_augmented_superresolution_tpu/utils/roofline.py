"""Composed speed-of-light (SOL) accounting from compiled HLO.

XLA's ``compiled.cost_analysis()`` reports aggregate flops/bytes, which is
enough for an MFU line but cannot answer "is 40% MFU actually near the
roofline for THIS program?" — a depthwise-heavy workload (NOTES.md "VPU
roofline") is structurally bounded far below the MXU peak, so the honest
perf bar is measured-time vs a COMPOSED bound that charges each op class to
its own ceiling:

    sol_seconds = max( F_mxu/P_mxu + F_dw/P_vpu + F_other/P_vpu,
                       bytes/BW_hbm )

where the FLOP split comes from parsing the compiled module's own HLO text
(every convolution/dot instruction, classified MXU vs depthwise-VPU by
``feature_group_count``), so the accounting follows the exact program that
was timed — the compiler's arithmetic, not hand-derived layer math. The
compute classes are summed because on one TensorCore the MXU and VPU issue
from the same instruction stream (fused loops serialize them); memory is
overlapped (max), so ``sol_seconds`` is an optimistic achievable-time
estimate and ``sol_fraction = sol_seconds / measured_seconds`` reads as
"fraction of speed-of-light achieved" (1.0 = at the composed roofline).

No reference counterpart: the reference (nicoloalbergoni/
DeepLabV3Plus-Augmented-SuperResolution) reports wall-clock only.
"""

import re

__all__ = ["parse_hlo_flop_classes", "sol_summary"]

# Per-class ceilings. MXU: measured bf16 matmul peak on this chip through
# the axon tunnel (NOTES.md "Measured kernel facts": 4096^3 in 0.99 ms).
# VPU: measured depthwise-conv ceiling 1.6-1.8 TF/s (NOTES.md "VPU
# roofline"; the v5e VPU spec roofline is ~2 TF/s) — elementwise flops get
# the same ceiling. HBM: v5e spec sheet.
MXU_PEAK_FLOPS = 138e12
VPU_PEAK_FLOPS = 1.8e12
HBM_BYTES_PER_S = 819e9

# One HLO instruction definition: "%name = dtype[d0,d1,...]{layout} op(...)".
_DEF_RE = re.compile(
    r"^\s*(?:ROOT\s+)?%?([\w.\-]+)\s*=\s*\w+\[([\d,]*)\]")
_CONV_RE = re.compile(r"\bconvolution\(([^)]*)\)")
_DOT_RE = re.compile(r"\bdot\(([^)]*)\)")
_WINDOW_RE = re.compile(r"window=\{[^}]*?size=([\dx]+)")
_DIMLABEL_RE = re.compile(r"dim_labels=([\w\d]+)_([\w\d]+)->([\w\d]+)")
_FGC_RE = re.compile(r"feature_group_count=(\d+)")
_BGC_RE = re.compile(r"batch_group_count=(\d+)")
_LHS_C_RE = re.compile(r"lhs_contracting_dims=\{([\d,]*)\}")


def _prod(dims):
    out = 1
    for d in dims:
        out *= d
    return out


def _shape(text):
    return [int(d) for d in text.split(",") if d] if text else []


def parse_hlo_flop_classes(hlo_text: str):
    """Split an HLO module's conv/dot FLOPs into hardware-unit classes.

    Returns ``{"mxu_flops": F, "dw_flops": F, "n_conv": .., "n_dot": ..}``:
    regular convolutions and dots land on the MXU; grouped convolutions
    (``feature_group_count > 1``, i.e. depthwise and depthwise-gradient
    convs — no MXU path exists for them) land on the VPU.

    Operand shapes are not printed inline in optimized HLO, so definitions
    are tracked sequentially (HLO is SSA: every operand is defined before
    use within its computation; later same-named definitions in other
    computations simply overwrite, which is safe for use-after-def lookup).
    """
    shapes = {}
    mxu = 0.0
    dw = 0.0
    n_conv = 0
    n_dot = 0
    for line in hlo_text.splitlines():
        d = _DEF_RE.match(line)
        if not d:
            continue
        name, out_shape_txt = d.group(1), d.group(2)
        out_shape = _shape(out_shape_txt)
        shapes[name] = out_shape

        conv = _CONV_RE.search(line)
        if conv and "window=" in line:
            out_elems = _prod(out_shape)
            win = _WINDOW_RE.search(line)
            k_spatial = (_prod(int(s) for s in win.group(1).split("x"))
                         if win else 1)
            # Cin-per-group from the kernel operand's shape at the 'i'
            # position of the kernel dim_labels (e.g. "01io" -> index 2).
            cin_per_group = None
            dl = _DIMLABEL_RE.search(line)
            operands = [o.strip().lstrip("%")
                        for o in conv.group(1).split(",")]
            if dl and len(operands) >= 2 and operands[1] in shapes:
                kshape = shapes[operands[1]]
                kernel_labels = dl.group(2)
                i_pos = kernel_labels.find("i")
                if 0 <= i_pos < len(kshape):
                    cin_per_group = kshape[i_pos]
            fgc = _FGC_RE.search(line)
            fgc = int(fgc.group(1)) if fgc else 1
            bgc = _BGC_RE.search(line)
            bgc = int(bgc.group(1)) if bgc else 1
            if cin_per_group is None:
                # Fallback (kernel defined in an outer scope we cannot see):
                # depthwise convs have cin_per_group == 1; dense convs are
                # skipped rather than guessed (undercounting keeps
                # sol_fraction conservative — a lower SOL bound).
                if fgc <= 1:
                    continue
                cin_per_group = 1
            flops = 2.0 * out_elems * k_spatial * cin_per_group
            n_conv += 1
            if fgc > 1 or bgc > 1:
                dw += flops
            else:
                mxu += flops
            continue

        dot = _DOT_RE.search(line)
        if dot:
            operands = [o.strip().lstrip("%")
                        for o in dot.group(1).split(",")]
            lhs_c = _LHS_C_RE.search(line)
            if not (operands and operands[0] in shapes and lhs_c):
                continue
            lhs_shape = shapes[operands[0]]
            cdims = [int(x) for x in lhs_c.group(1).split(",") if x]
            contracted = _prod(lhs_shape[i] for i in cdims
                               if i < len(lhs_shape))
            mxu += 2.0 * _prod(out_shape) * contracted
            n_dot += 1

    return {"mxu_flops": mxu, "dw_flops": dw,
            "n_conv": n_conv, "n_dot": n_dot}


def sol_summary(hlo_text: str, total_flops: float, total_bytes: float,
                measured_seconds: float, xla_optimal_seconds=None):
    """Composed speed-of-light summary for one timed program execution.

    ``total_flops`` / ``total_bytes`` are the cost_analysis aggregates of
    the same executable; conv/dot FLOPs not attributable from the HLO text
    stay in the "other" (VPU) class via the total, so the compute-side sum
    never undercounts vs the compiler's own total.
    """
    if not measured_seconds or total_flops <= 0:
        return None
    cls = parse_hlo_flop_classes(hlo_text)
    f_mxu = min(cls["mxu_flops"], total_flops)
    f_dw = min(cls["dw_flops"], max(total_flops - f_mxu, 0.0))
    f_other = max(total_flops - f_mxu - f_dw, 0.0)
    t_mxu = f_mxu / MXU_PEAK_FLOPS
    t_dw = f_dw / VPU_PEAK_FLOPS
    t_other = f_other / VPU_PEAK_FLOPS
    t_compute = t_mxu + t_dw + t_other
    t_hbm = (total_bytes or 0.0) / HBM_BYTES_PER_S
    sol_seconds = max(t_compute, t_hbm)
    bound = "hbm" if t_hbm > t_compute else max(
        (("mxu", t_mxu), ("depthwise_vpu", t_dw), ("elementwise_vpu",
                                                   t_other)),
        key=lambda kv: kv[1])[0]
    out = {
        "sol_fraction": round(sol_seconds / measured_seconds, 4),
        "sol_ms": round(sol_seconds * 1e3, 2),
        "measured_ms": round(measured_seconds * 1e3, 2),
        # Strict lower bound under PERFECT overlap of all units (each roof
        # alone): no program can beat this no matter how XLA schedules.
        # sol_ms assumes the compute classes serialize (one TensorCore
        # instruction stream) with memory overlapped — the realistic target.
        "sol_lb_ms": round(max(t_mxu, t_dw, t_other, t_hbm) * 1e3, 2),
        "bound_by": bound,
        "class_ms": {"mxu": round(t_mxu * 1e3, 2),
                     "depthwise_vpu": round(t_dw * 1e3, 2),
                     "elementwise_vpu": round(t_other * 1e3, 2),
                     "hbm": round(t_hbm * 1e3, 2)},
        "class_flops": {"mxu": f_mxu, "depthwise_vpu": f_dw,
                        "elementwise_vpu": f_other},
        "n_conv": cls["n_conv"], "n_dot": cls["n_dot"],
        "peaks": {"mxu_tf_s": MXU_PEAK_FLOPS / 1e12,
                  "vpu_tf_s": VPU_PEAK_FLOPS / 1e12,
                  "hbm_gb_s": HBM_BYTES_PER_S / 1e9},
        "accounting": ("SOL = max(F_mxu/138TF + F_dw/1.8TF + F_other/1.8TF,"
                       " bytes/819GB/s); FLOP classes parsed from the timed"
                       " executable's own HLO (conv/dot instructions,"
                       " grouped convs -> VPU), totals from XLA"
                       " cost_analysis; peaks are measured (NOTES.md"
                       " 'Measured kernel facts' / 'VPU roofline') except"
                       " the HBM spec number"),
    }
    # XLA's own per-instruction optimal-time estimate, as a cross-check
    # only where the backend reports a sane value (the CPU backend emits
    # negative garbage here).
    if xla_optimal_seconds and xla_optimal_seconds > 0:
        out["xla_optimal_seconds"] = xla_optimal_seconds
    return out
