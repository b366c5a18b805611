"""Tracing / profiling helpers (aux subsystem; the reference has none beyond
tqdm bars + wandb runtime columns — SURVEY.md §5.1).

StageTimer gives per-stage wall times with real device syncs (important
through the axon TPU tunnel where block_until_ready can return early — force
a tiny value fetch instead). trace_to wraps jax.profiler for XLA-level traces
viewable in TensorBoard/Perfetto.
"""

import contextlib
import threading
import time
from collections import defaultdict
from typing import Dict

import jax
import jax.numpy as jnp


def _sync(value=None):
    """Force a device->host sync that actually round-trips."""
    if value is None:
        value = jnp.zeros(())
    leaves = [l for l in jax.tree.leaves(value)
              if isinstance(l, jax.Array)]
    if leaves:
        float(jnp.sum(leaves[0].ravel()[0]))


class StageTimer:
    """Accumulates wall time per named stage.

    with timer.stage("forward", out=logits): ...

    sync=True (default) brackets each stage with real device round-trips —
    honest per-stage device time, but serializing; use for sequential
    profiling. sync=False records pure wall time with a thread lock on the
    accumulators — safe inside overlapped producer/writer pipelines
    (cli/run_asr) where forcing syncs would destroy the very overlap being
    measured.
    """

    def __init__(self, sync: bool = True):
        self.sync = sync
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)
        self.maxes: Dict[str, float] = defaultdict(float)
        self._lock = threading.Lock()

    @contextlib.contextmanager
    def stage(self, name: str, sync_value=None):
        if self.sync:
            _sync()
        start = time.perf_counter()
        result = {}
        try:
            yield result
        finally:
            if self.sync:
                _sync(result.get("out", sync_value))
            elapsed = time.perf_counter() - start
            with self._lock:
                self.totals[name] += elapsed
                self.counts[name] += 1
                self.maxes[name] = max(self.maxes[name], elapsed)

    def as_dict(self) -> Dict[str, Dict[str, float]]:
        """max_s separates the compile-dominated first call: steady-state
        ms/call = (total_s - max_s) / (calls - 1) when calls > 1."""
        with self._lock:
            out = {}
            for name in self.totals:
                total, count = self.totals[name], self.counts[name]
                mx = self.maxes[name]
                d = {"total_s": round(total, 4), "calls": count,
                     "ms_per_call": round(total / max(count, 1) * 1000, 2),
                     "max_s": round(mx, 4)}
                if count > 1:
                    d["steady_ms_per_call"] = round(
                        (total - mx) / (count - 1) * 1000, 2)
                out[name] = d
            return out

    def summary(self) -> str:
        lines = []
        for name in sorted(self.totals, key=self.totals.get, reverse=True):
            total = self.totals[name]
            count = self.counts[name]
            lines.append(f"{name:<30} {total:8.3f}s total "
                         f"{total / max(count, 1) * 1000:9.2f}ms/call x{count}")
        return "\n".join(lines)


@contextlib.contextmanager
def trace_to(log_dir: str):
    """XLA profiler trace (open with TensorBoard's profile plugin)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def device_summary() -> str:
    devs = jax.devices()
    lines = [f"{len(devs)} device(s), platform={devs[0].platform}"]
    for d in devs:
        mem = getattr(d, "memory_stats", lambda: None)()
        if mem:
            used = mem.get("bytes_in_use", 0) / 2**30
            limit = mem.get("bytes_limit", 0) / 2**30
            lines.append(f"  {d}: {used:.2f}/{limit:.2f} GiB HBM in use")
        else:
            lines.append(f"  {d}")
    return "\n".join(lines)
