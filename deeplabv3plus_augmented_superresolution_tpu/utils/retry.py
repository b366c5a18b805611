"""Failure detection & retry for flaky accelerator runtimes.

The reference's failure handling is try/except-skip around corrupt files
(SURVEY.md §5.3). On TPU there is a second, hardware-level failure mode this
repo has hit in practice: the device worker process can crash on pathological
programs ("TPU worker process crashed or restarted") and takes minutes to
recover. ``device_resilient`` wraps per-item work (e.g. one image's ASR) with
health-checked, backed-off retries so long batch runs survive.
"""

import functools
import time
from typing import Callable, Optional

import jax


def device_healthy(timeout_ok: float = 30.0) -> bool:
    """Cheap device probe: run + fetch a tiny computation."""
    try:
        import jax.numpy as jnp

        start = time.time()
        val = float(jnp.ones((8, 8)).sum())
        return val == 64.0 and (time.time() - start) < timeout_ok
    except Exception:
        return False


def wait_for_device(max_wait_s: float = 600.0, poll_s: float = 30.0) -> bool:
    """Block until the device answers again (worker restarts take minutes)."""
    deadline = time.time() + max_wait_s
    while time.time() < deadline:
        if device_healthy():
            return True
        time.sleep(poll_s)
    return device_healthy()


def device_resilient(max_retries: int = 2, max_wait_s: float = 600.0,
                     on_retry: Optional[Callable[[int, Exception], None]] = None):
    """Decorator: retry a device-touching function across worker crashes.

    Retries only on runtime/device errors (jax.errors.JaxRuntimeError),
    never on Python/tracing errors — those are bugs, not flakiness.
    """

    def deco(fn):
        @functools.wraps(fn)
        def wrapper(*args, **kwargs):
            attempt = 0
            while True:
                try:
                    return fn(*args, **kwargs)
                except jax.errors.JaxRuntimeError as e:
                    attempt += 1
                    if attempt > max_retries:
                        raise
                    if on_retry is not None:
                        on_retry(attempt, e)
                    else:
                        print(f"[device_resilient] {type(e).__name__} on "
                              f"attempt {attempt}; waiting for device...")
                    wait_for_device(max_wait_s=max_wait_s)
        return wrapper

    return deco
