"""Profiling / model-info utilities.

Behavioral reference: ``Profile``/``Timeout`` (``/root/reference/metayolo/
engines/general.py:45-86``), ``time_sync``/``profile`` micro-bench
(``engines/torch_utils.py:84-140``), ``model_info`` param/GFLOPs summary
(``models/utils_torch.py:102-124``).

TPU equivalents: jax cost analysis for FLOPs, device memory_stats for HBM,
jax.profiler traces, and the dispatch-overhead-free latency loop (see
bench.py's methodology note).
"""

from __future__ import annotations

import contextlib
import signal
import time
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp

from .. import LOGGER


class Profile(contextlib.ContextDecorator):
    """Wall-clock accumulator context/decorator (general.py:45-51)."""

    def __init__(self, t: float = 0.0):
        self.t = t

    def __enter__(self):
        self.start = time.time()
        return self

    def __exit__(self, *exc):
        self.dt = time.time() - self.start
        self.t += self.dt


class Timeout(contextlib.ContextDecorator):
    """SIGALRM timeout guard (general.py:54-73)."""

    def __init__(self, seconds: int, timeout_msg: str = "", suppress: bool = True):
        self.seconds = int(seconds)
        self.msg = timeout_msg
        self.suppress = suppress

    def _handler(self, signum, frame):
        raise TimeoutError(self.msg)

    def __enter__(self):
        signal.signal(signal.SIGALRM, self._handler)
        signal.alarm(self.seconds)

    def __exit__(self, exc_type, exc_val, exc_tb):
        signal.alarm(0)
        return self.suppress and exc_type is TimeoutError


def flops_of(fn: Callable, *args, **kwargs) -> float:
    """Estimated FLOPs of one call via XLA cost analysis."""
    lowered = jax.jit(fn).lower(*args, **kwargs)
    cost = lowered.compile().cost_analysis()
    if isinstance(cost, list):
        cost = cost[0] if cost else {}
    return float(cost.get("flops", 0.0)) if cost else 0.0


def device_memory_stats(device=None) -> Dict[str, Any]:
    """HBM usage of a device (the autobatch signal, engines/autobatch.py)."""
    d = device or jax.devices()[0]
    try:
        return dict(d.memory_stats() or {})
    except Exception:
        return {}


def model_info(model, variables, input_shape=(1, 640, 640, 3), verbose: bool = False):
    """Param/GFLOPs summary (model_info, utils_torch.py:102-124)."""
    params = variables.get("params", variables)
    n_params = sum(p.size for p in jax.tree.leaves(params))
    n_tensors = len(jax.tree.leaves(params))
    gflops = None
    try:
        x = jnp.zeros(input_shape, jnp.float32)
        gflops = flops_of(
            lambda v, a: model.apply(v, a, train=False, compute_masks=False), variables, x
        ) / 1e9
    except Exception as e:
        LOGGER.debug(f"flops estimate failed: {e}")
    msg = f"model summary: {n_tensors} tensors, {n_params:,} parameters"
    if gflops:
        msg += f", {gflops:.1f} GFLOPs @ {input_shape[1]}px"
    LOGGER.info(msg)
    if verbose:
        for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
            LOGGER.info(f"{jax.tree_util.keystr(path):60s} {leaf.shape}")
    return {"n_params": n_params, "n_tensors": n_tensors, "gflops": gflops}


def measure_latency(fn: Callable, *args, iters: int = 10) -> float:
    """Dispatch-overhead-free latency (seconds) of fn(*args) via an in-jit loop."""

    @jax.jit
    def loop(*a):
        def body(carry, _):
            # perturb float inputs with the carry so XLA can't hoist fn out
            perturbed = jax.tree.map(
                lambda x: x + carry.astype(x.dtype) * 1e-6
                if jnp.issubdtype(jnp.asarray(x).dtype, jnp.floating) else x,
                a,
            )
            out = fn(*perturbed)
            s = jax.tree.reduce(lambda p, q: p + jnp.sum(q.astype(jnp.float32)), out, 0.0)
            return s * 1e-12, None
        c, _ = jax.lax.scan(body, jnp.zeros(()), None, length=iters)
        return c.reshape(1)

    float(loop(*args)[0])
    t0 = time.time()
    float(loop(*args)[0])
    return (time.time() - t0) / iters


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace context (TensorBoard-viewable)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
