"""Lab: XLA-only stem reformulation — 6x6/s2/p2 conv(C_in=3) vs
space-to-depth(2) + 3x3/s1/p1 conv(C_in=12) with rearranged weights.

The stem is the one conv XLA schedules badly (3-channel contracted dim
wastes MXU lanes; the Pallas stem kernel does not compile on this libtpu).
The s2d form is bit-identical math (same 108-tap dot per output) expressed
so the conv emitter sees C_in=12 at half the spatial extent.

    PYTHONPATH=/root/.axon_site:/root/repo python -u tools/stem_s2d_lab.py
"""
import json
import os
import time

import numpy as np
import jax
import jax.numpy as jnp

B = int(os.environ.get("B", 16))
n_iter = 50
rng = np.random.default_rng(0)
x = jnp.asarray(rng.uniform(0, 1, (B, 640, 640, 3)).astype(np.float32))
w = jnp.asarray(rng.normal(0, 0.1, (6, 6, 3, 64)).astype(np.float32))


def conv_ref(x, w):
    return jax.lax.conv_general_dilated(
        x.astype(jnp.bfloat16), w.astype(jnp.bfloat16), (2, 2),
        [(2, 2), (2, 2)], dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)


def s2d(x):
    Bq, H, W, C = x.shape
    y = x.reshape(Bq, H // 2, 2, W // 2, 2, C)
    return y.transpose(0, 1, 3, 2, 4, 5).reshape(Bq, H // 2, W // 2, 4 * C)


def remap(w):
    # w[2a+di, 2b+dj, c, o] -> w2[a, b, di*6+dj*3+c, o]
    k = w.reshape(3, 2, 3, 2, 3, 64)            # a, di, b, dj, c, o
    return k.transpose(0, 2, 1, 3, 4, 5).reshape(3, 3, 12, 64)


def conv_s2d(x, w):
    y = s2d(jnp.pad(x, ((0, 0), (2, 2), (2, 2), (0, 0))))
    return jax.lax.conv_general_dilated(
        y.astype(jnp.bfloat16), remap(w).astype(jnp.bfloat16), (1, 1),
        [(0, 0), (0, 0)], dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)


a = jax.jit(conv_ref)(x, w)
b = jax.jit(conv_s2d)(x, w)
err = float(jnp.max(jnp.abs(a - b)))
print("shapes", a.shape, b.shape, "max abs diff", err, flush=True)
assert a.shape == b.shape


def timed(name, body):
    @jax.jit
    def fn(x, w):
        def step(c, _):
            return jnp.sum(body(x + c * 1e-6, w)) * 1e-9, None
        c, _ = jax.lax.scan(step, jnp.float32(0), None, length=n_iter)
        return c
    float(fn(x, w)); t0 = time.time(); float(fn(x, w))
    dt = (time.time() - t0) / n_iter
    print(json.dumps({"name": name, "ms_per_batch": round(dt * 1e3, 3)}), flush=True)
    return dt

timed("stem_6x6s2", conv_ref)
timed("stem_s2d_3x3", conv_s2d)


def conv_im2col(x, w):
    # im2col: extract 6x6 patches at stride 2 -> one [rows, 108] x [108, 64]
    # GEMM.  The patches op is DMA work (no lane waste); the GEMM is dense.
    p = jax.lax.conv_general_dilated_patches(
        x.astype(jnp.bfloat16), (6, 6), (2, 2), [(2, 2), (2, 2)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    # patches channel order for NHWC: C * kh * kw with channel-major
    wm = w.transpose(2, 0, 1, 3).reshape(108, 64).astype(jnp.bfloat16)
    return jax.lax.dot_general(
        p, wm, (((3,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


if __name__ == "__main__" and os.environ.get("IM2COL", "1") == "1":
    c = jax.jit(conv_im2col)(x, w)
    err2 = float(jnp.max(jnp.abs(a - c)))
    print("im2col max abs diff", err2, flush=True)
    timed("stem_im2col", conv_im2col)
