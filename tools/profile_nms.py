"""NMS sub-part timing on the real TPU."""
import time
import numpy as np
import jax, jax.numpy as jnp
from jax import lax

from hd_yolo_tpu.ops.nms import nms_padded, nms_per_image
from hd_yolo_tpu.ops.boxes import box_iou, xywh2xyxy

batch, n_iter = 8, 10
rng = np.random.default_rng(0)


def timed(name, fn, *args):
    f = jax.jit(fn)
    float(jnp.sum(f(*args)))
    t0 = time.time(); float(jnp.sum(f(*args)))
    dt = (time.time() - t0) / n_iter
    print(f"{name:32s} {dt*1e3:8.2f} ms/batch", flush=True)
    return dt


def loop(body):
    def fn(*args):
        def b(c, _):
            s = body(*((args[0] + c * 1e-6,) + args[1:]))
            return jnp.sum(s.astype(jnp.float32)) * 1e-9, None
        c, _ = lax.scan(b, 0.0, None, length=n_iter)
        return c
    return fn

K = 25200
pre = jnp.asarray(rng.uniform(0, 1, (batch, K)).astype(np.float32))
boxes_all = jnp.asarray(
    np.concatenate([rng.uniform(0, 600, (batch, K, 2)), rng.uniform(4, 64, (batch, K, 2))], -1
                   ).astype(np.float32))

# (a) top_k 25200 -> 1024
timed("topk 8x25200->1024", loop(lambda s: lax.top_k(s, 1024)[0]), pre)

b1024 = jnp.asarray(np.concatenate(
    [rng.uniform(0, 600, (batch, 1024, 2)), rng.uniform(4, 64, (batch, 1024, 2))], -1).astype(np.float32))
b1024 = b1024.at[..., 2:].set(b1024[..., :2] + b1024[..., 2:])
s1024 = jnp.asarray(rng.uniform(0, 1, (batch, 1024)).astype(np.float32))
v1024 = jnp.ones((batch, 1024), bool)

# (b) IoU matrix only
timed("iou 8x1024^2", loop(lambda b: jax.vmap(lambda x: box_iou(x, x))(b)), b1024)

# (c) argsort 1024
timed("argsort 8x1024", loop(lambda s: jnp.argsort(-s, axis=-1, stable=True).astype(jnp.float32)), s1024)

# (d) full nms_padded on 1024
timed("nms_padded 8x1024", loop(
    lambda b, s, v: jax.vmap(lambda bb, ss, vv: nms_padded(bb, ss, vv, 0.45, 300)[0].astype(jnp.float32))(b, s, v)
), b1024, s1024, v1024)
