"""Component timing on the real TPU: trunk / +decode+NMS / +mask head."""
import os, time, sys
import numpy as np
import jax, jax.numpy as jnp

from hd_yolo_tpu.models import Model
from hd_yolo_tpu.models.builder import parse_model_cfg
from hd_yolo_tpu.ops.nms import nms_per_image

batch, img, n_iter = int(__import__("os").environ.get("B", 8)), 640, 50
dtype = jnp.bfloat16
spec = parse_model_cfg("yolov5l6-mask", "hyp-nuclei")
model = Model(spec=spec, dtype=dtype, max_masks=100, pre_nms_topk=1024)
x0 = jnp.zeros((batch, img, img, 3), jnp.float32)
variables = jax.jit(lambda k: model.init(k, x0, train=False, compute_masks=True))(jax.random.PRNGKey(0))
jax.block_until_ready(variables)
rng = np.random.default_rng(0)
xb = jnp.asarray(rng.uniform(0, 1, (batch, img, img, 3)).astype(np.float32))

def timed(name, fn, *args):
    f = jax.jit(fn)
    float(jnp.sum(f(*args)))  # compile + warm; float() forces a real fetch on the tunnel
    t0 = time.time(); float(jnp.sum(f(*args)))
    dt = (time.time() - t0) / n_iter
    print(f"{name:28s} {dt*1e3:8.2f} ms/batch  {batch/dt:8.1f} tiles/s", flush=True)
    return dt

def loop(body):
    def fn(v, x):
        def b(c, _):
            s = body(v, x + c * 1e-6)
            return s * 1e-9, None
        c, _ = jax.lax.scan(b, 0.0, None, length=n_iter)
        return c
    return fn

def red(out):
    return jax.tree.reduce(lambda a, b: a + jnp.sum(b.astype(jnp.float32)), out, 0.0)

# full masked forward
timed("full (masks)", loop(lambda v, x: red(model.apply(v, x, train=False, compute_masks=True)[1])), variables, xb)
# det-only forward
timed("det only (no masks)", loop(lambda v, x: red(model.apply(v, x, train=False, compute_masks=False)[1])), variables, xb)
# trunk only (backbone+neck convs, no decode/top-k/NMS/mask branch)
timed("trunk only", loop(lambda v, x: red(model.apply(v, x, train=False, method=Model.trunk))), variables, xb)

# NMS in isolation: realistic proposal tensor
K = 25200  # approx proposals at 640 yolov5l6 (4 levels x3 anchors)
nc = spec.headers[0].nc if hasattr(spec, "headers") else 6
pre = jnp.asarray(rng.uniform(0, 1, (batch, K, 5 + 6 + 1)).astype(np.float32))
pre = pre.at[..., 2:4].set(pre[..., 2:4] * 60 + 4).at[..., 0:2].set(pre[..., 0:2] * 640)
def nms_body(v, p):
    out = jax.vmap(lambda q: nms_per_image(q, nc=6, conf_thres=0.15, iou_thres=0.45, max_det=300, pre_nms_topk=1024))(p)
    return red(out)
timed("nms alone (8x25200)", loop(lambda v, p: nms_body(v, p)), variables, pre)
