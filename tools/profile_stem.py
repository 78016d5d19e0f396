"""A/B the Pallas stem kernel vs the XLA stem conv on the real TPU.

Runs the flagship trunk twice in SEPARATE subprocesses (the fast-path gate
reads HDYOLO_PALLAS_STEM at trace time, so an in-process flip would hit the
jit cache), plus the stem layer in isolation.  Prints ms/batch for each.
"""
import json
import os
import subprocess
import sys

_CHILD = r"""
import os, time, sys
import numpy as np, jax, jax.numpy as jnp
from hd_yolo_tpu.models import Model
from hd_yolo_tpu.models.builder import parse_model_cfg
from hd_yolo_tpu.models.layers import ConvBnAct

B, img, n_iter = int(os.environ.get("B", 8)), 640, 50
dtype = jnp.bfloat16
rng = np.random.default_rng(0)
xb = jnp.asarray(rng.uniform(0, 1, (B, img, img, 3)).astype(np.float32))

def timed(name, body, v, x):
    @jax.jit
    def fn(v, x):
        def b(c, _):
            s = body(v, x + c * 1e-6)
            return jnp.sum(s.astype(jnp.float32)) * 1e-9, None
        c, _ = jax.lax.scan(b, jnp.float32(0), None, length=n_iter)
        return c
    float(fn(v, x))
    t0 = time.time(); float(fn(v, x)); dt = (time.time() - t0) / n_iter
    print(json.dumps({"name": name, "ms_per_batch": round(dt * 1e3, 3),
                      "stem_env": os.environ.get("HDYOLO_PALLAS_STEM", "1")}),
          flush=True)

import json
# stem layer in isolation
stem = ConvBnAct(64, 6, 2, 2, dtype=dtype)
sv = stem.init(jax.random.PRNGKey(0), xb, train=True)
timed("stem", lambda v, x: stem.apply(v, x, train=False), sv, xb)

# full trunk
spec = parse_model_cfg("yolov5l6-mask", "hyp-nuclei")
model = Model(spec=spec, dtype=dtype, max_masks=100, pre_nms_topk=1024)
x0 = jnp.zeros((B, img, img, 3), jnp.float32)
v = jax.jit(lambda k: model.init(k, x0, train=False, compute_masks=True))(jax.random.PRNGKey(0))
jax.block_until_ready(v)
timed("trunk", lambda v, x: jax.tree.reduce(
    lambda a, b: a + jnp.sum(b.astype(jnp.float32)),
    model.apply(v, x, train=False, method=Model.trunk), jnp.float32(0)), v, xb)
"""


def main():
    for flag in ("0", "1"):
        env = dict(os.environ, HDYOLO_PALLAS_STEM=flag)
        print(f"--- HDYOLO_PALLAS_STEM={flag} ---", flush=True)
        r = subprocess.run([sys.executable, "-u", "-c", _CHILD], env=env,
                           timeout=1200)
        if r.returncode:
            return r.returncode
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
