#!/usr/bin/env python3
"""Headline benchmark: tiles/sec/chip for flagship 640px WSI tile inference.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
``vs_baseline`` is the ratio vs the MEASURED reference baseline: the ACTUAL
``/root/reference/evaluation.py::run`` executed unmodified on CPU via the
``refshim/`` compat layer (its own ``time_per_image`` metric,
evaluation.py:97-104; recorded in BASELINE_MEASURED.json by
tools/reference_baseline.py).  Fallback when that file is absent: the
FLOPs-matched torch mirror in hd_yolo_tpu/utils/torch_baseline.py.

Timing note: the axon tunnel adds ~29 ms fixed overhead per dispatch+fetch
(measured: a trivial jitted add costs the same as a full trunk forward), so
the benchmark loops N forwards *inside one jit* via lax.scan with a
data-dependent perturbation (defeats CSE) and fetches once.
"""

import json
import os
import sys
import time

import numpy as np


def main():
    if (os.environ.get("HDYOLO_BENCH_AB") == "1"
            and os.environ.get("HDYOLO_PALLAS_MASKHEAD") is None
            and os.environ.get("BENCH_SUB") != "1"):
        # Opt-in (HDYOLO_BENCH_AB=1): A/B the fused Pallas mask head
        # (ops/pallas_mask_head.py) against the stock XLA path, each in a
        # SACRIFICIAL subprocess (a Mosaic rejection on this libtpu must
        # not cost the headline number), serially so they never contend
        # for the chip; report the faster.  Off by default since the r3
        # measured verdict (tools/maskhead_lab.py): XLA wins decisively
        # (11.2 vs 18.9 ms at N=1600) and the losing sub costs 10+ min of
        # tunnel compile per bench run.  (The Pallas stem is NOT tried: it
        # cannot compile on this hardware — see ops/pallas_stem.py.)
        import subprocess

        def run_sub(maskhead: str):
            env = dict(os.environ, HDYOLO_PALLAS_MASKHEAD=maskhead,
                       BENCH_SUB="1")
            try:
                r = subprocess.run([sys.executable, os.path.abspath(__file__)],
                                   env=env, capture_output=True, text=True,
                                   timeout=2400)
                line = next((ln for ln in reversed(
                    r.stdout.strip().splitlines()) if ln.startswith("{")), None)
                if r.returncode == 0 and line and json.loads(line).get("value"):
                    return json.loads(line)
                print(f"bench sub (maskhead={maskhead}) failed "
                      f"(rc={r.returncode})", file=sys.stderr)
            except Exception as e:
                print(f"bench sub (maskhead={maskhead}) failed "
                      f"({type(e).__name__})", file=sys.stderr)
            return None

        results = [r for r in (run_sub("1"), run_sub("0")) if r]
        if results:
            print(json.dumps(max(results, key=lambda r: r["value"])))
            return
        print("both bench subprocesses failed; measuring in-process",
              file=sys.stderr)

    import jax
    import jax.numpy as jnp

    from hd_yolo_tpu.models import Model
    from hd_yolo_tpu.models.builder import parse_model_cfg

    # batch 16 is the throughput sweet spot on v5e (477 @ 8 → 502 @ 16 → 510
    # @ 32 tiles/s); WSI tile streams batch anyway, so the headline uses it
    batch = int(os.environ.get("BENCH_BATCH", 16))
    img = int(os.environ.get("BENCH_IMG", 640))
    compute_masks = os.environ.get("BENCH_MASKS", "1") != "0"
    dtype = jnp.bfloat16 if os.environ.get("BENCH_BF16", "1") != "0" else jnp.float32

    # Occupancy packing (BENCH_BUDGET=0 disables): the mask branch pools+heads
    # a global top-768 cross-batch ROI budget instead of all B×100 slots.
    # 768 = measured realistic occupancy + margin: the trained flagship on
    # 40-nuclei tiles carries ≤746 mask-eligible detections per batch-16
    # (46.6/img — OCCUPANCY.json), so nothing is dropped there; worst case
    # drops masks of the lowest-scored detections beyond the budget, like
    # max_det caps keeps.  Measured: 678.7 tiles/s @512, 622.9 @768,
    # 564.2 @1024, 505.0 legacy B×100.
    budget = int(os.environ.get("BENCH_BUDGET", 768)) or None
    spec = parse_model_cfg("yolov5l6-mask", "hyp-nuclei")
    model = Model(spec=spec, dtype=dtype, max_masks=100, pre_nms_topk=1024,
                  mask_budget=budget if compute_masks else None)

    x0 = jnp.zeros((batch, img, img, 3), jnp.float32)
    variables = jax.jit(lambda k: model.init(k, x0, train=False, compute_masks=compute_masks))(
        jax.random.PRNGKey(0)
    )
    jax.block_until_ready(variables)

    # 50 in-jit iterations amortize the tunnel's fixed ~29 ms dispatch+fetch
    # to <0.6 ms/batch; per-chip throughput is the steady-state figure.
    n_iter = int(os.environ.get("BENCH_ITERS", 50))

    @jax.jit
    def loop(v, x):
        def body(carry, _):
            out = model.apply(
                v, x + carry * 1e-6, train=False, compute_masks=compute_masks
            )[1]
            s = jax.tree.reduce(lambda a, b: a + jnp.sum(b.astype(jnp.float32)), out, 0.0)
            return s * 1e-9, None
        c, _ = jax.lax.scan(body, 0.0, None, length=n_iter)
        return c.reshape(1)

    rng = np.random.default_rng(0)
    xb = jnp.asarray(rng.uniform(0, 1, (batch, img, img, 3)).astype(np.float32))

    float(loop(variables, xb)[0])  # compile + warm
    t0 = time.time()
    float(loop(variables, xb)[0])  # one dispatch, n_iter forwards
    dt = (time.time() - t0) / n_iter
    tiles_per_sec = batch / dt

    # Baseline: prefer the MEASURED reference number — the ACTUAL
    # /root/reference/evaluation.py::run on CPU (tools/reference_baseline.py
    # writes BASELINE_MEASURED.json; reference's own time_per_image metric,
    # evaluation.py:97-104).  Fallback: the FLOPs-matched torch mirror.
    cpu_tps = float("nan")
    measured = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "BASELINE_MEASURED.json")
    if os.path.exists(measured):
        try:
            rows = json.load(open(measured))
            # prefer the rows measured on an idle host (the *_trained legs
            # run alongside TPU jobs; same FLOPs, noisier wall-clock)
            for key in ((["masked", "masked_trained", "det_only",
                          "det_only_trained"]) if compute_masks else
                        (["det_only", "det_only_trained", "masked",
                          "masked_trained"])):
                if key in rows:
                    cpu_tps = float(rows[key]["images_per_s"])
                    break
        except Exception as e:
            print(f"measured baseline unreadable: {e}", file=sys.stderr)
    if not np.isfinite(cpu_tps):
        try:
            from hd_yolo_tpu.utils.torch_baseline import measure_cpu_tiles_per_sec

            cpu_tps = measure_cpu_tiles_per_sec(
                spec, img_size=img, masks=compute_masks, max_masks=100
            )
        except Exception as e:  # torch missing / OOM — ratio unknown
            print(f"baseline measurement failed: {e}", file=sys.stderr)
            cpu_tps = float("nan")

    result = {
        "metric": "tiles_per_sec_per_chip_640px_mask_inference" if compute_masks
        else "tiles_per_sec_per_chip_640px_det_inference",
        "value": round(tiles_per_sec, 2),
        "unit": "tiles/s",
        "vs_baseline": round(tiles_per_sec / cpu_tps, 2) if np.isfinite(cpu_tps) else None,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
