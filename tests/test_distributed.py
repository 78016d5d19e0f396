"""Multi-host readiness: 2-process jax.distributed smoke test + helpers.

The reference's DDP world (torchrun WORLD_SIZE procs, NCCL allreduce, rank-0
gating — /root/reference/train.py:249,296,330-331,683) maps to one
``jax.distributed.initialize`` per process and a global mesh.  The smoke test
spawns two coordinated CPU processes over localhost, each contributing half
the global batch, and runs ONE full train step of the small model.
"""

import os
import socket
import subprocess
import sys
import textwrap

import numpy as np
import pytest


def test_dataloader_process_sharding():
    """Disjoint + exhaustive per-rank index slices (DistributedSampler analog)."""
    from hd_yolo_tpu.data.dataset import DataLoader

    class Fake:
        def __len__(self):
            return 10

        def __getitem__(self, i):
            return i

    d0 = DataLoader(Fake(), batch_size=1, shuffle=True, seed=7, shard=(0, 2))
    d1 = DataLoader(Fake(), batch_size=1, shuffle=True, seed=7, shard=(1, 2))
    i0, i1 = d0._epoch_indices(3), d1._epoch_indices(3)
    assert set(i0).isdisjoint(i1)
    assert sorted(i0 + i1) == list(range(10))
    assert len(d0) == 5


_WORKER = textwrap.dedent("""
    import os, sys
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    import jax
    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, "__REPO__")
    import numpy as np
    import jax.numpy as jnp
    from hd_yolo_tpu.parallel import (create_mesh, maybe_initialize_distributed,
                                      replicate, shard_batch, is_main_process)
    pid, n = maybe_initialize_distributed()
    assert n == 2, n
    assert is_main_process() == (pid == 0)
    assert len(jax.devices()) == 4  # 2 local x 2 processes

    from hd_yolo_tpu.engines.optim import build_optimizer
    from hd_yolo_tpu.engines.train_step import TrainState, make_train_step
    from hd_yolo_tpu.models import Model

    # Establish the Gloo collective context while the processes are still in
    # lockstep: its KV rendezvous has a hardcoded 30 s deadline, and on a
    # loaded single-core host the big model compile below can skew the two
    # processes past it (observed DEADLINE_EXCEEDED under full-suite load).
    from jax.experimental import multihost_utils
    multihost_utils.sync_global_devices("pre-compile")

    model = Model.from_cfg("yolov5s-test", "hyp-nuclei", mask_rois=4,
                           max_masks=8, pre_nms_topk=64)
    mesh = create_mesh(shape=(4, 1))
    rng = np.random.default_rng(pid)  # different local data per process
    B_local, T, H = 2, 8, 128
    xy = rng.uniform(0.1, 0.6, (B_local, T, 2)).astype(np.float32)
    wh = rng.uniform(0.05, 0.3, (B_local, T, 2)).astype(np.float32)
    local = {
        "image": rng.uniform(0, 1, (B_local, H, H, 3)).astype(np.float32),
        "targets": {"det": {
            "boxes": np.concatenate([xy, np.minimum(xy + wh, 1.0)], -1),
            "labels": rng.integers(1, 5, (B_local, T)),
            "masks": (rng.uniform(0, 1, (B_local, T, 28, 28)) > 0.5).astype(np.float32),
            "valid": np.ones((B_local, T), bool),
        }},
    }
    with mesh:
        batch = shard_batch(local, mesh)  # global (4, ...) from 2x local (2, ...)
        assert batch["image"].shape[0] == 4
        variables = jax.jit(
            lambda k, x, t: model.init(k, x, t, train=True, compute_masks=True)
        )(jax.random.PRNGKey(0), batch["image"], batch["targets"])
        tx = build_optimizer(variables["params"], {"lr0": 0.01}, 2, 2)
        state = replicate(TrainState.create(variables, tx), mesh)
        step = make_train_step(model, tx)
        state, metrics = step(state, batch)
        loss = float(metrics["loss"])
    assert np.isfinite(loss), loss
    print(f"proc {pid}: loss={loss:.4f}", flush=True)

    # rank-0-gated checkpoint + all-process restore (train.py:529-547 save
    # gating; resume must hand every process identical params)
    from hd_yolo_tpu.engines.checkpoint import restore_train_state, save_checkpoint
    ckpt_dir = os.environ["HDYOLO_SMOKE_CKPT"]
    # orbax saves are collective — every process calls save; the meta sidecar
    # and tensorstore writes are rank-gated inside the checkpointer
    save_checkpoint(ckpt_dir, state, epoch=1, best_fitness=loss)
    multihost_utils.sync_global_devices("ckpt-written")
    # the post-step state provides the restore structure template (donation
    # may have deleted the pre-step buffers that `variables` aliased)
    restored, meta = restore_train_state(ckpt_dir, state)
    assert int(meta["epoch"]) == 1
    same = jax.tree.reduce(
        lambda a, b: a and b,
        jax.tree.map(lambda a, b: bool(jnp.allclose(a, b, atol=1e-7)),
                     restored.params, state.params), True)
    assert same, "restored params differ from saved state"
    csum = float(jax.tree.reduce(
        lambda a, b: a + b,
        jax.tree.map(lambda a: jnp.sum(jnp.abs(a.astype(jnp.float32))),
                     restored.params)))
    print(f"proc {pid}: ckpt_csum={csum:.6f}", flush=True)
""")


@pytest.mark.slow
def test_two_process_train_step(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    script = tmp_path / "worker.py"
    script.write_text(_WORKER.replace("__REPO__", repo))

    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.update({
            "JAX_COORDINATOR_ADDRESS": f"localhost:{port}",
            "JAX_NUM_PROCESSES": "2",
            "JAX_PROCESS_ID": str(pid),
            "HDYOLO_SMOKE_CKPT": str(tmp_path / "ckpt"),
        })
        env.pop("JAX_PLATFORMS", None)
        procs.append(subprocess.Popen(
            [sys.executable, "-u", str(script)], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        ))
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=900)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out[-4000:]}"
        assert f"proc {pid}: loss=" in out
    # the loss is a global-batch quantity → identical on both processes
    l0 = outs[0].split("loss=")[1].split()[0]
    l1 = outs[1].split("loss=")[1].split()[0]
    assert l0 == l1, (l0, l1)
    # both processes restored the rank-0 checkpoint to identical params
    c0 = outs[0].split("ckpt_csum=")[1].split()[0]
    c1 = outs[1].split("ckpt_csum=")[1].split()[0]
    assert c0 == c1, (c0, c1)
