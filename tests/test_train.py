"""Training engine: optimizer groups/schedules, EMA, pjit train step on an
8-device CPU mesh, loss decrease over steps."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hd_yolo_tpu.engines.optim import (
    build_optimizer,
    ema_init,
    ema_update,
    label_params,
    make_lr_schedules,
)
from hd_yolo_tpu.engines.train_step import TrainState, make_train_step, make_eval_step
from hd_yolo_tpu.models import Model
from hd_yolo_tpu.parallel import create_mesh, replicate, shard_batch

from test_model import make_targets


def test_param_group_labels():
    params = {
        "conv": {"kernel": jnp.zeros((3, 3, 4, 4)), "bias": jnp.zeros(4)},
        "bn": {"scale": jnp.zeros(4), "bias": jnp.zeros(4)},
    }
    labels = label_params(params)
    assert labels["conv"]["kernel"] == "kernel"
    assert labels["conv"]["bias"] == "bias"
    assert labels["bn"]["scale"] == "bn_scale"
    assert labels["bn"]["bias"] == "bias"


def test_lr_schedules_warmup_shapes():
    hyp = {"lr0": 0.01, "lrf": 0.1, "warmup_epochs": 1.0, "warmup_bias_lr": 0.1}
    lr_main, lr_bias, mom = make_lr_schedules(hyp, epochs=10, steps_per_epoch=200)
    # warmup spans max(1*200, 100) = 200 steps
    assert float(lr_main(0)) == 0.0
    assert float(lr_bias(0)) == pytest.approx(0.1)
    assert float(mom(0)) == pytest.approx(0.8)
    assert float(lr_main(200)) == pytest.approx(0.01 * (1 - 1 / 9 * 0.9), rel=1e-3)
    assert float(mom(300)) == pytest.approx(0.937)
    # final epoch lr ≈ lr0 * lrf
    assert float(lr_main(10 * 200 - 1)) == pytest.approx(0.001, rel=1e-2)


def test_ema_ramp():
    p = {"w": jnp.ones(3)}
    s = ema_init(p)
    s2 = ema_update(s, {"w": jnp.zeros(3)}, decay=0.9999, tau=2000.0)
    d = 0.9999 * (1 - np.exp(-1 / 2000))
    np.testing.assert_allclose(np.asarray(s2.params["w"]), d, rtol=1e-3)  # f32 1-exp(-x) cancellation
    assert int(s2.updates) == 1


@pytest.mark.slow
def test_train_step_loss_decreases_on_mesh():
    """3 optimizer steps on one fixed batch over an 8-device mesh: loss drops,
    EMA tracks, batch_stats update."""
    model = Model.from_cfg(
        "yolov5s-test", "hyp-nuclei", mask_rois=4, max_masks=8, pre_nms_topk=64
    )
    rng = np.random.default_rng(0)
    B, H = 8, 128
    batch = {
        "image": jnp.asarray(rng.uniform(0, 1, (B, H, H, 3)).astype(np.float32)),
        "targets": jax.tree.map(
            lambda x: jnp.asarray(np.tile(np.asarray(x), (4,) + (1,) * (np.asarray(x).ndim - 1))),
            make_targets(rng, 2, 8, 4),
        ),
    }
    variables = model.init(
        jax.random.PRNGKey(0), batch["image"], batch["targets"], train=True, compute_masks=True
    )
    tx = build_optimizer(
        variables["params"], {"lr0": 0.05, "warmup_epochs": 0.0}, epochs=3, steps_per_epoch=3
    )
    state = TrainState.create(variables, tx)
    mesh = create_mesh()
    assert mesh.devices.size == 8
    step = make_train_step(model, tx)
    with mesh:
        state = replicate(state, mesh)
        sb = shard_batch(batch, mesh)
        losses = []
        for _ in range(4):
            state, metrics = step(state, sb)
            losses.append(float(metrics["loss"]))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0], losses
    assert int(state.step) == 4
    assert int(state.ema.updates) == 4
    # EMA params differ from live params but are close
    diff = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()), state.params, state.ema.params)
    assert max(jax.tree.leaves(diff)) > 0

    # eval step runs with EMA params
    ev = make_eval_step(model)
    _, out = ev(state, batch["image"])
    assert out["det"]["boxes"].shape[0] == B


def test_freeze_groups():
    """--freeze substrings map params to the zero-update 'frozen' group."""
    import optax

    params = {
        "blocks_0": {"conv": {"kernel": jnp.ones((1, 1, 3, 4))}},
        "header_det": {"det0": {"kernel": jnp.ones((1, 1, 4, 8)), "bias": jnp.zeros(8)}},
    }
    labels = label_params(params, freeze=["blocks_"])
    assert labels["blocks_0"]["conv"]["kernel"] == "frozen"
    assert labels["header_det"]["det0"]["kernel"] == "kernel"

    tx = build_optimizer(params, {"lr0": 0.1, "warmup_epochs": 0.0}, 1, 1,
                         freeze=["blocks_"])
    state = tx.init(params)
    grads = jax.tree.map(jnp.ones_like, params)
    # step 0 lr is 0 under warmup (nw >= 100 steps) — check the second step
    updates, state = tx.update(grads, state, params)
    updates, _ = tx.update(grads, state, params)
    assert float(jnp.abs(updates["blocks_0"]["conv"]["kernel"]).sum()) == 0.0
    assert float(jnp.abs(updates["header_det"]["det0"]["kernel"]).sum()) > 0.0


def test_batchnorm_stats_are_global_under_sharded_jit():
    """SyncBatchNorm parity (ref train.py:281-283): with the batch axis
    sharded over 8 devices, BN must accumulate GLOBAL batch statistics (XLA
    inserts the collectives) — not per-shard stats like plain DDP BN."""
    import jax.lax as lax
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from hd_yolo_tpu.models.layers import ConvBnAct

    mesh = Mesh(np.array(jax.devices()).reshape(8, 1), ("data", "model"))
    m = ConvBnAct(8, 3)
    rng = np.random.default_rng(0)
    # give every device's shard wildly different statistics
    x = np.concatenate(
        [rng.normal(3.0 * d, 1.0 + d, (2, 8, 8, 4)) for d in range(8)]
    ).astype(np.float32)
    xj = jax.device_put(jnp.asarray(x), NamedSharding(mesh, P("data")))
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 4)), train=True)

    @jax.jit
    def step(v, x):
        _, mut = m.apply(v, x, train=True, mutable=["batch_stats"])
        return mut["batch_stats"]

    with mesh:
        stats = step(v, xj)
    got_mean = np.asarray(stats["bn"]["mean"])
    conv_w = v["params"]["conv"]["kernel"]
    xc = lax.conv_general_dilated(
        jnp.asarray(x), conv_w, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    want = np.asarray(jnp.mean(xc, axis=(0, 1, 2))) * (1 - 0.97)  # fresh EMA step
    np.testing.assert_allclose(got_mean, want, rtol=1e-4, atol=1e-5)


def test_tensor_parallel_placement_matches_dp():
    """shard_params_tp: large kernels shard out-channels over 'model'; one
    train step on a (4,2) dp*tp mesh matches the pure-DP (8,1) step exactly
    (GSPMD placement must not change numerics)."""
    from hd_yolo_tpu.parallel import create_mesh, replicate, shard_batch, shard_params_tp

    model = Model.from_cfg(
        "yolov5s-test", "hyp-nuclei", mask_rois=4, max_masks=8, pre_nms_topk=64
    )
    rng = np.random.default_rng(0)
    B, H = 8, 128
    batch = {
        "image": jnp.asarray(rng.uniform(0, 1, (B, H, H, 3)).astype(np.float32)),
        "targets": jax.tree.map(
            lambda x: jnp.asarray(np.tile(np.asarray(x), (4,) + (1,) * (np.asarray(x).ndim - 1))),
            make_targets(rng, 2, 8, 4),
        ),
    }
    variables = model.init(jax.random.PRNGKey(0), batch["image"], batch["targets"],
                           train=True, compute_masks=True)
    tx = build_optimizer(variables["params"], {"lr0": 0.05, "warmup_epochs": 0.0},
                         epochs=3, steps_per_epoch=3)

    losses = {}
    for name, shape in (("dp", (8, 1)), ("dp_tp", (4, 2))):
        # fresh buffers per mesh config: the donating train step consumes the
        # replicated state, which on CPU can alias the original `variables`
        state = TrainState.create(
            jax.tree.map(lambda x: jnp.array(x, copy=True), variables), tx)
        mesh = create_mesh(shape=shape)
        step = make_train_step(model, tx)
        with mesh:
            state = replicate(state, mesh)
            if shape[1] > 1:
                state = state.replace(
                    params=shard_params_tp(state.params, mesh, min_size=1 << 12))
                # at least one kernel must actually be sharded over 'model'
                from jax.sharding import PartitionSpec as P
                specs = [x.sharding.spec for x in jax.tree.leaves(state.params)
                         if hasattr(x, "sharding")]
                assert any(s != P() for s in specs), "no TP-sharded kernels"
            sb = shard_batch(batch, mesh)
            _, metrics = step(state, sb)
            losses[name] = float(metrics["loss"])
    np.testing.assert_allclose(losses["dp"], losses["dp_tp"], rtol=2e-5)


def test_nonfinite_gradient_step_is_skipped():
    """optax.apply_if_finite wrapping (the GradScaler skip-on-inf analog):
    a NaN-gradient step leaves params AND momentum untouched; the next finite
    step applies normally."""
    import optax

    params = {"w": jnp.ones((4, 4))}
    tx = build_optimizer(params, {"lr0": 0.1, "warmup_epochs": 0.0},
                         epochs=1, steps_per_epoch=10)
    opt = tx.init(params)

    bad = {"w": jnp.full((4, 4), jnp.nan)}
    upd, opt = tx.update(bad, opt, params)
    p1 = optax.apply_updates(params, upd)
    np.testing.assert_array_equal(np.asarray(p1["w"]), np.asarray(params["w"]))
    assert int(opt.notfinite_count) == 1

    good = {"w": jnp.ones((4, 4))}
    upd, opt = tx.update(good, opt, params)  # inner step 0: lr ramp starts at 0
    assert int(opt.notfinite_count) == 0     # reset on a finite step
    p2 = optax.apply_updates(params, upd)
    upd, opt = tx.update(good, opt, p2)      # inner step 1: lr > 0 applies
    p3 = optax.apply_updates(p2, upd)
    assert np.abs(np.asarray(p3["w"]) - np.asarray(params["w"])).max() > 0


def test_nonfinite_batch_does_not_poison_training():
    """End-to-end: one poisoned batch (NaN pixels) mid-training is skipped and
    the model keeps converging."""
    model = Model.from_cfg(
        "yolov5s-test", "hyp-nuclei", mask_rois=4, max_masks=8, pre_nms_topk=64
    )
    rng = np.random.default_rng(0)
    B, H = 2, 128
    batch = {
        "image": jnp.asarray(rng.uniform(0, 1, (B, H, H, 3)).astype(np.float32)),
        "targets": jax.tree.map(jnp.asarray, make_targets(rng, B, 8, 4)),
    }
    variables = model.init(jax.random.PRNGKey(0), batch["image"], batch["targets"],
                           train=True, compute_masks=True)
    tx = build_optimizer(variables["params"], {"lr0": 0.05, "warmup_epochs": 0.0},
                         epochs=3, steps_per_epoch=3)
    state = TrainState.create(variables, tx)
    step = make_train_step(model, tx)

    state, m0 = step(state, batch)
    params_before = jax.tree.map(np.asarray, state.params)
    poisoned = dict(batch)
    poisoned["image"] = batch["image"].at[0, 0, 0, 0].set(jnp.nan)
    state, m_bad = step(state, poisoned)
    assert not np.isfinite(float(m_bad["loss"]))
    # params unchanged by the poisoned step
    same = jax.tree.map(lambda a, b: np.array_equal(a, np.asarray(b)),
                        params_before, state.params)
    assert all(jax.tree.leaves(same))
    # training continues and loss is finite again
    state, m1 = step(state, batch)
    assert np.isfinite(float(m1["loss"]))


def test_train_step_threads_dropout_rng():
    """ADVICE r2 (high): models with stochastic depth/dropout (swin
    drop_path_rate>0) must train through make_train_step — the step threads
    rngs={'dropout': fold_in(seed, step)} into model.apply."""
    from hd_yolo_tpu.hnet import HNet

    cfg = {
        "backbone": {"type": "swin", "embed_dim": 16, "depths": [1, 1],
                     "num_heads": [1, 2], "window_size": 4,
                     "drop_path_rate": 0.5, "drop_rate": 0.1,
                     "attn_drop_rate": 0.1},
        "fpn": {"out_channels": 32},
        "headers": {
            "seg": {"type": "panoptic", "num_classes": 3, "channels": 32},
        },
    }
    model = HNet.from_cfg(cfg)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 1, (2, 32, 32, 3)).astype(np.float32))
    targets = {"seg": {"seg_map": jnp.asarray(rng.integers(0, 3, (2, 8, 8)))}}
    k0 = jax.random.PRNGKey(0)
    variables = model.init({"params": k0, "dropout": jax.random.fold_in(k0, 1)},
                           x, targets, train=True)
    tx = build_optimizer(variables["params"], {"lr0": 0.01, "warmup_epochs": 0.0},
                         epochs=1, steps_per_epoch=2)
    state = TrainState.create(variables, tx)
    step = make_train_step(model, tx, mask_weight=0.0, seed=7)
    batch = {"image": x, "targets": targets}
    state, metrics = step(state, batch)   # raised InvalidRngError before fix
    assert np.isfinite(float(metrics["loss"]))
    state2, metrics2 = step(state, batch)
    assert int(state2.step) == 2


def test_early_stopping_respects_val_interval():
    """ADVICE r2 (medium): epochs where validation is skipped must not feed
    the stopper — mirrored here: the driver now gates stopper() on do_val."""
    from hd_yolo_tpu.engines.train import EarlyStopping

    stopper = EarlyStopping(patience=3)
    # validations at epochs 0, 10, 20, 30 (val_interval=10); fitness improves
    # each time — must never stop even though raw epoch gaps (10) > patience
    val_epochs = [0, 10, 20, 30]
    for i, e in enumerate(val_epochs):
        assert not stopper(e, 0.1 * (i + 1)), e
    # ...but stalls measured over VALIDATED epochs do stop eventually
    assert not stopper(31, 0.0)
    assert not stopper(32, 0.0)
    assert stopper(33, 0.0)


def test_resident_data_step_matches_streaming():
    """--cache-device path: make_train_step(resident_data=True) gathering
    rows on device must produce the SAME step as the streaming path fed the
    gathered batch (identical state/seed ⇒ identical metrics)."""
    model = Model.from_cfg(
        "yolov5s-test", "hyp-nuclei", mask_rois=4, max_masks=8, pre_nms_topk=64
    )
    rng = np.random.default_rng(1)
    N, B, H = 16, 8, 128
    data = {
        "image": jnp.asarray(rng.uniform(0, 1, (N, H, H, 3)).astype(np.float32)),
        "targets": jax.tree.map(
            lambda x: jnp.asarray(np.tile(np.asarray(x), (8,) + (1,) * (np.asarray(x).ndim - 1))),
            make_targets(rng, 2, 8, 4),
        ),
    }
    variables = model.init(
        jax.random.PRNGKey(0), data["image"][:B], jax.tree.map(lambda a: a[:B], data["targets"]),
        train=True, compute_masks=True,
    )
    tx = build_optimizer(
        variables["params"], {"lr0": 0.05, "warmup_epochs": 0.0}, epochs=2, steps_per_epoch=2
    )
    mesh = create_mesh()
    idx = np.asarray([3, 7, 1, 12, 9, 0, 15, 4], np.int32)

    step_res = make_train_step(model, tx, resident_data=True)
    step_str = make_train_step(model, tx)
    with mesh:
        from hd_yolo_tpu.parallel.mesh import batch_sharding

        data_dev = jax.device_put(
            data, jax.tree.map(lambda _: batch_sharding(mesh), data)
        )
        # distinct buffers per state: step donation invalidates its inputs
        v1 = jax.tree.map(jnp.array, variables)
        v2 = jax.tree.map(jnp.array, variables)
        st1 = replicate(TrainState.create(v1, tx), mesh)
        st1, m1 = step_res(st1, data_dev, shard_batch(idx, mesh))

        batch = jax.tree.map(lambda a: np.asarray(a)[idx], data)
        st2 = replicate(TrainState.create(v2, tx), mesh)
        st2, m2 = step_str(st2, shard_batch(batch, mesh))

    for k in m1:
        np.testing.assert_allclose(float(m1[k]), float(m2[k]), rtol=1e-5,
                                   err_msg=k)
    d = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()), st1.params, st2.params)
    assert max(jax.tree.leaves(d)) < 1e-6


def test_optimizer_choices_update_params():
    """--optimizer adam/adamw produce finite, nonzero, distinct updates
    (reference train.py:612 choice surface)."""
    params = {
        "blocks_0": {"conv": {"kernel": jnp.ones((1, 1, 3, 4))}},
        "header_det": {"det0": {"kernel": jnp.ones((1, 1, 4, 8)),
                                "bias": jnp.zeros(8)}},
    }
    grads = jax.tree.map(lambda p: jnp.full_like(p, 0.5), params)
    outs = {}
    for name in ("sgd", "adam", "adamw"):
        tx = build_optimizer(params, {"lr0": 0.01, "warmup_epochs": 0.0,
                                      "weight_decay": 0.05}, 1, 1,
                             optimizer=name)
        state = tx.init(params)
        updates, state = tx.update(grads, state, params)
        updates, _ = tx.update(grads, state, params)
        k = updates["header_det"]["det0"]["kernel"]
        assert jnp.all(jnp.isfinite(k)), name
        assert float(jnp.abs(k).sum()) > 0.0, name
        outs[name] = np.asarray(updates["blocks_0"]["conv"]["kernel"])
    assert not np.allclose(outs["sgd"], outs["adam"])
    # adamw decay is decoupled; adam's is L2-into-grad -> different updates
    assert not np.allclose(outs["adam"], outs["adamw"])
