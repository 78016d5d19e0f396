"""SRGAN aux (ref hnet/srgan_pytorch.py): generator/critic shapes, pixel
shuffle exactness, WGAN-GP finiteness and gradient flow."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hd_yolo_tpu.hnet.srgan import (
    SRDiscriminator,
    SRGenerator,
    gradient_penalty,
    pixel_shuffle,
)


@pytest.fixture()
def rng():
    return np.random.default_rng(0)


def test_pixel_shuffle_exact():
    """NHWC pixel shuffle must equal torch's NCHW PixelShuffle."""
    import torch

    x = np.arange(1 * 2 * 2 * 8, dtype=np.float32).reshape(1, 2, 2, 8)
    got = np.asarray(pixel_shuffle(jnp.asarray(x), 2))
    want = (
        torch.pixel_shuffle(torch.from_numpy(x.transpose(0, 3, 1, 2)), 2)
        .numpy().transpose(0, 2, 3, 1)
    )
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("scale", [2, 4])
def test_generator_shapes_and_range(rng, scale):
    g = SRGenerator(scale_factor=scale, channels=16, num_blocks=2)
    x = jnp.asarray(rng.uniform(0, 1, (2, 8, 8, 3)).astype(np.float32))
    vars_ = g.init(jax.random.PRNGKey(0), x)
    y = g.apply(vars_, x)
    assert y.shape == (2, 8 * scale, 8 * scale, 3)
    assert float(y.min()) >= 0.0 and float(y.max()) <= 1.0


def test_discriminator_and_wgan_gp(rng):
    real = jnp.asarray(rng.uniform(0, 1, (2, 32, 32, 3)).astype(np.float32))
    fake = jnp.asarray(rng.uniform(0, 1, (2, 32, 32, 3)).astype(np.float32))

    d = SRDiscriminator(wgan=False)
    dv = d.init(jax.random.PRNGKey(0), real)
    p = d.apply(dv, real)
    assert p.shape == (2,) and (np.asarray(p) >= 0).all() and (np.asarray(p) <= 1).all()

    w = SRDiscriminator(wgan=True)
    wv = w.init(jax.random.PRNGKey(0), real)
    s = w.apply(wv, real)
    assert s.shape == (2,)

    gp = gradient_penalty(lambda z: w.apply(wv, z), real, fake,
                          jax.random.PRNGKey(1))
    assert np.isfinite(float(gp)) and float(gp) >= 0.0

    # GP gradient reaches the critic parameters (trainable regularizer)
    gfun = jax.grad(lambda params: gradient_penalty(
        lambda z: w.apply({"params": params}, z), real, fake, jax.random.PRNGKey(1)))
    g = gfun(wv["params"])
    assert any(np.abs(np.asarray(l)).sum() > 0 for l in jax.tree.leaves(g))


def test_adversarial_step_decreases_critic_loss(rng):
    """One WGAN critic step on tiny models reduces the critic objective."""
    import optax

    g = SRGenerator(scale_factor=2, channels=8, num_blocks=1)
    d = SRDiscriminator(wgan=True)
    lr_img = jnp.asarray(rng.uniform(0, 1, (2, 8, 8, 3)).astype(np.float32))
    hr_img = jnp.asarray(rng.uniform(0, 1, (2, 16, 16, 3)).astype(np.float32))
    gv = g.init(jax.random.PRNGKey(0), lr_img)
    dv = d.init(jax.random.PRNGKey(1), hr_img)
    fake = jax.lax.stop_gradient(g.apply(gv, lr_img))

    def critic_loss(params):
        f = d.apply({"params": params}, fake)
        r = d.apply({"params": params}, hr_img)
        gp = gradient_penalty(lambda z: d.apply({"params": params}, z),
                              hr_img, fake, jax.random.PRNGKey(2))
        return jnp.mean(f) - jnp.mean(r) + 10.0 * gp

    tx = optax.adam(1e-3)
    params = dv["params"]
    opt = tx.init(params)
    l0 = float(critic_loss(params))
    for _ in range(5):
        grads = jax.grad(critic_loss)(params)
        upd, opt = tx.update(grads, opt)
        params = optax.apply_updates(params, upd)
    assert float(critic_loss(params)) < l0
