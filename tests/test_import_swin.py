"""Swin weight importer: shape wiring vs the flax tree + numeric parity of
window attention against a hand-written torch equivalent."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from hd_yolo_tpu.hnet.swin import SwinTransformer, WindowAttention, relative_position_index
from hd_yolo_tpu.utils.import_swin import import_swin_state_dict


def synthetic_torch_swin_sd(embed_dim=32, depths=(1, 1), num_heads=(2, 4), mlp_ratio=4.0,
                            window=4, rng=None):
    """Random state_dict in the upstream key layout with correct shapes."""
    rng = rng or np.random.default_rng(0)
    sd = {}
    t = lambda *s: torch.from_numpy(rng.standard_normal(s).astype(np.float32) * 0.05)
    sd["patch_embed.proj.weight"] = t(embed_dim, 3, 4, 4)
    sd["patch_embed.proj.bias"] = t(embed_dim)
    sd["patch_embed.norm.weight"] = t(embed_dim)
    sd["patch_embed.norm.bias"] = t(embed_dim)
    dim = embed_dim
    for i, d in enumerate(depths):
        for j in range(d):
            b = f"layers.{i}.blocks.{j}"
            for n in ("norm1", "norm2"):
                sd[f"{b}.{n}.weight"] = t(dim)
                sd[f"{b}.{n}.bias"] = t(dim)
            sd[f"{b}.attn.qkv.weight"] = t(3 * dim, dim)
            sd[f"{b}.attn.qkv.bias"] = t(3 * dim)
            sd[f"{b}.attn.proj.weight"] = t(dim, dim)
            sd[f"{b}.attn.proj.bias"] = t(dim)
            sd[f"{b}.attn.relative_position_bias_table"] = t((2 * window - 1) ** 2, num_heads[i])
            hid = int(dim * mlp_ratio)
            sd[f"{b}.mlp.fc1.weight"] = t(hid, dim)
            sd[f"{b}.mlp.fc1.bias"] = t(hid)
            sd[f"{b}.mlp.fc2.weight"] = t(dim, hid)
            sd[f"{b}.mlp.fc2.bias"] = t(dim)
        if i < len(depths) - 1:
            sd[f"layers.{i}.downsample.reduction.weight"] = t(2 * dim, 4 * dim)
            sd[f"layers.{i}.downsample.norm.weight"] = t(4 * dim)
            sd[f"layers.{i}.downsample.norm.bias"] = t(4 * dim)
            dim *= 2
    # out norms (mmdet style) for both stages
    dims = [embed_dim, embed_dim * 2]
    for k, dd in enumerate(dims):
        sd[f"norm{k}.weight"] = t(dd)
        sd[f"norm{k}.bias"] = t(dd)
    return sd


def test_swin_import_shapes_and_forward(rng):
    m = SwinTransformer(embed_dim=32, depths=(1, 1), num_heads=(2, 4), window_size=4,
                        out_indices=(0, 1))
    x = jnp.asarray(rng.uniform(0, 1, (1, 32, 32, 3)).astype(np.float32))
    ref = m.init(jax.random.PRNGKey(0), x)["params"]
    sd = synthetic_torch_swin_sd()
    imported = import_swin_state_dict(sd, depths=(1, 1))
    # identical tree structure + leaf shapes
    ref_flat = jax.tree_util.tree_flatten_with_path(ref)[0]
    imp_flat = jax.tree_util.tree_flatten_with_path(imported)[0]
    ref_map = {jax.tree_util.keystr(k): v.shape for k, v in ref_flat}
    imp_map = {jax.tree_util.keystr(k): np.asarray(v).shape for k, v in imp_flat}
    assert ref_map == imp_map
    outs = m.apply({"params": imported}, x)
    assert outs[0].shape == (1, 8, 8, 32)
    assert all(np.isfinite(np.asarray(o)).all() for o in outs)


def test_window_attention_numeric_parity(rng):
    """flax WindowAttention with imported weights == a direct torch
    computation of relative-position-biased MSA."""
    C, heads, ws = 16, 2, 4
    N = ws * ws
    wa = WindowAttention(C, ws, heads)
    x_np = rng.standard_normal((3, N, C)).astype(np.float32)
    qkv_w = rng.standard_normal((3 * C, C)).astype(np.float32) * 0.1
    qkv_b = rng.standard_normal(3 * C).astype(np.float32) * 0.1
    proj_w = rng.standard_normal((C, C)).astype(np.float32) * 0.1
    proj_b = rng.standard_normal(C).astype(np.float32) * 0.1
    table = rng.standard_normal(((2 * ws - 1) ** 2, heads)).astype(np.float32) * 0.1

    params = {
        "qkv": {"kernel": qkv_w.T, "bias": qkv_b},
        "proj": {"kernel": proj_w.T, "bias": proj_b},
        "relative_position_bias_table": table,
    }
    got = np.asarray(wa.apply({"params": params}, jnp.asarray(x_np)))

    # torch reference (upstream WindowAttention math)
    x = torch.from_numpy(x_np)
    qkv = torch.nn.functional.linear(x, torch.from_numpy(qkv_w), torch.from_numpy(qkv_b))
    B_, _, _ = x.shape
    hd = C // heads
    q, k, v = qkv.reshape(B_, N, 3, heads, hd).permute(2, 0, 3, 1, 4)
    attn = (q * hd**-0.5) @ k.transpose(-2, -1)
    idx = torch.from_numpy(relative_position_index(ws).reshape(-1).astype(np.int64))
    bias = torch.from_numpy(table)[idx].reshape(N, N, heads).permute(2, 0, 1)
    attn = torch.softmax(attn + bias.unsqueeze(0), dim=-1)
    out = (attn @ v).transpose(1, 2).reshape(B_, N, C)
    want = torch.nn.functional.linear(out, torch.from_numpy(proj_w), torch.from_numpy(proj_b))
    np.testing.assert_allclose(got, want.numpy(), rtol=1e-4, atol=1e-5)
