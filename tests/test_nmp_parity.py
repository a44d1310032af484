"""Parity tests: NMP attention modules vs inline-torch goldens of the
reference math (``nmrf/models/NMP.py``), with shared weights."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn.functional as F

from nmrf_tpu.models import nmp as nmp_mod
from nmrf_tpu.models.nmp import (
    NEG_INF,
    BasicAttention,
    CSWinAttention,
    WindowAttention,
    shift_window_attn_mask,
    window_attn_mask,
)

RNG = np.random.RandomState(0)


class TestMasks:
    def test_window_mask_matches_reference(self):
        """gen_window_attn_mask (NMP.py:195-208) in torch."""
        wh, ww, n = 2, 3, 4
        idx = torch.arange(0, wh * ww, dtype=torch.float32).view(-1, 1)
        idx = idx.expand(wh * ww, n).flatten()
        m = idx.unsqueeze(-1) - idx.unsqueeze(0)
        m = m.masked_fill(m == 0, float("-inf")).masked_fill(m != 0, 0.0)
        m.fill_diagonal_(0.0)
        want = m.numpy()

        got = window_attn_mask((wh, ww, n))
        # -inf vs NEG_INF: compare blocked/open pattern
        np.testing.assert_array_equal(got < -1e8, np.isinf(want))

    def test_shift_window_mask_matches_reference(self):
        """gen_shift_window_attn_mask (NMP.py:210-239) in torch."""
        H, W, ws, shift, n = 12, 12, 6, 3, 2
        img_mask = torch.zeros((1, H, W, 1))
        h_slices = (slice(0, -ws), slice(-ws, -shift), slice(-shift, None))
        w_slices = (slice(0, -ws), slice(-ws, -shift), slice(-shift, None))
        cnt = 0
        for hs in h_slices:
            for wsl in w_slices:
                img_mask[:, hs, wsl, :] = cnt
                cnt += 1
        mw = img_mask.view(1, H // ws, ws, W // ws, ws, 1)
        mw = mw.permute(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws)
        am = mw.unsqueeze(1) - mw.unsqueeze(2)
        am = am.masked_fill(am != 0, float("-inf")).masked_fill(am == 0, 0.0)
        am = am.repeat_interleave(n, dim=1).repeat_interleave(n, dim=2)
        # + window mask
        idx = torch.arange(0, ws * ws, dtype=torch.float32).view(-1, 1)
        idx = idx.expand(ws * ws, n).flatten()
        wm = idx.unsqueeze(-1) - idx.unsqueeze(0)
        wm = wm.masked_fill(wm == 0, float("-inf")).masked_fill(wm != 0, 0.0)
        wm.fill_diagonal_(0.0)
        want = (am + wm.unsqueeze(0)).numpy()

        got = shift_window_attn_mask((H, W), (ws, ws, n), shift)
        np.testing.assert_array_equal(got < -1e8, np.isinf(want) | (want < -1e8))


def torch_window_attention(qkv, table, rel_index, num_heads, ws, shift, n, mask):
    """Reference WindowAttention.forward (NMP.py:241-289) in torch."""
    bs, ht, wd = qkv.shape[:3]
    dim = qkv.shape[-1] // 3
    if shift > 0:
        qkv = torch.roll(qkv, shifts=(-shift, -shift), dims=(1, 2))
    query, key, value = qkv.chunk(3, dim=-1)

    def win_part(x):
        x = x.reshape(bs, ht // ws, ws, wd // ws, ws, n, num_heads, dim // num_heads)
        return x.permute(0, 1, 3, 6, 2, 4, 5, 7).reshape(
            -1, num_heads, ws * ws * n, dim // num_heads)

    q, k, v = win_part(query), win_part(key), win_part(value)
    rpe = table[rel_index.view(-1)].view(ws * ws, ws * ws, num_heads, -1)
    rpe = rpe.repeat_interleave(n, dim=0).repeat_interleave(n, dim=1)
    q_embed, k_embed, v_embed = rpe.chunk(3, dim=-1)
    scale = (dim // num_heads) ** -0.5
    q = q * scale
    q_embed = q_embed * scale
    qk = q @ k.transpose(-2, -1)
    qr = torch.einsum("bhic,ijhc->bhij", q, k_embed)
    kr = torch.einsum("bhjc,ijhc->bhij", k, q_embed)
    attn = qk + qr + kr
    if mask is not None:
        attn = attn.reshape(bs, -1, num_heads, *attn.shape[-2:])
        attn = attn + mask[None, :, None]
        attn = attn.reshape(-1, num_heads, *attn.shape[-2:])
    attn = F.softmax(attn, dim=-1)
    x = attn @ v + torch.einsum("bhij,ijhc->bhic", attn, v_embed)
    x = x.reshape(bs, ht // ws, wd // ws, num_heads, ws, ws, n, dim // num_heads)
    x = x.permute(0, 1, 4, 2, 5, 6, 3, 7).reshape(bs, ht, wd, n, dim)
    if shift > 0:
        x = torch.roll(x, shifts=(shift, shift), dims=(1, 2))
    return x


class TestWindowAttention:
    @pytest.mark.parametrize("shift", [0, 3])
    def test_matches_torch_reference(self, shift):
        B, H, W, N, dim, heads, ws = 1, 12, 12, 2, 8, 2, 6
        qkv_np = RNG.randn(B, H, W, N, 3 * dim).astype(np.float32)
        table_np = RNG.randn((2 * ws - 1) ** 2, 3 * dim).astype(np.float32) * 0.1

        module = WindowAttention(dim, (ws, ws), shift, heads)
        if shift > 0:
            mask_np = shift_window_attn_mask((H, W), (ws, ws, N), shift)
        else:
            nW = (H // ws) * (W // ws)
            mask_np = np.broadcast_to(
                window_attn_mask((ws, ws, N))[None],
                (nW, ws * ws * N, ws * ws * N)).copy()

        out = module.apply(
            {"params": {"relative_position_enc_table": jnp.asarray(table_np)}},
            jnp.asarray(qkv_np), jnp.asarray(mask_np))

        rel_index = torch.from_numpy(
            np.asarray(nmp_mod._relative_position_index(ws, ws), np.int64))
        tmask = torch.from_numpy(np.asarray(mask_np))
        want = torch_window_attention(
            torch.from_numpy(qkv_np), torch.from_numpy(table_np), rel_index,
            heads, ws, shift, N, tmask)
        np.testing.assert_allclose(np.asarray(out), want.numpy(), atol=2e-4)


def torch_cswin_attention(q, k, v, get_v_weight, num_heads, H_sp, W_sp):
    """Reference CSWinAttention.forward (NMP.py:451-505) in torch, no padding
    case (input already multiple of stripes)."""
    bs, ht, wd, n, dim = q.shape
    ni, nj = ht // H_sp, wd // W_sp

    def im2cswin(x):
        x = x.reshape(bs, ni, H_sp, nj, W_sp, n, num_heads, dim // num_heads)
        return x.permute(0, 1, 3, 6, 2, 4, 5, 7).reshape(
            -1, num_heads, H_sp * W_sp * n, dim // num_heads)

    # rpe via depthwise conv on stripe planes
    x = v.reshape(bs, ni, H_sp, nj, W_sp, n, dim)
    x = x.permute(0, 1, 3, 5, 6, 2, 4).reshape(bs * ni * nj * n, dim, H_sp, W_sp)
    rpe = F.conv2d(x, get_v_weight, padding=1, groups=dim)
    rpe = rpe.reshape(bs * ni * nj, n, dim, H_sp, W_sp).sum(dim=1, keepdim=True)
    mask = (~torch.eye(n, dtype=torch.bool)).float() * (-1)
    tmp = x.reshape(bs * ni * nj, n, dim, H_sp, W_sp) * (
        get_v_weight[:, 0, 1, 1][None, None, :, None, None])
    tmp = torch.einsum("jk,bkdhw->bjdhw", mask, tmp)
    rpe = rpe + tmp
    rpe = rpe.reshape(bs * ni * nj, n, num_heads, dim // num_heads, H_sp, W_sp)
    rpe = rpe.permute(0, 2, 4, 5, 1, 3).reshape(
        -1, num_heads, H_sp * W_sp * n, dim // num_heads)

    vv = x.reshape(bs * ni * nj, n, num_heads, dim // num_heads, H_sp, W_sp)
    vv = vv.permute(0, 2, 4, 5, 1, 3).reshape(
        -1, num_heads, H_sp * W_sp * n, dim // num_heads)

    scale = (dim // num_heads) ** -0.5
    qs, ks = im2cswin(q), im2cswin(k)
    attn = (qs * scale) @ ks.transpose(-2, -1)
    idx = torch.arange(0, H_sp * W_sp, dtype=torch.float32).view(-1, 1)
    idx = idx.expand(H_sp * W_sp, n).flatten()
    m = idx.unsqueeze(-1) - idx.unsqueeze(0)
    m = m.masked_fill(m == 0, NEG_INF).masked_fill(m != 0, 0.0)
    m.fill_diagonal_(0.0)
    attn = attn + m[None, None]
    attn = F.softmax(attn, dim=-1)
    out = attn @ vv + rpe
    out = out.reshape(bs, ni, nj, num_heads, H_sp, W_sp, n, dim // num_heads)
    out = out.permute(0, 1, 4, 2, 5, 6, 3, 7).reshape(bs, ht, wd, n, dim)
    return out


class TestCSWinAttention:
    @pytest.mark.parametrize("idx", [0, 1])
    def test_matches_torch_reference(self, idx):
        B, H, W, N, dim, heads, split = 1, 6, 8, 3, 8, 2, 1
        q_np = RNG.randn(B, H, W, N, dim).astype(np.float32)
        k_np = RNG.randn(B, H, W, N, dim).astype(np.float32)
        v_np = RNG.randn(B, H, W, N, dim).astype(np.float32)
        w_np = (RNG.randn(dim, 1, 3, 3) * 0.2).astype(np.float32)

        module = CSWinAttention(dim, idx=idx, split_size=split, num_heads=heads)
        kernel = jnp.asarray(w_np.transpose(2, 3, 1, 0))  # OIHW -> HWIO
        out = module.apply({"params": {"get_v_kernel": kernel}},
                           jnp.asarray(q_np), jnp.asarray(k_np), jnp.asarray(v_np))

        H_sp, W_sp = (H, split) if idx == 0 else (split, W)
        want = torch_cswin_attention(
            torch.from_numpy(q_np), torch.from_numpy(k_np), torch.from_numpy(v_np),
            torch.from_numpy(w_np), heads, H_sp, W_sp)
        np.testing.assert_allclose(np.asarray(out), want.numpy(), atol=2e-4)


class TestBasicAttention:
    @pytest.mark.parametrize("normalize_before", [True, False])
    # N=4 exercises the lane-friendly unrolled small-N path, N=6 the
    # head-split einsum path (models/nmp.py BasicAttention)
    @pytest.mark.parametrize("N", [4, 6])
    def test_matches_torch_reference(self, normalize_before, N):
        """Reference BasicAttention (NMP.py:70-139) in torch."""
        M, dim, qk_dim, heads = 7, 8, 12, 2
        x_np = RNG.randn(M, N, dim).astype(np.float32)
        enc_np = RNG.randn(M, N, qk_dim - dim).astype(np.float32)

        module = BasicAttention(dim, heads, normalize_before=normalize_before)
        params = module.init(jax.random.PRNGKey(0), jnp.asarray(x_np),
                             jnp.asarray(enc_np))
        out = module.apply(params, jnp.asarray(x_np), jnp.asarray(enc_np))

        p = params["params"]

        def lin(name, t):
            w = torch.from_numpy(np.asarray(p[name]["kernel"]))
            b = torch.from_numpy(np.asarray(p[name]["bias"]))
            return t @ w + b

        tx = torch.from_numpy(x_np)
        tenc = torch.from_numpy(enc_np)
        ln_w = torch.from_numpy(np.asarray(p["norm1"]["scale"]))
        ln_b = torch.from_numpy(np.asarray(p["norm1"]["bias"]))

        def ln(t):
            return F.layer_norm(t, (dim,), ln_w, ln_b, eps=1e-5)

        shortcut = tx
        h = ln(tx) if normalize_before else tx
        qk = torch.cat([h, tenc], dim=-1)
        q, k, v = lin("q", qk), lin("k", qk), lin("v", h)
        hd = dim // heads
        q = q.reshape(M, N, heads, hd).permute(0, 2, 1, 3)
        k = k.reshape(M, N, heads, hd).permute(0, 2, 1, 3)
        v = v.reshape(M, N, heads, hd).permute(0, 2, 1, 3)
        attn = F.softmax((q @ k.transpose(-2, -1)) * hd ** -0.5, dim=-1)
        o = (attn @ v).permute(0, 2, 1, 3).reshape(M, N, dim)
        o = shortcut + lin("proj", o)
        if not normalize_before:
            o = ln(o)
        np.testing.assert_allclose(np.asarray(out), o.numpy(), atol=2e-4)
