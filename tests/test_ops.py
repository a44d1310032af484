"""Kernel parity tests: jnp ops vs torch-CPU goldens.

Mirrors the reference's validation pattern (``ops/test.py``: CUDA kernel vs
pure-PyTorch golden + gradcheck), applied to every op in ``nmrf_tpu.ops``.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn.functional as F

from nmrf_tpu import ops


RNG = np.random.RandomState(0)


def t2n(t):
    return t.detach().cpu().numpy()


class TestCorrelation:
    def test_matmul_band_matches_golden(self):
        f1 = RNG.randn(2, 6, 16, 8).astype(np.float32)
        f2 = RNG.randn(2, 6, 16, 8).astype(np.float32)
        got = ops.correlation_volume(jnp.array(f1), jnp.array(f2), 5, 4)
        want = ops.correlation_volume_golden(jnp.array(f1), jnp.array(f2), 5, 4)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)

    def test_matches_torch_reference_semantics(self):
        """Reference build_correlation_volume (submodule.py:13-23) in torch."""
        B, C, H, W, D, G = 2, 8, 6, 16, 5, 4
        f1 = RNG.randn(B, C, H, W).astype(np.float32)
        f2 = RNG.randn(B, C, H, W).astype(np.float32)

        tf1, tf2 = torch.from_numpy(f1), torch.from_numpy(f2)
        vol = torch.zeros(B, G, D, H, W)
        for i in range(D):
            a = tf1[:, :, :, i:] if i > 0 else tf1
            b = tf2[:, :, :, : W - i] if i > 0 else tf2
            cost = (a * b).view(B, G, C // G, H, W - i).mean(dim=2)
            vol[:, :, i, :, i:] = cost
        want = vol.permute(0, 3, 4, 1, 2).numpy()  # [B,H,W,G,D]

        got = ops.correlation_volume(
            jnp.array(f1.transpose(0, 2, 3, 1)), jnp.array(f2.transpose(0, 2, 3, 1)), D, G
        )
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)

    def test_grad(self):
        rng = np.random.RandomState(7)
        f1 = jnp.array(rng.randn(1, 4, 8, 4).astype(np.float32))
        f2 = jnp.array(rng.randn(1, 4, 8, 4).astype(np.float32))
        from .gradcheck import check_grads
        check_grads(lambda a, b: ops.correlation_volume(a, b, 3, 2).sum(), (f1, f2))


class TestDispWarp:
    @pytest.mark.parametrize("radius", [0, 4])
    def test_matches_torch_grid_sample(self, radius):
        """Reference Inference.sample_fmap (NMP.py:682-707) in torch."""
        B, C, H, W, N = 2, 6, 5, 16, 3
        fmap = RNG.randn(B, C, H, W).astype(np.float32)
        disp = (RNG.rand(B * H * W, N) * (W + 4) - 2).astype(np.float32)

        tf = torch.from_numpy(fmap)
        td = torch.from_numpy(disp)
        offset = torch.arange(-radius, radius + 1, dtype=td.dtype).view(1, 1, -1)
        grid_x = (td[..., None] + offset).reshape(B, H, W, -1)
        grid_y = torch.zeros_like(grid_x)
        xs = torch.arange(0, W, dtype=torch.float32).view(1, W).expand(H, W)
        ys = torch.arange(0, H, dtype=torch.float32).view(H, 1).expand(H, W)
        grid = torch.stack((xs, ys), dim=-1).reshape(1, H, W, 1, 2)
        grid = grid + torch.stack((-grid_x, grid_y), dim=-1)
        grid[..., 0] = 2 * grid[..., 0].clone() / (W - 1) - 1
        grid[..., 1] = 2 * grid[..., 1].clone() / (H - 1) - 1
        grid = grid.reshape(B, H, -1, 2)
        want = F.grid_sample(tf, grid, mode="bilinear", padding_mode="zeros",
                             align_corners=True)
        want = want.reshape(B, C, H, W, N * (2 * radius + 1))
        want = t2n(want).transpose(0, 2, 3, 4, 1)  # [B,H,W,K,C]

        got = ops.disp_warp(
            jnp.array(fmap.transpose(0, 2, 3, 1)),
            jnp.array(disp.reshape(B, H, W, N)),
            radius=radius,
        )
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)


class TestGridSample2D:
    @pytest.mark.parametrize("align_corners", [False, True])
    def test_matches_torch(self, align_corners):
        B, C, H, W = 2, 5, 7, 9
        img = RNG.randn(B, C, H, W).astype(np.float32)
        grid = (RNG.rand(B, 4, 6, 2) * 2.4 - 1.2).astype(np.float32)
        want = F.grid_sample(torch.from_numpy(img), torch.from_numpy(grid),
                             mode="bilinear", padding_mode="zeros",
                             align_corners=align_corners)
        want = t2n(want).transpose(0, 2, 3, 1)
        got = ops.grid_sample_2d(jnp.array(img.transpose(0, 2, 3, 1)),
                                 jnp.array(grid), align_corners=align_corners)
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)


class TestSampleCost:
    def test_matches_torch_reference(self):
        """Reference Propagation.sample_cost (NMP.py:618-634) in torch."""
        M, G, D, N = 20, 4, 12, 3
        cv = RNG.randn(M, G, D).astype(np.float32)
        seeds = RNG.randint(0, D, size=(M, N)).astype(np.int64)

        tcv, ts = torch.from_numpy(cv), torch.from_numpy(seeds)
        offset = torch.arange(-4, 5, dtype=ts.dtype)
        idx = torch.clamp(ts[..., None] + offset.view(1, 1, -1), 0, D - 1)
        idx = idx.reshape(-1, 1, 9 * N).repeat(1, G, 1)
        cost = torch.gather(tcv, dim=-1, index=idx)
        want = cost.reshape(M, G, N, 9).permute(0, 2, 1, 3).reshape(M, N, G * 9).numpy()

        got = ops.sample_cost(jnp.array(cv), jnp.array(seeds.astype(np.int32)))
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-6)


class TestNMS:
    def test_maxpool3_matches_torch(self):
        x = RNG.randn(7, 13).astype(np.float32)
        want = t2n(F.max_pool1d(torch.from_numpy(x)[:, None], 3, 1, 1).squeeze(1))
        got = ops.max_pool_1d_3(jnp.array(x))
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-6)

    def test_nms_topk_matches_reference_semantics(self):
        """Reference DPN.forward step-1 (DPN.py:119-125) in torch."""
        eps = 1e-3
        prob = np.abs(RNG.randn(50, 24)).astype(np.float32)
        prob = prob / prob.sum(-1, keepdims=True)

        tp = torch.from_numpy(prob)
        out = F.max_pool1d(tp.unsqueeze(-2), 3, 1, 1).squeeze(-2)
        nlm = (tp != out) & (tp > eps)
        prob_ = tp.clone()
        prob_[nlm] = eps
        _, want = torch.topk(prob_, 4, dim=-1)

        got = ops.nms_topk_seeds(jnp.array(prob), 4, eps=eps)
        # compare the selected probability VALUES (ties may reorder indices)
        got_v = np.take_along_axis(prob, np.asarray(got), axis=-1)
        want_v = np.take_along_axis(prob, want.numpy(), axis=-1)
        np.testing.assert_allclose(np.sort(got_v, -1), np.sort(want_v, -1), atol=1e-6)


class TestSoftHistogram:
    def test_matches_torch_scatter(self):
        """Reference Criterion.loss_init scatter path (NMRF.py:343-358)."""
        M, T, D = 11, 16, 10
        vals = (RNG.rand(M, T) * (D + 1)).astype(np.float32)
        wts = (RNG.rand(M, T) > 0.3).astype(np.float32)

        tv, tw = torch.from_numpy(vals), torch.from_numpy(wts)
        lower = torch.floor(tv).to(torch.int64)
        high = lower + 1
        high_p = tv - lower
        lower = torch.clamp(lower, max=D - 1)
        high = torch.clamp(high, max=D - 1)
        label = torch.zeros(M, D)
        label.scatter_reduce_(-1, lower, (1 - high_p) * tw, reduce="sum")
        label.scatter_reduce_(-1, high, high_p * tw, reduce="sum")

        got = ops.soft_histogram(jnp.array(vals), jnp.array(wts), D)
        np.testing.assert_allclose(np.asarray(got), label.numpy(), atol=1e-5)


class TestMSDeformAttn:
    def test_matches_torch_golden(self):
        """Reference ms_deform_attn_core_pytorch (ms_deform_attn_func.py:49-71)."""
        B, M, D = 2, 4, 8
        shapes = [(6, 8), (3, 4)]
        S = sum(h * w for h, w in shapes)
        Lq, L, P = 10, len(shapes), 3
        value = RNG.randn(B, S, M, D).astype(np.float32)
        locs = RNG.rand(B, Lq, M, L, P, 2).astype(np.float32) * 1.2 - 0.1
        attn = RNG.rand(B, Lq, M, L, P).astype(np.float32)
        attn = attn / attn.sum((-1, -2), keepdims=True)

        tv = torch.from_numpy(value)
        tl = torch.from_numpy(locs)
        ta = torch.from_numpy(attn)
        value_list = tv.split([h * w for h, w in shapes], dim=1)
        grids = 2 * tl - 1
        svl = []
        for lid, (h, w) in enumerate(shapes):
            v = value_list[lid].flatten(2).transpose(1, 2).reshape(B * M, D, h, w)
            g = grids[:, :, :, lid].transpose(1, 2).flatten(0, 1)
            svl.append(F.grid_sample(v, g, mode="bilinear", padding_mode="zeros",
                                     align_corners=False))
        aw = ta.transpose(1, 2).reshape(B * M, 1, Lq, L * P)
        want = (torch.stack(svl, dim=-2).flatten(-2) * aw).sum(-1).view(B, M * D, Lq)
        want = want.transpose(1, 2).numpy()

        got = ops.ms_deform_attn(jnp.array(value), shapes, jnp.array(locs), jnp.array(attn))
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)

    def test_grad(self):
        B, M, D = 1, 2, 4
        shapes = [(4, 4)]
        S = sum(h * w for h, w in shapes)
        rng = np.random.RandomState(11)
        value = jnp.array(rng.randn(B, S, M, D).astype(np.float32))
        # keep sampling points away from bilinear-cell boundaries so the
        # central-difference probe stays on one smooth piece
        locs = rng.rand(B, 5, M, 1, 2, 2).astype(np.float32) * 0.8 + 0.1
        px = (np.floor(locs * 8) + np.clip(locs * 8 - np.floor(locs * 8), 0.3, 0.7)) / 8
        locs = jnp.array(px.astype(np.float32))
        attn = jnp.array(np.ones((B, 5, M, 1, 2), np.float32) / 2)
        from .gradcheck import check_grads
        check_grads(lambda v, l, a: ops.ms_deform_attn(v, shapes, l, a).sum(),
                    (value, locs, attn))


class TestDownsampleDisp:
    def test_majority_pooling(self):
        disp = np.zeros((1, 8, 8), np.float32)
        label = np.zeros((1, 8, 8), np.int32)
        # 40 pixels of superpixel 1 at disparity ~10, 24 pixels of sp 2 at 50
        label[0, :5, :] = 1
        label[0, 5:, :] = 2
        disp[0, :5, :] = 10.0
        disp[0, 5:, :] = 50.0
        out = ops.downsample_disp(jnp.array(disp), jnp.array(label), factor=8)
        np.testing.assert_allclose(np.asarray(out), [[[10.0]]])

    def test_invalid_cell(self):
        disp = np.zeros((1, 8, 8), np.float32)
        label = np.zeros((1, 8, 8), np.int32)
        out = ops.downsample_disp(jnp.array(disp), jnp.array(label), factor=8)
        np.testing.assert_allclose(np.asarray(out), [[[0.0]]])


class TestEncodings:
    def test_fourier_coord_embed_matches_torch(self):
        """Reference fourier_coord_embed (NMP.py:35-51) in torch."""
        coord = RNG.rand(7, 3, 1).astype(np.float32) * 40

        tc = torch.from_numpy(coord)
        freq = 2 ** torch.linspace(0, 14, 15)
        c = tc.unsqueeze(-1) * (3.14 / 64)
        f = c * freq
        want = torch.cat([f.sin(), f.cos(), c], dim=-1).reshape(7, 3, 31).numpy()

        got = ops.fourier_coord_embed(jnp.array(coord), 15, normalizer=3.14 / 64)
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)

    def test_fourier_grid_embed_matches_torch(self):
        """Reference fourier_grid_embed (NMP.py:11-32) in torch."""
        import math
        H, W, dim = 5, 6, 8
        axis_pos = [torch.linspace(-1, 1, steps=s) for s in (H, W)]
        pos = torch.stack(torch.meshgrid(*axis_pos, indexing="ij"), dim=-1)
        nb = dim // 4
        fb = torch.linspace(1.0, nb, nb)
        pe = pos.unsqueeze(-1) * fb * math.pi
        want = torch.cat([pe.sin(), pe.cos()], dim=-1).reshape(H, W, dim).numpy()

        got = ops.fourier_grid_embed((H, W), dim)
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)
