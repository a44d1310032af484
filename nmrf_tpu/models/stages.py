"""NMRF processing stages: seed Propagation, Inference NMP, Refinement NMP.

Behavioral parity targets:
  * ``Propagation``        — reference ``NMP.py:603-667``
  * ``PropagationLayer``   — reference ``NMP.py:903-929``
  * ``Inference``          — reference ``NMP.py:670-798``
  * ``InferenceLayer``     — reference ``NMP.py:932-958``
  * ``Refinement``         — reference ``NMP.py:801-900``
  * ``RefinementLayer``    — reference ``NMP.py:961-981``

Token layout is [B, H, W, N, C] throughout (spatial-major, channel-last);
intermediate layer outputs are stacked on a leading layer axis for the aux
losses.  Window padding is static (trace-time), masks are numpy constants.
"""

from typing import Any

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.encodings import fourier_coord_embed
from ..ops.sampling import disp_warp, sample_cost
from .layers import Dense, LayerNorm, Mlp, get_activation
from .nmp import (
    BasicAttention,
    CSWinNMP,
    SwinNMP,
    shift_window_attn_mask,
    window_attn_mask,
)


def _center_pad_hw(x, top, bottom, left, right):
    """Pad H, W axes of [B, H, W, N, C]."""
    return jnp.pad(x, ((0, 0), (top, bottom), (left, right), (0, 0), (0, 0)))


def _drop_path_rates(drop_path: float, n: int):
    return [float(r) for r in np.linspace(0.0, drop_path, n)]


class PropagationLayer(nn.Module):
    """CSWin NMP with visual-context-augmented qk (reference NMP.py:903-929)."""

    embed_dim: int
    mlp_ratio: float
    context_dim: int
    split_size: int
    n_heads: int
    activation: str = "gelu"
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    dropout: float = 0.0
    normalize_before: bool = False
    dtype: Any = None
    use_pallas: bool = False
    spatial_axis: Any = None

    @nn.compact
    def __call__(self, tgt, context, deterministic: bool = True,
                 drop_path_rate=None):
        return CSWinNMP(
            dim=self.embed_dim,
            qk_dim=self.embed_dim + self.context_dim,
            v_dim=self.embed_dim,
            num_heads=self.n_heads,
            split_size=self.split_size,
            mlp_ratio=self.mlp_ratio,
            attn_drop=self.attn_drop,
            proj_drop=self.proj_drop,
            dropout=self.dropout,
            act=get_activation(self.activation),
            normalize_before=self.normalize_before,
            dtype=self.dtype,
            use_pallas=self.use_pallas,
            spatial_axis=self.spatial_axis,
            name="nmp",
        )(tgt, context, deterministic, drop_path_rate=drop_path_rate)


class _PropScanBody(nn.Module):
    """One scanned propagation layer."""

    layer_kwargs: tuple
    deterministic: bool
    use_drop_path: bool = False

    @nn.compact
    def __call__(self, x, dpr, context):
        x = PropagationLayer(**dict(self.layer_kwargs), name="layer")(
            x, context, self.deterministic,
            drop_path_rate=dpr if self.use_drop_path else None)
        return x, x


class Propagation(nn.Module):
    """Label-seed propagation (reference NMP.py:603-667).

    Embeds each seed from its local cost profile + Fourier disparity encoding,
    then runs CSWin propagation layers conditioned on visual context.
    """

    embed_dim: int
    cost_group: int
    num_layers: int
    mlp_ratio: float
    context_dim: int
    split_size: int
    n_heads: int
    activation: str = "gelu"
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    drop_path: float = 0.0
    dropout: float = 0.0
    normalize_before: bool = False
    return_intermediate: bool = False
    dtype: Any = None
    use_pallas: bool = False  # fused CSWin stripe attention in the layers
    spatial_axis: Any = None
    remat: bool = False  # jax.checkpoint each scanned layer (TPU.REMAT)

    @nn.compact
    def __call__(self, cost_volume, label_seed, context, deterministic: bool = True):
        """
        cost_volume: [M, G, D] (M = B*H*W); label_seed: [M, N] int;
        context: [B, H, W, C_ctx].
        Returns ([L, B, H, W, N, C] embeddings, [M, N] float seeds).
        """
        B, H, W, _ = context.shape
        N = label_seed.shape[-1]

        cost = sample_cost(cost_volume, label_seed)  # [M, N, G*9]
        x = Dense(self.embed_dim, dtype=self.dtype, name="cost_encoder_0")(cost)
        x = jax.nn.gelu(x, approximate=False)
        cost_feat = Dense(self.embed_dim, dtype=self.dtype, name="cost_encoder_2")(x)
        seeds_f = label_seed.astype(jnp.float32)
        disp_enc = fourier_coord_embed(seeds_f[..., None], 15, normalizer=3.14 / 64)
        embed = Dense(self.embed_dim, use_bias=False, dtype=self.dtype, name="proj")(
            jnp.concatenate([cost_feat.astype(jnp.float32), disp_enc], axis=-1)
            if self.dtype is None else
            jnp.concatenate([cost_feat, disp_enc.astype(self.dtype)], axis=-1))
        embed = embed.reshape(B, H, W, N, self.embed_dim)

        ctx = jnp.broadcast_to(context[:, :, :, None, :],
                               (B, H, W, N, context.shape[-1]))
        norm = LayerNorm(name="norm")
        dprs = jnp.asarray(_drop_path_rates(self.drop_path, self.num_layers),
                           jnp.float32)
        layer_kwargs = (
            ("embed_dim", self.embed_dim), ("mlp_ratio", self.mlp_ratio),
            ("context_dim", self.context_dim), ("split_size", self.split_size),
            ("n_heads", self.n_heads), ("activation", self.activation),
            ("attn_drop", self.attn_drop), ("proj_drop", self.proj_drop),
            ("dropout", self.dropout),
            ("normalize_before", self.normalize_before),
            ("dtype", self.dtype),
            ("use_pallas", self.use_pallas),
            ("spatial_axis", self.spatial_axis),
        )
        # Under TPU.REMAT each scanned layer is rematerialized in the
        # backward pass (prevent_cse is unnecessary inside scan and would
        # block fusion).
        prop_body = (nn.remat(_PropScanBody, prevent_cse=False)
                     if self.remat else _PropScanBody)
        ScanStack = nn.scan(
            prop_body,
            variable_axes={"params": 0},
            split_rngs={"params": True, "dropout": True, "drop_path": True},
            in_axes=(0, nn.broadcast),
            out_axes=0,
            length=self.num_layers,
        )
        embed, ys = ScanStack(layer_kwargs, deterministic,
                              use_drop_path=self.drop_path > 0.0,
                              name="layers")(embed, dprs, ctx)

        if self.return_intermediate:
            return norm(ys), seeds_f
        return norm(embed)[None], seeds_f


class InferenceLayer(nn.Module):
    """Self-edge attention + Swin spatial NMP (reference NMP.py:932-958).

    ``shift``/``drop_path_rate`` arrive as traced scalars from the nn.scan
    layer stack (layers alternate shift 0 / ws//2).
    """

    embed_dim: int
    mlp_ratio: float
    window_size: int
    n_heads: int
    activation: str = "gelu"
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    dropout: float = 0.0
    normalize_before: bool = False
    dtype: Any = None
    use_pallas: bool = False
    spatial_axis: Any = None

    @nn.compact
    def __call__(self, tgt, abs_encoding, attn_mask, deterministic: bool = True,
                 shift=0, drop_path_rate=None):
        """tgt/abs_encoding: [B, H, W, N, C]."""
        B, H, W, N, C = tgt.shape
        x = tgt.reshape(B * H * W, N, C)
        enc = abs_encoding.reshape(B * H * W, N, abs_encoding.shape[-1])
        x = BasicAttention(
            self.embed_dim, self.n_heads, self.attn_drop, self.proj_drop,
            0.0, self.normalize_before, dtype=self.dtype, name="self_nmp",
        )(x, enc, deterministic)
        x = x.reshape(B, H, W, N, C)
        x = SwinNMP(
            self.embed_dim, self.n_heads, self.window_size, 0,
            self.mlp_ratio, self.dropout, self.attn_drop, 0.0,
            get_activation(self.activation), self.normalize_before,
            dtype=self.dtype, use_pallas=self.use_pallas,
            candidate_mask=True,
            spatial_axis=self.spatial_axis, name="nmp",
        )(x, abs_encoding, attn_mask, deterministic, shift=shift,
          drop_path_rate=drop_path_rate)
        return x


class RefinementLayer(nn.Module):
    """Swin spatial NMP only, N=1 (reference NMP.py:961-981)."""

    embed_dim: int
    mlp_ratio: float
    window_size: int
    n_heads: int
    activation: str = "gelu"
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    dropout: float = 0.0
    normalize_before: bool = False
    dtype: Any = None
    use_pallas: bool = False
    spatial_axis: Any = None

    @nn.compact
    def __call__(self, tgt, abs_encoding, attn_mask, deterministic: bool = True,
                 shift=0, drop_path_rate=None):
        return SwinNMP(
            self.embed_dim, self.n_heads, self.window_size, 0,
            self.mlp_ratio, self.dropout, self.attn_drop, 0.0,
            get_activation(self.activation), self.normalize_before,
            dtype=self.dtype, use_pallas=self.use_pallas,
            candidate_mask=False,
            spatial_axis=self.spatial_axis, name="nmp",
        )(tgt, abs_encoding, attn_mask, deterministic, shift=shift,
          drop_path_rate=drop_path_rate)


class _StageScanBody(nn.Module):
    """One scanned NMP layer: carry = token state; emits the state for the
    per-layer aux losses."""

    layer_cls: type
    layer_kwargs: tuple  # tuple of (key, value) pairs — hashable static
    deterministic: bool
    use_drop_path: bool = False

    @nn.compact
    def __call__(self, x, per_layer, abs_encoding, masks):
        shift, sel, dpr = per_layer
        mask = masks[sel]  # dynamic select between plain/shifted mask
        layer = self.layer_cls(**dict(self.layer_kwargs), name="layer")
        x = layer(x, abs_encoding, mask, self.deterministic,
                  shift=shift,
                  drop_path_rate=dpr if self.use_drop_path else None)
        return x, x


class _NMPStage(nn.Module):
    """Shared embed+window-pad+layer-loop machinery for Inference/Refinement."""

    cost_group: int
    dim: int
    num_layers: int
    mlp_ratio: float
    window_size: int
    n_heads: int
    activation: str = "gelu"
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    drop_path: float = 0.0
    dropout: float = 0.0
    normalize_before: bool = False
    return_intermediate: bool = False
    dtype: Any = None
    use_pallas: bool = False
    spatial_axis: Any = None
    remat: bool = False  # jax.checkpoint each scanned layer (TPU.REMAT)

    # refinement=False: candidate mask + normalizer pi/64 (Inference)
    # refinement=True:  no candidate mask + normalizer pi/128 (Refinement)
    refinement: bool = False

    def _embed(self, labels, fmap1, fmap2, fmap1_gw, fmap2_gw):
        """Candidate-label embedding: warped-feature concat + group corr.

        labels: [B, H, W, N]; fmaps: [B, H, W, C]. -> [B, H, W, N, dim]
        (reference Inference.forward embedding, NMP.py:722-741).
        """
        B, H, W, N = labels.shape
        G = self.cost_group
        warped_gw = disp_warp(fmap2_gw, labels)  # [B,H,W,N,Cgw]
        Cgw = fmap1_gw.shape[-1]
        f1g = fmap1_gw.reshape(B, H, W, 1, G, Cgw // G)
        wg = warped_gw.reshape(B, H, W, N, G, Cgw // G)
        corr = (f1g * wg).mean(axis=-1)  # [B,H,W,N,G]
        warped = disp_warp(fmap2, labels)  # [B,H,W,N,C]
        f1 = jnp.broadcast_to(fmap1[:, :, :, None, :],
                              (B, H, W, N, fmap1.shape[-1]))
        feat = jnp.concatenate([f1, warped, corr.astype(f1.dtype)], axis=-1)
        return Mlp(self.dim, self.dim, dtype=self.dtype, name="ffn")(feat)

    def _run_layers(self, layer_cls, label_rep, abs_encoding, deterministic):
        """Window-pad, build masks, scan the layer stack, crop.

        The L layers are homogeneous, so they run under ``nn.scan`` — one
        compiled layer body instead of L inlined copies (compile time and
        code size scale O(1) in depth; stacked params [L, ...] per leaf).
        Returns [L or 1, B, H, W, N, C].
        """
        B, H, W, N, C = label_rep.shape
        ws = self.window_size
        L = self.num_layers
        H_pad = (ws - H % ws) % ws
        W_pad = (ws - W % ws) % ws
        if self.spatial_axis is not None:
            # H is a tile of the global image: tiles must be window-aligned
            # (global H padding would make tile shapes unequal)
            assert H_pad == 0, (
                f"spatial sharding requires local H % window == 0, got "
                f"H={H}, window={ws}")
        tp, lp = H_pad // 2, W_pad // 2
        bp, rp = H_pad - tp, W_pad - lp
        if H_pad or W_pad:
            label_rep = _center_pad_hw(label_rep, tp, bp, lp, rp)
            abs_encoding = _center_pad_hw(abs_encoding, tp, bp, lp, rp)
        Hp, Wp = H + H_pad, W + W_pad
        nW = (Hp // ws) * (Wp // ws)

        # masks[0]: plain (even layers), masks[1]: shifted (odd layers)
        if self.refinement:
            mask0 = np.zeros((nW, ws * ws * N, ws * ws * N), np.float32)
        else:
            mask0 = np.broadcast_to(window_attn_mask((ws, ws, N))[None],
                                    (nW, ws * ws * N, ws * ws * N))
        if L < 2:
            mask1 = jnp.asarray(mask0)
        elif self.spatial_axis is not None:
            # shifted-window mask of the GLOBAL image, this tile's windows:
            # after the global cyclic roll only the globally-last tile sees
            # the H wrap, so masks differ per tile — select by axis index
            from jax import lax

            from ..parallel.spatial import split_shift_mask_per_tile

            n_tiles = lax.axis_size(self.spatial_axis)
            mask1_glob = shift_window_attn_mask(
                (Hp * n_tiles, Wp), (ws, ws, N), ws // 2,
                with_candidate_mask=not self.refinement)
            tiles = split_shift_mask_per_tile(mask1_glob, n_tiles)
            mask1 = jnp.take(jnp.asarray(tiles),
                             lax.axis_index(self.spatial_axis), axis=0)
        else:
            mask1 = jnp.asarray(
                shift_window_attn_mask((Hp, Wp), (ws, ws, N), ws // 2,
                                       with_candidate_mask=not self.refinement))
        masks = jnp.stack([jnp.asarray(np.ascontiguousarray(mask0)), mask1])

        shifts = jnp.asarray([0 if i % 2 == 0 else ws // 2 for i in range(L)],
                             jnp.int32)
        sels = jnp.asarray([i % 2 for i in range(L)], jnp.int32)
        dprs = jnp.asarray(_drop_path_rates(self.drop_path, L), jnp.float32)

        layer_kwargs = (
            ("embed_dim", self.dim), ("mlp_ratio", self.mlp_ratio),
            ("window_size", ws), ("n_heads", self.n_heads),
            ("activation", self.activation), ("attn_drop", self.attn_drop),
            ("proj_drop", self.proj_drop), ("dropout", self.dropout),
            ("normalize_before", self.normalize_before),
            ("dtype", self.dtype),
            ("use_pallas", self.use_pallas),
            ("spatial_axis", self.spatial_axis),
        )
        stage_body = (nn.remat(_StageScanBody, prevent_cse=False)
                      if self.remat else _StageScanBody)
        ScanStack = nn.scan(
            stage_body,
            variable_axes={"params": 0},
            split_rngs={"params": True, "dropout": True, "drop_path": True},
            in_axes=(0, nn.broadcast, nn.broadcast),
            out_axes=0,
            length=L,
        )
        x, ys = ScanStack(layer_cls, layer_kwargs, deterministic,
                          use_drop_path=self.drop_path > 0.0,
                          name="layers")(
            label_rep, (shifts, sels, dprs), abs_encoding, masks)

        norm = LayerNorm(name="norm")

        def crop(t):
            return t[..., tp:tp + H, lp:lp + W, :, :]

        # intermediates are only needed for the training aux losses
        # (reference NMP.py:777: return_intermediate and self.training)
        if self.return_intermediate and not deterministic:
            return norm(crop(ys))  # [L, B, H, W, N, C]
        return norm(crop(x))[None]


class Inference(_NMPStage):
    """Neural MRF inference over candidate labels (reference NMP.py:670-798)."""

    @nn.compact
    def __call__(self, labels, fmap1, fmap2, fmap1_gw, fmap2_gw,
                 deterministic: bool = True, collect_intermediate: bool = False):
        """labels: [B, H, W, N] candidate disparities. -> [L, B, H, W, N, C]."""
        labels = labels.astype(jnp.float32)
        label_rep = self._embed(labels, fmap1, fmap2, fmap1_gw, fmap2_gw)
        abs_enc = fourier_coord_embed(labels[..., None], 15, normalizer=3.14 / 64)
        return self._run_layers(InferenceLayer, label_rep, abs_enc, deterministic)


class Refinement(_NMPStage):
    """Disparity refinement at 1/4 res, single candidate
    (reference NMP.py:801-900)."""

    refinement: bool = True

    @nn.compact
    def __call__(self, disp, fmap1, fmap2, fmap1_gw, fmap2_gw,
                 deterministic: bool = True):
        """disp: [B, H, W]. -> [L, B, H, W, C] (candidate axis squeezed)."""
        labels = disp.astype(jnp.float32)[..., None]  # N = 1
        label_rep = self._embed(labels, fmap1, fmap2, fmap1_gw, fmap2_gw)
        abs_enc = fourier_coord_embed(labels[..., None], 15, normalizer=3.14 / 128)
        out = self._run_layers(RefinementLayer, label_rep, abs_enc, deterministic)
        return out.squeeze(-2)
