"""NMRF top-level model.

Behavioral parity target: reference ``nmrf/models/NMRF.py:21-273``:
backbone -> groupwise cost volume -> DPN -> NMRF inference (8x8 sub-patch
decode + selection) -> refinement (4x4 sub-patch residual decode).

Everything is channel-last and shape-static; eval-time padding to
divisibility is done OUTSIDE the jitted model (see ``utils.frame_utils``).
The aux-loss path returns stacked per-layer predictions instead of a list of
dicts — the criterion consumes them vectorized.
"""

from typing import Any, Dict

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.correlation import correlation_volume
from .backbone import Backbone
from .dpn import DPN
from .layers import ConvINReluConv, Dense, MLPBlock
from .stages import Inference, Refinement


def _subpatch_to_full(x, patch):
    """[..., B, H, W, N, patch*patch] -> [..., B, H*patch, W*patch, N]
    (einops 'a (b h w) n (hs ws) -> a b (h hs) (w ws) n')."""
    *lead, B, H, W, N, PP = x.shape
    x = x.reshape(*lead, B, H, W, N, patch, patch)
    # -> [..., B, H, hs, W, ws, N]
    perm = list(range(len(lead))) + [len(lead) + i for i in (0, 1, 4, 2, 5, 3)]
    x = x.transpose(*perm)
    return x.reshape(*lead, B, H * patch, W * patch, N)


def _select_argmax(values, scores):
    """``take_along_axis(values, argmax(scores, -1), -1)`` without the gather.

    Full-resolution lane-axis gathers are pathologically slow on TPU (the
    profiled ``take_along_axis`` in decode cost 6.3 ms/frame at KITTI
    resolution); a one-hot multiply-sum is exact (``one_hot(argmax)`` keeps
    first-winner tie semantics) and fuses into neighboring elementwise work.
    """
    n = values.shape[-1]
    sel = jax.nn.one_hot(jnp.argmax(scores, axis=-1), n, dtype=values.dtype)
    return (values * sel).sum(-1)


def _lower_median_pool(x, k):
    """Block-pool [B, H, W] by k x k lower median (torch.median semantics:
    the lower of the two middle values, reference NMRF.py:230-231).

    Uses rank-by-counting instead of a full sort: for each of the k*k values,
    count how many strictly smaller values (with index tie-break) precede it
    and select rank (k*k-1)//2 — pure VPU compare/sum work, ~4x faster than
    the sort fusion XLA emits at full resolution."""
    B, H, W = x.shape
    kk = k * k
    v = x.reshape(B, H // k, k, W // k, k).transpose(0, 1, 3, 2, 4)
    v = v.reshape(B, H // k, W // k, kk)
    lt = v[..., :, None] > v[..., None, :]  # [.., i, j]: v_j < v_i
    eq = v[..., :, None] == v[..., None, :]
    idx_lt = jnp.tril(jnp.ones((kk, kk), bool), -1)  # j < i tie-break
    rank = (lt | (eq & idx_lt)).sum(-1)  # exact rank of each element
    target = (kk - 1) // 2
    sel = (rank == target).astype(v.dtype)
    return (v * sel).sum(-1)


class NMRF(nn.Module):
    """Neural Markov Random Field stereo model (flagship)."""

    # architecture (mirrors reference from_config, NMRF.py:123-152)
    backbone_type: str = "resnet"
    backbone_out_channels: int = 256
    backbone_drop_path: float = 0.0
    num_proposals: int = 4
    max_disp: int = 320
    cost_group: int = 4
    context_dim: int = 64
    prop_embed_dim: int = 128
    infer_embed_dim: int = 128
    mlp_ratio: float = 4.0
    split_size: int = 1
    window_size: int = 6
    refine_window_size: int = 4
    prop_n_heads: int = 4
    infer_n_heads: int = 4
    num_prop_layers: int = 5
    num_infer_layers: int = 5
    num_refine_layers: int = 5
    with_refinement: bool = True
    return_intermediate: bool = True
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    drop_path: float = 0.0
    dropout: float = 0.0
    normalize_before: bool = True
    activation: str = "gelu"
    aux_loss: bool = True
    # computation dtype for the hot path ("float32" parity / "bfloat16" speed);
    # norms, softmax, probabilities, and all disparity arithmetic stay float32
    compute_dtype: str = "float32"
    # fused Pallas window-attention kernel in the NMP stages
    use_pallas: bool = False
    # tap-based MSDA fast path in the swin DeformNeck (ops/pallas/msda.py);
    # 0 = exact gather path
    msda_tap_radius: int = 0
    # rematerialize each scanned NMP layer in the backward pass (TPU.REMAT):
    # O(1) activation residuals per stack instead of O(num_layers)
    remat: bool = False
    # mesh axis name when the decode region (cost volume -> disparity) runs
    # H-sharded inside shard_map; the backbone is sharded by GSPMD outside
    # (parallel/mesh.py make_sharded_forward)
    spatial_axis: Any = None

    @property
    def dtype(self):
        return None if self.compute_dtype == "float32" else jnp.dtype(self.compute_dtype)

    def setup(self):
        if self.backbone_type == "resnet":
            self.image_encoder = Backbone(self.backbone_out_channels,
                                          dtype=self.dtype, name="backbone")
        elif self.backbone_type == "swin":
            from .adaptor import SwinAdaptor
            self.image_encoder = SwinAdaptor(
                out_channels=self.backbone_out_channels,
                drop_path_rate=self.backbone_drop_path,
                dtype=self.dtype, tap_radius=self.msda_tap_radius,
                name="backbone")
        else:
            raise ValueError(f"unknown backbone {self.backbone_type}")

        self.concatconv = ConvINReluConv(128, 64, dtype=self.dtype,
                                         spatial_axis=self.spatial_axis,
                                         name="concatconv")
        self.gw = ConvINReluConv(128, 256, dtype=self.dtype,
                                 spatial_axis=self.spatial_axis, name="gw")

        self.dpn = DPN(
            cost_group=self.cost_group,
            num_proposals=self.num_proposals,
            feat_dim=self.backbone_out_channels,
            context_dim=self.context_dim,
            num_prop_layers=self.num_prop_layers,
            prop_embed_dim=self.prop_embed_dim,
            mlp_ratio=self.mlp_ratio,
            split_size=self.split_size,
            prop_n_heads=self.prop_n_heads,
            activation=self.activation,
            attn_drop=self.attn_drop,
            proj_drop=self.proj_drop,
            drop_path=self.drop_path,
            dropout=self.dropout,
            normalize_before=self.normalize_before,
            dtype=self.dtype,
            use_pallas=self.use_pallas,
            spatial_axis=self.spatial_axis,
            remat=self.remat,
            name="dpn")

        self.inference = Inference(
            cost_group=32, dim=self.infer_embed_dim,
            num_layers=self.num_infer_layers, mlp_ratio=self.mlp_ratio,
            window_size=self.window_size, n_heads=self.infer_n_heads,
            activation=self.activation, attn_drop=self.attn_drop,
            proj_drop=self.proj_drop, drop_path=self.drop_path,
            dropout=self.dropout, normalize_before=self.normalize_before,
            return_intermediate=self.return_intermediate, dtype=self.dtype,
            use_pallas=self.use_pallas, spatial_axis=self.spatial_axis,
            remat=self.remat,
            name="inference")
        self.infer_head = MLPBlock(self.infer_embed_dim, 8 * 8, 3, name="infer_head")
        self.infer_score_head = Dense(8 * 8, name="infer_score_head")

        if self.with_refinement:
            self.refinement = Refinement(
                cost_group=32, dim=self.infer_embed_dim,
                num_layers=self.num_refine_layers, mlp_ratio=self.mlp_ratio,
                window_size=self.refine_window_size, n_heads=self.infer_n_heads,
                activation=self.activation, attn_drop=self.attn_drop,
                proj_drop=self.proj_drop, drop_path=self.drop_path,
                dropout=self.dropout, normalize_before=self.normalize_before,
                return_intermediate=self.return_intermediate, dtype=self.dtype,
                use_pallas=self.use_pallas, spatial_axis=self.spatial_axis,
                remat=self.remat,
                name="refinement")
            self.refine_head = MLPBlock(self.infer_embed_dim, 4 * 4, 3, name="refine_head")

    def extract_feature(self, img1, img2, deterministic: bool = True):
        """Batch both images through the backbone; returns per-image feature
        lists ordered low->high res ([1/8, 1/4]), reference NMRF.py:172-187."""
        cat = jnp.concatenate([img1, img2], axis=0)
        if self.backbone_type == "swin":
            feats = self.image_encoder(cat, deterministic)
        else:
            feats = self.image_encoder(cat)
        feats = feats[::-1]  # low to high res
        B = img1.shape[0]
        f1 = [f[:B] for f in feats]
        f2 = [f[B:] for f in feats]
        return f1, f2

    def __call__(self, img1, img2, train: bool = False):
        """img1/img2: [B, H, W, 3] float (0..255), H, W divisible by divis_by.

        Returns dict:
          disp: [B, H, W] full-res disparity
          prob: [B*H/8*W/8, D] initial distribution
          proposal / initial_proposal: [B, H/8*W/8, N]
          (train) coarse_disp/logits: [L_i, B, H, W, N]; disp_pred: [L_r, B, H, W]
        """
        f1_list, f2_list = self.extract_feature(img1, img2, not train)
        return self.decode(f1_list, f2_list, train)

    def decode(self, f1_list, f2_list, train: bool = False,
               spatial_out: bool = False):
        """Cost volume -> DPN -> NMP inference/refinement -> disparity.

        Split out of ``__call__`` so the spatial-sharded step can run it
        inside ``shard_map`` (every op here is H-local given the collectives
        in the NMP modules) while the backbone is sharded by GSPMD.

        spatial_out: return prob/proposals spatially shaped
        ([B, h8, w8, ...]) instead of flattened, so an H-sharded caller can
        reassemble the global flat layout outside shard_map.
        """
        deterministic = not train
        B = f1_list[0].shape[0]

        cost_volume = correlation_volume(
            f1_list[0], f2_list[0], self.max_disp // 8, self.cost_group)
        _, prob, label_seeds, labels = self.dpn(
            cost_volume, f1_list, deterministic)

        # ---- NMRF inference at 1/8 ---- #
        fmap1 = self.concatconv(f1_list[0])
        fmap2 = self.concatconv(f2_list[0])
        fmap1_gw = self.gw(f1_list[0])
        fmap2_gw = self.gw(f2_list[0])
        h8, w8 = fmap1.shape[1:3]
        labels_curr = jax.lax.stop_gradient(
            labels[-1].reshape(B, h8, w8, self.num_proposals))

        tgt = self.inference(labels_curr, fmap1, fmap2, fmap1_gw, fmap2_gw,
                             deterministic)  # [L,B,h8,w8,N,C]
        disp_delta = self.infer_head(tgt)  # [L,B,h8,w8,N,64]
        coarse = jax.nn.relu(labels_curr[None, ..., None] + disp_delta)
        logits = 0.25 * self.infer_score_head(tgt)
        coarse = _subpatch_to_full(coarse, 8)  # [L,B,H,W,N]
        logits = _subpatch_to_full(logits, 8)

        disp_pred = None
        if self.with_refinement:
            disp_curr = _select_argmax(coarse[-1], logits[-1]) * 2
            disp_curr = _lower_median_pool(disp_curr, 4)  # [B, H/4, W/4]
            disp_curr = jax.lax.stop_gradient(disp_curr)
            rf1 = self.concatconv(f1_list[1])
            rf2 = self.concatconv(f2_list[1])
            rf1_gw = self.gw(f1_list[1])
            rf2_gw = self.gw(f2_list[1])
            tgt_r = self.refinement(disp_curr, rf1, rf2, rf1_gw, rf2_gw,
                                    deterministic)  # [L,B,H/4,W/4,C]
            delta_r = self.refine_head(tgt_r)  # [L,B,H/4,W/4,16]
            disp_pred = jax.nn.relu(disp_curr[None, ..., None] + delta_r)
            disp_pred = _subpatch_to_full(disp_pred[..., None, :], 4).squeeze(-1)
            # [L, B, H, W]

        if disp_pred is not None:
            disp = disp_pred[-1] * 4
        else:
            disp = _select_argmax(coarse[-1], logits[-1]) * 8

        if spatial_out:
            # spatially-shaped flat outputs so an H-sharded caller can
            # concatenate tiles along H and re-flatten globally
            prob_out = prob.reshape(B, h8, w8, -1)
            prop_out = labels[-1].reshape(B, h8, w8, self.num_proposals)
            seed_out = label_seeds.reshape(B, h8, w8, self.num_proposals)
        else:
            prob_out = prob
            prop_out = labels[-1].reshape(B, -1, self.num_proposals)
            seed_out = label_seeds.reshape(B, -1, self.num_proposals)
        out: Dict[str, Any] = {
            "disp": disp,
            "prob": prob_out,
            "proposal": prop_out,
            "initial_proposal": seed_out,
        }
        if disp_pred is not None:
            out["disp_pred"] = disp_pred[-1]
        if train and self.aux_loss:
            out["coarse_disp_layers"] = coarse      # [L_i, B, H, W, N]
            out["logits_layers"] = logits           # [L_i, B, H, W, N]
            if disp_pred is not None:
                out["disp_pred_layers"] = disp_pred  # [L_r, B, H, W]
        return out
