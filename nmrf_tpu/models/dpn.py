"""Disparity Proposal Network.

Behavioral parity target: reference ``nmrf/models/DPN.py:11-134``:
  1. modal extraction: Conv1d stack (G->8->16->1, k=5) along disparity ->
     softmax -> 3-tap NMS -> top-k integer label seeds;
  2. seed propagation: visual-context projection + CSWin propagation layers +
     zero-init MLP head -> residual offsets; labels = relu(offsets + seeds).
"""

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.nms import nms_topk_seeds
from .layers import Conv, ConvINReluConv, MLPBlock
from .stages import Propagation


class DPN(nn.Module):
    cost_group: int
    num_proposals: int
    feat_dim: int
    context_dim: int
    num_prop_layers: int
    prop_embed_dim: int
    mlp_ratio: float
    split_size: int
    prop_n_heads: int
    activation: str = "gelu"
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    drop_path: float = 0.0
    dropout: float = 0.0
    normalize_before: bool = False
    dtype: Any = None
    spatial_axis: Any = None
    use_pallas: bool = False  # fused CSWin stripe attention in propagation
    remat: bool = False  # rematerialize scanned propagation layers

    @nn.compact
    def __call__(self, cost_volume, fmap1_list, deterministic: bool = True):
        """
        cost_volume: [B, H, W, G, D]
        fmap1_list: [1/8-res [B,H,W,C], 1/4-res] left features (low->high? the
          reference passes [1/8, 1/4]; only index 0 is used here).
        Returns:
          cost_volume_flat: [M, G, D] (M = B*H*W)
          prob: [M, D] softmax over disparity
          label_seeds: [M, N] int seeds
          labels: [L, M, N] refined candidate labels (L=1, no intermediates)
        """
        B, H, W, G, D = cost_volume.shape
        flat = cost_volume.reshape(B * H * W, G, D)

        # ---- step 1: disparity modals as label seeds ---- #
        # Conv1d stack along D (NWC: [M, D, G])
        x = flat.transpose(0, 2, 1)
        x = Conv(8, (5,), padding=2, dtype=self.dtype, name="mlp_0")(x)
        x = jax.nn.relu(x)
        x = Conv(16, (5,), padding=2, dtype=self.dtype, name="mlp_2")(x)
        x = jax.nn.relu(x)
        x = Conv(1, (5,), padding=2, dtype=self.dtype, name="mlp_4")(x)
        cost = x.squeeze(-1).astype(jnp.float32)  # [M, D]
        prob = jax.nn.softmax(cost, axis=-1)
        label_seeds = nms_topk_seeds(prob, self.num_proposals)  # [M, N]

        # ---- step 2: label seed propagation ---- #
        context = ConvINReluConv(128, self.context_dim, dtype=self.dtype,
                                 spatial_axis=self.spatial_axis,
                                 name="proj")(fmap1_list[0])
        memory, seeds_f = Propagation(
            embed_dim=self.prop_embed_dim,
            cost_group=self.cost_group,
            num_layers=self.num_prop_layers,
            mlp_ratio=self.mlp_ratio,
            context_dim=self.context_dim,
            split_size=self.split_size,
            n_heads=self.prop_n_heads,
            activation=self.activation,
            attn_drop=self.attn_drop,
            proj_drop=self.proj_drop,
            drop_path=self.drop_path,
            dropout=self.dropout,
            normalize_before=self.normalize_before,
            return_intermediate=False,
            dtype=self.dtype,
            use_pallas=self.use_pallas,
            spatial_axis=self.spatial_axis,
            remat=self.remat,
            name="propagation",
        )(flat, label_seeds, context, deterministic)
        # memory: [L, B, H, W, N, C]
        offsets = MLPBlock(self.prop_embed_dim, 1, 3, zero_init_last=True,
                           name="prop_head")(memory.astype(jnp.float32)).squeeze(-1)
        L = offsets.shape[0]
        offsets = offsets.reshape(L, B * H * W, self.num_proposals)
        labels = jax.nn.relu(offsets + seeds_f[None])
        return flat, prob, label_seeds, labels
