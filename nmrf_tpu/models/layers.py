"""Common neural-net primitives shared across the NMRF model family.

These re-implement (tpu-first, flax.linen, channel-last) the torch/timm
primitives the reference uses pervasively: ``timm.Mlp``, ``DropPath``,
``nn.InstanceNorm2d`` (affine-free), reference ``MLP`` (``NMP.py:54-66``),
and the Conv-IN-ReLU-Conv projection stacks (``NMRF.py:56-65``).

Numerical-parity notes (SURVEY.md §7.3 hard part #1):
  * LayerNorm eps = 1e-5 (torch default; flax default is 1e-6).
  * GELU is the exact erf form (torch default; flax default is tanh approx).
  * InstanceNorm2d: torch default affine=False, eps=1e-5, stats over (H, W).
  * Linear init: trunc_normal(std=0.02) + zero bias (reference _init_weights).
  * Conv init: kaiming_normal fan_out relu => variance_scaling(2, fan_out).
"""

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

# torch-parity initializers
trunc_normal_init = nn.initializers.truncated_normal(stddev=0.02, lower=-2.0, upper=2.0)


def kaiming_normal_out(key, shape, dtype=jnp.float32):
    """torch kaiming_normal_(mode='fan_out', nonlinearity='relu') for HWIO convs."""
    fan_out = shape[0] * shape[1] * shape[3] if len(shape) == 4 else shape[-1]
    std = (2.0 / fan_out) ** 0.5
    return jax.random.normal(key, shape, dtype) * std


_GELU_APPROXIMATE = False


def set_gelu_approximate(enabled: bool):
    """Deployment knob (``TPU.GELU_APPROX``): lower GELU to the tanh
    approximation INSIDE bf16 compute only.  The reference uses exact
    erf-GELU (torch nn.GELU default) — the f32 parity path always keeps it;
    the tanh form differs by <~1e-3 relative, far inside the bf16 path's
    own rounding.  Trace-time global set by ``build_model`` before any
    tracing (each jit trace reads the then-current value)."""
    global _GELU_APPROXIMATE
    _GELU_APPROXIMATE = bool(enabled)


def gelu_exact(x):
    if _GELU_APPROXIMATE and x.dtype == jnp.bfloat16:
        return jax.nn.gelu(x, approximate=True)
    return jax.nn.gelu(x, approximate=False)


def get_activation(name: str) -> Callable:
    if name == "relu":
        return jax.nn.relu
    if name == "gelu":
        return gelu_exact
    if name == "glu":
        return jax.nn.glu
    raise RuntimeError(f"activation should be relu/gelu/glu, not {name}.")


def instance_norm_2d(x, eps=1e-5):
    """Affine-free instance norm over spatial dims. x: [B, H, W, C].
    Accepts any float dtype; moments and normalization compute in f32
    (returns f32 — callers cast back to the compute dtype).

    Single-pass moments (E[x^2] - E[x]^2): mean and variance become two
    independent reductions XLA emits as ONE fusion over x, instead of the
    serialized mean -> centered-square passes of ``jnp.var`` — at 1/2-res
    backbone shapes the extra full-tensor read cost ~0.7 ms/frame per norm.
    f32 accumulation over >=10^4 spatial elements keeps cancellation error
    well inside the torch-golden parity tolerance.

    bf16 inputs must NOT be pre-upcast by the caller: a shared
    ``x.astype(f32)`` feeding both the moments and the normalize gets
    materialized by XLA as a full-resolution f32 copy (profiled ~0.5
    ms/frame at the ConvStem's 1/2-res shapes).  Here each consumer upcasts
    lazily — the reduction via its accumulation dtype, the square via a
    single-consumer convert, the normalize via bf16-f32 promotion inside
    its own fusion — so no f32 activation is ever materialized."""
    f32 = jnp.float32
    n = x.shape[1] * x.shape[2]
    s1 = jnp.sum(x, axis=(1, 2), keepdims=True, dtype=f32)
    xf = x.astype(f32)
    s2 = jnp.sum(xf * xf, axis=(1, 2), keepdims=True)
    mean = s1 / n
    var = jnp.maximum(s2 / n - mean * mean, 0.0)
    return (x - mean) * jax.lax.rsqrt(var + eps)


class LayerNorm(nn.LayerNorm):
    """LayerNorm with torch-default eps."""

    epsilon: float = 1e-5


class Dense(nn.Dense):
    """Linear with reference init: trunc_normal(0.02) weight, zero bias."""

    kernel_init: Any = trunc_normal_init
    bias_init: Any = nn.initializers.zeros


class Conv(nn.Conv):
    """Conv with reference init: kaiming_normal fan_out (relu)."""

    kernel_init: Any = kaiming_normal_out
    bias_init: Any = nn.initializers.zeros


class DropPath(nn.Module):
    """Per-sample stochastic depth (timm DropPath parity).

    ``rate`` may be a static float or (under nn.scan layer stacks) a traced
    scalar passed at call time.
    """

    rate: float = 0.0
    deterministic: Optional[bool] = None

    @nn.compact
    def __call__(self, x, deterministic: Optional[bool] = None, rate=None):
        deterministic = nn.merge_param("deterministic", self.deterministic, deterministic)
        rate = self.rate if rate is None else rate
        if deterministic or (isinstance(rate, float) and rate == 0.0):
            return x
        keep = 1.0 - rate
        # Prefer a dedicated stream: under spatial sharding the "dropout"
        # stream is folded per H-tile (parallel/mesh.py), which must NOT
        # split a sample's stochastic-depth decision across tiles.
        rng = (self.make_rng("drop_path") if self.has_rng("drop_path")
               else self.make_rng("dropout"))
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, shape)
        return jnp.where(mask, x / keep, 0.0)


class Mlp(nn.Module):
    """timm-style MLP: fc1 -> act -> drop -> fc2 -> drop."""

    hidden_features: int
    out_features: int
    act: Callable = gelu_exact
    drop: float = 0.0
    dtype: Any = None  # computation dtype (None = promote inputs)

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x = Dense(self.hidden_features, dtype=self.dtype, name="fc1")(x)
        x = self.act(x)
        x = nn.Dropout(self.drop, deterministic=deterministic)(x)
        x = Dense(self.out_features, dtype=self.dtype, name="fc2")(x)
        x = nn.Dropout(self.drop, deterministic=deterministic)(x)
        return x


class MLPBlock(nn.Module):
    """Reference plain MLP (``NMP.py:54-66``): n Linear layers, ReLU between."""

    hidden_dim: int
    output_dim: int
    num_layers: int
    # zero-init the final layer (used by DPN.prop_head, reference DPN.py:68-69)
    zero_init_last: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        dims = [self.hidden_dim] * (self.num_layers - 1) + [self.output_dim]
        for i, d in enumerate(dims):
            last = i == self.num_layers - 1
            init = nn.initializers.zeros if (last and self.zero_init_last) else trunc_normal_init
            x = Dense(d, kernel_init=init, dtype=self.dtype, name=f"layers_{i}")(x)
            if not last:
                x = jax.nn.relu(x)
        return x


class ConvINReluConv(nn.Module):
    """Conv3x3(no bias) -> InstanceNorm -> ReLU -> Conv1x1(no bias).

    The projection stack used for concatconv/gw/context (``NMRF.py:56-65``,
    ``DPN.py:45-49``).  Instance-norm statistics stay in float32.

    spatial_axis: mesh axis name when running H-sharded under shard_map —
    the 3x3 conv exchanges a 1-row halo between neighbor tiles (zero-filled
    at global edges, matching 'same' zero padding) and the instance-norm
    statistics are pmean'd to the global spatial extent.
    """

    mid_channels: int
    out_channels: int
    dtype: Any = None
    spatial_axis: Any = None

    @nn.compact
    def __call__(self, x):
        if self.spatial_axis is not None:
            from ..parallel.spatial import halo_exchange_h, instance_norm_2d_sharded

            x = halo_exchange_h(x, 1, self.spatial_axis, h_axis=1)
            x = Conv(self.mid_channels, (3, 3), padding=((0, 0), (1, 1)),
                     use_bias=False, dtype=self.dtype, name="conv1")(x)
            x = instance_norm_2d_sharded(x, self.spatial_axis)
        else:
            x = Conv(self.mid_channels, (3, 3), padding=1, use_bias=False,
                     dtype=self.dtype, name="conv1")(x)
            x = instance_norm_2d(x)  # lazy f32 upcast (see its docstring)
        if self.dtype is not None:
            x = x.astype(self.dtype)
        x = jax.nn.relu(x)
        x = Conv(self.out_channels, (1, 1), use_bias=False, dtype=self.dtype,
                 name="conv2")(x)
        return x
