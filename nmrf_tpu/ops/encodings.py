"""Fourier positional / coordinate encodings.

Behavioral parity targets: reference ``nmrf/models/NMP.py:11-51``
(``fourier_grid_embed``, ``fourier_coord_embed``).
"""

import math

import jax.numpy as jnp


def fourier_coord_embed(coord, n_freqs, normalizer=3.14 / 512, logscale=True):
    """Fourier-encode coordinates.

    Args:
      coord: [..., D] coordinates.
      n_freqs: number of frequency bands.
      normalizer: coordinate scale applied before encoding.
    Returns:
      [..., D*(2*n_freqs+1)] embedding, per-coordinate layout
      [sin(f1 x)..sin(fN x), cos(f1 x)..cos(fN x), x].
    """
    if logscale:
        freq_bands = 2.0 ** jnp.linspace(0.0, n_freqs - 1, n_freqs, dtype=coord.dtype)
    else:
        freq_bands = jnp.linspace(1.0, 2.0 ** (n_freqs - 1), n_freqs, dtype=coord.dtype)
    scaled = coord[..., None] * normalizer  # [..., D, 1]
    f = scaled * freq_bands  # [..., D, n_freqs]
    embed = jnp.concatenate([jnp.sin(f), jnp.cos(f), scaled], axis=-1)  # [..., D, 2N+1]
    return embed.reshape(*coord.shape[:-1], coord.shape[-1] * (2 * n_freqs + 1))


def fourier_grid_embed(shape, embed_dim, dtype=jnp.float32):
    """2D (or nD) sin/cos grid embedding.

    Unlike the reference (which takes a data tensor), this takes the spatial
    ``shape`` tuple directly — the embedding depends only on shape/dtype and is
    constant-folded by XLA at trace time.

    Args:
      shape: spatial dims, e.g. (H, W).
      embed_dim: total embedding dim; must be divisible by 2*len(shape).
    Returns:
      [*shape, embed_dim] embedding (no batch dim; broadcast by caller).
    """
    n_axes = len(shape)
    assert embed_dim % (2 * n_axes) == 0, (embed_dim, shape)
    num_bands = embed_dim // (2 * n_axes)
    axis_pos = [jnp.linspace(-1.0, 1.0, s, dtype=dtype) for s in shape]
    pos = jnp.stack(jnp.meshgrid(*axis_pos, indexing="ij"), axis=-1)  # [*shape, n_axes]
    freq_bands = jnp.linspace(1.0, num_bands, num_bands, dtype=dtype)
    emb = pos[..., None] * freq_bands * math.pi  # [*shape, n_axes, bands]
    emb = jnp.concatenate([jnp.sin(emb), jnp.cos(emb)], axis=-1)  # [*shape, n_axes, 2*bands]
    return emb.reshape(*shape, embed_dim)
