"""AOT export of the eval forward as a hermetic serialized artifact.

The reference deploys by shipping the python tree + a ``.pth`` file and
re-tracing torch modules at load time (``inference.py`` + ``nmrf/models``).
The TPU-native serving story is ahead-of-time: ``jax.export`` lowers the
jitted eval forward to versioned StableHLO once, and the resulting artifact
is loadable and callable WITHOUT the model code or config — only jax —
with the weights optionally baked in as constants.  One artifact per padded
input bucket (TPU wants static shapes; see ``TPU.EVAL_BUCKET``).

Contract of the exported callable (matches ``parallel.make_eval_step``):
``(img1, img2) -> {"disp": [B,H,W] f32, ...}`` with raw 0-255 RGB float
inputs of the exact exported shape — callers pad via
``data.frame_io.InputPadder`` exactly like ``inference.py:predict``.
"""

from __future__ import annotations

import json
import os
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import export as jax_export

MAGIC = "nmrf-tpu-exported-v1"


def export_eval(model, params, input_shape: Tuple[int, int, int, int],
                platforms: Sequence[str] = ("tpu",),
                freeze_params: bool = True):
    """Export the eval forward for ``input_shape`` = (B, H, W, 3).

    freeze_params=True bakes the weights into the artifact (hermetic,
    self-contained — the serving binary needs nothing else); False exports
    a ``(params, img1, img2)`` calling convention for weight hot-swap.
    Returns a ``jax.export.Exported``.
    """
    spec = jax.ShapeDtypeStruct(input_shape, jnp.float32)
    if freeze_params:
        fn = jax.jit(lambda a, b: model.apply(params, a, b, train=False))
        return jax_export.export(fn, platforms=list(platforms))(spec, spec)
    fn = jax.jit(lambda p, a, b: model.apply(p, a, b, train=False))
    pspec = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), params)
    return jax_export.export(fn, platforms=list(platforms))(pspec, spec, spec)


def save_exported(exported, path: str, *, extra_meta: Optional[dict] = None):
    """Serialize to ``path`` with a JSON sidecar (``path + '.json'``)."""
    blob = exported.serialize()
    with open(path, "wb") as f:
        f.write(blob)
    meta = {
        "magic": MAGIC,
        "platforms": list(exported.platforms),
        "in_avals": [str(a) for a in exported.in_avals],
        "calling_convention_version": exported.calling_convention_version,
        "jax_version": jax.__version__,
    }
    meta.update(extra_meta or {})
    with open(path + ".json", "w") as f:
        json.dump(meta, f, indent=2)
    return os.path.getsize(path)


def load_exported(path: str):
    """Deserialize an artifact; ``.call(...)`` runs it under jit."""
    with open(path, "rb") as f:
        return jax_export.deserialize(f.read())
