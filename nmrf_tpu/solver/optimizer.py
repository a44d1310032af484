"""Optimizer + LR schedule.

Behavioral parity targets:
  * param-group partition — reference ``build_optimizer`` (``main.py:186-244``):
      default(base_lr, wd) / sampling_offsets(lr*0.1) / norm params(wd_norm) /
      swin-backbone(lr*decay, backbone_wd) / swin rel-pos tables(lr*decay, wd 0)
      / NMP relative_position_enc_table(base lr, wd 0).
    NOTE the reference keys the backbone groups on "image_encoder.backbone"
    which only matches the swin (COMPAT=False) path — the resnet backbone
    lands in the default group.  Replicated exactly.
  * OneCycleLR cosine — reference ``main.py:383-391`` (torch defaults:
    div_factor 25, final_div_factor 1e4, pct_start 0.05).

Implemented as one optax.multi_transform over a path-derived label tree:
gradients are clipped globally first (reference clip_grad_norm_, main.py:425).
"""

import math
from typing import Any

import jax
import jax.numpy as jnp
import optax


def onecycle_cosine(max_lr, total_steps, pct_start=0.05,
                    div_factor=25.0, final_div_factor=1e4):
    """torch OneCycleLR(anneal_strategy='cos', cycle_momentum=False) parity."""
    initial_lr = max_lr / div_factor
    min_lr = initial_lr / final_div_factor
    up_end = float(pct_start * total_steps) - 1.0
    down_end = float(total_steps) - 1.0

    def _cos(start, end, pct):
        return end + (start - end) / 2.0 * (1.0 + jnp.cos(math.pi * pct))

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        pct_up = jnp.clip(step / jnp.maximum(up_end, 1e-8), 0.0, 1.0)
        pct_down = jnp.clip((step - up_end) / jnp.maximum(down_end - up_end, 1e-8),
                            0.0, 1.0)
        return jnp.where(step <= up_end,
                         _cos(initial_lr, max_lr, pct_up),
                         _cos(max_lr, min_lr, pct_down))

    return schedule


# group name -> (lr multiplier, weight-decay source key)
GROUPS = ("default", "offset", "norm", "backbone", "backbone_rpb", "rpe")


def label_params(params) -> Any:
    """Assign an optimizer-group label to every parameter by tree path."""

    def label(path, leaf):
        keys = [p.key for p in path if hasattr(p, "key")]
        joined = "/".join(keys)
        leaf_name = keys[-1] if keys else ""
        swin_backbone = joined.startswith("params/backbone/backbone") or \
            joined.startswith("backbone/backbone")
        if swin_backbone:
            if "relative_position_bias_table" in leaf_name:
                return "backbone_rpb"
            return "backbone"
        if "sampling_offsets" in joined:
            return "offset"
        if "relative_position_enc_table" in leaf_name:
            return "rpe"
        # norm-layer params: LayerNorm scale/bias (flax names)
        if len(keys) >= 2 and keys[-2].startswith("norm") and leaf_name in ("scale", "bias"):
            return "norm"
        return "default"

    return jax.tree_util.tree_map_with_path(label, params)


def build_optimizer(params, cfg):
    """Build the optax transform + schedule for logging."""
    base_lr = cfg.SOLVER.BASE_LR
    schedule = onecycle_cosine(base_lr, cfg.SOLVER.MAX_ITER + 100)

    wd = cfg.SOLVER.WEIGHT_DECAY
    group_spec = {
        "default": (1.0, wd),
        "offset": (0.1, wd),
        "norm": (1.0, cfg.SOLVER.WEIGHT_DECAY_NORM),
        "backbone": (cfg.SOLVER.BACKBONE_LR_DECAY, cfg.SOLVER.BACKBONE_WEIGHT_DECAY),
        "backbone_rpb": (cfg.SOLVER.BACKBONE_LR_DECAY, 0.0),
        "rpe": (1.0, 0.0),
    }

    def make_group(mult, group_wd):
        return optax.chain(
            optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),
            optax.add_decayed_weights(group_wd),
            optax.scale_by_schedule(lambda s: -mult * schedule(s)),
        )

    labels = label_params(params)
    tx = optax.chain(
        optax.clip_by_global_norm(cfg.SOLVER.GRAD_CLIP),
        optax.multi_transform(
            {k: make_group(*v) for k, v in group_spec.items()}, labels),
    )
    accum = getattr(cfg.SOLVER, "ACCUM_STEPS", 1)
    if accum > 1:
        # Gradient accumulation (beyond the reference): average grads over
        # ACCUM_STEPS microbatches, then apply the full chain (clip + AdamW
        # + schedule) once — exactly one big-batch update.  The schedule
        # advances per UPDATE, so MAX_ITER stays in loader steps while the
        # LR trajectory stretches by ACCUM_STEPS.
        tx = optax.MultiSteps(tx, every_k_schedule=accum)
    return tx, schedule
