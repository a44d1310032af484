"""Checkpointing: orbax-backed train-state save/restore + torch->JAX converter.

The converter maps reference .pth state dicts (``sceneflow.pth``/``kitti.pth``,
reference ``main.py:352-372`` format) onto this framework's flax param tree so
released checkpoints can be evaluated for numerical parity (SURVEY.md §6).

Weight layout transforms:
  * Linear  [out, in]        -> kernel [in, out]
  * Conv2d  [out, in, kh, kw]-> kernel [kh, kw, in, out]  (HWIO)
  * Conv1d  [out, in, k]     -> kernel [k, in, out]
  * depthwise Conv2d [dim,1,3,3] -> [3, 3, 1, dim]
  * LayerNorm weight -> scale
"""

import os
import re
from typing import Any, Dict

import numpy as np


def _set(tree: Dict, path, value):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def _linear(v):
    return np.ascontiguousarray(np.asarray(v).T)


def _conv2d(v):
    return np.ascontiguousarray(np.asarray(v).transpose(2, 3, 1, 0))


def _conv1d(v):
    return np.ascontiguousarray(np.asarray(v).transpose(2, 1, 0))


# (regex over torch key prefix, path template, kind)
# kind: linear | conv2d | conv1d | depthwise | raw | norm
_RULES = [
    # backbone (resnet, compat=True => torch prefix "backbone.")
    (r"backbone\.conv1\.(weight)", "backbone/conv1/kernel", "conv2d"),
    (r"backbone\.conv2\.(weight)", "backbone/conv2/kernel", "conv2d"),
    (r"backbone\.conv2\.(bias)", "backbone/conv2/bias", "raw"),
    (r"backbone\.layer(\d)\.(\d)\.conv(\d)\.weight",
     "backbone/layer{0}_{1}/conv{2}/kernel", "conv2d"),
    (r"backbone\.layer(\d)\.(\d)\.downsample\.0\.weight",
     "backbone/layer{0}_{1}/downsample/kernel", "conv2d"),
    (r"backbone\.layer(\d)\.(\d)\.downsample\.0\.bias",
     "backbone/layer{0}_{1}/downsample/bias", "raw"),
    # projection stacks: Sequential idx 0 -> conv1, idx 3 -> conv2
    (r"(concatconv|gw)\.0\.weight", "{0}/conv1/kernel", "conv2d"),
    (r"(concatconv|gw)\.3\.weight", "{0}/conv2/kernel", "conv2d"),
    (r"dpn\.proj\.0\.weight", "dpn/proj/conv1/kernel", "conv2d"),
    (r"dpn\.proj\.3\.weight", "dpn/proj/conv2/kernel", "conv2d"),
    # DPN conv1d stack
    (r"dpn\.mlp\.(\d)\.weight", "dpn/mlp_{0}/kernel", "conv1d"),
    (r"dpn\.mlp\.(\d)\.bias", "dpn/mlp_{0}/bias", "raw"),
    # Propagation embed
    (r"dpn\.propagation\.cost_encoder\.(\d)\.weight",
     "dpn/propagation/cost_encoder_{0}/kernel", "linear"),
    (r"dpn\.propagation\.cost_encoder\.(\d)\.bias",
     "dpn/propagation/cost_encoder_{0}/bias", "raw"),
    (r"dpn\.propagation\.proj\.weight", "dpn/propagation/proj/kernel", "linear"),
    (r"dpn\.propagation\.norm\.(weight)", "dpn/propagation/norm/scale", "raw"),
    (r"dpn\.propagation\.norm\.(bias)", "dpn/propagation/norm/bias", "raw"),
    # Propagation CSWin layers
    (r"dpn\.propagation\.layers\.(\d+)\.nmp\.(q|k|v|proj)\.weight",
     "dpn/propagation/layers_{0}/nmp/{1}/kernel", "linear"),
    (r"dpn\.propagation\.layers\.(\d+)\.nmp\.(q|k|v|proj)\.bias",
     "dpn/propagation/layers_{0}/nmp/{1}/bias", "raw"),
    (r"dpn\.propagation\.layers\.(\d+)\.nmp\.norm(\d)\.weight",
     "dpn/propagation/layers_{0}/nmp/norm{1}/scale", "raw"),
    (r"dpn\.propagation\.layers\.(\d+)\.nmp\.norm(\d)\.bias",
     "dpn/propagation/layers_{0}/nmp/norm{1}/bias", "raw"),
    (r"dpn\.propagation\.layers\.(\d+)\.nmp\.attns\.(\d)\.get_v\.weight",
     "dpn/propagation/layers_{0}/nmp/attns_{1}/get_v_kernel", "depthwise"),
    (r"dpn\.propagation\.layers\.(\d+)\.nmp\.mlp\.fc(\d)\.weight",
     "dpn/propagation/layers_{0}/nmp/mlp/fc{1}/kernel", "linear"),
    (r"dpn\.propagation\.layers\.(\d+)\.nmp\.mlp\.fc(\d)\.bias",
     "dpn/propagation/layers_{0}/nmp/mlp/fc{1}/bias", "raw"),
    # DPN head
    (r"dpn\.prop_head\.layers\.(\d)\.weight", "dpn/prop_head/layers_{0}/kernel", "linear"),
    (r"dpn\.prop_head\.layers\.(\d)\.bias", "dpn/prop_head/layers_{0}/bias", "raw"),
    # Inference/Refinement stage shared
    (r"(inference|refinement)\.ffn\.fc(\d)\.weight", "{0}/ffn/fc{1}/kernel", "linear"),
    (r"(inference|refinement)\.ffn\.fc(\d)\.bias", "{0}/ffn/fc{1}/bias", "raw"),
    (r"(inference|refinement)\.norm\.weight", "{0}/norm/scale", "raw"),
    (r"(inference|refinement)\.norm\.bias", "{0}/norm/bias", "raw"),
    # InferenceLayer self_nmp
    (r"inference\.layers\.(\d+)\.self_nmp\.(q|k|v|proj)\.weight",
     "inference/layers_{0}/self_nmp/{1}/kernel", "linear"),
    (r"inference\.layers\.(\d+)\.self_nmp\.(q|k|v|proj)\.bias",
     "inference/layers_{0}/self_nmp/{1}/bias", "raw"),
    (r"inference\.layers\.(\d+)\.self_nmp\.norm1\.weight",
     "inference/layers_{0}/self_nmp/norm1/scale", "raw"),
    (r"inference\.layers\.(\d+)\.self_nmp\.norm1\.bias",
     "inference/layers_{0}/self_nmp/norm1/bias", "raw"),
    # Swin NMP blocks (both stages)
    (r"(inference|refinement)\.layers\.(\d+)\.nmp\.qkv\.weight",
     "{0}/layers_{1}/nmp/qkv/kernel", "linear"),
    (r"(inference|refinement)\.layers\.(\d+)\.nmp\.qkv\.bias",
     "{0}/layers_{1}/nmp/qkv/bias", "raw"),
    (r"(inference|refinement)\.layers\.(\d+)\.nmp\.proj\.weight",
     "{0}/layers_{1}/nmp/proj/kernel", "linear"),
    (r"(inference|refinement)\.layers\.(\d+)\.nmp\.proj\.bias",
     "{0}/layers_{1}/nmp/proj/bias", "raw"),
    (r"(inference|refinement)\.layers\.(\d+)\.nmp\.norm(\d)\.weight",
     "{0}/layers_{1}/nmp/norm{2}/scale", "raw"),
    (r"(inference|refinement)\.layers\.(\d+)\.nmp\.norm(\d)\.bias",
     "{0}/layers_{1}/nmp/norm{2}/bias", "raw"),
    (r"(inference|refinement)\.layers\.(\d+)\.nmp\.attn\.relative_position_enc_table",
     "{0}/layers_{1}/nmp/attn/relative_position_enc_table", "raw"),
    (r"(inference|refinement)\.layers\.(\d+)\.nmp\.mlp\.fc(\d)\.weight",
     "{0}/layers_{1}/nmp/mlp/fc{2}/kernel", "linear"),
    (r"(inference|refinement)\.layers\.(\d+)\.nmp\.mlp\.fc(\d)\.bias",
     "{0}/layers_{1}/nmp/mlp/fc{2}/bias", "raw"),
    # heads
    (r"(infer_head|refine_head)\.layers\.(\d)\.weight",
     "{0}/layers_{1}/kernel", "linear"),
    (r"(infer_head|refine_head)\.layers\.(\d)\.bias", "{0}/layers_{1}/bias", "raw"),
    (r"infer_score_head\.weight", "infer_score_head/kernel", "linear"),
    (r"infer_score_head\.bias", "infer_score_head/bias", "raw"),
]

_TRANSFORM = {"linear": _linear, "conv2d": _conv2d, "conv1d": _conv1d,
              "depthwise": _conv2d, "raw": np.asarray}

_SKIP = re.compile(
    r"(relative_position_index|attn_mask|device_indicator_tensor|"
    r"num_batches_tracked|\.mean$|\.std$)")


_LAYER_COMPONENT = re.compile(r"^layers_(\d+)$")


def _stack_scanned_layers(tree: Dict) -> Dict:
    """Fold ``layers_<i>`` siblings into one ``layers`` subtree with leaves
    stacked on a leading axis — the nn.scan parameter layout used by the
    Propagation/Inference/Refinement stacks.

    Only components named exactly ``layers_<i>`` are folded (resnet
    ``layer1_0`` and swin ``layers_0_blocks_1`` names are untouched);
    ``MLPBlock``'s ``layers_<i>`` Dense children are heterogeneous
    (per-layer shapes may differ) and are left unrolled — detected by
    shape mismatch."""
    out = {}
    groups: Dict[int, Dict] = {}
    for k, v in tree.items():
        v = _stack_scanned_layers(v) if isinstance(v, dict) else v
        m = _LAYER_COMPONENT.match(k)
        if m:
            groups[int(m.group(1))] = v
        else:
            out[k] = v
    if groups:
        items = [groups[i] for i in sorted(groups)]
        leaves0 = jax_tree_leaves_with_shape(items[0])
        homogeneous = all(
            jax_tree_leaves_with_shape(it) == leaves0 for it in items[1:])
        if homogeneous and isinstance(items[0], dict) and len(items) > 1:
            # nn.scan layout: <stage>/layers/layer/<module>/... with leaves
            # stacked on axis 0 (the scan body names its inner module "layer")
            out["layers"] = {"layer": _tree_stack(items)}
        else:
            for i in sorted(groups):
                out[f"layers_{i}"] = groups[i]
    return out


def jax_tree_leaves_with_shape(tree):
    if isinstance(tree, dict):
        return sorted((k, jax_tree_leaves_with_shape(v)) for k, v in tree.items())
    return np.asarray(tree).shape


def _tree_stack(items):
    if isinstance(items[0], dict):
        return {k: _tree_stack([it[k] for it in items]) for k in items[0]}
    return np.stack([np.asarray(it) for it in items])


def convert_torch_state_dict(state_dict: Dict[str, Any], scanned: bool = True):
    """Convert a reference .pth state dict to a flax params dict.

    scanned: stack per-layer NMP weights for the nn.scan layer layout
    (the framework's native layout).  Returns (params_dict, unmatched_keys).
    """
    params: Dict[str, Any] = {}
    unmatched = []
    for key, value in state_dict.items():
        # COMPAT=False checkpoints name the backbone "image_encoder"
        # (reference NMRF.py:107-111); normalize to the compat prefix.
        if key.startswith("image_encoder."):
            key = "backbone." + key[len("image_encoder."):]
        if _SKIP.search(key):
            continue
        v = value.numpy() if hasattr(value, "numpy") else np.asarray(value)
        for pattern, template, kind in _RULES:
            m = re.fullmatch(pattern, key)
            if m:
                path = template.format(*m.groups()).split("/")
                _set(params, path, _TRANSFORM[kind](v))
                break
        else:
            unmatched.append(key)
    if scanned:
        # fold stage layer stacks; MLPBlock heads keep their layers_<i> names
        for stage in ("inference", "refinement"):
            if stage in params and any(_LAYER_COMPONENT.match(k) for k in params[stage]):
                params[stage] = _stack_scanned_layers(params[stage])
        prop = params.get("dpn", {}).get("propagation", {})
        if any(_LAYER_COMPONENT.match(k) for k in prop):
            params["dpn"]["propagation"] = _stack_scanned_layers(prop)
    return {"params": params}, unmatched


def load_torch_checkpoint(path: str):
    """Load a reference .pth and convert (requires torch, CPU)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    weights = ckpt.get("model", ckpt)
    return convert_torch_state_dict(weights)


# ---- pretrained Swin ingestion (reference backbone.py:161-196) ---- #

_SWIN_SKIP = re.compile(r"(attn_mask|relative_position_index)")
_SWIN_RULES = [
    (r"patch_embed\.proj\.weight", "patch_embed_proj/kernel", "conv2d"),
    (r"patch_embed\.proj\.bias", "patch_embed_proj/bias", "raw"),
    (r"patch_embed\.norm\.weight", "patch_embed_norm/scale", "raw"),
    (r"patch_embed\.norm\.bias", "patch_embed_norm/bias", "raw"),
    (r"layers\.(\d)\.blocks\.(\d+)\.norm(\d)\.weight",
     "layers_{0}_blocks_{1}/norm{2}/scale", "raw"),
    (r"layers\.(\d)\.blocks\.(\d+)\.norm(\d)\.bias",
     "layers_{0}_blocks_{1}/norm{2}/bias", "raw"),
    (r"layers\.(\d)\.blocks\.(\d+)\.attn\.qkv\.weight",
     "layers_{0}_blocks_{1}/attn/qkv/kernel", "linear"),
    (r"layers\.(\d)\.blocks\.(\d+)\.attn\.qkv\.bias",
     "layers_{0}_blocks_{1}/attn/qkv/bias", "raw"),
    (r"layers\.(\d)\.blocks\.(\d+)\.attn\.proj\.weight",
     "layers_{0}_blocks_{1}/attn/proj/kernel", "linear"),
    (r"layers\.(\d)\.blocks\.(\d+)\.attn\.proj\.bias",
     "layers_{0}_blocks_{1}/attn/proj/bias", "raw"),
    (r"layers\.(\d)\.blocks\.(\d+)\.attn\.relative_position_bias_table",
     "layers_{0}_blocks_{1}/attn/relative_position_bias_table", "raw"),
    (r"layers\.(\d)\.blocks\.(\d+)\.mlp\.fc(\d)\.weight",
     "layers_{0}_blocks_{1}/mlp/fc{2}/kernel", "linear"),
    (r"layers\.(\d)\.blocks\.(\d+)\.mlp\.fc(\d)\.bias",
     "layers_{0}_blocks_{1}/mlp/fc{2}/bias", "raw"),
    (r"layers\.(\d)\.downsample\.norm\.weight",
     "layers_{0}_downsample/norm/scale", "raw"),
    (r"layers\.(\d)\.downsample\.norm\.bias",
     "layers_{0}_downsample/norm/bias", "raw"),
    (r"layers\.(\d)\.downsample\.reduction\.weight",
     "layers_{0}_downsample/reduction/kernel", "linear"),
]


# ---- swin-NMRF (SwinAdaptor backbone) rules ---- #
# Reference: nmrf/models/backbone.py:101-158 (SwinAdaptor = SwinTransformer +
# DeformNeck), adaptor_modules.py:108-188 (ConvStem Sequential conv indices
# 0/3/6, fcs = [LayerNorm, Linear], Extractor norms + MSDeformAttn + ConvFFN),
# ops/modules/ms_deform_attn.py:28-130 (proj layers).  The inner swin tree
# reuses _SWIN_RULES with the adaptor prefix.
_ADAPTOR_RULES = [
    (r"backbone\.neck\.stem\.stem\.0\.weight",
     "backbone/neck/stem/stem_0/kernel", "conv2d"),
    (r"backbone\.neck\.stem\.stem\.3\.weight",
     "backbone/neck/stem/stem_1/kernel", "conv2d"),
    (r"backbone\.neck\.stem\.stem\.6\.weight",
     "backbone/neck/stem/stem_2/kernel", "conv2d"),
    (r"backbone\.neck\.stem\.fc\.weight", "backbone/neck/stem/fc/kernel", "conv2d"),
    (r"backbone\.neck\.stem\.fc\.bias", "backbone/neck/stem/fc/bias", "raw"),
    (r"backbone\.neck\.fcs\.(\d)\.0\.weight",
     "backbone/neck/fcs_{0}_norm/scale", "raw"),
    (r"backbone\.neck\.fcs\.(\d)\.0\.bias",
     "backbone/neck/fcs_{0}_norm/bias", "raw"),
    (r"backbone\.neck\.fcs\.(\d)\.1\.weight",
     "backbone/neck/fcs_{0}_linear/kernel", "linear"),
    (r"backbone\.neck\.fcs\.(\d)\.1\.bias",
     "backbone/neck/fcs_{0}_linear/bias", "raw"),
    (r"backbone\.neck\.extractors\.(\d)\.(query_norm|feat_norm|ffn_norm)\.weight",
     "backbone/neck/extractors_{0}/{1}/scale", "raw"),
    (r"backbone\.neck\.extractors\.(\d)\.(query_norm|feat_norm|ffn_norm)\.bias",
     "backbone/neck/extractors_{0}/{1}/bias", "raw"),
    (r"backbone\.neck\.extractors\.(\d)\.attn\."
     r"(value_proj|sampling_offsets|attention_weights|output_proj)\.weight",
     "backbone/neck/extractors_{0}/attn/{1}/kernel", "linear"),
    (r"backbone\.neck\.extractors\.(\d)\.attn\."
     r"(value_proj|sampling_offsets|attention_weights|output_proj)\.bias",
     "backbone/neck/extractors_{0}/attn/{1}/bias", "raw"),
    (r"backbone\.neck\.extractors\.(\d)\.ffn\.fc(\d)\.weight",
     "backbone/neck/extractors_{0}/ffn/fc{1}/kernel", "linear"),
    (r"backbone\.neck\.extractors\.(\d)\.ffn\.fc(\d)\.bias",
     "backbone/neck/extractors_{0}/ffn/fc{1}/bias", "raw"),
    (r"backbone\.neck\.extractors\.(\d)\.ffn\.dwconv\.dwconv\.weight",
     "backbone/neck/extractors_{0}/ffn/dwconv_kernel", "depthwise"),
    (r"backbone\.neck\.extractors\.(\d)\.ffn\.dwconv\.dwconv\.bias",
     "backbone/neck/extractors_{0}/ffn/dwconv_bias", "raw"),
]


_RULES.extend(_ADAPTOR_RULES)
# inner SwinTransformer under the adaptor: same key families as a standalone
# pretrained swin checkpoint, prefixed (reference SwinAdaptor.backbone)
_RULES.extend((r"backbone\.backbone\." + pat, "backbone/backbone/" + tmpl, kind)
              for pat, tmpl, kind in _SWIN_RULES)


def convert_swin_state_dict(state_dict: Dict[str, Any]):
    """Convert a torch Swin-T checkpoint (e.g. swin_tiny_patch4_window7_224)
    to the flax param subtree of ``models.swin.SwinTransformer``.

    Applies the reference's ``checkpoint_filter_fn`` semantics
    (backbone.py:161-173): drops attn_mask/index buffers and top-level
    ``norm.*`` / ``head.*`` classifier weights.  Returns (subtree, unmatched).
    """
    state_dict = state_dict.get("model", state_dict)
    state_dict = state_dict.get("state_dict", state_dict)
    out: Dict[str, Any] = {}
    unmatched = []
    for key, value in state_dict.items():
        if _SWIN_SKIP.search(key) or key.startswith(("norm", "head")):
            continue
        v = value.numpy() if hasattr(value, "numpy") else np.asarray(value)
        for pattern, template, kind in _SWIN_RULES:
            m = re.fullmatch(pattern, key)
            if m:
                _set(out, template.format(*m.groups()).split("/"), _TRANSFORM[kind](v))
                break
        else:
            unmatched.append(key)
    return out, unmatched


def load_pretrained_swin(params, weight_path: str):
    """Merge a pretrained torch Swin checkpoint into model params
    (params['params']['backbone']['backbone'], the SwinAdaptor's inner
    SwinTransformer — reference create_backbone, backbone.py:186-196)."""
    import torch

    ckpt = torch.load(weight_path, map_location="cpu", weights_only=False)
    subtree, unmatched = convert_swin_state_dict(ckpt)
    if unmatched:
        raise ValueError(f"unmatched swin keys: {unmatched[:8]}")
    import jax

    params = jax.tree_util.tree_map(lambda x: x, params)  # shallow copy
    target = params["params"]["backbone"]["backbone"]

    def merge(dst, src, path=""):
        for k, v in src.items():
            assert k in dst, f"swin param {path}/{k} missing in model"
            if isinstance(v, dict):
                merge(dst[k], v, f"{path}/{k}")
            else:
                assert tuple(dst[k].shape) == tuple(np.asarray(v).shape), \
                    (path + "/" + k, dst[k].shape, np.asarray(v).shape)
                dst[k] = np.asarray(v)

    merge(target, subtree)
    return params


# ---- orbax-backed native checkpointing ---- #

def save_checkpoint(ckpt_dir: str, step: int, state, keep_latest: bool = True):
    """Save train state (params/opt_state/step) with orbax.

    Arrays are pulled to host first so the checkpoint is topology-free:
    orbax otherwise records the device sharding and refuses to restore
    under a different device count (train on a pod -> eval on one chip,
    or the multi-host smoke tests here)."""
    import jax
    import orbax.checkpoint as ocp

    path = os.path.abspath(os.path.join(ckpt_dir, f"step_{step:08d}"))
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, jax.device_get(state), force=True)
    ckptr.wait_until_finished()
    if keep_latest:
        latest = os.path.join(ckpt_dir, "latest.txt")
        with open(latest, "w") as f:
            f.write(str(step))
    return path


def prune_stale_latest(ckpt_dir: str, keep_step: int, periodic_every: int):
    """Delete ``step_*`` checkpoints that were only ever "latest" saves.

    The reference overwrites one ``checkpoint_latest.pth`` every
    ``LATEST_CHECKPOINT_PERIOD`` (main.py:449) and keeps full snapshots only
    every ``CHECKPOINT_PERIOD``; orbax paths are per-step directories, so we
    match that retention by removing step dirs that are neither the newest
    save nor a CHECKPOINT_PERIOD multiple (a 300k-step run would otherwise
    keep ~300 full train states)."""
    import re
    import shutil

    for name in os.listdir(ckpt_dir) if os.path.isdir(ckpt_dir) else []:
        m = re.fullmatch(r"step_(\d{8})", name)
        if not m:
            continue
        step = int(m.group(1))
        if step != keep_step and (periodic_every <= 0
                                  or step % periodic_every != 0):
            shutil.rmtree(os.path.join(ckpt_dir, name), ignore_errors=True)


def restore_checkpoint(ckpt_dir: str, abstract_state=None, step: int = None):
    """Restore a train state saved by ``save_checkpoint``.

    abstract_state: the full {"params", "opt_state", "step"} tree (shapes /
    ShapeDtypeStructs) for sharded/typed restore, or None to restore the
    raw saved tree as host numpy (e.g. params-only consumers like
    ``inference.py``)."""
    import orbax.checkpoint as ocp

    if step is None:
        with open(os.path.join(ckpt_dir, "latest.txt")) as f:
            step = int(f.read().strip())
    path = os.path.abspath(os.path.join(ckpt_dir, f"step_{step:08d}"))
    ckptr = ocp.StandardCheckpointer()
    if abstract_state is None:
        return ckptr.restore(path), step
    return ckptr.restore(path, abstract_state), step
