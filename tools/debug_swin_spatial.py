"""Bisect the swin spatial-sharding divergence (VERDICT r2 weak #1).

Compares, on the 8-virtual-device CPU mesh:
  stage A: extract_feature under GSPMD (H-sharded inputs) vs unsharded
  stage B: decode via shard_map fed with the SAME unsharded features
to localize whether the 0.033 px disp divergence comes from the GSPMD
backbone region or the shard_map decode region.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
jax.config.update("jax_default_matmul_precision", "highest")
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache_cpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from nmrf_tpu.config import get_cfg
from nmrf_tpu.models import build_model
from nmrf_tpu.parallel import make_mesh, spatial_sharded_apply
from nmrf_tpu.parallel.mesh import SPATIAL_AXIS, _decode_out_specs, _unspatial

DATA, SPATIAL = 2, 4
B, H, W = 2, 192, 96

cfg = get_cfg()
cfg.BACKBONE.MODEL_TYPE = "swin"
cfg.BACKBONE.OUT_CHANNELS = 128
cfg.BACKBONE.COMPAT = False
cfg.DATASETS.DIVIS_BY = 32
cfg.DPN.MAX_DISP = 64
cfg.TPU.MSDA_TAP_RADIUS = 2
cfg.freeze()
model, _ = build_model(cfg)
model_sp, _ = build_model(cfg, spatial_axis="spatial")
rng = np.random.RandomState(1)
img1 = jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32) * 255)
img2 = jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32) * 255)
params = jax.jit(
    lambda r: model.init(r, img1[:1], img2[:1], train=False))(
    jax.random.PRNGKey(0))
mesh = make_mesh(DATA, SPATIAL)

# ---- stage A: backbone under GSPMD ----
ref_feats = jax.jit(lambda p, a, b: model.apply(
    p, a, b, True, method="extract_feature"))(params, img1, img2)


def gspmd_feats(p, a, b):
    fspec = NamedSharding(mesh, P("data", SPATIAL_AXIS))
    a = jax.lax.with_sharding_constraint(a, fspec)
    b = jax.lax.with_sharding_constraint(b, fspec)
    f1, f2 = model_sp.apply(p, a, b, True, method="extract_feature")
    f1 = [jax.lax.with_sharding_constraint(f, fspec) for f in f1]
    f2 = [jax.lax.with_sharding_constraint(f, fspec) for f in f2]
    return f1, f2


sp_feats = jax.jit(gspmd_feats)(params, img1, img2)
for i in range(2):
    for j in range(2):
        r = np.asarray(ref_feats[i][j])
        g = np.asarray(sp_feats[i][j])
        err = np.abs(r - g).max()
        rel = err / (np.abs(r).max() + 1e-9)
        print(f"stage A feats[{i}][{j}]: max|d|={err:.3e} rel={rel:.3e}")

# ---- stage B: decode via shard_map from the REF (unsharded) features ----
from jax import shard_map

ref_out = jax.jit(lambda p, f1, f2: model.apply(
    p, list(f1), list(f2), False, False, method="decode"))(
    params, tuple(ref_feats[0]), tuple(ref_feats[1]))


def body(p, f1, f2):
    return model_sp.apply(p, list(f1), list(f2), False, True, method="decode")


fn = shard_map(
    body, mesh=mesh,
    in_specs=(P(), P("data", SPATIAL_AXIS), P("data", SPATIAL_AXIS)),
    out_specs=_decode_out_specs(model_sp, False, "data"),
    check_vma=False,
)
sp_out = _unspatial(jax.jit(
    lambda p, f1, f2: fn(p, f1, f2))(params, tuple(ref_feats[0]),
                                     tuple(ref_feats[1])))
for k in ["disp", "prob", "disp_pred"]:
    r, g = np.asarray(ref_out[k]), np.asarray(sp_out[k])
    print(f"stage B {k}: max|d|={np.abs(r - g).max():.3e}")

# ---- stage C: intermediate-level bisect inside decode ----
from nmrf_tpu.ops.correlation import correlation_volume


def dbg(m, f1, f2):
    f1, f2 = list(f1), list(f2)
    B = f1[0].shape[0]
    cv = correlation_volume(f1[0], f2[0], m.max_disp // 8, m.cost_group)
    _, prob, seeds, labels = m.dpn(cv, f1, True)
    fmap1 = m.concatconv(f1[0])
    fmap2 = m.concatconv(f2[0])
    fmap1_gw = m.gw(f1[0])
    fmap2_gw = m.gw(f2[0])
    h8, w8 = fmap1.shape[1:3]
    labels_curr = labels[-1].reshape(B, h8, w8, m.num_proposals)
    tgt = m.inference(labels_curr, fmap1, fmap2, fmap1_gw, fmap2_gw, True)
    return {
        "cv": cv, "labels": labels_curr, "fmap1": fmap1,
        "fmap1_gw": fmap1_gw, "tgt_last": tgt[-1],
    }


ref_dbg = jax.jit(lambda p, f1, f2: model.apply(p, f1, f2, method=dbg))(
    params, tuple(ref_feats[0]), tuple(ref_feats[1]))

bh = P("data", SPATIAL_AXIS)
dbg_specs = {"cv": bh, "labels": bh, "fmap1": bh, "fmap1_gw": bh,
             "tgt_last": bh}
fn_dbg = shard_map(
    lambda p, f1, f2: model_sp.apply(p, f1, f2, method=dbg),
    mesh=mesh,
    in_specs=(P(), bh, bh),
    out_specs=dbg_specs,
    check_vma=False,
)
sp_dbg = jax.jit(fn_dbg)(params, tuple(ref_feats[0]), tuple(ref_feats[1]))
for k in ref_dbg:
    r, g = np.asarray(ref_dbg[k]), np.asarray(sp_dbg[k])
    err = np.abs(r - g).max()
    print(f"stage C {k}: max|d|={err:.3e} rel={err/(np.abs(r).max()+1e-9):.3e}")

# ---- stage D: is the disp divergence an argmax near-tie flip? ----
def dbg2(m, f1, f2):
    f1, f2 = list(f1), list(f2)
    B = f1[0].shape[0]
    cv = correlation_volume(f1[0], f2[0], m.max_disp // 8, m.cost_group)
    _, prob, seeds, labels = m.dpn(cv, f1, True)
    fmap1 = m.concatconv(f1[0])
    fmap2 = m.concatconv(f2[0])
    fmap1_gw = m.gw(f1[0])
    fmap2_gw = m.gw(f2[0])
    h8, w8 = fmap1.shape[1:3]
    labels_curr = labels[-1].reshape(B, h8, w8, m.num_proposals)
    tgt = m.inference(labels_curr, fmap1, fmap2, fmap1_gw, fmap2_gw, True)
    from nmrf_tpu.models.nmrf import _subpatch_to_full
    disp_delta = m.infer_head(tgt)
    coarse = jax.nn.relu(labels_curr[None, ..., None] + disp_delta)
    logits = 0.25 * m.infer_score_head(tgt)
    coarse = _subpatch_to_full(coarse[-1:], 8)[0]
    logits = _subpatch_to_full(logits[-1:], 8)[0]
    return {"coarse": coarse, "logits": logits}


ref_d2 = jax.jit(lambda p, f1, f2: model.apply(p, f1, f2, method=dbg2))(
    params, tuple(ref_feats[0]), tuple(ref_feats[1]))
fn_d2 = shard_map(
    lambda p, f1, f2: model_sp.apply(p, f1, f2, method=dbg2),
    mesh=mesh, in_specs=(P(), bh, bh),
    out_specs={"coarse": bh, "logits": bh}, check_vma=False)
sp_d2 = jax.jit(fn_d2)(params, tuple(ref_feats[0]), tuple(ref_feats[1]))
rc, rl = np.asarray(ref_d2["coarse"]), np.asarray(ref_d2["logits"])
gc, gl = np.asarray(sp_d2["coarse"]), np.asarray(sp_d2["logits"])
print(f"stage D coarse: max|d|={np.abs(rc-gc).max():.3e}")
print(f"stage D logits: max|d|={np.abs(rl-gl).max():.3e}")
ra, ga = rl.argmax(-1), gl.argmax(-1)
flips = ra != ga
print(f"stage D argmax flips: {flips.sum()} / {flips.size}")
if flips.any():
    idx = np.argwhere(flips)
    for i in idx[:5]:
        t = tuple(i)
        srt = np.sort(rl[t])[::-1]
        print(f"  flip@{t}: ref logit gap top1-top2 = {srt[0]-srt[1]:.3e}, "
              f"coarse vals ref {rc[t]} -> winner diff "
              f"{abs(rc[t][ra[t]] - rc[t][ga[t]]):.3e}")
