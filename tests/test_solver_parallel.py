"""Solver + parallel runtime tests (CPU, 8 virtual devices)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nmrf_tpu.config import get_cfg
from nmrf_tpu.data.loader import InferenceSampler, ShardedBatchSampler
from nmrf_tpu.solver import build_optimizer, label_params, onecycle_cosine


class TestOneCycle:
    def test_matches_torch_onecyclelr(self):
        """Parity with torch OneCycleLR (reference main.py:383-391)."""
        import torch

        max_lr, total = 5e-4, 1000
        m = torch.nn.Linear(2, 2)
        opt = torch.optim.AdamW(m.parameters(), lr=max_lr)
        sched = torch.optim.lr_scheduler.OneCycleLR(
            opt, max_lr, total, pct_start=0.05, cycle_momentum=False,
            anneal_strategy="cos")
        want = []
        for _ in range(total):
            want.append(sched.get_last_lr()[0])
            opt.step()
            sched.step()

        schedule = onecycle_cosine(max_lr, total, pct_start=0.05)
        got = np.asarray(jax.vmap(schedule)(jnp.arange(total)))
        np.testing.assert_allclose(got, np.asarray(want), rtol=1e-5, atol=1e-9)


class TestParamGroups:
    def test_labels_resnet_model(self):
        from nmrf_tpu.models import build_model

        cfg = get_cfg()
        cfg.freeze()
        model, _ = build_model(cfg)
        img = jnp.zeros((1, 64, 128, 3), jnp.float32)
        params = jax.eval_shape(
            lambda r: model.init(r, img, img, train=False), jax.random.PRNGKey(0))
        labels = label_params(params)
        flat = jax.tree_util.tree_leaves_with_path(labels)
        got = {}
        for path, lbl in flat:
            keys = "/".join(p.key for p in path if hasattr(p, "key"))
            got[keys] = lbl
        # NMP relative position tables -> rpe group
        rpe_keys = [k for k, v in got.items() if "relative_position_enc_table" in k]
        assert rpe_keys and all(got[k] == "rpe" for k in rpe_keys)
        # norm scale/bias -> norm group
        norm_keys = [k for k, v in got.items()
                     if k.endswith("norm/scale") or k.endswith("norm1/bias")]
        assert norm_keys and all(got[k] == "norm" for k in norm_keys)
        # resnet backbone lands in DEFAULT group (reference keys backbone
        # groups on "image_encoder.backbone", which only matches swin)
        assert got["params/backbone/conv1/kernel"] == "default"

    def test_optimizer_builds_and_steps(self):
        cfg = get_cfg()
        cfg.freeze()
        params = {"params": {"norm": {"scale": jnp.ones((4,))},
                             "dense": {"kernel": jnp.ones((4, 4))}}}
        tx, sched = build_optimizer(params, cfg)
        state = tx.init(params)
        grads = jax.tree_util.tree_map(jnp.ones_like, params)
        updates, state = tx.update(grads, state, params)
        leaves = jax.tree_util.tree_leaves(updates)
        assert all(np.isfinite(np.asarray(l)).all() for l in leaves)


class TestSamplers:
    def test_sharded_batch_sampler_coverage_determinism(self):
        s0 = ShardedBatchSampler(103, 8, rank=0, world_size=4, seed=3)
        s1 = ShardedBatchSampler(103, 8, rank=1, world_size=4, seed=3)
        e0a, e0b = s0.epoch_indices(5), s0.epoch_indices(5)
        np.testing.assert_array_equal(e0a, e0b)  # deterministic
        e1 = s1.epoch_indices(5)
        assert e0a.shape == e1.shape == (103 // 8, 2)
        # no overlap between ranks within a step
        assert not set(e0a[0]).intersection(e1[0])

    def test_inference_sampler_exact_union(self):
        n, world = 23, 4
        all_idx = []
        for r in range(world):
            all_idx.extend(list(InferenceSampler(n, r, world)))
        assert sorted(all_idx) == list(range(n))


class TestGradAccumulation:
    def test_k_microbatches_equal_one_mean_update(self):
        """SOLVER.ACCUM_STEPS=k: k micro-updates == one update with the
        mean gradient (clip + AdamW + schedule applied once)."""
        import jax
        import jax.numpy as jnp
        from nmrf_tpu.config import get_cfg
        from nmrf_tpu.solver import build_optimizer

        params = {"backbone": {"conv": {"kernel": jnp.ones((3, 3)) * 0.3}},
                  "head": {"bias": jnp.zeros((3,))}}
        rng = np.random.RandomState(0)
        k = 3
        grads = [jax.tree_util.tree_map(
            lambda x, i=i: jnp.asarray(
                rng.rand(*x.shape).astype(np.float32) - 0.4), params)
            for i in range(k)]
        mean_grad = jax.tree_util.tree_map(
            lambda *g: sum(g) / k, *grads)

        cfg = get_cfg()
        cfg.SOLVER.ACCUM_STEPS = k
        cfg.freeze()
        tx, _ = build_optimizer(params, cfg)
        state = tx.init(params)
        p = params
        for g in grads:
            upd, state = tx.update(g, state, p)
            p = jax.tree_util.tree_map(lambda a, u: a + u, p, upd)

        cfg2 = get_cfg()
        cfg2.freeze()
        tx2, _ = build_optimizer(params, cfg2)
        state2 = tx2.init(params)
        upd2, _ = tx2.update(mean_grad, state2, params)
        want = jax.tree_util.tree_map(lambda a, u: a + u, params, upd2)

        for a, b in zip(jax.tree_util.tree_leaves(p),
                        jax.tree_util.tree_leaves(want)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-6, atol=1e-7)


class TestDevicePrefetch:
    def test_order_sharding_and_meta_drop(self):
        import jax
        from nmrf_tpu.parallel import device_prefetch, make_mesh

        mesh = make_mesh(2, 1, devices=np.array(jax.devices()[:2]))
        batches = [{"img1": np.full((2, 4, 4, 3), i, np.float32),
                    "meta": [{"i": i}]} for i in range(5)]
        out = list(device_prefetch(iter(batches), mesh, size=2))
        assert len(out) == 5
        for i, b in enumerate(out):
            assert "meta" not in b  # shard_batch drops host-only fields
            assert float(np.asarray(b["img1"]).ravel()[0]) == i  # order kept
            assert b["img1"].sharding.spec == ("data",)


@pytest.mark.slow
class TestMultichipDryrun:
    def test_dryrun_8_devices(self):
        # subprocess isolation: after ~140 in-process tests the accumulated
        # compiled-executable state makes this full-train-step compile hang;
        # the driver invokes dryrun_multichip in a fresh process too
        import os
        import subprocess
        import sys

        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        env = dict(os.environ, JAX_PLATFORMS="cpu",
                   XLA_FLAGS="--xla_force_host_platform_device_count=8")
        for attempt in range(2):  # CPU collective rendezvous aborts rarely
            r = subprocess.run(
                [sys.executable, "-c",
                 "import __graft_entry__ as g; g.dryrun_multichip(8)"],
                cwd=repo, env=env, capture_output=True, text=True,
                timeout=1200)
            if r.returncode == 0:
                break
        assert r.returncode == 0, (r.stdout[-800:], r.stderr[-800:])
        assert "spatial step ok" in r.stdout + r.stderr
