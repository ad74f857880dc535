import numpy as np
import jax
import jax.numpy as jnp

from supnerf_tpu.data.synthetic import make_synthetic_object
from supnerf_tpu.models import build_model
from supnerf_tpu.parallel import make_mesh, shard_pytree_batch
from supnerf_tpu.parallel.mesh import replicate_pytree
from supnerf_tpu.training import (
    TrainBatch, TrainConfig, init_train_state, make_train_step,
)
from supnerf_tpu.training.ray_prep import prepare_train_sample
from supnerf_tpu.geometry.poses import get_random_pose

TINY_HP = {"shape_blocks": 1, "texture_blocks": 1, "latent_dim": 32,
           "pose_shortcut": 1, "pred_wlh": 0}

_SHARED = {}


def _shared_step():
    """One (model, cfg, state, step) for the single-device full-batch tests:
    test_train_step_runs_and_updates and test_compact_rays_match_expanded use
    identical configs/shapes, and sharing the step closure means the second
    test hits the in-memory jit cache instead of re-compiling the same
    program (~20-35 s on the 1-CPU CI host).

    The shared `state` is only safe because the step is built with
    donate=False — a donating step would invalidate the cached state's
    buffers for whichever test runs second. Keep donate=False here; a
    donating-step test must build its own state."""
    if not _SHARED:
        model = build_model("supnerf", TINY_HP)
        cfg = TrainConfig(latent_dim=32, im_enc_rate=1.0)
        state = init_train_state(model, jax.random.PRNGKey(0), n_instances=3,
                                 cfg=cfg, img_size=32)
        _SHARED.update(model=model, cfg=cfg, state=state,
                       step=make_train_step(model, cfg, donate=False))
    return _SHARED["model"], _SHARED["cfg"], _SHARED["state"], _SHARED["step"]


def _make_batch(n=4, n_rays=64, n_samples=8, in_img_sz=32, compact=False):
    rng = np.random.default_rng(0)
    rows = []
    for i in range(n):
        s = make_synthetic_object(seed=20 + i)
        src = np.asarray(get_random_pose(
            jax.random.PRNGKey(i), jnp.asarray(s["obj_poses"]),
            jnp.asarray(s["cam_intrinsics"]), jnp.asarray(s["rois"], jnp.float32)))
        rows.append(prepare_train_sample(
            s, n_rays=n_rays, n_samples=n_samples, in_img_sz=in_img_sz,
            rng=rng, src_pose=src, code_idx=i % 3, compact_rays=compact))
    batch = {k: np.stack([r[k] for r in rows]) for k in rows[0]}
    return TrainBatch(**{k: jnp.asarray(v) for k, v in batch.items()})


def test_train_step_runs_and_updates():
    model, cfg, state, step = _shared_step()
    batch = _make_batch()
    losses = []
    for t in range(3):
        state, metrics = step(state, batch, jax.random.PRNGKey(t))
        losses.append(float(metrics["loss_total"]))
    assert np.isfinite(losses).all()
    assert int(state.niter) == 3
    assert float(state.optimized_idx.sum()) == 3.0  # code_idx 0..2 touched
    for k in ["loss_rgb", "loss_occ", "loss_pose_iter1", "loss_pose_direct",
              "loss_code", "psnr", "loss_reg"]:
        assert k in metrics
    # the model is actually learning something on the repeated batch
    assert losses[-1] < losses[0]


def test_compact_rays_match_expanded():
    """Compact (B, R, 3) ray upload + device-side expansion
    (train_step.expand_compact_rays) must reproduce the host-expanded
    (B, R, S, 3) batch: same rng stream -> same rays, and the expansion
    xyz = o/diag + v*z/diag differs from (o + v*z)/diag only by fp
    reassociation."""
    model, cfg, state, step = _shared_step()
    b_full = _make_batch()
    b_compact = _make_batch(compact=True)
    assert b_compact.xyz.ndim == 3 and b_full.xyz.ndim == 4

    from supnerf_tpu.training.train_step import expand_compact_rays

    expanded = expand_compact_rays(b_compact)
    np.testing.assert_allclose(np.asarray(expanded.xyz),
                               np.asarray(b_full.xyz), rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(np.asarray(expanded.viewdir),
                               np.asarray(b_full.viewdir), rtol=1e-6, atol=1e-7)

    s1, m1 = step(state, b_full, jax.random.PRNGKey(5))
    s2, m2 = step(state, b_compact, jax.random.PRNGKey(5))
    np.testing.assert_allclose(float(m1["loss_total"]),
                               float(m2["loss_total"]), rtol=1e-4)
    # loose: Adam normalizes near-zero grads, amplifying the expansion's fp
    # reassociation noise on a handful of elements
    p1, p2 = jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)
    for a, b in zip(p1, p2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-2, atol=5e-5)


def test_train_step_data_parallel_mesh():
    """The train step must compile and run with the batch sharded over an
    8-device mesh and the state replicated."""
    model = build_model("supnerf", TINY_HP)
    cfg = TrainConfig(latent_dim=32)
    state = init_train_state(model, jax.random.PRNGKey(0), n_instances=8, cfg=cfg,
                             img_size=32)
    step = make_train_step(model, cfg, donate=False)
    # same shapes as test_train_step_pallas_field_on_mesh_partitioned's flax
    # arm: the two tests then share ONE flax-mesh program via the persistent
    # compilation cache instead of paying two cold ~30 s CPU compiles
    batch = _make_batch(n=8, n_rays=32, n_samples=8)
    mesh = make_mesh(8)
    state_r = replicate_pytree(state, mesh)
    batch_s = shard_pytree_batch(batch, mesh)
    new_state, metrics = step(state_r, batch_s, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss_total"]))
    assert int(new_state.niter) == 1
    # replicated output state
    delta = jax.tree.leaves(new_state.params)[0] - jax.tree.leaves(state.params)[0]
    assert float(jnp.abs(delta).max()) > 0  # params moved


def test_lr_schedule_halving():
    from supnerf_tpu.training.train_step import _make_optimizers
    cfg = TrainConfig(lr_model=1e-4, lr_interval_model=10)
    tx_model, _ = _make_optimizers(cfg)
    # schedule embedded: verify 2^-(t//interval) scaling via a probe update
    params = {"w": jnp.ones(4)}
    state = tx_model.init(params)
    g = {"w": jnp.ones(4)}
    # advance count to 10 and compare update magnitude ratio ~0.5
    u0, state = tx_model.update(g, state, params)
    for _ in range(10):
        _, state = tx_model.update(g, state, params)
    u10, _ = tx_model.update(g, state, params)
    ratio = float(jnp.abs(u10["w"][0]) / jnp.abs(u0["w"][0]))
    assert 0.4 < ratio < 0.6


def test_train_step_pallas_field_matches_flax():
    """cfg.field_impl='pallas' (fused fwd+bwd train kernels incl. decoder
    weight grads) must reproduce the flax step: same losses and same updated
    parameters after a step (f32 interpret mode on CPU). Shapes are one tile
    minimum — the parity pinned here is shape-independent and interpret-mode
    compile+run on the 1-CPU CI host dominates the suite otherwise."""
    model = build_model("supnerf", TINY_HP)
    batch = _make_batch(n=2, n_rays=32)
    outs = {}
    for impl in ("flax", "pallas"):
        cfg = TrainConfig(latent_dim=32, im_enc_rate=1.0, field_impl=impl)
        state = init_train_state(model, jax.random.PRNGKey(0), n_instances=2,
                                 cfg=cfg, img_size=32)
        step = make_train_step(model, cfg, donate=False)
        state, metrics = step(state, batch, jax.random.PRNGKey(5))
        outs[impl] = (state, metrics)
    for k in ("loss_total", "loss_rgb", "loss_occ", "psnr"):
        np.testing.assert_allclose(float(outs["pallas"][1][k]),
                                   float(outs["flax"][1][k]),
                                   rtol=1e-4, err_msg=k)
    # atol 3e-4: a near-zero gradient element can flip the sign of its first
    # AdamW update (magnitude lr=1e-4) under f32 reassociation; everything
    # else must agree tightly.
    leaves_f = jax.tree_util.tree_flatten_with_path(outs["flax"][0].params)[0]
    leaves_p = jax.tree_util.tree_flatten_with_path(outs["pallas"][0].params)[0]
    for (path, a), (_, b) in zip(leaves_f, leaves_p):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=5e-3, atol=3e-4,
            err_msg=jax.tree_util.keystr(path))
    np.testing.assert_allclose(np.asarray(outs["pallas"][0].shape_codes),
                               np.asarray(outs["flax"][0].shape_codes),
                               rtol=5e-3, atol=3e-4)


def test_train_step_pallas_field_on_mesh_partitioned():
    """field_impl='pallas' + mesh: the kernel must run under shard_map on each
    device's LOCAL batch shard (XLA cannot partition a custom call — without
    shard_map it all-gathers the full point batch to every device), and the
    step must match the flax mesh step."""
    import re

    model = build_model("supnerf", TINY_HP)
    mesh = make_mesh(8)
    n, n_rays, n_samples = 8, 32, 8
    batch = _make_batch(n=n, n_rays=n_rays, n_samples=n_samples)
    pts = n * n_rays * n_samples        # full global point batch
    outs = {}
    for impl in ("flax", "pallas"):
        cfg = TrainConfig(latent_dim=32, field_impl=impl)
        state = init_train_state(model, jax.random.PRNGKey(0), n_instances=8,
                                 cfg=cfg, img_size=32)
        step = make_train_step(model, cfg, donate=False, mesh=mesh)
        state_r = replicate_pytree(state, mesh)
        batch_s = shard_pytree_batch(batch, mesh)
        if impl == "pallas":
            # compile ONCE and reuse the executable for both the HLO check
            # and the step (re-jitting compiled 247 s of interpret-mode
            # shard_map a second time on the 1-CPU CI host)
            compiled = step.lower(
                state_r, batch_s, jax.random.PRNGKey(0)).compile()
            txt = compiled.as_text()
            # the full point batch showing up in an all-gather means the
            # partitioner replicated the field custom call
            assert not [l for l in txt.splitlines()
                        if "all-gather" in l
                        and re.search(rf"= f32\[{pts}", l)]
            new_state, metrics = compiled(state_r, batch_s,
                                          jax.random.PRNGKey(0))
        else:
            new_state, metrics = step(state_r, batch_s, jax.random.PRNGKey(0))
        outs[impl] = (new_state, float(metrics["loss_total"]))
    np.testing.assert_allclose(outs["pallas"][1], outs["flax"][1], rtol=1e-5)
    for a, b in zip(jax.tree.leaves(outs["flax"][0].params),
                    jax.tree.leaves(outs["pallas"][0].params)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=3e-4)


def test_multi_step_matches_sequential_steps():
    """make_train_multi_step (K steps in one lax.scan program) must reproduce
    K sequential make_train_step calls: same final state, same per-step
    metric rows (the grouped epoch path relies on this equivalence)."""
    from supnerf_tpu.training.train_step import make_train_multi_step

    model, cfg, state, step_plain = _shared_step()
    step = make_train_step(model, cfg, donate=False, packed_metrics=True)
    multi = make_train_multi_step(model, cfg, donate=False)
    b1, b2 = _make_batch(), _make_batch()
    group = jax.tree.map(lambda a, b: jnp.stack([a, b]), b1, b2)
    keys = jnp.stack([jax.random.PRNGKey(11), jax.random.PRNGKey(12)])

    st_m, rows = multi(state, group, keys)
    st_s = state
    seq_rows = []
    for b, k in ((b1, keys[0]), (b2, keys[1])):
        st_s, vec = step(st_s, b, k)
        seq_rows.append(np.asarray(vec))
    assert rows.shape[0] == 2
    np.testing.assert_allclose(np.asarray(rows), np.stack(seq_rows),
                               rtol=5e-4, atol=1e-5)
    assert multi.metric_names() == step.metric_names()
    for a, b in zip(jax.tree.leaves(st_s.params), jax.tree.leaves(st_m.params)):
        # post-Adam params: a ~1-ulp grad difference can flip an entire
        # update sign locally (update magnitude == lr=1e-4), so compare at
        # the update scale, not fp epsilon
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-3, atol=3e-4)
    assert int(st_m.niter) == int(state.niter) + 2
