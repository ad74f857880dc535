"""Decompose the published-config train step's wall time on the real TPU.

Post-fusion numbers (VALIDATION.md round 3): the fused render fwd+bwd is
108.5 ms/step at batch 48 (scripts/sweep_train_render_tiles.py,
tile_bwd=1024) and the full step ~140-145 ms (bench.py train,
6.9-7.1 steps/s); this script attributes the remainder — measured
enc_pose 10.6 ms, AdamW-on-49M 7.7 ms, residual (XLA-side PE, gout
packing, losses) ~9 ms.

Variants (each a jitted fori_loop over N_ITERS with a loop-carried
dependency so XLA cannot hoist the work):

  full     : the exact bench.py train step (sanity anchor)
  enc_pose : value_and_grad of the encoder + direct-UV + 3 refiner iters +
             code losses ONLY (NeRF branch ablated) — the non-field model work
  opt_only : AdamW update + apply on the full 49M-param tree with fixed grads
             (the optimizer's HBM-bound cost)

Run: python scripts/profile_train_step.py       (on the real TPU chip)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))

from supnerf_tpu.models import build_model
from supnerf_tpu.training import (
    TrainBatch, TrainConfig, init_train_state, make_train_step,
)
from supnerf_tpu.training.train_step import _make_optimizers, unified_loss
from supnerf_tpu.data.synthetic import make_random_train_batch

B, R, S, IMG = 48, 1024, 64, 128
N_ITERS = int(os.environ.get("PROFILE_ITERS", "10"))
_PUBLISHED_HP = {"shape_blocks": 3, "texture_blocks": 1, "latent_dim": 256,
                 "pose_shortcut": 1, "pred_wlh": 0}


def timed_loop(fn, carry, label):
    loop = jax.jit(lambda c: jax.lax.fori_loop(0, N_ITERS, fn, c))
    out = jax.block_until_ready(loop(carry))
    t0 = time.perf_counter()
    out = jax.block_until_ready(loop(out))
    dt = (time.perf_counter() - t0) / N_ITERS
    print(f"{label:10s} {dt * 1e3:8.2f} ms/step")
    return dt


def main():
    model = build_model("supnerf", _PUBLISHED_HP)
    cfg = TrainConfig(latent_dim=256, field_impl="pallas")
    state = init_train_state(model, jax.random.PRNGKey(0), n_instances=B,
                             cfg=cfg, img_size=IMG)
    batch = TrainBatch(**{k: jnp.asarray(v) for k, v in
                          make_random_train_batch(B, R, S, IMG).items()})
    step = make_train_step(model, cfg, donate=False)

    t_full = timed_loop(
        lambda i, st: step(st, batch, jax.random.fold_in(jax.random.PRNGKey(1), i))[0],
        state, "full")

    # encoder + pose branch only: ablate the NeRF branch by replacing the
    # field config with a zero-cost stub via loss surgery — simplest honest
    # form: run unified_loss but on a 1-sample, 1-ray NeRF tensor so the
    # field/compositing cost is negligible while every encoder-side term and
    # its gradients stay identical in shape and schedule.
    tiny = TrainBatch(**{
        **{k: getattr(batch, k) for k in batch.__dataclass_fields__},
        "xyz": batch.xyz[:, :8, :2], "viewdir": batch.viewdir[:, :8, :2],
        "z_vals": batch.z_vals[:, :2], "rgb_tgt": batch.rgb_tgt[:, :8],
        "occ_pixels": batch.occ_pixels[:, :8],
    })

    def enc_pose_body(i, carry):
        params, codes = carry
        key = jax.random.fold_in(jax.random.PRNGKey(2), i)

        def loss_fn(p, c):
            return unified_loss(model, p, state.batch_stats, c, tiny, cfg,
                                jnp.asarray(True), key)[0]

        g_p, g_c = jax.grad(loss_fn, argnums=(0, 1))(params, codes)
        # loop-carried dependency without an optimizer
        params = jax.tree.map(lambda a, g: a - 0.0 * g, params, g_p)
        codes = jax.tree.map(lambda a, g: a - 0.0 * g, codes, g_c)
        return params, codes

    codes0 = (state.shape_codes[batch.code_idx], state.texture_codes[batch.code_idx])
    t_enc = timed_loop(enc_pose_body, (state.params, codes0), "enc_pose")

    tx_model, _ = _make_optimizers(cfg)
    opt0 = tx_model.init(state.params)
    grads = jax.tree.map(lambda a: jnp.full_like(a, 1e-6), state.params)

    def opt_body(i, carry):
        params, opt = carry
        upd, opt = tx_model.update(grads, opt, params)
        import optax
        return optax.apply_updates(params, upd), opt

    t_opt = timed_loop(opt_body, (state.params, opt0), "opt_only")

    print(f"\nfull {t_full*1e3:.1f} ms = field(~125 sweep) + enc_pose "
          f"{t_enc*1e3:.1f} + opt {t_opt*1e3:.1f} + residual "
          f"{(t_full - 0.125 - t_enc - t_opt)*1e3:.1f} ms")


if __name__ == "__main__":
    main()
