"""Multiview joint test-time optimization: one instance's shape/texture codes
optimized against ALL of its views simultaneously.

Capability-equivalent of the reference multiview modes
(/root/reference/src/optimizer_nuscenes.py: optimize_objs_multi_anns :796,
optimize_objs_multi_anns_w_pose :1000ish — shared codes per instance, per-view
losses accumulated each iteration, optionally per-view pose parameters).

TPU-first: views are a fixed-size padded axis with a validity mask; the
per-iteration render batches all V views in one field evaluation, and whole
instances are vmapped. The reference loops views inside each iteration.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import optax
from flax import struct
from typing import Any

from supnerf_tpu.geometry.boxes import invert_pose
from supnerf_tpu.tto.core import pose_param_fns
from supnerf_tpu.ops.volume_render import (
    masked_psnr,
    occupancy_loss,
    rgb_loss_masked,
)
from supnerf_tpu.render.renderer import render_rays_frustum
from supnerf_tpu.tto.core import CODE_SAVE_ITERS, TTOConfig


@struct.dataclass
class MultiviewBatch:
    """One instance's padded views (leading axis V); vmap for many instances."""

    img_in: Any       # (V, S, S, 3)
    rgb_tgt: Any      # (V, R, 3)
    occ_tgt: Any      # (V, R, 1)
    K: Any            # (V, 3, 3)
    roi_nerf: Any     # (V, 4)
    pose_init: Any    # (V, 3, 4) per-view object pose (GT or injected error)
    wlh: Any          # (V, 3)
    obj_pose_gt: Any  # (V, 3, 4)
    view_valid: Any   # (V,) 1.0 real view / 0.0 padding


def run_multiview_tto(model, variables, batch: MultiviewBatch, mean_shape,
                      mean_texture, cfg: TTOConfig, key, opt_pose: bool = False,
                      opt_model: bool = False, slack_tex: bool = False):
    """Optimize shared codes (and optionally per-view poses) for one instance.

    opt_model: additionally fine-tune the decoder parameters at lr 1e-3
    (reference optimize_objs_multi_anns opt_model, optimizer_nuscenes.py:869).
    slack_tex: per-view texture residual codes added to the shared texture
    code (reference slack_tex :874-880).
    Returns codes at CODE_SAVE_ITERS, per-iter mean PSNR, final per-view poses.
    """
    V = batch.img_in.shape[0]

    def encode_one(img):
        out, _ = model.apply(
            variables, img[None], True, method=type(model).encode_img,
            mutable=["batch_stats"])
        return out[0][0], out[1][0]

    sc_enc, tc_enc = jax.vmap(encode_one)(batch.img_in)
    w = batch.view_valid[:, None]
    sc0 = (jnp.sum(sc_enc * w, 0) / jnp.maximum(w.sum(), 1) + mean_shape) / 2
    tc0 = (jnp.sum(tc_enc * w, 0) / jnp.maximum(w.sum(), 1) + mean_texture) / 2

    # per-view pose parameterization honors cfg.euler_rot / cfg.opt_cam_pose
    # (reference optimizer_nuscenes.py:1072,1122,1152,1157)
    params_from_obj_pose, obj_pose_from_params = pose_param_fns(cfg)
    rot0, trans0 = jax.vmap(params_from_obj_pose)(batch.pose_init)
    params0 = {"shape": sc0, "texture": tc0, "rot": rot0, "trans": trans0}
    if slack_tex:
        params0["tex_res"] = jnp.zeros((V,) + tc0.shape)
    if opt_model:
        params0["decoder"] = variables["params"]["decoder"]

    # base lrs; halving is applied to the updates by wall iteration (see
    # tto.core._make_optimizer for why optax schedule counts are unsuitable)
    labels = {"shape": "shape", "texture": "texture", "rot": "pose", "trans": "pose"}
    txs = {"shape": optax.adamw(cfg.lr_shape, weight_decay=cfg.weight_decay),
           "texture": optax.adamw(cfg.lr_texture, weight_decay=cfg.weight_decay),
           "pose": optax.adamw(cfg.lr_pose, weight_decay=cfg.weight_decay)}
    if slack_tex:
        labels["tex_res"] = "texture"
    if opt_model:
        labels["decoder"] = "model"
        txs["model"] = optax.adamw(1e-3, weight_decay=cfg.weight_decay)
    tx = optax.multi_transform(
        txs, lambda params: {k: labels[k] if not isinstance(v, dict) or k != "decoder"
                             else jax.tree.map(lambda _: "model", v)
                             for k, v in params.items()})
    opt_state0 = tx.init(params0)
    obj_diag = jnp.linalg.norm(batch.wlh, axis=-1)

    # fused differentiable render only with a FROZEN decoder (the kernels
    # give decoder weights zero cotangent); opt_model keeps the flax path
    if cfg.field_impl == "auto":
        from supnerf_tpu.ops.pallas_field import resolve_field_impl_cfg

        cfg = resolve_field_impl_cfg(cfg, model, variables)
    use_fused = cfg.field_impl == "pallas" and not opt_model
    if use_fused:
        from supnerf_tpu.ops.pallas_field import resolve_decoder_kernel_config
        from supnerf_tpu.ops.pallas_render import make_composite_grad_fn

        packed, kern_kw = resolve_decoder_kernel_config(model, variables)

    def view_loss(p, v, it_key):
        pose = obj_pose_from_params(p["rot"][v], p["trans"][v])
        cam = invert_pose(pose)
        tex = p["texture"] + p["tex_res"][v] if slack_tex else p["texture"]
        if opt_model:
            field_vars = {"params": dict(variables["params"], decoder=p["decoder"]),
                          "batch_stats": variables.get("batch_stats", {})}
        else:
            field_vars = variables
        comp = (make_composite_grad_fn(packed, kern_kw, p["shape"], tex)
                if use_fused else None)
        out = render_rays_frustum(
            lambda xyz, vd: model.apply(field_vars, xyz, vd, p["shape"], tex),
            it_key, cam, batch.K[v], batch.roi_nerf[v].astype(jnp.float32),
            obj_diag[v], n_samples=cfg.n_samples, im_sz=cfg.render_im_sz,
            shapenet_obj_cood=cfg.shapenet_obj_cood, kitti2nusc=cfg.kitti2nusc,
            composite_fn=comp)
        lr_ = rgb_loss_masked(out["rgb"], batch.rgb_tgt[v], batch.occ_tgt[v])
        lo = occupancy_loss(out["acc_trans"], batch.occ_tgt[v])
        psnr = masked_psnr(out["rgb"], batch.rgb_tgt[v], batch.occ_tgt[v])
        return (lr_ + cfg.loss_occ_coef * lo) * batch.view_valid[v], psnr

    def loss_fn(p, it_key):
        losses, psnrs = jax.vmap(
            lambda v: view_loss(p, v, jax.random.fold_in(it_key, v))
        )(jnp.arange(V))
        denom = jnp.maximum(batch.view_valid.sum(), 1.0)
        return jnp.sum(losses) / denom, jnp.sum(psnrs * batch.view_valid) / denom

    def step(carry, t):
        p, s = carry
        it_key = jax.random.fold_in(key, t)
        (loss, psnr), grads = jax.value_and_grad(loss_fn, has_aux=True)(p, it_key)
        if not opt_pose:
            grads = dict(grads, rot=jnp.zeros_like(grads["rot"]),
                         trans=jnp.zeros_like(grads["trans"]))
        updates, s2 = tx.update(grads, s, p)
        lr_scale = 2.0 ** (-(t // cfg.lr_half_interval)).astype(jnp.float32)
        updates = jax.tree.map(lambda u: u * lr_scale, updates)
        p2 = optax.apply_updates(p, updates)
        if not opt_pose:
            p2 = dict(p2, rot=p["rot"], trans=p["trans"])
        return (p2, s2), {"loss": loss, "psnr": psnr, "shape": p["shape"],
                          "texture": p["texture"]}

    (params_f, _), curves = jax.lax.scan(step, (params0, opt_state0),
                                         jnp.arange(cfg.num_opts))
    save_idx = jnp.array([min(i, cfg.num_opts - 1) for i in CODE_SAVE_ITERS])
    is_final = jnp.array([i >= cfg.num_opts for i in CODE_SAVE_ITERS])
    sc_saved = jnp.where(is_final[:, None], params_f["shape"][None],
                         curves["shape"][save_idx])
    tc_saved = jnp.where(is_final[:, None], params_f["texture"][None],
                         curves["texture"][save_idx])
    final_poses = jax.vmap(obj_pose_from_params)(
        params_f["rot"], params_f["trans"])
    return {
        "shapecodes_saved": sc_saved,
        "texturecodes_saved": tc_saved,
        "final_shapecode": params_f["shape"],
        "final_texturecode": params_f["texture"],
        "final_poses": final_poses,
        "loss": curves["loss"],
        "psnr": curves["psnr"],
    }
