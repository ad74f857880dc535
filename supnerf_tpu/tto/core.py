"""Batched, jit-compiled test-time optimization (TTO).

Capability-equivalent of the reference per-object optimization drivers
(/root/reference/src/optimizer_nuscenes.py: optimize_objs_w_pose_unified :553,
fw_pose_update :451, set_optimizers_w_poses :1762, update_learning_rate :1771,
log_eval_psnr :1670, log_eval_pose :1687, log_eval_depth_v2 :1736), re-designed
TPU-first:

  - The reference optimizes ~5k objects ONE AT A TIME with a Python loop and
    manual multi-process sharding (--num_subset). Here the full pipeline
    (encode -> feed-forward pose refine -> 100 Adam iterations) is vmapped
    across an object batch and jitted into a single XLA program; the object
    axis can additionally be sharded over a device mesh (see parallel/).
  - Python-side control flow (lr halving, replay-vs-step switch at reg_iters,
    snapshot iters) becomes lax.scan + masked updates with a static schedule.
  - BatchNorm batch statistics are computed PER OBJECT (the reference encodes
    one image at a time in train-mode BN); vmapping the encoder reproduces
    this exactly because each vmap instance sees a batch of one.

Loop-semantics notes mirrored from the reference:
  - Iterations 0..reg_iters render replayed refiner poses and perform NO
    parameter update (optimizer_nuscenes.py:684-689, 768-769).
  - AdamW on {shapecode, texturecode, rot_vec, trans_vec} with per-group lrs
    and torch-default weight decay 0.01; the optimizer is re-created (moments
    reset) every lr_half_interval iterations with halved lrs
    (set_optimizers_w_poses + update_learning_rate).
  - Metrics are logged every iteration BEFORE the update, using the pose that
    produced the render.
"""
from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import struct

from supnerf_tpu.data.common import NUSC_CAR_WLH_MEAN, NUSC_CAR_WLH_STD
from supnerf_tpu.geometry.boxes import invert_pose
from supnerf_tpu.geometry.poses import calc_pose_err
from supnerf_tpu.geometry.rotations import (
    axis_angle_to_matrix,
    euler_angles_to_matrix,
    matrix_to_axis_angle,
    matrix_to_euler_angles,
)
from supnerf_tpu.ops.volume_render import (
    masked_psnr,
    occupancy_loss,
    rgb_loss_masked,
)
from supnerf_tpu.render.renderer import render_rays_at_pixels, render_rays_frustum
from supnerf_tpu.tto.refiner import fw_pose_refine

# Snapshot iterations for saved codes/poses (reference CODE_SAVE_ITERS_,
# optimizer_nuscenes.py:24). The last entry equals num_opts and is captured
# after the loop.
CODE_SAVE_ITERS = (0, 5, 10, 20, 50, 100)

# nuScenes car dataset statistics used by pred_wlh==2 (reference :27-28);
# canonical values live in data.common (shared with the demo defaults)
WLH_MEAN = jnp.asarray(NUSC_CAR_WLH_MEAN)
WLH_STD = jnp.asarray(NUSC_CAR_WLH_STD)


@dataclasses.dataclass(frozen=True)
class TTOConfig:
    num_opts: int = 100
    reg_iters: int = 3
    n_samples: int = 64
    render_im_sz: int = 32
    in_img_sz: int = 128
    n_lidar: int = 256          # padded lidar-pixel slots per object
    lr_shape: float = 0.02
    lr_texture: float = 0.02
    lr_pose: float = 0.01
    lr_half_interval: int = 1000
    weight_decay: float = 0.01
    loss_occ_coef: float = 0.1
    shapenet_obj_cood: bool = True
    sym_aug: bool = False
    opt_pose: bool = True       # False: optimize codes only (reference opt_pose=0)
    kitti2nusc: bool = False    # KITTI/Waymo cross-domain field queries
    box_fac: float = 1.0        # refiner corner scale (KITTI BOX_FAC=1.1)
    pred_wlh_mode: int = 0      # 0: gt wlh; 1: predicted; 2: predicted-l/mean-wh
    obj_sz_reg: bool = False    # box-limit density regularizer (reference :1412)
    loss_obj_sz_coef: float = 1.0
    sym_loss_coef: float = 0.0  # >0 enables the density-symmetry loss (:1435)
    field_impl: str = "flax"    # "flax": XLA autodiff through the decoder;
                                # "pallas": fused fwd+bwd field kernels
                                # (ops/pallas_field.field_apply_pallas) on the
                                # 100-iteration hot loop — decoder weights are
                                # frozen there, so the kernel's zero weight
                                # cotangent is exact. CodeNeRF-style decoders
                                # only (SUPNeRF / AutoRFMix / CodeNeRF).
                                # "auto" (the CLI default): pallas on
                                # accelerators with a compatible decoder,
                                # flax otherwise (resolve_field_impl).
    remat_field: bool = False   # rematerialize the field in the backward pass:
                                # cuts multi-GB activation stashes (needed for
                                # object batches >32 on a 16 GB chip) but costs
                                # ~17% throughput at B=16 — opt in when batching
                                # wider than HBM allows
    emit_code_curves: bool = False  # also return per-iteration codes/poses
                                    # (vis=2 per-iteration rendering)
    use_aabb_render: bool = False   # AABB-bounded sampling instead of the
                                    # frustum shell (reference render_rays_v3,
                                    # the demo's rend_aabb=True path)
    adjust_scale: float = 1.0       # field coordinate scale for AABB renders
    euler_rot: bool = False     # pose vector = intrinsic XYZ Euler angles
                                # instead of axis-angle (reference hpams
                                # 'euler_rot': optimizer_nuscenes.py:339,361,
                                # 1122,1152). The reference only reads it in
                                # the baseline/multiview loops (the unified
                                # loop hardcodes axis-angle, :666); here it
                                # applies uniformly — a documented superset.
    opt_cam_pose: bool = False  # optimize the CAMERA pose instead of the
                                # object pose (reference optimize['opt_cam_
                                # pose']: optimizer_nuscenes.py:290,366,695,
                                # 1157). Params hold cam2obj; the object pose
                                # for metrics/snapshots is its inverse.


@struct.dataclass
class ObjectBatch:
    """Fixed-shape per-object inputs, batched along axis 0 (host-prepared)."""

    img_in: Any        # (B, in_img_sz, in_img_sz, 3) encoder input (white-padded square)
    rgb_tgt: Any       # (B, R, 3) render target at render_im_sz^2 = R rays
    occ_tgt: Any       # (B, R, 1) occupancy target in {-1, 0, 1}
    K: Any             # (B, 3, 3)
    K_inv: Any         # (B, 3, 3)
    roi_nerf: Any      # (B, 4) square-padded roi for rendering
    roi_refine: Any    # (B, 4) un-padded roi for the refiner normalization
    pose_init: Any     # (B, 3, 4) object pose init (with injected error / random)
    wlh: Any           # (B, 3)
    obj_pose_gt: Any   # (B, 3, 4) for metrics
    lidar_u: Any       # (B, L) full-image pixel x of lidar hits (padded)
    lidar_v: Any       # (B, L)
    lidar_depth: Any   # (B, L) gt depth at those pixels
    lidar_valid: Any   # (B, L) 1.0 for real entries, 0.0 padding


@struct.dataclass
class TTOParams:
    shapecode: Any
    texturecode: Any
    rot_vec: Any
    trans_vec: Any


def pose_param_fns(cfg: TTOConfig):
    """(params_from_obj_pose, obj_pose_from_params) for the configured pose
    parameterization: axis-angle vs intrinsic-XYZ Euler (euler_rot) and
    object-pose vs camera-pose parameters (opt_cam_pose). Both poses are
    (3, 4); invert_pose is an involution so the cam-pose branch simply maps
    through the inverse on both sides (reference optimizer_nuscenes.py:
    339-366 — when opt_cam_pose the params ARE cam2opt; otherwise cam2opt is
    the transposed/negated object pose)."""
    if cfg.euler_rot:
        def rot_to_vec(R):
            return matrix_to_euler_angles(R, "XYZ")

        def vec_to_rot(v):
            return euler_angles_to_matrix(v, "XYZ")
    else:
        rot_to_vec, vec_to_rot = matrix_to_axis_angle, axis_angle_to_matrix

    def params_from_obj_pose(pose_obj):
        p = invert_pose(pose_obj) if cfg.opt_cam_pose else pose_obj
        return rot_to_vec(p[:, :3]), p[:, 3]

    def obj_pose_from_params(rot_vec, trans_vec):
        pose = jnp.concatenate(
            [vec_to_rot(rot_vec), trans_vec[:, None]], axis=-1)
        return invert_pose(pose) if cfg.opt_cam_pose else pose

    return params_from_obj_pose, obj_pose_from_params


def _make_optimizer(cfg: TTOConfig):
    # Base learning rates only. The 2^-(t//lr_half_interval) halving is applied
    # by scaling the UPDATES with the wall iteration t inside the loop: optax's
    # schedule count would (a) reset to zero when the optimizer state is
    # re-created at each interval boundary (un-halving the lr) and (b) skip the
    # replay iterations, both diverging from the reference's nopts-based
    # schedule. Scaling updates is exact for torch AdamW semantics because the
    # decoupled weight decay is also multiplied by lr.
    return optax.multi_transform(
        {
            "shape": optax.adamw(cfg.lr_shape, weight_decay=cfg.weight_decay),
            "texture": optax.adamw(cfg.lr_texture, weight_decay=cfg.weight_decay),
            "pose": optax.adamw(cfg.lr_pose, weight_decay=cfg.weight_decay),
        },
        TTOParams(shapecode="shape", texturecode="texture", rot_vec="pose", trans_vec="pose"),
    )


def effective_wlh(wlh_gt, wlh_pred, mode: int):
    """Reference pred_wlh handling (optimizer_nuscenes.py:602-615): mode 2 keeps
    predicted volume but snaps w and h to the dataset mean."""
    if mode == 0 or wlh_pred is None:
        return wlh_gt
    if mode == 1:
        return wlh_pred
    w = jnp.full_like(wlh_pred[..., 0], WLH_MEAN[0])
    h = jnp.full_like(wlh_pred[..., 2], WLH_MEAN[2])
    l = wlh_pred[..., 0] * wlh_pred[..., 1] * wlh_pred[..., 2] / (w * h)
    return jnp.stack([w, l, h], axis=-1)


def run_tto_batch(model, variables, batch: ObjectBatch, mean_shape, mean_texture,
                  cfg: TTOConfig, key):
    """Run the full TTO pipeline for a batch of objects in one XLA program.

    Returns a dict of stacked results:
      codes/poses at CODE_SAVE_ITERS, per-iteration metric curves, and the
      refiner trajectory. All leaves have leading dim B.
    """
    B = batch.img_in.shape[0]
    if cfg.use_aabb_render and cfg.sym_loss_coef > 0:
        raise ValueError("sym_loss requires the frustum renderer (sample reuse)")
    if cfg.field_impl == "auto":
        from supnerf_tpu.ops.pallas_field import resolve_field_impl_cfg

        cfg = resolve_field_impl_cfg(cfg, model, variables)

    # ---- 1) encoder (per-object BN batch stats via vmap over batch-of-one) --
    # SUPNeRF encoders return (shape, texture, pose, uv, wlh); AutoRF-style
    # baselines return (shape, texture) and have no pose stream (reference
    # optimize_objs_w_pose :309-327 — their pose starts at the injected-error
    # init with no feed-forward refinement). CodeNeRF has no encoder at all.
    has_encoder = hasattr(type(model), "encode_img")
    has_refiner = hasattr(type(model), "pose_update")
    latent = mean_shape.shape[-1]

    def encode_one(img):
        out, _ = model.apply(
            variables, img[None], True, method=type(model).encode_img,
            mutable=["batch_stats"],
        )
        if len(out) == 2:
            sc, tc = out
            pc = jnp.zeros((1, latent))
            uv = jnp.zeros((1, 16))
            wlh_pred = jnp.zeros((1, 3))
        else:
            sc, tc, pc, uv, wlh_pred = out
            if wlh_pred is None:
                wlh_pred = jnp.zeros((1, 3))
        return sc[0], tc[0], pc[0], uv[0], wlh_pred[0]

    if has_encoder:
        shapecode_enc, texturecode_enc, posecode, uv_direct, wlh_pred = jax.vmap(
            encode_one)(batch.img_in)
    else:
        shapecode_enc = jnp.broadcast_to(mean_shape, (B, latent))
        texturecode_enc = jnp.broadcast_to(mean_texture, (B, latent))
        posecode = jnp.zeros((B, latent))
        uv_direct = jnp.zeros((B, 16))
        wlh_pred = jnp.zeros((B, 3))

    shapecode0 = (shapecode_enc + mean_shape[None]) / 2
    texturecode0 = (texturecode_enc + mean_texture[None]) / 2

    # predicted wlh only when the model actually has the head (reference gates
    # on net_hyperparams pred_wlh, optimizer_nuscenes.py:602); otherwise the
    # zeros fallback would make obj_diag 0 and divide the rays by zero
    model_predicts_wlh = has_encoder and bool(getattr(model, "pred_wlh", False))
    wlh_use = effective_wlh(
        batch.wlh, wlh_pred if (cfg.pred_wlh_mode and model_predicts_wlh) else None,
        cfg.pred_wlh_mode if model_predicts_wlh else 0)
    obj_diag = jnp.linalg.norm(wlh_use, axis=-1)

    # ---- 2) feed-forward pose refinement ------------------------------------
    if has_refiner:
        def pose_update_fn(pc, uv16):
            return model.apply(variables, pc[None], uv16[None],
                               method=type(model).pose_update)[0]

        def refine_one(pc, pose0, wlh, roi, K, K_inv):
            return fw_pose_refine(pose_update_fn, pc, pose0, wlh, roi, K, K_inv,
                                  iters=cfg.reg_iters, box_fac=cfg.box_fac)

        pose_traj = jax.vmap(refine_one)(
            posecode, batch.pose_init, wlh_use,
            batch.roi_refine.astype(jnp.float32), batch.K, batch.K_inv,
        )  # (B, reg_iters+1, 3, 4)
    else:
        # no pose stream: the "trajectory" replays the initial pose
        pose_traj = jnp.broadcast_to(
            batch.pose_init[:, None], (B, cfg.reg_iters + 1, 3, 4))

    # ---- 3) jitted optimization loop (vmapped over objects) -----------------
    tx = _make_optimizer(cfg)
    keys = jax.random.split(key, B)

    if cfg.field_impl == "pallas":
        from supnerf_tpu.ops.pallas_field import (
            field_apply_pallas,
            resolve_decoder_kernel_config,
        )
        from supnerf_tpu.ops.pallas_render import (
            make_composite_aabb_grad_fn,
            make_composite_fn,
            make_composite_grad_fn,
        )

        packed, kern_kw = resolve_decoder_kernel_config(model, variables)

        def make_field(sc, tc):
            def f(xyz, vd):
                return field_apply_pallas(packed, xyz, vd, sc, tc, **kern_kw)

            return f

        def make_composite(sc, tc):
            # forward-only fused field+compositing kernel for the grad-free
            # renders inside the loop (the per-iteration lidar depth metric)
            return make_composite_fn(packed, kern_kw, sc, tc)

        # the render backward has no weight-grad accumulators, so unlike the
        # field backward it fits (and wins 5-6% on the full TTO loop) at
        # tile_bwd=1024 — scripts/sweep_tto_tiles.py, VALIDATION.md round 3
        render_bwd_kw = (
            {} if kern_kw["interpret"] else {"tile_bwd": 1024})

        def make_composite_grad(sc, tc):
            # DIFFERENTIABLE fused render for the loss render: forward and
            # backward each run as one kernel (in-VMEM compositing VJP), so
            # no per-point tensor touches HBM in the hot loop
            return make_composite_grad_fn(packed, kern_kw, sc, tc,
                                          **render_bwd_kw)

        def make_composite_aabb_grad(sc, tc):
            # per-ray-z variant for the AABB-bounded loss render (demo
            # protocol, reference render_rays_v3)
            return make_composite_aabb_grad_fn(packed, kern_kw, sc, tc,
                                               **render_bwd_kw)
    else:
        def make_field(sc, tc):
            return lambda xyz, vd: model.apply(variables, xyz, vd, sc, tc)

        def make_composite(sc, tc):
            return None

        def make_composite_grad(sc, tc):
            return None

        def make_composite_aabb_grad(sc, tc):
            return None

    params_from_obj_pose, obj_pose_from_params = pose_param_fns(cfg)

    def optimize_one(sc0, tc0, traj, obj_key, rgb_tgt, occ_tgt, K,
                     roi_nerf, diag, wlh_obj, pose_gt, lid_u, lid_v, lid_d, lid_m):
        refined = traj[-1]
        rot_vec0, trans_vec0 = params_from_obj_pose(refined)
        params0 = TTOParams(
            shapecode=sc0,
            texturecode=tc0,
            rot_vec=rot_vec0,
            trans_vec=trans_vec0,
        )
        opt_state0 = tx.init(params0)

        def field_fn(p):
            f = make_field(p.shapecode, p.texturecode)
            return jax.checkpoint(f) if cfg.remat_field else f

        def pose_from_params(p):
            return obj_pose_from_params(p.rot_vec, p.trans_vec)

        def loss_fn(p, pose_override, use_replay, it_key):
            pose_obj = jnp.where(use_replay, pose_override, pose_from_params(p))
            cam = invert_pose(pose_obj)
            need_samples = cfg.sym_loss_coef > 0
            sym_flip = None
            if cfg.sym_aug:
                # random lateral flip of the sampled points (reference
                # render_rays_v2 sym_aug, utils.py:474-477)
                sym_flip = jax.random.bernoulli(jax.random.fold_in(it_key, 3))
            if cfg.use_aabb_render:
                from supnerf_tpu.render.renderer import render_rays_aabb

                out = render_rays_aabb(
                    field_fn(p), it_key, cam, K, roi_nerf, wlh_obj,
                    n_samples=cfg.n_samples, im_sz=cfg.render_im_sz,
                    shapenet_obj_cood=cfg.shapenet_obj_cood,
                    kitti2nusc=cfg.kitti2nusc, sym_flip=sym_flip,
                    adjust_scale=cfg.adjust_scale,
                    composite_fn=make_composite_aabb_grad(p.shapecode,
                                                          p.texturecode),
                )
            else:
                out = render_rays_frustum(
                    field_fn(p), it_key, cam, K, roi_nerf, diag,
                    n_samples=cfg.n_samples, im_sz=cfg.render_im_sz,
                    shapenet_obj_cood=cfg.shapenet_obj_cood,
                    kitti2nusc=cfg.kitti2nusc, sym_flip=sym_flip,
                    return_samples=need_samples,
                    composite_fn=make_composite_grad(p.shapecode,
                                                     p.texturecode),
                )
            loss_rgb = rgb_loss_masked(out["rgb"], rgb_tgt, occ_tgt)
            loss_occ = occupancy_loss(out["acc_trans"], occ_tgt)
            loss = loss_rgb + cfg.loss_occ_coef * loss_occ
            if cfg.obj_sz_reg:
                from supnerf_tpu.tto.regularizers import obj_sz_loss

                loss = loss + cfg.loss_obj_sz_coef * obj_sz_loss(
                    field_fn(p), jax.random.fold_in(it_key, 7), wlh_obj, diag,
                    cfg.shapenet_obj_cood)
            if need_samples:
                from supnerf_tpu.tto.regularizers import sym_loss

                loss = loss + cfg.sym_loss_coef * sym_loss(
                    field_fn(p), out["xyz"], out["viewdir"], out["sigmas"],
                    cfg.shapenet_obj_cood)
            psnr = masked_psnr(out["rgb"], rgb_tgt, occ_tgt)
            return loss, (psnr, pose_obj)

        def depth_metric(p, pose_obj, it_key):
            cam = invert_pose(pose_obj)
            out = render_rays_at_pixels(
                field_fn(p), it_key, cam, K, lid_u, lid_v, diag,
                n_samples=cfg.n_samples, shapenet_obj_cood=cfg.shapenet_obj_cood,
                kitti2nusc=cfg.kitti2nusc,
                composite_fn=make_composite(p.shapecode, p.texturecode),
            )
            err = jnp.abs(out["depth"] - lid_d) * lid_m
            return jnp.sum(err) / (jnp.sum(lid_m) + 1e-8)

        def iter_step(carry, t):
            params, opt_state = carry
            it_key = jax.random.fold_in(obj_key, t)
            use_replay = t <= cfg.reg_iters
            replay_pose = traj[jnp.minimum(t, cfg.reg_iters)]
            (loss, (psnr, pose_obj)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params, replay_pose, use_replay, it_key)

            err_R, err_T = calc_pose_err(pose_obj[None], pose_gt[None])
            d_err = depth_metric(params, pose_obj, jax.random.fold_in(it_key, 1))

            if not cfg.opt_pose:
                grads = grads.replace(rot_vec=jnp.zeros_like(grads.rot_vec),
                                      trans_vec=jnp.zeros_like(grads.trans_vec))

            # optimizer re-created (moments reset) at each lr-half boundary,
            # BEFORE this iteration's step: the reference rebuilds the
            # optimizer when nopts reaches the boundary (set_optimizers_w_
            # poses after the nopts increment, optimizer_nuscenes.py:780-783)
            # so iteration k*interval itself steps with fresh moments
            reset = jnp.logical_and(t > 0, (t % cfg.lr_half_interval) == 0)
            fresh = tx.init(params)
            opt_state = jax.tree.map(
                lambda f, s: jnp.where(reset, f, s), fresh, opt_state)
            updates, new_opt_state = tx.update(grads, opt_state, params)
            # lr halving by wall iteration (see _make_optimizer)
            lr_scale = 2.0 ** (-(t // cfg.lr_half_interval)).astype(jnp.float32)
            updates = jax.tree.map(lambda u: u * lr_scale, updates)
            new_params = optax.apply_updates(params, updates)
            if not cfg.opt_pose:
                # pose params are not in the reference optimizer at all in this
                # mode, so they must not even receive AdamW weight decay
                new_params = new_params.replace(rot_vec=params.rot_vec,
                                                trans_vec=params.trans_vec)
            # replay iterations perform no update (reference :768-769)
            new_params = jax.tree.map(
                lambda a, b: jnp.where(use_replay, a, b), params, new_params)
            new_opt_state = jax.tree.map(
                lambda a, b: jnp.where(use_replay, a, b), opt_state, new_opt_state)

            emit = {
                "psnr": psnr,
                "rot_err": err_R[0],
                "trans_err": err_T[0],
                "depth_err": d_err,
                "loss": loss,
                "shapecode": params.shapecode,
                "texturecode": params.texturecode,
                "pose": pose_obj,
            }
            return (new_params, new_opt_state), emit

        (params_f, _), curves = jax.lax.scan(
            iter_step, (params0, opt_state0), jnp.arange(cfg.num_opts))

        # the saved FINAL pose is the pose of the last RENDERED iteration
        # (pre-final-step): the reference stores pred_obj_poses from loop
        # body num_opts-1 into optimized_poses[...][-1]
        # (optimizer_nuscenes.py:788) while CODES take their post-loop values
        final_pose = curves["pose"][-1]
        # snapshot gather: save iters < num_opts come from the curves (values
        # captured BEFORE the update at that iteration), the last from final.
        save_idx = jnp.array([min(i, cfg.num_opts - 1) for i in CODE_SAVE_ITERS])
        sc_saved = curves["shapecode"][save_idx]
        tc_saved = curves["texturecode"][save_idx]
        pose_saved = curves["pose"][save_idx]
        is_final = jnp.array([i >= cfg.num_opts for i in CODE_SAVE_ITERS])
        sc_saved = jnp.where(is_final[:, None], params_f.shapecode[None], sc_saved)
        tc_saved = jnp.where(is_final[:, None], params_f.texturecode[None], tc_saved)
        pose_saved = jnp.where(is_final[:, None, None], final_pose[None], pose_saved)

        return {
            "shapecodes_saved": sc_saved,        # (n_code, latent)
            "texturecodes_saved": tc_saved,      # (n_code, latent)
            "poses_saved": pose_saved,           # (n_code, 3, 4)
            "final_pose": final_pose,
            "final_shapecode": params_f.shapecode,
            "final_texturecode": params_f.texturecode,
            "psnr": curves["psnr"],              # (num_opts,)
            "rot_err": curves["rot_err"],
            "trans_err": curves["trans_err"],
            "depth_err": curves["depth_err"],
            "loss": curves["loss"],
            **({"shapecode_curve": curves["shapecode"],
                "texturecode_curve": curves["texturecode"],
                "pose_curve": curves["pose"]} if cfg.emit_code_curves else {}),
        }

    results = jax.vmap(optimize_one)(
        shapecode0, texturecode0, pose_traj, keys,
        batch.rgb_tgt, batch.occ_tgt, batch.K,
        batch.roi_nerf.astype(jnp.float32), obj_diag, wlh_use, batch.obj_pose_gt,
        batch.lidar_u, batch.lidar_v, batch.lidar_depth, batch.lidar_valid,
    )
    results["pose_traj"] = pose_traj
    results["uv_direct"] = uv_direct
    results["wlh_pred"] = wlh_pred
    results["wlh_used"] = wlh_use
    return results


def make_tto_fn(model, cfg: TTOConfig):
    """Return a jitted TTO entry: (variables, batch, mean_shape, mean_texture,
    key) -> results. model/cfg are static (compiled in)."""

    def fn(variables, batch, mean_shape, mean_texture, key):
        return run_tto_batch(model, variables, batch, mean_shape, mean_texture, cfg, key)

    return jax.jit(fn)
