"""Unified SUP-NeRF training step (joint pose + NeRF), data-parallel via pjit.

Capability-equivalent of the reference training loss and optimizer wiring
(/root/reference/src/trainer_unified_nuscenes.py: ParallelModel.forward :27-148,
pose_regress :150-195, set_optimizers :414-421, get_learning_rate :423-429,
make_codes :437-447), re-designed TPU-first:

  - torch DataParallel scatter/gather (:227-229) becomes a jit-compiled step
    whose batch axis is sharded over a 1-D device mesh; XLA inserts the
    gradient all-reduce over ICI. Parameters and the per-instance code tables
    are replicated.
  - BatchNorm statistics are computed over the GLOBAL batch (psum across the
    mesh), where DataParallel used per-replica statistics — a strictly more
    consistent estimator at the same math.
  - The per-instance latent tables are dense (N_instances, latent) arrays
    updated through gather/scatter-add gradients, the functional equivalent of
    nn.Embedding rows receiving sparse gradients.

Loss terms (coefficients from the config json; see ParallelModel.forward):
  loss_rgb + occ_coef*loss_occ                     always
  + pose_coef * direct-UV corner loss              when encoder active
  + pose_coef * mean(3 unrolled refiner losses)    when encoder active
  + code_coef * code-consistency loss              when active and im_enc_rate<1
  + wlh_coef * wlh regression loss                 when pred_wlh finetuning
"""
from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import struct

from supnerf_tpu.geometry.boxes import corners_of_box, normalize_by_roi, view_points
from supnerf_tpu.geometry.rotations import axis_angle_to_matrix, matrix_to_axis_angle
from supnerf_tpu.ops.volume_render import (
    occupancy_loss,
    rgb_loss_masked,
    volume_render,
)


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    lr_model: float = 1e-4
    lr_codes: float = 1e-4
    lr_interval_model: int = 40000
    lr_interval_codes: int = 40000
    loss_occ_coef: float = 0.1
    loss_code_coef: float = 0.1
    loss_pose_coef: float = 0.01
    loss_wlh_coef: float = 1.0
    im_enc_rate: float = 1.0
    finetune_wlh: bool = False
    latent_dim: int = 256
    grad_clip: float = 0.0        # >0 enables global-norm gradient clipping
    lr_schedule_type: str = "step"  # "step" (reference) or "cosine"
    cosine_total_steps: int = 200000
    field_impl: str = "flax"      # "pallas": the NeRF branch (the step's FLOP
                                  # bulk, B*1024*64 point evals) runs on the
                                  # fused fwd+bwd train kernels with in-VMEM
                                  # weight-grad accumulation (no activation
                                  # stash / XLA remat); CodeNeRF-style
                                  # decoders only. "auto" (the CLI default)
                                  # is resolved by the trainer via
                                  # ops.pallas_field.resolve_field_impl.


@struct.dataclass
class TrainBatch:
    """One device-global training batch (leading axis B, shardable on 'dp').

    COMPACT ray form: xyz/viewdir may instead be (B, R, 3) — the transformed,
    diag-normalized ray origin and unit direction from
    ray_prep.prepare_pixel_samples(compact=True); expand_compact_rays
    reconstructs the per-sample point grid on device at the top of the train
    step. This cuts the step's host->device transfer ~60x on the two largest
    tensors (~75 MB -> ~1.2 MB at the published batch 48)."""

    img_in: Any       # (B, S_in, S_in, 3)
    xyz: Any          # (B, R, S, 3) pre-sampled points (data-pipeline ray prep)
    viewdir: Any      # (B, R, S, 3)
    z_vals: Any       # (B, S) shared-per-image sample depths
    rgb_tgt: Any      # (B, R, 3)
    occ_pixels: Any   # (B, R, 1)
    src_pose: Any     # (B, 3, 4) pose with injected error (refiner source)
    tgt_uv: Any       # (B, 2, 8) projected GT box corners
    tgt_uv_aug: Any   # (B, 2, 8) corners with wlh augmentation
    wlh: Any          # (B, 3)
    wlh_aug: Any      # (B, 3)
    roi: Any          # (B, 4)
    K: Any            # (B, 3, 3)
    code_idx: Any     # (B,) int32 instance index into the code tables


@struct.dataclass
class TrainState:
    params: Any
    batch_stats: Any
    shape_codes: Any      # (N_instances, latent)
    texture_codes: Any    # (N_instances, latent)
    opt_state_model: Any
    opt_state_codes: Any
    optimized_idx: Any    # (N_instances,) float32 1.0 if instance ever trained
    niter: Any            # int32 scalar


def expand_compact_rays(batch: TrainBatch) -> TrainBatch:
    """Reconstruct the (B, R, S, 3) point grid from compact (B, R, 3) rays:
    xyz[b,r,s] = origin[b,r] + dir[b,r] * z[b,s]/diag[b]. Exact up to fp
    reassociation vs host-side expansion (the flip/permute transforms are
    linear and already applied to origin/dir on the host). No-op for batches
    already carrying expanded rays (shape-dispatched at trace time)."""
    if batch.xyz.ndim != 3:
        return batch
    diag = jnp.linalg.norm(batch.wlh, axis=-1)                  # (B,)
    scale = batch.z_vals / diag[:, None]                        # (B, S)
    xyz = (batch.xyz[:, :, None, :]
           + batch.viewdir[:, :, None, :] * scale[:, None, :, None])
    vd = jnp.broadcast_to(batch.viewdir[:, :, None, :], xyz.shape)
    return batch.replace(xyz=xyz, viewdir=vd)


def make_code_table(key, n_instances: int, latent_dim: int):
    """randn / sqrt(latent/2) init (reference make_codes :437-447)."""
    return jax.random.normal(key, (n_instances, latent_dim)) / jnp.sqrt(latent_dim / 2)


def _make_optimizers(cfg: TrainConfig):
    def sched(lr, interval):
        if cfg.lr_schedule_type == "cosine":
            return optax.cosine_decay_schedule(lr, cfg.cosine_total_steps)
        return lambda t: lr * 2.0 ** (-(t // interval))

    def build(lr, interval):
        tx = optax.adamw(sched(lr, interval), weight_decay=0.01)
        if cfg.grad_clip > 0:
            tx = optax.chain(optax.clip_by_global_norm(cfg.grad_clip), tx)
        return tx

    return (build(cfg.lr_model, cfg.lr_interval_model),
            build(cfg.lr_codes, cfg.lr_interval_codes))


def init_train_state(model, key, n_instances: int, cfg: TrainConfig,
                     img_size: int = 128, mean_shape=None, mean_texture=None):
    from supnerf_tpu.models.initialization import init_model_variables

    k1, k2, k3 = jax.random.split(key, 3)
    variables = init_model_variables(model, k1, img_size=img_size)
    if mean_shape is not None:
        shape_codes = jnp.broadcast_to(mean_shape, (n_instances, cfg.latent_dim)).copy()
        texture_codes = jnp.broadcast_to(mean_texture, (n_instances, cfg.latent_dim)).copy()
    else:
        shape_codes = make_code_table(k2, n_instances, cfg.latent_dim)
        texture_codes = make_code_table(k3, n_instances, cfg.latent_dim)
    tx_model, tx_codes = _make_optimizers(cfg)
    return TrainState(
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        shape_codes=shape_codes,
        texture_codes=texture_codes,
        opt_state_model=tx_model.init(variables["params"]),
        opt_state_codes=tx_codes.init((shape_codes, texture_codes)),
        optimized_idx=jnp.zeros((n_instances,), jnp.float32),
        niter=jnp.asarray(0, jnp.int32),
    )


def pose_regress_step(model, variables, posecode, src_pose, tgt_uv, wlh, roi, K):
    """One unrolled pose-refinement training iteration
    (reference pose_regress :150-195). Returns (per-corner L2 loss (B, 8),
    pred_pose (B, 3, 4)). Gradients flow through the delta only at the corner
    projection (src detached there) but through the chain at composition."""
    src_uv = view_points(
        corners_of_box(jax.lax.stop_gradient(src_pose), wlh), K, normalize=True
    )
    src_uv_norm, dim = normalize_by_roi(src_uv[:, :2, :], roi, need_square=True)
    bsize = src_uv.shape[0]
    delta = model.apply(
        {"params": variables["params"], "batch_stats": variables["batch_stats"]},
        posecode, src_uv_norm.reshape(bsize, -1), method=type(model).pose_update,
    )
    d_rot = delta[:, :3] * (2 * jnp.pi)
    d_uv = delta[:, 3:5] * dim[:, None]
    z_ratio = delta[:, 5] + 1.0

    rot_vec_src = matrix_to_axis_angle(src_pose[:, :, :3])
    pred_R = axis_angle_to_matrix(rot_vec_src + d_rot)
    T_src = src_pose[:, :, 3]
    uvz = jnp.einsum("bij,bj->bi", K, T_src)
    u = uvz[:, 0] / uvz[:, 2] + d_uv[:, 0]
    v = uvz[:, 1] / uvz[:, 2] + d_uv[:, 1]
    Z = T_src[:, 2] * z_ratio
    pred_T = jnp.einsum("bij,bj->bi", jnp.linalg.inv(K), jnp.stack([u * Z, v * Z, Z], -1))
    pred_pose = jnp.concatenate([pred_R, pred_T[:, :, None]], axis=-1)

    pred_uv = view_points(corners_of_box(pred_pose, wlh), K, normalize=True)
    # eps inside the sqrt: its gradient is infinite at exactly-matching corners
    # (d sqrt(x)/dx -> inf as x -> 0), which NaNs training once predictions get
    # good; 1e-8 bounds the grad at 1e4 with a <1e-4-pixel loss offset
    loss = jnp.sqrt(jnp.sum((pred_uv[:, :2, :] - tgt_uv) ** 2, axis=-2) + 1e-8)
    return loss, pred_pose


def _apply_render(model, cfg: TrainConfig, variables, batch: "TrainBatch",
                  shapecodes, texturecodes, mesh=None):
    """The NeRF branch — field evaluation AND volume compositing, the step's
    FLOP bulk (B x 1024 rays x 64 samples). Returns (rgb_rays (B, R, 3),
    depth (B, R), acc_trans (B, R)).

    cfg.field_impl='pallas' runs the WHOLE branch on the fused train render
    kernels (ops/pallas_render.field_composite_train_pallas): per-object
    latent blocks indexed by tile, compositing computed in-VMEM on both
    passes, and decoder weight gradients accumulated in VMEM across the
    sequential grid — no HBM activation stash and no XLA rematerialization
    of the 9-layer chain. Measured at the published batch-48 shape on v5e:
    fusing compositing (and dropping the per-point (sigma, rgb)/(dsig, drgb)
    boundary) cut the step 161.6 -> 151.9 ms at the old tile_bwd=512, and
    freeing the per-point output blocks made tile_bwd=1024 VMEM-feasible
    (108.5 ms isolated render fwd+bwd vs 121.7 at 512 —
    scripts/sweep_train_render_tiles.py), so the train path overrides the
    shared tile_bwd default below.

    With a mesh, the kernel runs under shard_map over the data axis: XLA's
    SPMD partitioner cannot split a custom call, so without this it
    all-gathers the full point batch to every device and runs the kernel
    replicated (verified in HLO). shard_map keeps each device on its local
    batch shard; the cotangent of the replicated weights is psum'd by the
    shard_map transpose — exactly the DP gradient all-reduce."""
    if cfg.field_impl == "pallas":
        from supnerf_tpu.ops.pallas_field import resolve_decoder_kernel_config
        from supnerf_tpu.ops.pallas_render import field_composite_train_pallas

        packed, kern_kw = resolve_decoder_kernel_config(model, variables)
        if not kern_kw["interpret"]:
            # render-bwd VMEM fit differs from the field-bwd kernel the
            # shared default was swept for: per-ray (128-lane) output blocks
            # replace the per-point dsig/drgb ones, and tile_bwd=1024 both
            # compiles and wins 12% (sweep table in VALIDATION.md round 3)
            kern_kw = {**kern_kw, "tile_bwd": 1024}

        def run(packed_r, xyz_l, vd_l, z_l, sc_l, tc_l):
            # data_grads=False: the batch's rays/z are DATA — their
            # cotangents are dead, and skipping them drops the backward
            # kernel's 42.7x-padded per-point (m, 3) HBM writes
            return field_composite_train_pallas(packed_r, xyz_l, vd_l, z_l,
                                                sc_l, tc_l, data_grads=False,
                                                **kern_kw)

        if mesh is not None:
            from jax.sharding import PartitionSpec as P

            from supnerf_tpu.parallel.mesh import DATA_AXIS

            dp = P(DATA_AXIS)
            return jax.shard_map(
                run, mesh=mesh,
                in_specs=(P(), dp, dp, dp, dp, dp),
                out_specs=(dp, dp, dp),
                check_vma=False,
            )(packed, batch.xyz, batch.viewdir, batch.z_vals,
              shapecodes, texturecodes)
        return run(packed, batch.xyz, batch.viewdir, batch.z_vals,
                   shapecodes, texturecodes)
    sigmas, rgbs = model.apply(variables, batch.xyz, batch.viewdir,
                               shapecodes[:, None, None, :],
                               texturecodes[:, None, None, :])
    return volume_render(sigmas, rgbs, batch.z_vals[:, None, :])


def unified_loss(model, params, batch_stats, codes, batch: TrainBatch,
                 cfg: TrainConfig, enc_active, key, mesh=None):
    """Full SUP-NeRF training loss. codes = (shapecode_batch, texturecode_batch)
    gathered rows of the instance tables. Returns (loss_total, aux)."""
    shapecode_tbl, texturecode_tbl = codes
    variables = {"params": params, "batch_stats": batch_stats}

    (sc_enc, tc_enc, posecode, uv_direct, wlh_pred), bn_updates = model.apply(
        variables, batch.img_in, True, method=type(model).encode_img,
        mutable=["batch_stats"],
    )
    losses = {}
    loss_total = 0.0

    if cfg.finetune_wlh and wlh_pred is not None:
        losses["loss_wlh"] = jnp.mean((wlh_pred - batch.wlh) ** 2)
        loss_total += cfg.loss_wlh_coef * losses["loss_wlh"]

    # direct box-UV regression loss (corners predicted in ROI-normalized frame,
    # mapped back to image pixels; reference :64-74)
    uv_direct = uv_direct.reshape(-1, 2, 8)
    dim = jnp.maximum(batch.roi[:, 2] - batch.roi[:, 0], batch.roi[:, 3] - batch.roi[:, 1])
    uv_img = uv_direct * (dim[:, None, None] / 2)
    cx = (batch.roi[:, 0] + batch.roi[:, 2]) / 2
    cy = (batch.roi[:, 1] + batch.roi[:, 3]) / 2
    uv_img = uv_img + jnp.stack([cx, cy], axis=-1)[:, :, None]
    loss_uv = jnp.sqrt(jnp.sum((uv_img - batch.tgt_uv) ** 2, axis=-2) + 1e-8)
    losses["loss_pose_direct"] = jnp.mean(loss_uv)
    loss_total += jnp.where(enc_active, cfg.loss_pose_coef * losses["loss_pose_direct"], 0.0)

    # code consistency between encoder and per-instance tables (reference :77-84)
    losses["loss_code"] = jnp.mean(
        (sc_enc - shapecode_tbl) ** 2 + (tc_enc - texturecode_tbl) ** 2
    )
    if cfg.im_enc_rate < 1.0:
        loss_total += jnp.where(enc_active, cfg.loss_code_coef * losses["loss_code"], 0.0)
    shapecode = jnp.where(enc_active, (shapecode_tbl + sc_enc) / 2, shapecode_tbl)
    texturecode = jnp.where(enc_active, (texturecode_tbl + tc_enc) / 2, texturecode_tbl)

    # three unrolled pose-refiner iterations (reference :89-115)
    new_vars = {"params": params, "batch_stats": batch_stats}
    l1, p1 = pose_regress_step(model, new_vars, posecode, batch.src_pose,
                               batch.tgt_uv_aug, batch.wlh_aug, batch.roi, batch.K)
    l2, p2 = pose_regress_step(model, new_vars, posecode, p1,
                               batch.tgt_uv_aug, batch.wlh_aug, batch.roi, batch.K)
    l3, p3 = pose_regress_step(model, new_vars, posecode, p2,
                               batch.tgt_uv_aug, batch.wlh_aug, batch.roi, batch.K)
    losses["loss_pose_iter1"] = jnp.mean(l1)
    losses["loss_pose_iter2"] = jnp.mean(l2)
    losses["loss_pose_iter3"] = jnp.mean(l3)
    pose_loss = (losses["loss_pose_iter1"] + losses["loss_pose_iter2"]
                 + losses["loss_pose_iter3"]) / 3
    loss_total += jnp.where(enc_active, cfg.loss_pose_coef * pose_loss, 0.0)

    # NeRF branch (reference :120-146)
    rgb_rays, depth_rays, acc_trans = _apply_render(
        model, cfg, variables, batch, shapecode, texturecode, mesh=mesh)
    loss_rgb = rgb_loss_masked(rgb_rays, batch.rgb_tgt, batch.occ_pixels, axis=(-2, -1))
    losses["loss_rgb"] = jnp.mean(loss_rgb)
    losses["psnr"] = -10.0 * jnp.log(jnp.mean(loss_rgb)) / jnp.log(10.0)
    loss_occ = occupancy_loss(acc_trans, batch.occ_pixels, axis=(-2, -1))
    losses["loss_occ"] = jnp.mean(loss_occ)
    losses["loss_reg"] = jnp.mean(
        jnp.linalg.norm(shapecode, axis=-1) + jnp.linalg.norm(texturecode, axis=-1)
    )
    loss_total += losses["loss_rgb"] + cfg.loss_occ_coef * losses["loss_occ"]
    losses["loss_total"] = loss_total

    aux = {
        "losses": losses,
        "batch_stats": bn_updates["batch_stats"],
        "pred_pose": p3,
        "uv_direct_img": uv_img,
        "shapecode_out": shapecode,
        "texturecode_out": texturecode,
    }
    return loss_total, aux


def nerf_only_loss(model, params, batch_stats, codes, batch: TrainBatch,
                   cfg: TrainConfig, enc_active, mesh=None):
    """NeRF-only training loss for AutoRF/CodeNeRF baselines (reference
    trainer_nerf_nuscenes.py ParallelModel.forward :18-66): when the encoder
    triggers, its codes REPLACE the table codes (not averaged) and a code-
    consistency loss is added; CodeNeRF has no encoder so the table codes are
    always used."""
    shapecode_tbl, texturecode_tbl = codes
    variables = {"params": params, "batch_stats": batch_stats}
    losses = {}
    has_encoder = hasattr(type(model), "encode_img")

    if has_encoder:
        (sc_enc, tc_enc), bn_updates = model.apply(
            variables, batch.img_in, True, method=type(model).encode_img,
            mutable=["batch_stats"],
        )
        loss_code = jnp.mean((sc_enc - shapecode_tbl) ** 2 + (tc_enc - texturecode_tbl) ** 2)
        shapecode = jnp.where(enc_active, sc_enc, shapecode_tbl)
        texturecode = jnp.where(enc_active, tc_enc, texturecode_tbl)
        losses["loss_code"] = jnp.where(enc_active, loss_code, 0.0)
        new_bs = bn_updates["batch_stats"]
    else:
        shapecode, texturecode = shapecode_tbl, texturecode_tbl
        losses["loss_code"] = jnp.float32(0.0)
        new_bs = batch_stats

    rgb_rays, _, acc_trans = _apply_render(
        model, cfg, variables, batch, shapecode, texturecode, mesh=mesh)
    loss_rgb = rgb_loss_masked(rgb_rays, batch.rgb_tgt, batch.occ_pixels, axis=(-2, -1))
    loss_occ = occupancy_loss(acc_trans, batch.occ_pixels, axis=(-2, -1))
    losses["loss_rgb"] = jnp.mean(loss_rgb)
    losses["loss_occ"] = jnp.mean(loss_occ)
    losses["psnr"] = -10.0 * jnp.log(jnp.mean(loss_rgb)) / jnp.log(10.0)
    losses["loss_reg"] = jnp.mean(
        jnp.linalg.norm(shapecode, axis=-1) + jnp.linalg.norm(texturecode, axis=-1)
    )
    loss_total = (losses["loss_rgb"] + cfg.loss_occ_coef * losses["loss_occ"]
                  + cfg.loss_code_coef * losses["loss_code"])
    losses["loss_total"] = loss_total
    return loss_total, {"losses": losses, "batch_stats": new_bs,
                        "shapecode_out": shapecode, "texturecode_out": texturecode}


class _PackedStep:
    """A jitted train step returning (state, metrics_vector) plus the static
    metric-name order for host-side unpacking (one device->host buffer per
    step instead of one per scalar — through this environment's TPU tunnel
    each output buffer is its own fetch). Names are captured at trace time,
    so metric_names() is available after the first call."""

    def __init__(self, fn, names_holder):
        self._fn = fn
        self._names = names_holder

    def __call__(self, *args, **kwargs):
        return self._fn(*args, **kwargs)

    def lower(self, *args, **kwargs):
        return self._fn.lower(*args, **kwargs)

    def metric_names(self):
        return self._names[0] if self._names else None

    def unpack(self, vec):
        """metrics vector (host-fetched) -> {name: float} dict."""
        import numpy as np

        return {k: float(v) for k, v in zip(self.metric_names(),
                                            np.asarray(vec))}


def make_train_step(model, cfg: TrainConfig, donate: bool = True,
                    loss_mode: str = "unified", mesh=None,
                    packed_metrics: bool = False):
    """Build the jitted train step: (state, batch, key) -> (state, metrics).

    Shard the batch's leading axis over the mesh and replicate the state; jit
    with these shardings and XLA handles the cross-device gradient reduction.

    packed_metrics=True returns a _PackedStep whose second output is ONE
    (n_metrics,) float32 vector (static name order via .metric_names()); the
    default returns the metrics dict.
    """
    tx_model, tx_codes = _make_optimizers(cfg)
    names_holder: list = []
    train_step = _make_step_body(model, cfg, loss_mode, mesh, tx_model,
                                 tx_codes, names_holder, packed=packed_metrics)
    fn = jax.jit(train_step, donate_argnums=(0,) if donate else ())
    return _PackedStep(fn, names_holder) if packed_metrics else fn


def _make_step_body(model, cfg: TrainConfig, loss_mode, mesh, tx_model,
                    tx_codes, names_holder, packed: bool = True):
    """The single-train-step body shared by make_train_step (jitted directly)
    and make_train_multi_step (scanned K times in one program)."""

    def train_step(state: TrainState, batch: TrainBatch, key):
        batch = expand_compact_rays(batch)
        if batch.img_in.dtype != jnp.float32:
            # the trainer uploads encoder images as bfloat16 (halves the
            # dominant host->device transfer); cast back up front — on TPU
            # the default matmul/conv precision rounds f32 operands to bf16
            # anyway, so this is numerically free on the compiled path
            batch = batch.replace(img_in=batch.img_in.astype(jnp.float32))
        enc_key, loss_key = jax.random.split(key)
        enc_active = jax.random.uniform(enc_key, ()) < cfg.im_enc_rate

        sc_rows = state.shape_codes[batch.code_idx]
        tc_rows = state.texture_codes[batch.code_idx]

        def loss_fn(params, code_rows):
            if loss_mode == "unified":
                return unified_loss(model, params, state.batch_stats, code_rows,
                                    batch, cfg, enc_active, loss_key, mesh=mesh)
            return nerf_only_loss(model, params, state.batch_stats, code_rows,
                                  batch, cfg, enc_active, mesh=mesh)

        (loss, aux), (g_params, g_codes) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True)(state.params, (sc_rows, tc_rows))

        # scatter-add row gradients back into dense table gradients
        g_shape_tbl = jnp.zeros_like(state.shape_codes).at[batch.code_idx].add(g_codes[0])
        g_tex_tbl = jnp.zeros_like(state.texture_codes).at[batch.code_idx].add(g_codes[1])

        upd_m, opt_m = tx_model.update(g_params, state.opt_state_model, state.params)
        new_params = optax.apply_updates(state.params, upd_m)
        upd_c, opt_c = tx_codes.update(
            (g_shape_tbl, g_tex_tbl), state.opt_state_codes,
            (state.shape_codes, state.texture_codes))
        new_shape, new_tex = optax.apply_updates(
            (state.shape_codes, state.texture_codes), upd_c)

        new_state = TrainState(
            params=new_params,
            batch_stats=aux["batch_stats"],
            shape_codes=new_shape,
            texture_codes=new_tex,
            opt_state_model=opt_m,
            opt_state_codes=opt_c,
            optimized_idx=state.optimized_idx.at[batch.code_idx].set(1.0),
            niter=state.niter + 1,
        )
        metrics = dict(aux["losses"])
        metrics["enc_active"] = enc_active.astype(jnp.float32)
        if packed:
            names = tuple(sorted(metrics))
            if not names_holder:
                names_holder.append(names)
            return new_state, jnp.stack(
                [jnp.asarray(metrics[k], jnp.float32) for k in names])
        return new_state, metrics

    return train_step


def make_train_multi_step(model, cfg: TrainConfig, donate: bool = True,
                          loss_mode: str = "unified", mesh=None):
    """K train steps in ONE jitted program: (state, batch_group, keys) ->
    (state, metrics (K, n_metrics)) with batch_group leaves stacked on a new
    leading step axis (K, B, ...) and keys (K, 2) uint32.

    This is the grouped-stepping path for hosts where per-step dispatch cost
    cannot hide under the device step: on this environment's SINGLE-core host
    each dispatched step costs ~45-50 ms of client CPU (response handling +
    one jax.Array handle per state leaf) that the data producer must share
    the core with, capping the per-step epoch loop at ~85% of the isolated
    rate (VALIDATION.md round 5). lax.scan over the step body amortizes all
    of it K-fold; K is static per executable (the trainer picks it). The
    reference has no analogue — its dataloader feeds a per-step python loop
    (trainer_unified_nuscenes.py:266-388).

    Metrics come back as one (K, n_metrics) buffer (one fetch per group);
    unpack rows with .unpack(row). Same math as K make_train_step calls —
    tests/test_train_step.py::test_multi_step_matches_sequential_steps."""
    tx_model, tx_codes = _make_optimizers(cfg)
    names_holder: list = []
    step = _make_step_body(model, cfg, loss_mode, mesh, tx_model, tx_codes,
                           names_holder)

    def multi_step(state: TrainState, group: TrainBatch, keys):
        def body(st, xs):
            b, k = xs
            st2, vec = step(st, b, k)
            return st2, vec

        return jax.lax.scan(body, state, (group, keys))

    fn = jax.jit(multi_step, donate_argnums=(0,) if donate else ())
    return _PackedStep(fn, names_holder)
