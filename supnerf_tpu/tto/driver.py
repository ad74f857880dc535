"""Host-side test-time-optimization drivers for nuScenes / KITTI / Waymo.

Capability-equivalent of the reference per-dataset optimizer classes
(/root/reference/src/optimizer_nuscenes.py OptimizerNuScenes :35,
optimizer_kitti.py OptimizerKitti :34, optimizer_waymo.py OptimizerWaymo :34):
result bookkeeping keyed by anntoken_camid, CODE_SAVE_ITERS snapshots,
codes+poses result files, periodic saving, and cross-view evaluation — but the
objects are optimized in DEVICE BATCHES through the single jitted program in
tto.core instead of one Python loop iteration per object.

Dataset-frame handling (reference optimizer_kitti.py:24,638-639, 3.3 in the
survey): KITTI/Waymo object poses are converted to the nuScenes frame first,
the refiner sees box corners scaled by BOX_FAC=1.1 unless predicted wlh is
used, and field queries apply the kitti->nusc rotation.
"""
from __future__ import annotations

import os
import pickle
import sys

import jax
import jax.numpy as jnp
import numpy as np

from supnerf_tpu.data.synthetic import prepare_object_inputs
from supnerf_tpu.geometry import poses as pose_gen
from supnerf_tpu.geometry.boxes import obj_pose_kitti2nusc
from supnerf_tpu.parallel import make_mesh, shard_pytree_batch
from supnerf_tpu.parallel.mesh import replicate_pytree
from supnerf_tpu.tto.core import (
    CODE_SAVE_ITERS,
    ObjectBatch,
    TTOConfig,
    run_tto_batch,
)
from supnerf_tpu.tto.pnp import pnp_bootstrap
from supnerf_tpu.utils.transfer import packed_jit

KITTI_BOX_FAC = 1.1


def tto_config_from_hpams(hpams: dict, *, reg_iters: int = 3, opt_pose: int = 1,
                          dataset_frame: str = "nusc", pred_wlh: int = 0,
                          n_lidar: int = 256,
                          field_impl: str = "flax") -> TTOConfig:
    opt = hpams.get("optimize", {})
    is_kitti_frame = dataset_frame in ("kitti", "waymo")
    return TTOConfig(
        num_opts=opt.get("num_opts", 100),
        reg_iters=reg_iters,
        n_samples=hpams.get("n_samples", 64),
        render_im_sz=hpams.get("render_im_sz", 32),
        in_img_sz=hpams.get("in_img_sz", 128),
        n_lidar=n_lidar,
        lr_shape=opt.get("lr_shape", 0.02),
        lr_texture=opt.get("lr_texture", 0.02),
        lr_pose=opt.get("lr_pose", 0.01),
        lr_half_interval=opt.get("lr_half_interval", 1000),
        loss_occ_coef=hpams.get("loss_occ_coef", 0.1),
        shapenet_obj_cood=bool(hpams.get("shapenet_obj_cood", 1)),
        sym_aug=bool(hpams.get("sym_aug", 0)),
        opt_pose=opt_pose > 0,
        kitti2nusc=is_kitti_frame,
        box_fac=KITTI_BOX_FAC if (is_kitti_frame and not pred_wlh) else 1.0,
        pred_wlh_mode=pred_wlh,
        field_impl=field_impl,
        euler_rot=bool(hpams.get("euler_rot", 0)),
        opt_cam_pose=bool(opt.get("opt_cam_pose", 0)),
        # box-limit density regularizer of the reference's no-pose TTO branch
        # (optimizer_nuscenes.py:397-400). NOTE the adjacent jsonfiles keys
        # loss_reg_coef and loss_sym_coef are dead in the reference too:
        # loss_reg is logged but never added (trainer_unified_nuscenes.py:
        # 143-148) and loss_sym (:1435) has no call site — so they are
        # intentionally not plumbed anywhere here either.
        obj_sz_reg=bool(hpams.get("obj_sz_reg", 0)),
        loss_obj_sz_coef=float(hpams.get("loss_obj_sz_coef", 1.0)),
    )


class TTODriver:
    """Batched test-time optimization over a dataset of objects.

    dataset: indexable returning sample dicts (see data.synthetic contract)
    with 'instoken', 'anntoken', 'cam_ids' keys for bookkeeping (synthetic
    fixtures may omit them). The model's variables and mean codes come from a
    training checkpoint (training.checkpoints).
    """

    def __init__(self, model, variables, mean_shape, mean_texture, hpams: dict,
                 dataset, save_dir: str, *, cfg: TTOConfig | None = None,
                 opt_pose: int = 1, reg_iters: int = 3,
                 dataset_frame: str = "nusc", pred_wlh: int = 0,
                 add_pose_err: int = 2, batch_size: int = 16,
                 save_freq: int = 100, n_devices: int | None = None,
                 seed: int = 0, vis: int = 0, vis_im_sz: int = 128,
                 use_pallas: bool = False, init_rot_err: float | None = None,
                 init_trans_err: float | None = None,
                 rand_angle_lim: float = 0.0, field_impl: str = "flax",
                 code_level: int | None = None):
        self.model = model
        self.variables = variables
        self.mean_shape = jnp.asarray(mean_shape)
        self.mean_texture = jnp.asarray(mean_texture)
        self.hpams = hpams
        self.dataset = dataset
        self.save_dir = save_dir
        self.opt_pose = opt_pose
        self.add_pose_err = add_pose_err
        self.dataset_frame = dataset_frame
        self.batch_size = batch_size
        self.save_freq = save_freq
        self.vis = vis
        self.vis_im_sz = vis_im_sz
        # code_level: result-storage granularity for the optimized codes
        # (reference optimizer_nuscenes.py:86-112, selected by opt_multiview
        # at optimize_nuscenes.py:90-94):
        #   0 = per instance (flat (n_code, latent) keyed by instoken —
        #       the multiview schema; run_multiview always uses this)
        #   1 = per annotation (flat, keyed by anntoken)
        #   2 = per (annotation, camera) ({ann: {cam: codes}} — the default
        #       single-view schema)
        # None resolves to 2 in run() and 0 in run_multiview(), matching the
        # reference dispatch. optimized_poses stay keyed {ann: {cam: pose}}
        # at EVERY level, as the reference initializes them before its
        # code_level branch (:80-84). NOTE the reference's own level-1 write
        # path is unreachable/broken (its loops always index [ann][cam]; no
        # entry point selects 1) — here level 1 stores per-ann flat codes as
        # the reference's init structure implies, last camera wins.
        if code_level not in (None, 0, 1, 2):
            raise ValueError(f"code_level must be 0/1/2, got {code_level!r}")
        self.code_level = code_level
        # pose-error injection parameters; None falls back to the config then
        # the reference nuScenes CLI defaults (init_rot_err 0.0,
        # init_trans_err 0.2; KITTI/Waymo wrappers pass 0.4 / 0.01)
        self.init_rot_err = (init_rot_err if init_rot_err is not None
                             else hpams.get("init_rot_err", 0.0))
        self.init_trans_err = (init_trans_err if init_trans_err is not None
                               else hpams.get("init_trans_err", 0.2))
        self.rand_angle_lim = rand_angle_lim
        # independent key streams for host prep (pose-error injection) and the
        # device TTO runs, so batch i+1's prep can overlap batch i's device
        # step without perturbing either sequence
        key = jax.random.PRNGKey(seed)
        self.key = jax.random.fold_in(key, 1)       # device-run stream
        self.prep_key = jax.random.fold_in(key, 2)  # host-prep stream
        # host-side generator for mode-1 error injection (sign choices);
        # seeded so the controlled-error protocol is reproducible
        self.np_rng = np.random.default_rng(seed)
        from supnerf_tpu.utils.profiling import PhaseTimer

        self.timer = PhaseTimer()
        self._rand_pose_jit = None  # batched mode-2 pose init (see _initial_poses)
        # the reference's non-BatchNorm encode path feeds a VARIABLE-size
        # keep-ratio crop (preprocess_img_keepratio(max_img_sz), e.g.
        # optimizer_nuscenes.py:179) — dynamic shapes this TPU pipeline does
        # not support. All published configs use BatchNorm2d; fail loudly
        # rather than silently substituting the square-pad preprocessing.
        nl = hpams.get("net_hyperparams", {}).get("norm_layer_type",
                                                  "BatchNorm2d")
        if nl != "BatchNorm2d":
            raise ValueError(
                f"norm_layer_type={nl!r}: the keep-ratio (max_img_sz) encoder "
                "preprocessing the reference pairs with non-BatchNorm "
                "encoders needs dynamic input shapes; use a BatchNorm2d "
                "config for TTO")
        self.cfg = cfg if cfg is not None else tto_config_from_hpams(
            hpams, reg_iters=reg_iters, opt_pose=opt_pose,
            dataset_frame=dataset_frame, pred_wlh=pred_wlh,
            field_impl=field_impl)
        if vis >= 2 and not self.cfg.emit_code_curves:
            # per-iteration panels need per-iteration codes/poses
            import dataclasses

            self.cfg = dataclasses.replace(self.cfg, emit_code_curves=True)
        if self.cfg.field_impl == "auto":
            # 'auto' (the CLI default): fused kernels on accelerators with a
            # kernel-compatible decoder, XLA autodiff otherwise
            from supnerf_tpu.ops.pallas_field import resolve_field_impl_cfg

            self.cfg = resolve_field_impl_cfg(self.cfg, model, variables)
        os.makedirs(save_dir, exist_ok=True)

        self.mesh = make_mesh(n_devices) if n_devices else None
        if self.mesh is not None:
            self.variables = replicate_pytree(self.variables, self.mesh)

        # forward-only renders (cross-view eval, vis) use the fused Pallas
        # forward kernel whenever the optimization loop runs on the fused
        # kernels (field_impl='pallas'), or when explicitly requested.
        if self.cfg.field_impl == "pallas" and jax.default_backend() != "cpu":
            use_pallas = True
        self._pallas_field = None
        if use_pallas:
            from supnerf_tpu.ops.pallas_field import (
                field_forward_pallas,
                resolve_decoder_kernel_config,
            )

            # shared gating: clear error for non-CodeNeRF-style decoders,
            # consistent dtype/interpret/block/TILE configuration (the
            # tile_fwd -> tile_m mapping lives in one helper; re-deriving it
            # here previously dropped the resolved tile and fell back to the
            # 1024 default even in interpret mode)
            from supnerf_tpu.ops.pallas_render import (
                composite_kwargs_from_kernel_config,
            )

            _, kern_kw = resolve_decoder_kernel_config(model, self.variables)
            fwd_kw = composite_kwargs_from_kernel_config(kern_kw)
            # reused by _field_for_v / _composite_for so every forward call
            # site (cross-view eval, vis) gets the same gating/dtype/
            # interpret/tile configuration
            self._fwd_kw = fwd_kw
            self._kern_kw = kern_kw

            def _pallas_fwd(xyz, vd, sc, tc):
                from supnerf_tpu.ops.pallas_field import pack_decoder_params

                packed = pack_decoder_params(
                    self.variables["params"]["decoder"],
                    kern_kw["shape_blocks"], kern_kw["texture_blocks"])
                return field_forward_pallas(packed, xyz, vd, sc, tc, **fwd_kw)

            self._pallas_field = _pallas_fwd

        # the result pytree is bitcast+packed into ONE uint32 buffer inside
        # the SAME jitted program (utils.transfer.packed_jit): one dispatch +
        # one fetch round trip per batch through the TPU tunnel, instead of
        # one dispatch for the TTO, one for a separate packing program, and
        # ~14 per-leaf fetches
        self._tto = packed_jit(
            lambda v, b, k: run_tto_batch(self.model, v, b, self.mean_shape,
                                          self.mean_texture, self.cfg, k),
            label="tto_batch",
        )

        # result dicts mirroring the reference's bookkeeping
        self.optimized_shapecodes = {}
        self.optimized_texturecodes = {}
        self.optimized_poses = {}
        self.psnr_eval = {}
        self.ssim_eval = {}
        self.R_eval = {}
        self.T_eval = {}
        self.depth_err_mean = {}
        self.lidar_pts_cnt = {}
        self.ood_flags = {}

    # ------------------------------------------------------------------ prep
    def _log_idx(self, sample, idx):
        ann = sample.get("anntoken", f"obj{idx}")
        cam = sample.get("cam_ids", "CAM")
        return f"{ann}_{cam}", ann, cam

    def _initial_pose(self, sample):
        """Pose initialization by error-injection mode (reference
        data_nuscenes.py:511-574 / survey 2.10)."""
        gt = np.asarray(sample["obj_poses"], np.float32)
        if self.add_pose_err == 0:
            return gt
        if self.add_pose_err == 1:
            yaw_err = self.np_rng.choice([1.0, -1.0]) * self.init_rot_err
            c, s = np.cos(yaw_err), np.sin(yaw_err)
            if self.dataset_frame in ("kitti", "waymo"):
                # KITTI-frame poses yaw about the camera y axis; the conversion
                # to the nuScenes frame happens later in _prep_one
                rot_err = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float32)
            else:
                rot_err = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)
            t_ratio = 1.0 + self.np_rng.choice([1.0, -1.0]) * self.init_trans_err
            out = gt.copy()
            out[:, :3] = gt[:, :3] @ rot_err
            out[:, 3] = gt[:, 3] * t_ratio
            return out
        if self.add_pose_err == 3 and "obj_poses_w_err" in sample:
            return np.asarray(sample["obj_poses_w_err"], np.float32)
        # mode 2 (default test protocol): fully random init
        self.prep_key, k = jax.random.split(self.prep_key)
        return np.asarray(pose_gen.get_random_pose2(
            k, jnp.asarray(sample["cam_intrinsics"]),
            jnp.asarray(np.asarray(sample["rois"], np.float32)),
            angle_lim=self.rand_angle_lim, trans_lim=0.3,
            is_kitti=self.dataset_frame in ("kitti", "waymo"),
        ))

    def _initial_poses(self, samples):
        """Pose inits for a whole batch. Mode 2 runs as ONE jitted, vmapped
        CPU call: per-object eager get_random_pose2 is ~70 Python primitive
        binds each, and on a 1-CPU host inside a TPU-backend process that
        per-op dispatch overhead (~3 s/batch of 16) was the product path's
        critical-path item — the batched call is ~ms."""
        if self.add_pose_err == 2 and len(samples) > 1:
            if self._rand_pose_jit is None:
                import functools

                fn = functools.partial(
                    pose_gen.get_random_pose2,
                    angle_lim=self.rand_angle_lim, trans_lim=0.3,
                    is_kitti=self.dataset_frame in ("kitti", "waymo"))
                # pinned to the host CPU backend explicitly: this must never
                # compile through the TPU tunnel (host prep is the pipeline's
                # overlap-side work)
                self._rand_pose_jit = jax.jit(jax.vmap(fn), backend="cpu")
            keys = jax.random.split(self.prep_key, len(samples) + 1)
            self.prep_key = keys[0]
            Ks = np.stack([np.asarray(s["cam_intrinsics"], np.float32)
                           for s in samples])
            rois = np.stack([np.asarray(s["rois"], np.float32)
                             for s in samples])
            return list(np.asarray(self._rand_pose_jit(keys[1:], Ks, rois)))
        return [self._initial_pose(s) for s in samples]

    def _prep_one(self, idx):
        sample = self.dataset[idx]
        return self._prep_sample(sample, self._initial_pose(sample)), sample

    def _prep_sample(self, sample, pose_init):
        inputs = prepare_object_inputs(
            sample, in_img_sz=self.cfg.in_img_sz,
            render_im_sz=self.cfg.render_im_sz,
            roi_margin=self.hpams.get("roi_margin", 5),
            n_lidar=self.cfg.n_lidar, pose_init=pose_init,
        )
        if self.dataset_frame in ("kitti", "waymo"):
            h = float(sample["wlh"][2])
            inputs["pose_init"] = np.asarray(
                obj_pose_kitti2nusc(jnp.asarray(inputs["pose_init"])[None], h)[0])
            inputs["obj_pose_gt"] = np.asarray(
                obj_pose_kitti2nusc(jnp.asarray(inputs["obj_pose_gt"])[None], h)[0])
        return inputs

    def _prep_batch(self, idxs):
        # pin the prep math (random pose init, frame conversions — eager jnp)
        # to the host CPU device so nothing rides the TPU tunnel per object;
        # the mode-2 random inits additionally batch into one jitted call
        cpu = jax.local_devices(backend="cpu")[0]
        with self.timer.phase("host_prep"), jax.default_device(cpu):
            samples = [self.dataset[i] for i in idxs]
            poses = self._initial_poses(samples)
            prepped = [self._prep_sample(s, p)
                       for s, p in zip(samples, poses)]
            return prepped, samples

    def _prep_many(self, idxs):
        """CPU-pinned host prep for the multiview / cross-view paths (same
        tunnel-round-trip fix as _prep_batch; these call sites previously ran
        _prep_one eagerly on the default device at ~0.4 s/object)."""
        cpu = jax.local_devices(backend="cpu")[0]
        with self.timer.phase("host_prep"), jax.default_device(cpu):
            return [self._prep_one(i)[0] for i in idxs]

    # ------------------------------------------------------------------- run
    def run(self):
        """Optimize the whole dataset in device batches, fully pipelined:
        host prep for batch i+1 overlaps batch i's device step (one prefetch
        worker keeps the prep RNG stream sequential), and batch i's device
        step is DISPATCHED before batch i-1's results are fetched and
        bookkept — result transfer and bookkeeping ride under the next
        batch's device time instead of serializing with it (the reference
        preps, optimizes, and logs strictly serially per object)."""
        from concurrent.futures import ThreadPoolExecutor

        n = len(self.dataset)
        starts = list(range(0, n, self.batch_size))
        pending = None          # (idxs, samples, prepped, device result)
        done_batches = 0
        with ThreadPoolExecutor(max_workers=1) as ex:
            all_idxs = [list(range(s, min(s + self.batch_size, n)))
                        for s in starts]
            fut = ex.submit(self._prep_batch, all_idxs[0]) if starts else None
            for bi, (start, idxs) in enumerate(zip(starts, all_idxs)):
                prepped, samples = fut.result()
                fut = (ex.submit(self._prep_batch, all_idxs[bi + 1])
                       if bi + 1 < len(starts) else None)
                print(f"num obj: {start}/{n}")
                res = self._dispatch_batch(idxs, prepped)
                if pending is not None:
                    self._postprocess_batch(*pending)
                    done_batches += 1
                    if (done_batches - 1) % max(self.save_freq // self.batch_size, 1) == 0:
                        self.save_results()
                pending = (idxs, samples, prepped, res)
            if pending is not None:
                self._postprocess_batch(*pending)
        self.save_results()
        # reference-format twin so reference tooling can re-score these
        # results (one-way read of reference .pth already exists in
        # eval/aggregate.py; this closes the loop in the other direction).
        # Interop is best-effort: without torch the native pickles above are
        # the complete record, and a finished run must not crash at the end.
        try:
            self.save_results_pth()
        except ImportError:
            print("torch not available - skipped the reference-format "
                  ".pth twin (codes+poses.pkl is complete)", file=sys.stderr)
        print("phase timing:\n" + self.timer.report())
        return self.results_dict()

    def optimize_object_batch(self, idxs, prepped=None, samples=None):
        """Dispatch + fetch + bookkeep one batch synchronously (run() uses
        the pipelined dispatch/postprocess pair directly)."""
        if prepped is None:
            prepped, samples = self._prep_batch(idxs)
        res = self._dispatch_batch(idxs, prepped)
        return self._postprocess_batch(idxs, samples, prepped, res)

    def _dispatch_batch(self, idxs, prepped):
        """Launch the device TTO program for one batch and return the device
        result pytree WITHOUT synchronizing (jax async dispatch)."""
        B = len(prepped)
        rows = list(prepped)
        if B < self.batch_size:  # pad to the compiled batch size
            rows = rows + [rows[-1]] * (self.batch_size - B)
        stacked = {k: np.stack([r[k] for r in rows]) for k in rows[0]}

        if self.opt_pose == 2:
            # PnP bootstrap needs the encoder's direct-UV prediction first; a
            # cheap encoder-only pass provides it, then poses are re-seeded.
            # KNOWN COST: the main TTO program re-runs the encoder on the
            # same images (one extra encoder pass + dispatch per batch in
            # this non-default mode) — the host-side P3P-RANSAC must see uv
            # BEFORE the jitted program launches, a boundary the reference's
            # serial flow doesn't have.
            uv_direct = self._encode_uv(stacked["img_in"])
            for i in range(B):
                stacked["pose_init"][i] = pnp_bootstrap(
                    uv_direct[i], stacked["roi_refine"][i], stacked["wlh"][i],
                    stacked["K"][i], stacked["pose_init"][i])

        batch = ObjectBatch(**{k: jnp.asarray(v) for k, v in stacked.items()})
        if self.mesh is not None:
            batch = shard_pytree_batch(batch, self.mesh)
        self.key, k = jax.random.split(self.key)
        with self.timer.phase("device_dispatch"):
            # one program dispatch; the packed D2H copy starts as soon as the
            # program finishes (PackedFunction.__call__)
            return self._tto(self.variables, batch, k)

    def _postprocess_batch(self, idxs, samples, prepped, res):
        """Fetch one batch's device results (blocking) and do the host-side
        bookkeeping. Under run()'s pipeline this overlaps the NEXT batch's
        device step."""
        with self.timer.phase("device_tto"):
            res = self._tto.fetch(res)

        # OOD pose sanity check (reference optimizer_nuscenes.py:656-660): the
        # feed-forward-refined pose's up axis (rotation z column) deviating
        # more than 45 deg from camera-up [0, -1, 0] is flagged.
        refined = res["pose_traj"][:, -1]           # (B, 3, 4) post-refiner
        up_cos = np.clip(-refined[:, 1, 2], -1.0, 1.0)
        ood = np.abs(np.arccos(up_cos)) > np.pi / 4

        level = 2 if self.code_level is None else self.code_level
        for i, (sample, idx) in enumerate(zip(samples, idxs)):
            log_idx, ann, cam = self._log_idx(sample, idx)
            # np.array COPIES: the fetched leaves are zero-copy views into the
            # batch's single packed transfer buffer — storing raw slices in
            # these long-lived dicts would pin the whole buffer (all curves /
            # trajectories, several MB with emit_code_curves) per batch
            sc = np.array(res["shapecodes_saved"][i])
            tc = np.array(res["texturecodes_saved"][i])
            if level == 0:          # per instance, flat (multiview schema)
                ins = sample.get("instoken", ann)
                self.optimized_shapecodes[ins] = sc
                self.optimized_texturecodes[ins] = tc
            elif level == 1:        # per annotation, flat
                self.optimized_shapecodes[ann] = sc
                self.optimized_texturecodes[ann] = tc
            else:                   # per (annotation, camera) — the default
                self.optimized_shapecodes.setdefault(ann, {})[cam] = sc
                self.optimized_texturecodes.setdefault(ann, {})[cam] = tc
            self.optimized_poses.setdefault(ann, {})[cam] = np.array(
                res["poses_saved"][i])
            self.psnr_eval[log_idx] = res["psnr"][i].tolist()
            self.R_eval[log_idx] = res["rot_err"][i].tolist()
            self.T_eval[log_idx] = res["trans_err"][i].tolist()
            self.depth_err_mean[log_idx] = res["depth_err"][i].tolist()
            self.lidar_pts_cnt[log_idx] = int(np.asarray(prepped[i]["lidar_valid"]).sum())
            self.ood_flags[log_idx] = bool(ood[i])
            if ood[i]:
                print("Found out-of-distribution pose")
            print(f"  {log_idx}: psnr {res['psnr'][i, 0]:.2f} -> {res['psnr'][i, -1]:.2f}, "
                  f"RE {res['rot_err'][i, 0]:.3f} -> {res['rot_err'][i, -1]:.3f}, "
                  f"TE {res['trans_err'][i, 0]:.3f} -> {res['trans_err'][i, -1]:.3f}, "
                  f"DE {res['depth_err'][i, 0]:.3f} -> {res['depth_err'][i, -1]:.3f}")
            if self.vis > 0:
                self._save_vis(log_idx, prepped[i], res, i)
        return res

    def _save_vis(self, log_idx: str, inputs, res, i: int):
        """Render [rgb | depth | target] panels at the snapshot iterations
        (vis=1: first and last; vis=2: all snapshots), plus an 8-view virtual
        sheet at the end (reference output_single_view_vis :1479 /
        save_virtual_img :1643)."""
        import imageio.v2 as imageio

        from supnerf_tpu.geometry.boxes import corners_of_box, view_points
        from supnerf_tpu.render.renderer import render_full_image, render_virtual_views
        from supnerf_tpu.utils.vis import panel_rgb_depth_gt, render_box, virtual_view_sheet
        from supnerf_tpu.geometry.roi import roi_coord_trans

        out_dir = os.path.join(self.save_dir, log_idx)
        os.makedirs(out_dir, exist_ok=True)
        if self.vis >= 2 and "shapecode_curve" in res:
            # faithful per-iteration panels (reference vis=2)
            code_iters = list(range(res["shapecode_curve"].shape[1]))
            codes_sc = res["shapecode_curve"]
            codes_tc = res["texturecode_curve"]
            poses = res["pose_curve"]
            sel = range(len(code_iters))
        else:
            code_iters = list(CODE_SAVE_ITERS)
            codes_sc = res["shapecodes_saved"]
            codes_tc = res["texturecodes_saved"]
            poses = res["poses_saved"]
            sel = range(len(code_iters)) if self.vis >= 2 else [0, len(code_iters) - 1]
        sz = self.vis_im_sz
        roi = np.asarray(inputs["roi_nerf"], np.float32)
        diag = float(np.linalg.norm(inputs["wlh"]))
        gt_small = np.asarray(jax.image.resize(
            jnp.asarray(inputs["rgb_tgt"]).reshape(
                self.cfg.render_im_sz, self.cfg.render_im_sz, 3),
            (sz, sz, 3), method="linear"))

        for ci in sel:
            sc = jnp.asarray(codes_sc[i, ci])
            tc = jnp.asarray(codes_tc[i, ci])
            pose = jnp.asarray(poses[i, ci])
            from supnerf_tpu.geometry.boxes import invert_pose

            cam = invert_pose(pose)
            field = self._field_for(sc, tc)
            rgb, depth, _ = render_full_image(
                field, cam, jnp.asarray(inputs["K"]), (jnp.asarray(roi), sz, sz),
                diag, n_samples=self.cfg.n_samples,
                shapenet_obj_cood=self.cfg.shapenet_obj_cood,
                kitti2nusc=self.cfg.kitti2nusc, chunk=4096,
                composite_fn=self._composite_for(sc, tc))
            gt_vis = gt_small.copy()
            uv = np.asarray(view_points(
                corners_of_box(pose, jnp.asarray(inputs["wlh"])),
                jnp.asarray(inputs["K"]), normalize=True))[:2]
            u2, v2 = roi_coord_trans(uv[0] - roi[0], uv[1] - roi[1],
                                     roi - np.array([roi[0], roi[1], roi[0], roi[1]]),
                                     sz)
            gt_vis = render_box(gt_vis, np.stack([u2, v2]),
                                colors=((1, 144 / 255, 30 / 255),) * 3, linewidth=1)

            t = code_iters[ci]
            panel = panel_rgb_depth_gt(
                np.asarray(rgb), np.asarray(depth), gt_vis,
                psnr=float(res["psnr"][i, min(t, self.cfg.num_opts - 1)]),
                depth_err=float(res["depth_err"][i, min(t, self.cfg.num_opts - 1)]),
                rot_err=float(res["rot_err"][i, min(t, self.cfg.num_opts - 1)]),
                trans_err=float(res["trans_err"][i, min(t, self.cfg.num_opts - 1)]))
            imageio.imwrite(os.path.join(out_dir, f"opt{t:03d}.png"), panel)

        if self.vis >= 1:
            sc = jnp.asarray(res["final_shapecode"][i])
            tc = jnp.asarray(res["final_texturecode"][i])
            field = self._field_for(sc, tc)
            # final-codes SSIM between render and target (reference
            # log_compute_ssim, optimizer_nuscenes.py:1657-1666); only
            # computed when visualization renders exist, like the reference
            from supnerf_tpu.geometry.boxes import invert_pose as _inv
            from supnerf_tpu.eval.metrics import ssim as compute_ssim

            rgb_f, _, _ = render_full_image(
                field, _inv(jnp.asarray(res["final_pose"][i])),
                jnp.asarray(inputs["K"]), (jnp.asarray(roi), sz, sz), diag,
                n_samples=self.cfg.n_samples,
                shapenet_obj_cood=self.cfg.shapenet_obj_cood,
                kitti2nusc=self.cfg.kitti2nusc, chunk=4096,
                composite_fn=self._composite_for(sc, tc))
            self.ssim_eval.setdefault(log_idx, []).append(
                compute_ssim(np.asarray(rgb_f), gt_small))
            views = render_virtual_views(
                field, diag, np.asarray(inputs["K"]), n_samples=self.cfg.n_samples,
                shapenet_obj_cood=self.cfg.shapenet_obj_cood, pan_num=8,
                img_sz=min(sz, 64), kitti2nusc=self.cfg.kitti2nusc,
                composite_fn=self._composite_for(sc, tc))
            imageio.imwrite(os.path.join(out_dir, "virt_final.png"),
                            virtual_view_sheet(np.asarray(views)))

    def _field_for(self, sc, tc):
        if self._pallas_field is not None:
            return lambda xyz, vd: self._pallas_field(xyz, vd, sc, tc)
        return lambda xyz, vd: self.model.apply(self.variables, xyz, vd, sc, tc)

    def _composite_for(self, sc, tc):
        """Fused forward field+compositing closure for the renderer
        composite_fn hooks (None on the flax path)."""
        return self._composite_for_v(self.variables, sc, tc)

    def _field_for_v(self, variables, sc, tc):
        """Field closure over EXPLICIT variables — use inside jitted functions
        so the params are traced arguments, not multi-GB baked-in constants."""
        if self._pallas_field is not None:
            from supnerf_tpu.ops.pallas_field import field_forward_pallas, pack_decoder_params

            packed = pack_decoder_params(
                variables["params"]["decoder"],
                self._fwd_kw["shape_blocks"], self._fwd_kw["texture_blocks"])
            return lambda xyz, vd: field_forward_pallas(
                packed, xyz, vd, sc, tc, **self._fwd_kw)
        return lambda xyz, vd: self.model.apply(variables, xyz, vd, sc, tc)

    def _composite_for_v(self, variables, sc, tc):
        """Fused composite closure over EXPLICIT (traced) variables."""
        if self._pallas_field is None:
            return None
        from supnerf_tpu.ops.pallas_field import pack_decoder_params
        from supnerf_tpu.ops.pallas_render import make_composite_fn

        packed = pack_decoder_params(
            variables["params"]["decoder"],
            self._fwd_kw["shape_blocks"], self._fwd_kw["texture_blocks"])
        return make_composite_fn(packed, self._kern_kw, sc, tc)

    def _encode_uv(self, img_in):
        if not hasattr(self, "_encode_uv_jit"):
            def enc(v, img):
                out, _ = self.model.apply(
                    v, img[None], True, method=type(self.model).encode_img,
                    mutable=["batch_stats"])
                return out[3][0]

            # built once: a fresh closure per call would miss jit's cache and
            # recompile every batch
            self._encode_uv_jit = jax.jit(jax.vmap(enc, in_axes=(None, 0)))
        return np.asarray(self._encode_uv_jit(self.variables, jnp.asarray(img_in)))

    # ------------------------------------------------------------------ save
    def results_dict(self):
        return {
            "num_obj": len(self.psnr_eval),
            "ssim_eval": getattr(self, "ssim_eval", {}),
            "optimized_shapecodes": self.optimized_shapecodes,
            "optimized_texturecodes": self.optimized_texturecodes,
            "optimized_poses": self.optimized_poses,
            "psnr_eval": self.psnr_eval,
            "R_eval": self.R_eval,
            "T_eval": self.T_eval,
            "depth_err_mean": self.depth_err_mean,
            "lidar_pts_cnt": self.lidar_pts_cnt,
            "ood_flags": self.ood_flags,
            "num_ood": int(sum(self.ood_flags.values())),
            "CODE_SAVE_ITERS_": list(CODE_SAVE_ITERS),
            # extra (absent from reference files; readers index specific keys
            # so it is interop-neutral): which storage schema the optimized_*
            # dicts use — see the code_level docstring in __init__
            "code_level": 2 if self.code_level is None else self.code_level,
        }

    def save_results(self, name: str = "codes+poses.pkl"):
        with open(os.path.join(self.save_dir, name), "wb") as f:
            pickle.dump(self.results_dict(), f)

    def save_results_pth(self, name: str = "codes+poses.pth"):
        """Write the results in the REFERENCE's torch format so its tooling
        (scripts/eval_saved_result.py -> utils.collect_eval_results,
        /root/reference/src/utils.py:786-988) can re-score this framework's
        outputs directly. Container types match what that reader requires:
        codes/poses as torch tensors, psnr/depth curves as plain float lists,
        R_eval/T_eval as LISTS OF 0-d TENSORS (the reader torch.stack's them;
        reference save shape at optimizer_nuscenes.py:1464-1477)."""
        import torch

        def t(x):
            # np.array (copy) — jax device arrays expose read-only buffers,
            # which torch.from_numpy warns about
            return torch.from_numpy(np.array(x, np.float32))

        def conv(entry):
            # single-view entries are {cam: codes}; multiview entries are
            # FLAT (n_code, latent) arrays per instance — the reference's own
            # two schemas (optimizer_nuscenes.py:89-90 vs :103)
            if isinstance(entry, dict):
                return {c: t(v) for c, v in entry.items()}
            return t(entry)

        saved = {
            "num_obj": len(self.psnr_eval),
            "optimized_shapecodes": {
                a: conv(cams)
                for a, cams in self.optimized_shapecodes.items()},
            "optimized_texturecodes": {
                a: conv(cams)
                for a, cams in self.optimized_texturecodes.items()},
            "optimized_poses": {
                a: conv(cams)
                for a, cams in self.optimized_poses.items()},
            "psnr_eval": {k: [float(x) for x in v]
                          for k, v in self.psnr_eval.items()},
            "ssim_eval": dict(self.ssim_eval),
            "depth_err_mean": {k: [float(x) for x in v]
                               for k, v in self.depth_err_mean.items()},
            "lidar_pts_cnt": dict(self.lidar_pts_cnt),
            "R_eval": {k: [torch.tensor(float(x)) for x in v]
                       for k, v in self.R_eval.items()},
            "T_eval": {k: [torch.tensor(float(x)) for x in v]
                       for k, v in self.T_eval.items()},
        }
        torch.save(saved, os.path.join(self.save_dir, name))

    def run_multiview(self, v_max: int = 4, opt_pose: bool = False,
                      opt_model: bool = False, slack_tex: bool | None = None):
        """Joint multiview optimization per instance (reference
        optimize_objs_multi_anns[_w_pose] — shared codes across all views of an
        instance). Views are padded to v_max for one compiled program.

        slack_tex defaults to the reference dispatch: True for the codes-only
        mode (optimizer_nuscenes.py:135 runs optimize_objs_multi_anns with
        slack_tex=True), False when poses are optimized."""
        from supnerf_tpu.tto.multiview import MultiviewBatch, run_multiview_tto

        if slack_tex is None:
            slack_tex = not opt_pose
        # multiview codes are joint per instance: storage is ALWAYS the
        # level-0 schema, exactly as the reference forces code_level=0 for
        # opt_multiview (optimize_nuscenes.py:90-92)
        self.code_level = 0

        by_ins = {}
        for idx in range(len(self.dataset)):
            s = self.dataset[idx]
            by_ins.setdefault(s.get("instoken", str(idx)), []).append(idx)

        # variables passed as a traced ARG, not closed over: closures bake
        # the full model params into the program as MLIR constants (can
        # crash the backend and defeats mesh sharding) — same contract as
        # _tto / _cross_view_fn. packed_jit: one dispatch + one fetch round
        # trip per instance.
        mv_fn = packed_jit(lambda v, b, k: run_multiview_tto(
            self.model, v, b, self.mean_shape, self.mean_texture,
            self.cfg, k, opt_pose=opt_pose, opt_model=opt_model,
            slack_tex=slack_tex), label="multiview_tto")

        for ins, idx_list in by_ins.items():
            idx_list = idx_list[:v_max]
            prepped = self._prep_many(idx_list)
            V = len(prepped)
            rows = prepped + [prepped[-1]] * (v_max - V)
            stacked = {k: np.stack([r[k] for r in rows]) for k in rows[0]}
            batch = MultiviewBatch(
                img_in=jnp.asarray(stacked["img_in"]),
                rgb_tgt=jnp.asarray(stacked["rgb_tgt"]),
                occ_tgt=jnp.asarray(stacked["occ_tgt"]),
                K=jnp.asarray(stacked["K"]),
                roi_nerf=jnp.asarray(stacked["roi_nerf"]),
                pose_init=jnp.asarray(stacked["pose_init"]),
                wlh=jnp.asarray(stacked["wlh"]),
                obj_pose_gt=jnp.asarray(stacked["obj_pose_gt"]),
                view_valid=jnp.asarray(
                    [1.0] * V + [0.0] * (v_max - V), jnp.float32),
            )
            self.key, k = jax.random.split(self.key)
            res = mv_fn.call_and_fetch(self.variables, batch, k)
            # multiview codes are FLAT (n_code, latent) per instance — the
            # reference's own multiview schema (optimizer_nuscenes.py:89-90),
            # distinct from the single-view {ann: {cam: codes}} nesting;
            # the result writers accept both. np.array: copy out of the
            # packed transfer buffer (see _postprocess_batch)
            self.optimized_shapecodes[ins] = np.array(res["shapecodes_saved"])
            self.optimized_texturecodes[ins] = np.array(res["texturecodes_saved"])
            self.psnr_eval[ins] = res["psnr"].tolist()
            print(f"  multiview {ins} ({V} views): psnr "
                  f"{res['psnr'][0]:.2f} -> {res['psnr'][-1]:.2f}")
        self.save_results(name="codes_multiview.pkl")
        return self.results_dict()

    # ------------------------------------------------- cross-view evaluation
    def _cross_view_fn(self):
        """One jitted program computing an instance's FULL cross-view metric
        matrices: (n_code, n_v, n_v) PSNR + lidar-depth error in a single
        dispatch (nested vmap over code-iters x source codes x target views).
        The reference — and the round-1 version here — dispatched one render
        per (code-iter, row, col) cell: 6*n_v^2 round-trips per instance at
        ~0.4 s each through this environment's tunnel."""
        if hasattr(self, "_cross_pf"):
            return self._cross_pf

        from supnerf_tpu.geometry.boxes import invert_pose
        from supnerf_tpu.ops.volume_render import masked_psnr
        from supnerf_tpu.render.renderer import render_rays_at_pixels, render_rays_frustum

        def one_cell(variables, sc, tc, obj_pose_gt, K, roi_nerf, wlh,
                     rgb_tgt, occ_tgt, lid_u, lid_v, lid_d, lid_m):
            diag = jnp.linalg.norm(wlh)
            cam = invert_pose(obj_pose_gt)
            field = self._field_for_v(variables, sc, tc)
            comp = self._composite_for_v(variables, sc, tc)
            out = render_rays_frustum(
                field, jax.random.PRNGKey(0), cam, K, roi_nerf, diag,
                n_samples=self.cfg.n_samples, im_sz=self.cfg.render_im_sz,
                shapenet_obj_cood=self.cfg.shapenet_obj_cood,
                kitti2nusc=self.cfg.kitti2nusc, composite_fn=comp)
            psnr = masked_psnr(out["rgb"], rgb_tgt, occ_tgt)
            outd = render_rays_at_pixels(
                field, jax.random.PRNGKey(0), cam, K, lid_u, lid_v, diag,
                n_samples=self.cfg.n_samples,
                shapenet_obj_cood=self.cfg.shapenet_obj_cood,
                kitti2nusc=self.cfg.kitti2nusc, composite_fn=comp)
            derr = jnp.sum(jnp.abs(outd["depth"] - lid_d) * lid_m) / (jnp.sum(lid_m) + 1e-8)
            return psnr, derr

        def matrices(variables, sc, tc, pose_gt, K, roi, wlh,
                     rgb_tgt, occ_tgt, lid_u, lid_v, lid_d, lid_m):
            # sc/tc: (n_code, n_v, latent) saved codes; the rest: (n_v, ...)
            # per-target-view inputs. Rows = source codes, cols = target views.
            # One dispatch, but the (code, row) axis runs under lax.map so at
            # most n_v renders are live at once — a full vmap over all
            # 6*n_v^2 cells would materialize tens of GB of decoder
            # activations at the published render size.
            n_code, n_v = sc.shape[0], sc.shape[1]
            view_axes = (None, None, None) + (0,) * 10
            over_cols = jax.vmap(one_cell, in_axes=view_axes)

            def row_fn(codes_one):
                sc1, tc1 = codes_one
                return over_cols(variables, sc1, tc1, pose_gt, K, roi, wlh,
                                 rgb_tgt, occ_tgt, lid_u, lid_v, lid_d, lid_m)

            pm, dm = jax.lax.map(
                row_fn, (sc.reshape(n_code * n_v, -1),
                         tc.reshape(n_code * n_v, -1)))
            return pm.reshape(n_code, n_v, n_v), dm.reshape(n_code, n_v, n_v)

        self._cross_pf = packed_jit(matrices, label="cross_view")
        return self._cross_pf

    def eval_cross_view(self, vis_iter=None):
        """Render each instance's saved codes into every other view of the same
        instance and score PSNR + lidar depth error (reference eval_cross_view
        :1279-1410). Returns and saves the cross_eval result dict."""
        by_ins = {}
        for idx in range(len(self.dataset)):
            s = self.dataset[idx]
            by_ins.setdefault(s.get("instoken", str(idx)), []).append(idx)

        psnr_mat_per_ins = {}
        depth_mat_per_ins = {}
        cross_fn = self._cross_view_fn()

        for ins, idx_list in by_ins.items():
            views = []
            for idx in idx_list:
                s = self.dataset[idx]
                ann = s.get("anntoken", f"obj{idx}")
                cam = s.get("cam_ids", "CAM")
                if ann in self.optimized_shapecodes and cam in self.optimized_shapecodes[ann]:
                    views.append((idx, ann, cam))
            if len(views) < 1:
                continue
            n_v = len(views)
            # host prep runs ONCE per view, not per (code-iter x row) pair,
            # pinned to the CPU device (same fix as _prep_batch)
            prepped = self._prep_many([idx for idx, _, _ in views])
            # saved codes stacked (n_code, n_v, latent)
            sc = np.stack([np.asarray(self.optimized_shapecodes[a][c])
                           for _, a, c in views], axis=1)
            tc = np.stack([np.asarray(self.optimized_texturecodes[a][c])
                           for _, a, c in views], axis=1)
            # pad the view axis to a power-of-two bucket so recompiles are
            # bounded by log2(max views), not one per distinct view count
            n_pad = 1 << (n_v - 1).bit_length()
            if n_pad > n_v:
                sc = np.concatenate([sc, np.repeat(sc[:, -1:], n_pad - n_v, 1)], 1)
                tc = np.concatenate([tc, np.repeat(tc[:, -1:], n_pad - n_v, 1)], 1)
                prepped = prepped + [prepped[-1]] * (n_pad - n_v)

            def col(kk, dt=None):
                arr = np.stack([p[kk] for p in prepped])
                return jnp.asarray(arr if dt is None else arr.astype(dt))

            pm, dm = cross_fn.call_and_fetch(
                self.variables, jnp.asarray(sc), jnp.asarray(tc),
                col("obj_pose_gt"), col("K"), col("roi_nerf", np.float32),
                col("wlh"), col("rgb_tgt"), col("occ_tgt"), col("lidar_u"),
                col("lidar_v"), col("lidar_depth"), col("lidar_valid"))
            pm = pm[:, :n_v, :n_v]
            dm = dm[:, :n_v, :n_v]
            psnr_mat_per_ins[ins] = [pm[ci] for ci in range(pm.shape[0])]
            depth_mat_per_ins[ins] = [dm[ci] for ci in range(dm.shape[0])]

        cross = {
            "psnr_eval_mat_per_ins": psnr_mat_per_ins,
            "depth_eval_mat_per_ins": depth_mat_per_ins,
            # empty IN THE REFERENCE TOO: its population lines are commented
            # out (optimizer_nuscenes.py:1396,1400) as is the consumer
            # (utils.py:934) — kept for byte-level result-schema parity
            "cnt_lidar_pts_per_ins": {},
            "CODE_SAVE_ITERS_": list(CODE_SAVE_ITERS),
        }
        with open(os.path.join(self.save_dir, "cross_eval.pkl"), "wb") as f:
            pickle.dump(cross, f)
        return cross
