"""Host-side per-sample ray preparation for training (numpy).

Equivalent of the reference's dataloader-worker ray prep
(/root/reference/src/utils.py: prepare_pixel_samples :330-377 via
data_nuscenes.py:615-658): build the ray grid over the (variable-size) ROI,
draw a random fixed-size subset of pixels, stratified-sample depths in the
frustum shell, normalize points by the object diagonal, and apply the
object-frame transforms. Outputs are fixed-shape so the device-side train step
compiles once.
"""
from __future__ import annotations

import numpy as np

from supnerf_tpu.geometry import roi as roi_ops


def _get_rays_np(K, c2w, roi, uv_steps=None, ids=None):
    """Rays over the ROI pixel grid. With ids (flat row-major indices into the
    (h_steps, w_steps) grid), computes ONLY those pixels' rays — bit-identical
    to indexing the full grid (the per-pixel math is elementwise + a (n,3)@(3,3)
    matmul) at O(n_rays) instead of O(roi area); the full grid costs ~60x more
    and dominated the product train path's host prep (VALIDATION.md round 4)."""
    dx, dy, fx, fy = K[0, 2], K[1, 2], K[0, 0], K[1, 1]
    if uv_steps is not None:
        xs = np.linspace(roi[0], roi[2] - 1, uv_steps[0])
        ys = np.linspace(roi[1], roi[3] - 1, uv_steps[1])
    else:
        xs = np.linspace(roi[0], roi[2] - 1, int(roi[2] - roi[0]))
        ys = np.linspace(roi[1], roi[3] - 1, int(roi[3] - roi[1]))
    if ids is not None:
        # row-major flat index over meshgrid(xs, ys, indexing="xy"):
        # i[id] = xs[id % w], j[id] = ys[id // w]
        i = xs[ids % len(xs)]
        j = ys[ids // len(xs)]
    else:
        i, j = np.meshgrid(xs, ys, indexing="xy")
    dirs = np.stack([(i - dx) / fx, (j - dy) / fy, np.ones_like(i)], -1)
    rays_d = dirs @ c2w[:3, :3].T
    viewdir = rays_d / np.linalg.norm(rays_d, axis=-1, keepdims=True)
    rays_o = np.broadcast_to(c2w[:3, 3], viewdir.shape)
    return rays_o.reshape(-1, 3), viewdir.reshape(-1, 3)


def prepare_pixel_samples(img_crop, mask_crop, cam_pose, obj_diag, K, roi,
                          n_rays: int, n_samples: int, shapenet_obj_cood: bool,
                          sym_aug: bool, rng: np.random.Generator,
                          im_sz: int | None = None, compact: bool = False):
    """img_crop (h, w, 3) whitened ROI crop; mask_crop (h, w, 1) in {-1,0,1}.

    Returns dict(xyz (n_rays, S, 3), viewdir (n_rays, S, 3), z_vals (S,),
    rgb_tgt (n_rays, 3), occ_pixels (n_rays, 1)). If the roi has fewer pixels
    than n_rays, rays are repeated (reference instead shrinks the batch, which
    would break static shapes; repetition preserves the loss normalization).

    compact=True returns UN-EXPANDED rays — xyz (n_rays, 3) holds the
    transformed, diagonal-normalized ray ORIGIN and viewdir (n_rays, 3) the
    transformed unit direction; the per-sample point grid is reconstructed on
    device as xyz + viewdir * z/diag (train_step.expand_compact_rays). The
    flip/permute transforms are linear, so the expansion commutes exactly (up
    to fp reassociation of the /diag). This cuts the host->device transfer of
    the two (B, R, S, 3) tensors by a factor of n_samples — through this
    environment's TPU tunnel they are ~75 MB/step at the published batch 48
    and dominate the product train path otherwise."""
    near = np.linalg.norm(cam_pose[:, 3]) - obj_diag / 2
    far = np.linalg.norm(cam_pose[:, 3]) + obj_diag / 2

    # draw the pixel subset FIRST (same rng stream as sampling after a full
    # grid build), then compute rays only at those n_rays pixels
    if im_sz is None:
        h_steps = int(roi[3] - roi[1])
        w_steps = int(roi[2] - roi[0])
        img_px = img_crop.reshape(-1, 3)
        occ_px = mask_crop.reshape(-1, 1)
    else:
        h_steps = w_steps = im_sz
        img_px = roi_ops.resize_bilinear_np(img_crop, (im_sz, im_sz)).reshape(-1, 3)
        occ_px = np.trunc(
            roi_ops.resize_bilinear_np(mask_crop[..., 0], (im_sz, im_sz))
        ).reshape(-1, 1)

    total = h_steps * w_steps
    ids = rng.permutation(total)[:n_rays]
    if len(ids) < n_rays:
        ids = np.concatenate([ids, rng.choice(total, n_rays - len(ids))])
    rays_o, viewdir = _get_rays_np(
        K, cam_pose, roi,
        uv_steps=None if im_sz is None else (im_sz, im_sz), ids=ids)
    rgb_tgt = img_px[ids]
    occ_pixels = occ_px[ids]

    # stratified depths with a jitter vector shared across rays (reference
    # sample_from_rays, utils.py:154-167)
    dist = (far - near) / (2 * n_samples)
    z_vals = np.linspace(near + dist, far - dist, n_samples)
    z_vals = z_vals + rng.random(n_samples) * (far - near) / (2 * n_samples)

    if compact:
        xyz = rays_o / obj_diag            # origin term of the expansion
        vds = viewdir.copy()
        if sym_aug and rng.random() > 0.5:
            xyz[:, 1] *= -1
            vds[:, 1] *= -1
        if shapenet_obj_cood:
            xyz = np.stack([-xyz[..., 1], xyz[..., 0], xyz[..., 2]], axis=-1)
            vds = np.stack([-vds[..., 1], vds[..., 0], vds[..., 2]], axis=-1)
        return {
            "xyz": xyz.astype(np.float32),
            "viewdir": vds.astype(np.float32),
            "z_vals": z_vals.astype(np.float32),
            "rgb_tgt": rgb_tgt.astype(np.float32),
            "occ_pixels": occ_pixels.astype(np.float32),
        }

    xyz = rays_o[:, None, :] + viewdir[:, None, :] * z_vals[None, :, None]
    xyz = xyz / obj_diag
    vds = np.broadcast_to(viewdir[:, None, :], xyz.shape).copy()

    if sym_aug and rng.random() > 0.5:
        xyz[:, :, 1] *= -1
        vds[:, :, 1] *= -1
    if shapenet_obj_cood:
        xyz = np.stack([-xyz[..., 1], xyz[..., 0], xyz[..., 2]], axis=-1)
        vds = np.stack([-vds[..., 1], vds[..., 0], vds[..., 2]], axis=-1)

    return {
        "xyz": xyz.astype(np.float32),
        "viewdir": vds.astype(np.float32),
        "z_vals": z_vals.astype(np.float32),
        "rgb_tgt": rgb_tgt.astype(np.float32),
        "occ_pixels": occ_pixels.astype(np.float32),
    }


def prepare_train_sample(sample, *, n_rays: int = 1024, n_samples: int = 64,
                         in_img_sz: int = 128, roi_margin: int = 5,
                         shapenet_obj_cood: bool = True, sym_aug: bool = False,
                         rng=None, render_sz: int | None = None,
                         src_pose=None, code_idx: int = 0,
                         compact_rays: bool = False, tgt_uv=None,
                         img_dtype=None):
    """Full host prep from a dataset sample dict (see data.synthetic /
    data.nuscenes) to one TrainBatch row (stack rows then shard).

    tgt_uv: optional precomputed (2, 8) projected GT box corners — the
    trainer passes these from ONE batched jitted CPU call; the per-row eager
    corners_of_box+view_points chain here costs ~7 ms of Python dispatch per
    sample on a 1-CPU host (see trainer._prepare_batch_rows).

    img_dtype: storage dtype for img_in (default float32). The trainer passes
    ml_dtypes.bfloat16 to halve the step's dominant host->device transfer
    (the 128x128x3 encoder image); the train step casts back to f32 on
    device, which is numerically free on TPU (conv operands are rounded to
    bf16 by the default precision anyway)."""
    from supnerf_tpu.geometry.boxes import corners_of_box, view_points
    import jax.numpy as jnp

    rng = np.random.default_rng() if rng is None else rng
    img, mask_occ = sample["imgs"], sample["masks_occ"]
    H, W = img.shape[:2]
    roi = roi_ops.roi_process(sample["rois"], H, W, roi_margin,
                              sq_pad=render_sz is not None)
    # training keeps bg BLACK after masking (reference data_nuscenes.py:637-639)
    # — crop the mask and mask the crop directly instead of paying
    # crop_and_whiten's white-bg composite only to overwrite it
    mask_crop = np.asarray(mask_occ, np.float32)[roi[1]:roi[3],
                                                 roi[0]:roi[2]][..., None]
    img_crop = np.asarray(img, np.float32)[roi[1]:roi[3], roi[0]:roi[2]] * (mask_crop > 0)
    img_in = roi_ops.preprocess_img_square(img_crop, in_img_sz)
    if img_dtype is not None:
        img_in = img_in.astype(img_dtype)

    wlh = sample["wlh"]
    obj_diag = float(np.linalg.norm(wlh))
    rays = prepare_pixel_samples(
        img_crop, mask_crop, sample["cam_poses"], obj_diag,
        sample["cam_intrinsics"], roi, n_rays, n_samples,
        shapenet_obj_cood, sym_aug, rng, im_sz=render_sz,
        compact=compact_rays,
    )

    tgt_pose = sample["obj_poses"]
    if tgt_uv is None:
        tgt_uv = np.asarray(view_points(
            corners_of_box(jnp.asarray(tgt_pose), jnp.asarray(wlh)),
            jnp.asarray(sample["cam_intrinsics"]), normalize=True))[:2]
    else:
        tgt_uv = np.asarray(tgt_uv)[:2]

    return {
        "img_in": img_in,
        "xyz": rays["xyz"],
        "viewdir": rays["viewdir"],
        "z_vals": rays["z_vals"],
        "rgb_tgt": rays["rgb_tgt"],
        "occ_pixels": rays["occ_pixels"],
        "src_pose": (tgt_pose if src_pose is None else src_pose).astype(np.float32),
        "tgt_uv": tgt_uv.astype(np.float32),
        "tgt_uv_aug": tgt_uv.astype(np.float32),
        "wlh": np.asarray(wlh, np.float32),
        "wlh_aug": np.asarray(wlh, np.float32),
        "roi": roi.astype(np.float32),
        "K": sample["cam_intrinsics"].astype(np.float32),
        "code_idx": np.asarray(code_idx, np.int32),
    }
