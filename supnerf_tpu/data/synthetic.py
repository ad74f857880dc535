"""Synthetic object fixtures for dataset-free tests and benchmarks.

nuScenes/KITTI/Waymo cannot ship with the repo, so CI and the benchmark drive
the full pipeline on procedurally generated objects: a 3D box at a known pose
is projected into a virtual camera; its silhouette becomes the occupancy mask,
a flat-colored crop becomes the RGB target, and box-surface depths become the
lidar-pixel fixture. This exercises every interface of the real data layer
(supnerf_tpu.data.nuscenes etc.) with fully known ground truth.
"""
from __future__ import annotations

import numpy as np

from supnerf_tpu.geometry import roi as roi_ops

_DEFAULT_K = np.array([[800.0, 0, 640], [0, 800, 360], [0, 0, 1]], np.float32)


def _box_corners_np(pose, wlh):
    w, l, h = wlh
    x = l / 2 * np.array([1, 1, 1, 1, -1, -1, -1, -1])
    y = w / 2 * np.array([1, -1, -1, 1, 1, -1, -1, 1])
    z = h / 2 * np.array([1, 1, -1, -1, 1, 1, -1, -1])
    c = pose[:, :3] @ np.vstack([x, y, z])
    return c + pose[:, 3:4]


def _yaw_pose(yaw, t):
    cy, sy = np.cos(yaw), np.sin(yaw)
    R_unit = np.array([[0.0, -1.0, 0.0], [0.0, 0.0, -1.0], [1.0, 0.0, 0.0]])
    R_yaw = np.array([[cy, -sy, 0.0], [sy, cy, 0.0], [0.0, 0.0, 1.0]])
    return np.concatenate([R_unit @ R_yaw, np.reshape(t, (3, 1))], axis=1).astype(np.float32)


def make_synthetic_object(seed: int = 0, img_h: int = 900, img_w: int = 1600,
                          K=None, color=None):
    """Generate one synthetic sample with the same dict contract as the real
    datasets' __getitem__ (imgs, masks_occ, rois, cam_intrinsics, cam_poses,
    obj_poses, obj_poses_w_err, wlh, depth-fixture pixels)."""
    rng = np.random.default_rng(seed)
    K = _DEFAULT_K if K is None else np.asarray(K, np.float32)
    wlh = np.array([1.9, 4.6, 1.7], np.float32) * rng.uniform(0.9, 1.1, 3).astype(np.float32)
    yaw = rng.uniform(-np.pi, np.pi)
    depth = rng.uniform(12.0, 30.0)
    # keep the object roughly centered in the camera
    u = rng.uniform(0.35, 0.65) * img_w
    v = rng.uniform(0.4, 0.6) * img_h
    t = np.linalg.inv(K) @ np.array([u * depth, v * depth, depth])
    obj_pose = _yaw_pose(yaw, t)

    corners = _box_corners_np(obj_pose, wlh)
    uv = K @ corners
    uv = uv[:2] / uv[2:3]
    x0, y0 = np.floor(uv.min(axis=1)).astype(int)
    x1, y1 = np.ceil(uv.max(axis=1)).astype(int)
    box_2d = [max(x0, 0), max(y0, 0), min(x1, img_w - 1), min(y1, img_h - 1)]

    # rasterize the box with per-face shading (painter's order): faces carry
    # distinct brightness so orientation is visually recoverable — a flat
    # silhouette would make yaw unlearnable for the pose stream
    import cv2

    mask = np.zeros((img_h, img_w), np.uint8)
    hull = cv2.convexHull(uv.T.astype(np.int32))
    cv2.fillConvexPoly(mask, hull, 1)
    mask_occ = np.where(mask > 0, 1.0, -1.0).astype(np.float32)

    if color is None:
        color = rng.uniform(0.3, 0.9, 3).astype(np.float32)
    img = np.ones((img_h, img_w, 3), np.float32)
    # corner order: first four face forward (+x), last four backward
    faces = [
        ((0, 1, 2, 3), 1.00),   # front: brightest
        ((4, 5, 6, 7), 0.35),   # rear: darkest
        ((0, 3, 7, 4), 0.75),   # left side
        ((1, 2, 6, 5), 0.55),   # right side
        ((0, 1, 5, 4), 0.90),   # top
        ((2, 3, 7, 6), 0.45),   # bottom
    ]
    depth_per_face = [(np.mean(corners[2, list(ids)]), ids, shade)
                      for ids, shade in faces]
    for _, ids, shade in sorted(depth_per_face, reverse=True):
        poly = uv[:, list(ids)].T.astype(np.int32)
        cv2.fillConvexPoly(img, poly, (color * shade).astype(float).tolist())

    # lidar fixture: pixels inside the mask with depth of the box center plane
    ys, xs = np.nonzero(mask)
    if len(xs) > 0:
        sel = rng.choice(len(xs), size=min(256, len(xs)), replace=False)
        lid_u, lid_v = xs[sel].astype(np.float32), ys[sel].astype(np.float32)
        lid_d = np.full(len(sel), float(t[2]), np.float32)
    else:
        lid_u = lid_v = lid_d = np.zeros(0, np.float32)

    cam_pose = np.concatenate(
        [obj_pose[:, :3].T, -obj_pose[:, :3].T @ obj_pose[:, 3:4]], axis=1
    ).astype(np.float32)

    return {
        "imgs": img,
        "masks_occ": mask_occ,
        "rois": np.asarray(box_2d, np.int32),
        "cam_intrinsics": K,
        "cam_poses": cam_pose,
        "obj_poses": obj_pose,
        "wlh": wlh,
        "lidar_u": lid_u,
        "lidar_v": lid_v,
        "lidar_depth": lid_d,
        "color": color,
    }


def prepare_object_inputs(sample, *, in_img_sz: int = 128, render_im_sz: int = 32,
                          roi_margin: int = 5, n_lidar: int = 256,
                          pose_init=None):
    """Host-side preprocessing from a dataset sample dict to the fixed-shape
    arrays of tto.core.ObjectBatch (one object; stack for a batch).

    Mirrors the reference prep (optimizer_nuscenes.py:586-650): refine-roi
    without square padding, nerf-roi with square padding, crop + white-out,
    encoder square input, render target resize.
    """
    img, mask_occ = sample["imgs"], sample["masks_occ"]
    H, W = img.shape[:2]
    roi = sample["rois"]
    roi_refine = roi_ops.roi_process(roi, H, W, roi_margin, sq_pad=False)
    roi_nerf = roi_ops.roi_process(roi, H, W, roi_margin, sq_pad=True)

    img_crop_r, mask_crop_r = roi_ops.crop_and_whiten(img, mask_occ, roi_refine)
    img_in = roi_ops.preprocess_img_square(img_crop_r, in_img_sz)

    img_crop_n, mask_crop_n = roi_ops.crop_and_whiten(img, mask_occ, roi_nerf)
    rgb_tgt = roi_ops.resize_bilinear_np(img_crop_n, (render_im_sz, render_im_sz))
    mask_tgt = np.trunc(
        roi_ops.resize_bilinear_np(mask_crop_n[..., 0], (render_im_sz, render_im_sz))
    )

    K = sample["cam_intrinsics"]
    lid_u = np.zeros(n_lidar, np.float32)
    lid_v = np.zeros(n_lidar, np.float32)
    lid_d = np.zeros(n_lidar, np.float32)
    lid_m = np.zeros(n_lidar, np.float32)
    n = min(n_lidar, len(sample["lidar_u"]))
    lid_u[:n] = sample["lidar_u"][:n]
    lid_v[:n] = sample["lidar_v"][:n]
    lid_d[:n] = sample["lidar_depth"][:n]
    lid_m[:n] = 1.0

    return {
        "img_in": img_in,
        "rgb_tgt": rgb_tgt.reshape(-1, 3),
        "occ_tgt": mask_tgt.reshape(-1, 1),
        "K": K,
        "K_inv": np.linalg.inv(K).astype(np.float32),
        "roi_nerf": roi_nerf,
        "roi_refine": roi_refine,
        "pose_init": (sample["obj_poses"] if pose_init is None else pose_init).astype(np.float32),
        "wlh": sample["wlh"],
        "obj_pose_gt": sample["obj_poses"],
        "lidar_u": lid_u,
        "lidar_v": lid_v,
        "lidar_depth": lid_d,
        "lidar_valid": lid_m,
    }


def make_object_batch(n_objects: int, seed: int = 0, **prep_kwargs):
    """Build a stacked ObjectBatch-compatible dict of n_objects synthetic samples."""
    samples = [make_synthetic_object(seed + i) for i in range(n_objects)]
    prepped = [prepare_object_inputs(s, **prep_kwargs) for s in samples]
    batch = {k: np.stack([p[k] for p in prepped]) for k in prepped[0]}
    return batch, samples


def make_random_train_batch(B: int, R: int, S: int, img_sz: int, seed: int = 0):
    """Random TrainBatch-shaped arrays (dict of np arrays keyed like
    training.TrainBatch) for benchmarks and multi-chip dryruns — shared by
    bench.py and __graft_entry__ so the fixture cannot drift between them.
    Not the rendered synthetic dataset; see prepare_train_sample for that."""
    rng = np.random.default_rng(seed)
    eye_pose = np.broadcast_to(
        np.concatenate([np.eye(3), np.array([[0.0], [0.0], [20.0]])], axis=1),
        (B, 3, 4)).astype(np.float32)
    K = np.broadcast_to(np.array(
        [[800.0, 0, 640], [0, 800, 360], [0, 0, 1]], np.float32), (B, 3, 3))
    return dict(
        img_in=rng.uniform(0, 1, (B, img_sz, img_sz, 3)).astype(np.float32),
        xyz=(rng.normal(size=(B, R, S, 3)) * 0.3).astype(np.float32),
        viewdir=rng.normal(size=(B, R, S, 3)).astype(np.float32),
        z_vals=np.sort(rng.uniform(10, 30, (B, S)).astype(np.float32), axis=-1),
        rgb_tgt=rng.uniform(0, 1, (B, R, 3)).astype(np.float32),
        occ_pixels=rng.choice([-1.0, 0.0, 1.0], (B, R, 1)).astype(np.float32),
        src_pose=np.ascontiguousarray(eye_pose),
        tgt_uv=rng.uniform(0, 1000, (B, 2, 8)).astype(np.float32),
        tgt_uv_aug=rng.uniform(0, 1000, (B, 2, 8)).astype(np.float32),
        wlh=np.tile(np.float32([1.9, 4.6, 1.7]), (B, 1)),
        wlh_aug=np.tile(np.float32([1.9, 4.6, 1.7]), (B, 1)),
        roi=np.tile(np.float32([500.0, 200.0, 700.0, 400.0]), (B, 1)),
        K=np.ascontiguousarray(K),
        code_idx=np.arange(B, dtype=np.int32),
    )


# --------------------------------------------------------------------------
# Shared published-protocol fixtures (bench.py + measurement scripts)
# --------------------------------------------------------------------------

PUBLISHED_NET_HP = {
    "shape_blocks": 3, "texture_blocks": 1, "latent_dim": 256,
    "pose_shortcut": 1, "pred_wlh": 0,
}


def published_hparams() -> dict:
    """One copy of the published supnerf.nusc protocol hyperparameters
    (the jsonfiles/supnerf.nusc.vehicle.car.json subset the synthetic
    measurement paths need), shared by bench.py,
    scripts/quality_ab_published.py and scripts/train_extended_synthetic.py
    so the protocol cannot drift between the numbers they produce."""
    return {
        "arch": "supnerf",
        "net_hyperparams": dict(PUBLISHED_NET_HP),
        "n_rays": 1024, "n_samples": 64, "in_img_sz": 128, "render_im_sz": 32,
        "roi_margin": 5, "loss_occ_coef": 0.1, "loss_code_coef": 0.1,
        "loss_pose_coef": 0.01, "shapenet_obj_cood": 1, "sym_aug": 0,
        "lr_schedule": [{"lr": 1e-4, "interval": 40000},
                        {"lr": 1e-4, "interval": 40000}],
        "optimize": {"num_opts": 100, "lr_shape": 0.02, "lr_texture": 0.02,
                     "lr_pose": 0.01, "lr_half_interval": 1000},
    }


class SyntheticTTODataset:
    """n synthetic objects carrying the instoken/anntoken/cam_ids bookkeeping
    fields the TTODriver and UnifiedTrainer expect of the real datasets."""

    def __init__(self, n: int, seed0: int = 0):
        self.samples = [make_synthetic_object(seed=seed0 + i) for i in range(n)]
        for i, s in enumerate(self.samples):
            s["instoken"] = f"ins_{i}"
            s["anntoken"] = f"ann_{i}"
            s["cam_ids"] = "CAM_FRONT"

    def __len__(self):
        return len(self.samples)

    def __getitem__(self, i):
        return self.samples[i]


class CyclingDataset:
    """A length-n view cycling over a smaller base dataset (i -> base[i % len]).

    Lets the product-level train benchmark run a realistic number of steps
    per epoch without materializing hundreds of full-resolution synthetic
    frames (each ~23 MB): host-side prep randomness is salted by the ROW
    index (trainer._prepare_row), so repeated base samples still produce
    distinct ray draws and pose errors per row, like fresh dataset accesses
    in the reference's mode-2 protocol."""

    def __init__(self, base, n: int):
        self.base = base
        self.n = int(n)

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return self.base[i % len(self.base)]


def make_heldout_tto_batch(n_eval: int, seed: int, *, in_img_sz: int = 128,
                           render_im_sz: int = 32, n_lidar: int = 256,
                           pose_seed: int = 11):
    """Held-out eval batch at the published TTO protocol: make_object_batch
    with RANDOM initial poses injected (the reference test protocol's
    add_pose_err=2 random init, utils.py:1300 get_random_pose2) so the TTO
    has pose error to recover. Returns (raw dict incl. pose_init, samples);
    callers wrap raw in tto.core.ObjectBatch."""
    import jax
    import jax.numpy as jnp

    from supnerf_tpu.geometry import poses as pose_gen

    raw, samples = make_object_batch(n_eval, seed=seed, in_img_sz=in_img_sz,
                                     render_im_sz=render_im_sz,
                                     n_lidar=n_lidar)
    keys = jax.random.split(jax.random.PRNGKey(pose_seed), n_eval)
    roi_key = "rois" if "rois" in raw else "roi_nerf"
    init = jax.vmap(lambda k, K, roi: pose_gen.get_random_pose2(
        k, K, roi.astype(jnp.float32)))(
        keys, jnp.asarray(raw["K"]), jnp.asarray(raw[roi_key]))
    raw["pose_init"] = np.asarray(init)
    return raw, samples
