"""Ray-level rendering APIs over a conditioned NeRF field.

Functional equivalents of the reference rendering entry points
(/root/reference/src/utils.py: render_rays :380, render_rays_v2 :435,
render_rays_specified :504, render_full_img :554, render_virtual_imgs :619;
/root/reference/src/renderer.py: render_rays_v3 :382 with ray-AABB bounds).

TPU-first design:
  - Everything is jit/vmap-compatible: static ray-grid sizes, no boolean
    gathers, masks for ragged cases.
  - The field is passed as a closure `field_fn(xyz, viewdir) -> (sigma, rgb)`
    binding model params + latent codes, so renderers compose with any model
    and with vmapped per-object batching.
  - Full-image rendering maps over fixed ray blocks with lax.map (the
    reference chunks rays host-side, utils.py:591-597).
  - Target preparation (crop resize) is separated from per-iteration rendering
    so the TTO loop never repeats it (the reference re-resizes every iter).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from supnerf_tpu.geometry.rays import (
    aabb_ray_bounds,
    get_rays,
    get_rays_specified,
    sample_from_rays,
    sample_z_stratified,
)
from supnerf_tpu.geometry.roi import resize_bilinear_jnp
from supnerf_tpu.ops.volume_render import volume_render

# nuScenes object frame -> ShapeNet frame: new_x = -old_y, new_y = old_x
# (reference utils.py:421-426, applied when hpams['shapenet_obj_cood']).
_KITTI2NUSC_ROT = jnp.array(
    [[1.0, 0.0, 0.0], [0.0, 0.0, 1.0], [0.0, -1.0, 0.0]], jnp.float32
)


def apply_obj_coord_transform(xyz, viewdir, shapenet_obj_cood: bool,
                              kitti2nusc: bool = False, sym_flip=None):
    """Frame fix-ups applied to sampled points before the field query.
    Order matches the reference: sym flip, then kitti->nusc, then shapenet."""
    if sym_flip is not None:
        flip = jnp.where(sym_flip, -1.0, 1.0)
        xyz = xyz.at[..., 1].multiply(flip)
        viewdir = viewdir.at[..., 1].multiply(flip)
    if kitti2nusc:
        xyz = xyz @ _KITTI2NUSC_ROT.T
        viewdir = viewdir @ _KITTI2NUSC_ROT.T
    if shapenet_obj_cood:
        xyz = jnp.stack([-xyz[..., 1], xyz[..., 0], xyz[..., 2]], axis=-1)
        viewdir = jnp.stack([-viewdir[..., 1], viewdir[..., 0], viewdir[..., 2]], axis=-1)
    return xyz, viewdir


def frustum_near_far(cam_pose, obj_diag):
    """near/far = ||t_c2o|| -/+ diag/2 (reference utils.py:467-469).

    CONSTANT w.r.t. the pose: the reference computes the distance from
    `cam_pose[:, -1].tolist()` — detached python floats — so its z samples
    never backprop into the translation through near/far (pose gradients
    reach the loss only through ray origins/directions). Mirror that with a
    stop_gradient; same treatment as the AABB bounds (render_rays_aabb)."""
    dist = jnp.linalg.norm(jax.lax.stop_gradient(cam_pose[:, 3]))
    return dist - obj_diag / 2, dist + obj_diag / 2


def render_rays_frustum(field_fn, key, cam_pose, K, roi, obj_diag, *,
                        n_samples: int, im_sz: int, shapenet_obj_cood: bool,
                        kitti2nusc: bool = False, sym_flip=None,
                        return_samples: bool = False, composite_fn=None):
    """The TTO hot path (reference render_rays_v2): an im_sz x im_sz ray grid
    over the ROI, stratified samples in the frustum shell around the object
    distance, points normalized by obj_diag.

    composite_fn, if given, replaces field_fn + volume_render with one fused
    call (xyz (R,S,3), viewdir (R,3), z_vals (S,)) -> (rgb, depth, acc) —
    the forward-only fused Pallas render kernel (ops.pallas_render). Ignored
    when return_samples needs the raw sigmas.

    Returns dict(rgb (R,3), depth (R,), acc_trans (R,)) with R = im_sz^2.
    """
    rays_o, viewdir = get_rays(K, cam_pose, roi, (im_sz, im_sz))
    near, far = frustum_near_far(cam_pose, obj_diag)
    xyz, vds, z_vals = sample_from_rays(key, rays_o, viewdir, near, far, n_samples)
    xyz = xyz / obj_diag
    xyz, vds = apply_obj_coord_transform(xyz, vds, shapenet_obj_cood, kitti2nusc, sym_flip)
    if composite_fn is not None and not return_samples:
        rgb, depth, acc = composite_fn(xyz, vds[:, 0, :], z_vals)
        return {"rgb": rgb, "depth": depth, "acc_trans": acc}
    sigmas, rgbs = field_fn(xyz, vds)
    rgb, depth, acc = volume_render(sigmas, rgbs, z_vals)
    out = {"rgb": rgb, "depth": depth, "acc_trans": acc}
    if return_samples:
        out.update(xyz=xyz, viewdir=vds, sigmas=sigmas)
    return out


def render_rays_at_pixels(field_fn, key, cam_pose, K, u_vec, v_vec, obj_diag, *,
                          n_samples: int, shapenet_obj_cood: bool,
                          kitti2nusc: bool = False, sym_flip=None,
                          composite_fn=None):
    """Render only specified pixels (sparse lidar depth evaluation, reference
    render_rays_specified). u_vec/v_vec: (N,) FULL-image pixel coordinates
    (caller adds the roi offset). Padded entries are fine — mask downstream.
    composite_fn: see render_rays_frustum."""
    rays_o, viewdir = get_rays_specified(K, cam_pose, u_vec, v_vec)
    near, far = frustum_near_far(cam_pose, obj_diag)
    xyz, vds, z_vals = sample_from_rays(key, rays_o, viewdir, near, far, n_samples)
    xyz = xyz / obj_diag
    xyz, vds = apply_obj_coord_transform(xyz, vds, shapenet_obj_cood, kitti2nusc, sym_flip)
    if composite_fn is not None:
        rgb, depth, acc = composite_fn(xyz, vds[:, 0, :], z_vals)
        return {"rgb": rgb, "depth": depth, "acc_trans": acc}
    sigmas, rgbs = field_fn(xyz, vds)
    rgb, depth, acc = volume_render(sigmas, rgbs, z_vals)
    return {"rgb": rgb, "depth": depth, "acc_trans": acc}


def render_rays_aabb(field_fn, key, cam_pose, K, roi, obj_sz, *,
                     n_samples: int, im_sz: int, shapenet_obj_cood: bool,
                     kitti2nusc: bool = False, sym_flip=None,
                     adjust_scale: float = 1.0, white_bkgd: bool = False,
                     composite_fn=None):
    """AABB-bounded sampling (reference render_rays_v3 / NeRFRenderer): per-ray
    near/far from ray-box intersection in units of obj_diag/2; rays missing the
    box get degenerate bounds (-1, -1) and composite to background.

    composite_fn, if given, replaces field_fn + hit-masking + volume_render
    with one fused kernel call (xyz, viewdir (R, 3), z_vals (R, S), hit) ->
    (rgb, depth, acc) — ops.pallas_render.make_composite_aabb_(grad_)fn; the
    closure must be built with the same white_bkgd as this call.

    Returns dict(rgb, depth, acc_trans, hit (R,) bool)."""
    obj_sz = jnp.asarray(obj_sz, jnp.float32)
    obj_diag = jnp.linalg.norm(obj_sz)
    rays_o, viewdir = get_rays(K, cam_pose, roi, (im_sz, im_sz))
    bounds, hit, rays_o_n = aabb_ray_bounds(rays_o, viewdir, obj_sz)
    # The box bounds are CONSTANTS w.r.t. the pose, exactly like the
    # reference, which intersects on DETACHED numpy rays (renderer.py:426
    # rays_o.cpu().detach().numpy()). Besides parity, this is load-bearing
    # for stability: reverse-mode through the slab test's 1/viewdir produces
    # 0*inf = NaN when a pose update drives a ray direction component
    # through zero (grazing ray), and the true d(bound)/d(dir) ~ 1/d^2
    # diverges there anyway. Pose gradients still flow through rays_o/
    # viewdir into the sample positions below.
    bounds = jax.lax.stop_gradient(bounds)
    z_coarse = sample_z_stratified(key, bounds[:, 0], bounds[:, 1], n_samples)
    xyz = rays_o_n[:, None, :] + z_coarse[:, :, None] * viewdir[:, None, :]
    vds = jnp.broadcast_to(viewdir[:, None, :], xyz.shape)
    # metric distance from the camera center (z_coarse is in diag/2 units)
    z_vals = z_coarse * (obj_diag / 2)
    xyz = xyz * adjust_scale
    xyz, vds = apply_obj_coord_transform(xyz, vds, shapenet_obj_cood, kitti2nusc, sym_flip)
    if composite_fn is not None:
        rgb, depth, acc = composite_fn(xyz, vds[:, 0, :], z_vals, hit)
        return {"rgb": rgb, "depth": depth, "acc_trans": acc, "hit": hit}
    sigmas, rgbs = field_fn(xyz, vds)
    # kill contributions of rays that miss the box (their z ordering is bogus)
    sigmas = jnp.where(hit[:, None, None], sigmas, 0.0)
    rgb, depth, acc = volume_render(sigmas, rgbs, z_vals, white_bkgd=white_bkgd)
    return {"rgb": rgb, "depth": depth, "acc_trans": acc, "hit": hit}


def render_full_image(field_fn, cam_pose, K, roi_hw, obj_diag, *,
                      n_samples: int, shapenet_obj_cood: bool,
                      kitti2nusc: bool = False, chunk: int = 4096, key=None,
                      composite_fn=None):
    """Render every pixel of an (H, W) ROI grid. z sampling is JITTERED
    stratification exactly like the reference's render_full_img
    (utils.py:554-566 -> sample_from_rays jittered path); with key=None the
    jitter vector is frozen at PRNGKey(0), so repeat calls are deterministic
    but NOT midpoint-sampled — pass a key for per-call jitter.

    roi_hw: (roi (4,), H, W) with H, W static ints. Returns (img (H, W, 3),
    depth (H, W), acc (H, W))."""
    roi, H, W = roi_hw
    rays_o, viewdir = get_rays(K, cam_pose, roi, (W, H))
    near, far = frustum_near_far(cam_pose, obj_diag)
    if key is None:
        key = jax.random.PRNGKey(0)
    xyz, vds, z_vals = sample_from_rays(key, rays_o, viewdir, near, far, n_samples)
    xyz = xyz / obj_diag
    xyz, vds = apply_obj_coord_transform(xyz, vds, shapenet_obj_cood, kitti2nusc)

    n_rays = H * W
    pad = (-n_rays) % chunk
    xyz_p = jnp.pad(xyz, ((0, pad), (0, 0), (0, 0)))
    vds_p = jnp.pad(vds, ((0, pad), (0, 0), (0, 0)))
    xyz_b = xyz_p.reshape(-1, chunk, n_samples, 3)
    vds_b = vds_p.reshape(-1, chunk, n_samples, 3)

    def render_block(args):
        xb, vb = args
        if composite_fn is not None:
            return composite_fn(xb, vb[:, 0, :], z_vals)
        sig, rgb = field_fn(xb, vb)
        return volume_render(sig, rgb, z_vals)

    rgb_b, depth_b, acc_b = jax.lax.map(render_block, (xyz_b, vds_b))
    rgb = rgb_b.reshape(-1, 3)[:n_rays].reshape(H, W, 3)
    depth = depth_b.reshape(-1)[:n_rays].reshape(H, W)
    acc = acc_b.reshape(-1)[:n_rays].reshape(H, W)
    return rgb, depth, acc


def render_virtual_views(field_fn, obj_diag, K, *, n_samples: int,
                         shapenet_obj_cood: bool, radius: float = 40.0,
                         tilt: float = jnp.pi / 6, pan_num: int = 8,
                         img_sz: int = 128, kitti2nusc: bool = False,
                         composite_fn=None):
    """Render a ring of pan_num virtual views around the object (reference
    render_virtual_imgs, utils.py:619-672). Returns (pan_num, img_sz, img_sz, 3)."""
    K = jnp.asarray(K, jnp.float32)
    roi = jnp.stack([K[0, 2] - img_sz / 2, K[1, 2] - img_sz / 2,
                     K[0, 2] + img_sz / 2, K[1, 2] + img_sz / 2])
    cam_init = jnp.array(
        [[0.0, 0.0, 1.0, -radius], [-1.0, 0.0, 0.0, 0.0],
         [0.0, -1.0, 0.0, 0.0], [0.0, 0.0, 0.0, 1.0]], jnp.float32)
    ct, st = jnp.cos(tilt), jnp.sin(tilt)
    cam_tilt = jnp.array(
        [[ct, 0.0, st, 0.0], [0.0, 1.0, 0.0, 0.0],
         [-st, 0.0, ct, 0.0], [0.0, 0.0, 0.0, 1.0]], jnp.float32) @ cam_init

    imgs = []
    for i in range(pan_num):
        pan = 2 * jnp.pi * i / pan_num
        cp, sp = jnp.cos(pan), jnp.sin(pan)
        rot = jnp.array(
            [[cp, -sp, 0.0, 0.0], [sp, cp, 0.0, 0.0],
             [0.0, 0.0, 1.0, 0.0], [0.0, 0.0, 0.0, 1.0]], jnp.float32)
        cam_pose = (rot @ cam_tilt)[:3, :]
        img, _, _ = render_full_image(
            field_fn, cam_pose, K, (roi, img_sz, img_sz), obj_diag,
            n_samples=n_samples, shapenet_obj_cood=shapenet_obj_cood,
            kitti2nusc=kitti2nusc, composite_fn=composite_fn,
        )
        imgs.append(img)
    return jnp.stack(imgs)


def prepare_render_target(img_crop, mask_crop, im_sz: int):
    """Resize an ROI crop + occupancy mask to the im_sz render grid once per
    object (reference repeats this inside render_rays_v2 every iteration:
    utils.py:446-456). Bilinear for rgb; bilinear + truncation toward zero for
    the {-1,0,1} mask, matching torchvision Resize + int cast.

    img_crop (h, w, 3), mask_crop (h, w, 1) -> (rgb_tgt (im_sz^2, 3),
    occ_pixels (im_sz^2, 1))."""
    img_r = resize_bilinear_jnp(img_crop, (im_sz, im_sz))
    mask_r = jnp.trunc(resize_bilinear_jnp(mask_crop, (im_sz, im_sz)))
    return img_r.reshape(-1, 3), mask_r.reshape(-1, 1)
