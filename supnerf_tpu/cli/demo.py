"""Full-image demo: reconstruct every detected car in one image, then re-render
the composed scene from manipulated object poses into a GIF.

Capability-equivalent of the reference demo (/root/reference/scripts/demo.py:
OptimizerDemo :19, optimize_pose_nerf :242, vis_scene :425, __main__ :582):
per-object encoder + random pose init + feed-forward refinement + test-time
optimization, followed by multi-object z-sorted scene composition.

Without nuScenes data, --dataset synthetic builds a procedural multi-object
scene so the full pipeline runs anywhere.

Usage:
  python -m supnerf_tpu.cli.demo --config_file hpam_demo.json --dataset synthetic
"""
from __future__ import annotations

import argparse
import os

import numpy as np

from supnerf_tpu.cli.common import add_common_args, load_model_and_codes, resolve_hpams

MANIPULATIONS = [[0, 0, 0], [-1, 0, 1], [-2, 0, 2], [-3, 0, 3], [-4, 0, 4], [-5, 0, 5]]


def synthetic_scene(n_objects: int = 3, img_h: int = 900, img_w: int = 1600):
    """A multi-object synthetic image with per-object masks and rois."""
    from supnerf_tpu.data.synthetic import make_synthetic_object

    objs = []
    for i in range(n_objects):
        s = make_synthetic_object(seed=200 + i, img_h=img_h, img_w=img_w)
        s["instoken"] = f"demo_ins_{i}"
        s["anntoken"] = f"demo_ann_{i}"
        s["cam_ids"] = "CAM_FRONT"
        objs.append(s)
    img = np.ones((img_h, img_w, 3), np.float32)
    for s in objs:
        m = s["masks_occ"] > 0
        img[m] = s["imgs"][m]
    return img, objs


def main(argv=None):
    p = argparse.ArgumentParser("supnerf_tpu demo")
    add_common_args(p)
    p.add_argument("--dataset", type=str, default="synthetic")
    p.add_argument("--img_name", type=str, default=None,
                   help="nuScenes image to run on (requires nusc data)")
    p.add_argument("--save_dir", type=str, default="demo_output")
    p.add_argument("--num_opts", type=int, default=None)
    p.add_argument("--n_objects", type=int, default=3)
    p.add_argument("--render_scale", type=int, default=4,
                   help="downscale factor for the composed scene render")
    p.add_argument("--field_impl", type=str, default="auto",
                   choices=["auto", "flax", "pallas"],
                   help="NeRF field on the TTO hot loop: the fused AABB "
                        "render kernel (pallas) or XLA autodiff (flax); "
                        "auto = pallas on accelerators")
    args = p.parse_args(argv)
    if args.config_file == "supnerf.nusc.vehicle.car.json":
        args.config_file = "hpam_demo.json"

    hpams = resolve_hpams(args)
    if args.num_opts:
        hpams["optimize"]["num_opts"] = args.num_opts
    os.makedirs(args.save_dir, exist_ok=True)

    model, variables, mean_shape, mean_texture = load_model_and_codes(hpams, seed=args.seed)

    if args.dataset == "synthetic":
        ds_cfg = hpams.get("dataset", {})
        img, objects = synthetic_scene(args.n_objects,
                                       ds_cfg.get("img_h", 900),
                                       ds_cfg.get("img_w", 1600))
    else:
        from supnerf_tpu.data.nuscenes import NuScenesData

        ds = NuScenesData(hpams, split="val", add_pose_err=2)
        objects_data = ds.get_objects_in_image(args.img_name)
        img = objects_data["img"]
        objects = objects_data["objects"]

    import imageio.v2 as imageio

    from supnerf_tpu.geometry.roi import image_float_to_uint8
    from supnerf_tpu.tto.driver import TTODriver

    imageio.imwrite(os.path.join(args.save_dir, "input.png"), image_float_to_uint8(img.copy()))

    class _ListDS:
        def __init__(self, items):
            self.items = items

        def __len__(self):
            return len(self.items)

        def __getitem__(self, i):
            return self.items[i]

    from supnerf_tpu.tto.core import TTOConfig
    from supnerf_tpu.tto.driver import tto_config_from_hpams

    # the reference demo optimizes with AABB-bounded sampling (rend_aabb=True,
    # scripts/demo.py:616); adjust_scale maps the diag/2-unit samples onto the
    # frustum-trained field's diag-unit coordinates
    cfg = tto_config_from_hpams(hpams, reg_iters=3, opt_pose=1,
                                pred_wlh=hpams["net_hyperparams"].get("pred_wlh", 0),
                                field_impl=args.field_impl)
    import dataclasses

    cfg = dataclasses.replace(cfg, use_aabb_render=True, adjust_scale=0.5)
    driver = TTODriver(
        model, variables, mean_shape, mean_texture, hpams, _ListDS(objects),
        args.save_dir, cfg=cfg, opt_pose=1, reg_iters=3, add_pose_err=2,
        batch_size=len(objects), n_devices=args.devices, seed=args.seed,
    )
    driver.run()

    # gather final codes + poses for the scene render
    import jax
    import jax.numpy as jnp

    shapecodes, texturecodes, poses, wlhs = [], [], [], []
    for i, s in enumerate(objects):
        ann, cam = s["anntoken"], s["cam_ids"]
        shapecodes.append(driver.optimized_shapecodes[ann][cam][-1])
        texturecodes.append(driver.optimized_texturecodes[ann][cam][-1])
        poses.append(driver.optimized_poses[ann][cam][-1])
        wlhs.append(np.asarray(s["wlh"], np.float32))
    shapecodes = jnp.asarray(np.stack(shapecodes))
    texturecodes = jnp.asarray(np.stack(texturecodes))
    poses0 = np.stack(poses)
    wlhs = jnp.asarray(np.stack(wlhs))
    K = jnp.asarray(objects[0]["cam_intrinsics"])
    img_h, img_w = img.shape[:2]

    from supnerf_tpu.render.compositor import (
        render_scene_window, scene_window_from_objects,
    )

    # one static window covering all manipulated positions -> one compile
    all_poses = []
    for dt in MANIPULATIONS:
        pp = poses0.copy()
        pp[:, :, 3] += np.asarray(dt, np.float32)
        all_poses.append(pp)
    window = scene_window_from_objects(
        np.concatenate(all_poses), np.tile(np.asarray(wlhs), (len(MANIPULATIONS), 1)),
        np.asarray(K), img_h, img_w, margin=8)
    sc = args.render_scale
    win_w = max(int(window[2] - window[0]) // sc, 16)
    win_h = max(int(window[3] - window[1]) // sc, 16)
    K_scaled = jnp.asarray(np.diag([1 / sc, 1 / sc, 1.0]).astype(np.float32)) @ K
    window_scaled = jnp.asarray(window) / sc

    def field_fn(xyz, vd, s_code, t_code):
        return model.apply(variables, xyz, vd, s_code, t_code)

    # adjust_scale=0.5: the compositor samples points in obj_diag/2 units but
    # the field was optimized through the frustum renderer's obj_diag
    # normalization (the reference demo exposes the same knob for the same
    # scale mismatch, scripts/demo.py:542-543 "temporal code due to conflict
    # of training scale")
    render = jax.jit(lambda op, key: render_scene_window(
        field_fn, key, op, wlhs, shapecodes, texturecodes, K_scaled,
        window_scaled, (win_w, win_h), n_samples=hpams["n_samples"],
        shapenet_obj_cood=bool(hpams.get("shapenet_obj_cood", 1)),
        adjust_scale=0.5, chunk=1024))

    print("Novel-view rendering frame by frame ...")
    gif_path = os.path.join(args.save_dir, "scene.gif")
    with imageio.get_writer(gif_path, mode="I", duration=0.5) as writer:
        for fi, pp in enumerate(all_poses):
            rgb, _ = render(jnp.asarray(pp), jax.random.PRNGKey(fi))
            writer.append_data(image_float_to_uint8(np.asarray(rgb)))
    print(f"saved {gif_path}")


if __name__ == "__main__":
    main()
