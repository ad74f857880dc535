"""Minimal nuscenes-devkit API shim + on-disk fixture generator.

The real devkit cannot be installed in this image, but data/nuscenes.py only
touches a narrow API surface (reference src/data_nuscenes.py:330-446,716-1007
uses the same): NuScenes table lookups (`get`, `field2token`, `.instance`,
`.sample_data`), `get_sample_data` (camera-frame boxes filtered by
visibility), `explorer.map_pointcloud_to_image`, `BoxVisibility`, and the
Box record (center / orientation.rotation_matrix / corners()). This module
provides those over a generated miniature dataset so the nuScenes layer runs
end-to-end in CI.

Fixture contents (v1.0-mini naming so the embedded mini splits apply):
  scene-0061 (train, day):  2 car instances x 2 samples, plus one
                            partially-out-of-frame instance (visibility
                            filter) and one too-small "occluder" car mask +
                            one "person" mask per image.
  scene-0103 (val, day):    1 car instance x 2 samples (multiview).
  scene-0916 (val, night):  1 car instance x 1 sample — must be filtered by
                            the log-hour >= 18 rule.
"""
from __future__ import annotations

import json
import os
import sys
import types

import numpy as np
from PIL import Image

IMG_W, IMG_H = 1600, 900
K_FIX = [[800.0, 0.0, 800.0], [0.0, 800.0, 450.0], [0.0, 0.0, 1.0]]
WLH = [1.9, 4.6, 1.7]
# upright car in the camera frame: object z (up) -> camera -y
R_BASE = np.array([[1.0, 0, 0], [0, 0, -1], [0, 1, 0]])


def _rot_yaw(yaw):
    """Rotation about the object's up axis, composed into the camera frame."""
    c, s = np.cos(yaw), np.sin(yaw)
    rz = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1.0]])
    return R_BASE @ rz


def _box_corners(R, center, wlh):
    w, l, h = wlh
    x = l / 2 * np.array([1, 1, 1, 1, -1, -1, -1, -1.0])
    y = w / 2 * np.array([1, -1, -1, 1, 1, -1, -1, 1.0])
    z = h / 2 * np.array([1, 1, -1, -1, 1, 1, -1, -1.0])
    return np.asarray(R) @ np.vstack([x, y, z]) + np.asarray(center)[:, None]


def _project(K, pts3d):
    uvz = np.asarray(K) @ pts3d
    return uvz[:2] / uvz[2:3], uvz[2]


# --------------------------------------------------------------------------
# fixture generation
# --------------------------------------------------------------------------
def build_fixture(root: str) -> dict:
    """Write the miniature dataset under `root` and return its meta dict."""
    os.makedirs(root, exist_ok=True)
    rng = np.random.default_rng(0)

    scenes = [
        {"name": "scene-0061", "hour": 15,
         "samples": 2, "instances": [
             {"k": 0, "x": -2.2, "yaw": 0.3},
             {"k": 1, "x": 2.2, "yaw": -0.4},
             # partially out of frame -> dropped by BoxVisibility.ALL
             {"k": 2, "x": -16.0, "yaw": 0.0},
         ]},
        {"name": "scene-0103", "hour": 10,
         "samples": 2, "instances": [{"k": 0, "x": 0.5, "yaw": 1.2}]},
        {"name": "scene-0916", "hour": 19,
         "samples": 1, "instances": [{"k": 0, "x": 0.0, "yaw": 0.0}]},
    ]

    meta = {"scene": [], "log": [], "sample": [], "sample_data": [],
            "instance": [], "sample_annotation": [], "calibrated_sensor": [],
            "category": [{"token": "cat_car", "name": "vehicle.car"}],
            "lidar": {}}
    seg_root = os.path.join(root, "pred_instance", "CAM_FRONT")
    img_root = os.path.join(root, "samples", "CAM_FRONT")
    os.makedirs(seg_root, exist_ok=True)
    os.makedirs(img_root, exist_ok=True)

    meta["calibrated_sensor"].append(
        {"token": "cs_front", "camera_intrinsic": K_FIX})

    for si, sc in enumerate(scenes):
        meta["log"].append({
            "token": f"log{si}",
            "logfile": f"n008-2018-08-01-{sc['hour']:02d}-26-43-0400"})
        meta["scene"].append({"token": f"sc{si}", "name": sc["name"],
                              "log_token": f"log{si}"})
        for ins in sc["instances"]:
            tok = f"ins{si}_{ins['k']}"
            if not any(r["token"] == tok for r in meta["instance"]):
                meta["instance"].append(
                    {"token": tok, "category_token": "cat_car"})

        for j in range(sc["samples"]):
            smp = f"smp{si}_{j}"
            sd_cam, sd_lid = f"sdc{si}_{j}", f"sdl{si}_{j}"
            stem = f"img_{si}_{j}"
            meta["sample"].append({
                "token": smp, "scene_token": f"sc{si}",
                "data": {"CAM_FRONT": sd_cam, "LIDAR_TOP": sd_lid}})
            meta["sample_data"].append({
                "token": sd_cam, "channel": "CAM_FRONT",
                "filename": f"samples/CAM_FRONT/{stem}.png",
                "calibrated_sensor_token": "cs_front"})
            meta["sample_data"].append({
                "token": sd_lid, "channel": "LIDAR_TOP", "filename": ""})

            img = np.full((IMG_H, IMG_W, 3), 90, np.uint8)
            preds = {"labels": [], "boxes": []}
            masks = []
            lidar_uv, lidar_d = [], []

            for ins in sc["instances"]:
                # the object drifts slightly between samples of a scene
                center = [ins["x"] + 0.3 * j, 0.85, 14.0 + 2.0 * j]
                yaw = ins["yaw"] + 0.1 * j
                R = _rot_yaw(yaw)
                ann_tok = f"ann{si}_{j}_{ins['k']}"
                meta["sample_annotation"].append({
                    "token": ann_tok, "sample_token": smp,
                    "instance_token": f"ins{si}_{ins['k']}",
                    "size": WLH, "center": center,
                    "rotation_matrix": R.tolist()})

                corners = _box_corners(R, center, WLH)
                uv, z = _project(K_FIX, corners)
                visible = (z > 0).all() and (uv[0] > 0).all() and \
                    (uv[0] < IMG_W).all() and (uv[1] > 0).all() and \
                    (uv[1] < IMG_H).all()
                if not visible:
                    continue
                x0, y0 = int(uv[0].min()), int(uv[1].min())
                x1, y1 = int(uv[0].max()), int(uv[1].max())
                img[y0:y1, x0:x1] = (40 + 60 * ins["k"], 80, 160)
                m = np.zeros((IMG_H, IMG_W), np.uint8)
                m[y0:y1, x0:x1] = 255
                preds["labels"].append("car")
                preds["boxes"].append([float(x0), float(y0),
                                       float(x1), float(y1)])
                masks.append(m)

                # lidar points inside the middle of the box (in-box test with
                # keep_top_portion=0.9 keeps them)
                n_pts = 30
                obj_pts = np.vstack([
                    rng.uniform(-0.3 * WLH[1], 0.3 * WLH[1], n_pts),
                    rng.uniform(-0.3 * WLH[0], 0.3 * WLH[0], n_pts),
                    rng.uniform(-0.3 * WLH[2], 0.3 * WLH[2], n_pts)])
                cam_pts = R @ obj_pts + np.asarray(center)[:, None]
                puv, pz = _project(K_FIX, cam_pts)
                lidar_uv.append(puv)
                lidar_d.append(pz)

            # background lidar points (not on any car)
            bg_uv = np.vstack([rng.uniform(10, IMG_W - 10, 40),
                               rng.uniform(IMG_H - 120, IMG_H - 10, 40)])
            lidar_uv.append(bg_uv)
            lidar_d.append(rng.uniform(25, 60, 40))
            uv_all = np.concatenate(lidar_uv, axis=1)
            uv_hom = np.vstack([uv_all, np.ones((1, uv_all.shape[1]))])
            meta["lidar"][f"{sd_lid}|{sd_cam}"] = {
                "uv": uv_hom.tolist(),
                "depth": np.concatenate(lidar_d).tolist()}

            # a small occluding car (below mask_pixels threshold: 40x38 px)
            if masks:
                bx0 = int(preds["boxes"][0][0])
                by0 = int(preds["boxes"][0][1])
                m = np.zeros((IMG_H, IMG_W), np.uint8)
                m[by0:by0 + 38, bx0:bx0 + 40] = 255
                preds["labels"].append("car")
                preds["boxes"].append(
                    [float(bx0), float(by0), float(bx0 + 40), float(by0 + 38)])
                masks.append(m)
            # and a pedestrian mask (category-filtered everywhere)
            m = np.zeros((IMG_H, IMG_W), np.uint8)
            m[100:220, 100:160] = 255
            preds["labels"].append("person")
            preds["boxes"].append([100.0, 100.0, 160.0, 220.0])
            masks.append(m)

            Image.fromarray(img).save(os.path.join(img_root, stem + ".png"))
            with open(os.path.join(seg_root, stem + ".json"), "w") as f:
                json.dump(preds, f)
            for bi, m in enumerate(masks):
                Image.fromarray(m).save(
                    os.path.join(seg_root, f"{stem}_{bi}.png"))

    with open(os.path.join(root, "fixture_meta.json"), "w") as f:
        json.dump(meta, f)
    return meta


# --------------------------------------------------------------------------
# devkit API shim
# --------------------------------------------------------------------------
class _Quat:
    def __init__(self, R):
        self.rotation_matrix = np.asarray(R, float)


class ShimBox:
    def __init__(self, center, wlh, R, token):
        self.center = np.asarray(center, float)
        self.wlh = np.asarray(wlh, float)
        self.orientation = _Quat(R)
        self.token = token

    def corners(self):
        return _box_corners(self.orientation.rotation_matrix, self.center,
                            self.wlh)


class BoxVisibility:
    ALL = 3
    ANY = 1
    NONE = 0


class _Explorer:
    def __init__(self, nusc):
        self._nusc = nusc

    def map_pointcloud_to_image(self, lidar_token, cam_token):
        rec = self._nusc._lidar[f"{lidar_token}|{cam_token}"]
        return (np.asarray(rec["uv"], np.float64),
                np.asarray(rec["depth"], np.float64), None)


class ShimNuScenes:
    def __init__(self, version: str, dataroot: str, verbose: bool = False):
        self.version = version
        self.dataroot = dataroot
        meta = json.load(open(os.path.join(dataroot, "fixture_meta.json")))
        self._tables = {}
        for name in ["scene", "log", "sample", "sample_data", "instance",
                     "sample_annotation", "calibrated_sensor", "category"]:
            self._tables[name] = meta[name]
        self._by_token = {
            name: {r["token"]: r for r in rows}
            for name, rows in self._tables.items()}
        self._lidar = meta["lidar"]
        self.instance = self._tables["instance"]
        self.sample_data = self._tables["sample_data"]
        self.explorer = _Explorer(self)

    def get(self, table, token):
        return self._by_token[table][token]

    def field2token(self, table, field, value):
        return [r["token"] for r in self._tables[table] if r[field] == value]

    def get_sample_data(self, sd_token, box_vis_level=BoxVisibility.ALL,
                        selected_anntokens=None):
        sd = self.get("sample_data", sd_token)
        sample = next(s for s in self._tables["sample"]
                      if s["data"].get(sd["channel"]) == sd_token)
        K = np.asarray(
            self.get("calibrated_sensor",
                     sd["calibrated_sensor_token"])["camera_intrinsic"])
        anns = [self.get("sample_annotation", t) for t in
                (selected_anntokens if selected_anntokens is not None else
                 self.field2token("sample_annotation", "sample_token",
                                  sample["token"]))]
        boxes = []
        for ann in anns:
            if ann["sample_token"] != sample["token"]:
                continue
            box = ShimBox(ann["center"], ann["size"], ann["rotation_matrix"],
                          ann["token"])
            if box_vis_level == BoxVisibility.ALL:
                uv, z = _project(K, box.corners())
                ok = (z > 0).all() and (uv[0] > 0).all() and \
                    (uv[0] < IMG_W).all() and (uv[1] > 0).all() and \
                    (uv[1] < IMG_H).all()
                if not ok:
                    continue
            boxes.append(box)
        data_path = os.path.join(self.dataroot, sd["filename"])
        return data_path, boxes, K


def install_shim():
    """Register fake `nuscenes` modules in sys.modules; returns an uninstall
    callable. Idempotent if a real devkit is importable (then no-op)."""
    try:
        import nuscenes  # noqa: F401

        return lambda: None
    except ImportError:
        pass

    mods = {}
    pkg = types.ModuleType("nuscenes")
    pkg.__path__ = []
    nusc_mod = types.ModuleType("nuscenes.nuscenes")
    nusc_mod.NuScenes = ShimNuScenes
    utils_pkg = types.ModuleType("nuscenes.utils")
    utils_pkg.__path__ = []
    geom_mod = types.ModuleType("nuscenes.utils.geometry_utils")
    geom_mod.BoxVisibility = BoxVisibility
    splits_mod = types.ModuleType("nuscenes.utils.splits")
    splits_mod.train = ["scene-0061"]
    splits_mod.val = ["scene-0103", "scene-0916"]
    splits_mod.test = []
    pkg.nuscenes = nusc_mod
    pkg.utils = utils_pkg
    utils_pkg.geometry_utils = geom_mod
    utils_pkg.splits = splits_mod
    mods = {"nuscenes": pkg, "nuscenes.nuscenes": nusc_mod,
            "nuscenes.utils": utils_pkg,
            "nuscenes.utils.geometry_utils": geom_mod,
            "nuscenes.utils.splits": splits_mod}
    for k, v in mods.items():
        sys.modules[k] = v

    def uninstall():
        for k in mods:
            sys.modules.pop(k, None)

    return uninstall
