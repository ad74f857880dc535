"""nuScenes object dataset.

Capability-equivalent of the reference dataset
(/root/reference/src/data_nuscenes.py NuScenesData :214): per-(annotation,
camera) samples of the target category with
  - curation (scene-split filtering, night filtering by log hour >= 18,
    mask-rcnn mask association via lidar-point voting, mask-pixel / box-IoU /
    area-ratio / distance / lidar-count thresholds) cached to a JSON index,
  - occupancy masks (1 fg / 0 occluder / -1 bg),
  - camera/object poses, wlh, sparse lidar depth pixels,
  - pose-error injection modes 0/1/2/3,
  - multiview retrieval per instance and whole-image object extraction for the
    demo pipeline.

Requires the nuscenes-devkit + dataset on disk; the import is gated so the
rest of the framework (and CI, which uses data.synthetic) works without it.
"""
from __future__ import annotations

import json
import os

import numpy as np

from supnerf_tpu.data.common import (
    NUSC_CAR_WLH_MEAN,
    get_associate_box_3d,
    pts_in_box_np,
    get_mask_occ_from_ins,
    get_tgt_ins_from_maskrcnn,
    load_instance_masks,
)
from supnerf_tpu.geometry import poses as pose_gen

MINI_TRAIN = [
    "scene-0061", "scene-0553", "scene-0655", "scene-0757",
    "scene-0796", "scene-1077", "scene-1094", "scene-1100",
]
MINI_VAL = ["scene-0103", "scene-0916"]


def _splits(nusc_version: str, split: str):
    if "mini" in nusc_version:
        return MINI_TRAIN if split == "train" else MINI_VAL
    from nuscenes.utils import splits as nusc_splits

    return {"train": nusc_splits.train, "val": nusc_splits.val,
            "test": nusc_splits.test}[split]



class NuScenesData:
    def __init__(self, hpams, split: str = "train", out_gt_depth: bool = True,
                 add_pose_err: int = 0, init_rot_err: float = 0.2,
                 init_trans_err: float = 0.1, rand_angle_lim: float = np.pi / 9,
                 det3d_path: str | None = None, test_size: int = 5000,
                 pred_box2d: bool = False, box2d_rz_ratio: float = 1.2,
                 num_subset: int = 1, id_subset: int = 0,
                 data_dir: str | None = None, seg_dir: str | None = None,
                 nusc_version: str | None = None, seed: int = 0,
                 debug: bool = False, debug_dir: str = "debug_vis"):
        from nuscenes.nuscenes import NuScenes

        ds_cfg = hpams["dataset"]
        self.nusc_cat = ds_cfg["nusc_cat"]
        self.seg_cat = ds_cfg.get("seg_cat", "car")
        self.box_iou_th = ds_cfg.get("box_iou_th", 0.5)
        self.max_dist = ds_cfg.get("max_dist", 40)
        self.min_lidar_cnt = ds_cfg.get("min_lidar_cnt", 5)
        self.mask_pixels = ds_cfg.get("mask_pixels", 2500)
        self.img_h = ds_cfg.get("img_h", 900)
        self.img_w = ds_cfg.get("img_w", 1600)
        self.split = split
        self.add_pose_err = add_pose_err
        self.init_rot_err = init_rot_err
        self.init_trans_err = init_trans_err
        self.rand_angle_lim = rand_angle_lim
        self.det3d_path = det3d_path
        self.pred_box2d = pred_box2d
        self.box2d_rz_ratio = box2d_rz_ratio
        self.out_gt_depth = out_gt_depth
        # debug=True writes a per-sample QA overlay panel (reference
        # data_nuscenes.py:660-711 renders it interactively)
        self.debug = debug
        self.debug_dir = debug_dir
        self.rng = np.random.default_rng(seed)

        key = "train_data_dir" if split == "train" else "test_data_dir"
        self.data_dir = data_dir or ds_cfg.get(key, "data/NuScenes")
        self.seg_dir = seg_dir or os.path.join(self.data_dir, "pred_instance")
        version_key = "train_nusc_version" if split == "train" else "test_nusc_version"
        self.version = nusc_version or ds_cfg.get(
            version_key, ds_cfg.get("train_nusc_version", "v1.0-trainval"))

        self.nusc = NuScenes(version=self.version, dataroot=self.data_dir, verbose=False)
        self.all_valid_samples = []
        self.anntokens_per_ins = {}
        self.instoken_per_ann = {}
        self.sample_attr = {}

        index_file = os.path.join(
            self.data_dir, f"nusc.{self.version}.{split}.{self.nusc_cat}.json")
        thresholds = {
            "box_iou_th": self.box_iou_th, "max_dist": self.max_dist,
            "mask_pixels": self.mask_pixels, "min_lidar_cnt": self.min_lidar_cnt,
            "seg_type": "instance",
        }
        if os.path.exists(index_file):
            subset = json.load(open(index_file))
            if all(subset.get(k) == v for k, v in thresholds.items()):
                self.all_valid_samples = subset["all_valid_samples"]
                self.anntokens_per_ins = subset["anntokens_per_ins"]
                self.instoken_per_ann = subset["instoken_per_ann"]
                self.sample_attr = subset["sample_attr"]
            else:
                self.preprocess_dataset(split, index_file, thresholds)
        else:
            self.preprocess_dataset(split, index_file, thresholds)

        # fixed random test subset (reference :298-307)
        if split != "train" and len(self.all_valid_samples) > test_size:
            subset = json.load(open(index_file))
            if ("rand_data_ids" not in subset
                    or len(subset["rand_data_ids"]) != test_size):
                ids = self.rng.permutation(len(self.all_valid_samples))[:test_size]
                subset["rand_data_ids"] = ids.tolist()
                json.dump(subset, open(index_file, "w"), indent=4)
            self.all_valid_samples = [
                self.all_valid_samples[i] for i in subset["rand_data_ids"]]

        # legacy manual sharding
        set_size = len(self.all_valid_samples) // num_subset
        self.all_valid_samples = self.all_valid_samples[
            id_subset * set_size:(id_subset + 1) * set_size]
        self.lenids = len(self.all_valid_samples)

        # image-name -> camera sample-data map for the demo path
        self.cam_data_dict = {}
        for sd in self.nusc.sample_data:
            if "CAM" in sd["channel"]:
                self.cam_data_dict[os.path.basename(sd["filename"])] = sd

    # -- curation -------------------------------------------------------------
    def preprocess_dataset(self, split: str, index_file: str, thresholds: dict):
        from nuscenes.utils.geometry_utils import BoxVisibility

        scene_names = set(_splits(self.version, split))
        for instance in self.nusc.instance:
            if self.nusc.get("category", instance["category_token"])["name"] != self.nusc_cat:
                continue
            instoken = instance["token"]
            anntokens = self.nusc.field2token("sample_annotation", "instance_token", instoken)
            for anntoken in anntokens:
                ann = self.nusc.get("sample_annotation", anntoken)
                rec = self.nusc.get("sample", ann["sample_token"])
                scene = self.nusc.get("scene", rec["scene_token"])
                if scene["name"] not in scene_names:
                    continue
                # night filtering by log hour (reference :360-363)
                log_file = self.nusc.get("log", scene["log_token"])["logfile"]
                if int(log_file.split("-")[4]) >= 18:
                    continue
                if "LIDAR_TOP" not in rec["data"]:
                    continue
                cams = [k for k in rec["data"] if "CAM" in k]
                for cam in self.rng.permutation(cams):
                    data_path, boxes, K = self.nusc.get_sample_data(
                        rec["data"][cam], box_vis_level=BoxVisibility.ALL,
                        selected_anntokens=[anntoken])
                    if len(boxes) != 1:
                        continue
                    box = boxes[0]
                    corners = K @ box.corners()
                    corners = corners[:2] / corners[2:3]
                    box_2d = [corners[0].min(), corners[1].min(),
                              corners[0].max(), corners[1].max()]

                    lidar_im, lidar_depth, _ = self.nusc.explorer.map_pointcloud_to_image(
                        rec["data"]["LIDAR_TOP"], rec["data"][cam])
                    lidar_cam = np.linalg.inv(K) @ lidar_im * lidar_depth
                    in_box = pts_in_box_np(lidar_cam, box.corners(), 0.9)
                    lidar_im_ann = lidar_im[:, in_box]

                    stem = os.path.basename(data_path)[:-4]
                    try:
                        preds, masks = load_instance_masks(
                            os.path.join(self.seg_dir, cam), stem)
                    except FileNotFoundError:
                        continue
                    tgt_id, cnt, area_ratio, iou, lidar_cnt = get_tgt_ins_from_maskrcnn(
                        preds, masks, self.seg_cat, box_2d, lidar_im_ann)
                    if (tgt_id is not None and cnt > self.mask_pixels
                            and iou > self.box_iou_th and area_ratio > self.box_iou_th
                            and np.linalg.norm(box.center) < self.max_dist
                            and lidar_cnt >= self.min_lidar_cnt):
                        self.all_valid_samples.append([anntoken, cam])
                        self.anntokens_per_ins.setdefault(instoken, []).append(
                            [anntoken, cam])
                        self.instoken_per_ann[anntoken] = instoken
                        self.sample_attr.setdefault(anntoken, {})[cam] = {
                            "seg_id": int(tgt_id), "lidar_cnt": float(lidar_cnt)}

        subset = {
            "all_valid_samples": self.all_valid_samples,
            "anntokens_per_ins": self.anntokens_per_ins,
            "instoken_per_ann": self.instoken_per_ann,
            "sample_attr": self.sample_attr, **thresholds,
        }
        json.dump(subset, open(index_file, "w"), indent=4)

    # -- samples --------------------------------------------------------------
    def __len__(self):
        return self.lenids

    def _load_ann(self, anntoken: str, cam: str):
        from PIL import Image
        from nuscenes.utils.geometry_utils import BoxVisibility

        ann = self.nusc.get("sample_annotation", anntoken)
        rec = self.nusc.get("sample", ann["sample_token"])
        data_path, boxes, K = self.nusc.get_sample_data(
            rec["data"][cam], box_vis_level=BoxVisibility.ALL,
            selected_anntokens=[anntoken])
        img = np.asarray(Image.open(data_path)).astype(np.float32) / 255.0
        box = boxes[0]
        obj_pose = np.concatenate(
            [box.orientation.rotation_matrix, box.center[:, None]], axis=1
        ).astype(np.float32)
        return ann, rec, data_path, img, box, K.astype(np.float32), obj_pose

    def __getitem__(self, idx):
        anntoken, cam = self.all_valid_samples[idx]
        ann, rec, data_path, img, box, K, obj_pose = self._load_ann(anntoken, cam)
        R_c2o = obj_pose[:, :3].T
        cam_pose = np.concatenate([R_c2o, -R_c2o @ obj_pose[:, 3:4]], axis=1)

        corners = K @ box.corners().astype(np.float32)
        corners = corners[:2] / corners[2:3]
        box_2d = np.array([corners[0].min(), corners[1].min(),
                           corners[0].max(), corners[1].max()])

        stem = os.path.basename(data_path)[:-4]
        preds, masks = load_instance_masks(os.path.join(self.seg_dir, cam), stem)
        tgt_id = self.sample_attr[anntoken][cam]["seg_id"]
        mask_occ = get_mask_occ_from_ins(masks, tgt_id).astype(np.float32)
        if self.pred_box2d:
            from supnerf_tpu.geometry.roi import roi_resize

            box_2d = np.asarray(roi_resize(preds["boxes"][tgt_id], self.box2d_rz_ratio))

        wlh = np.asarray(ann["size"], np.float32)
        sample = {
            "imgs": img,
            "masks_occ": mask_occ,
            "rois": box_2d.astype(np.int32),
            "cam_intrinsics": K,
            "cam_poses": cam_pose.astype(np.float32),
            "obj_poses": obj_pose,
            "wlh": wlh,
            "instoken": self.instoken_per_ann[anntoken],
            "anntoken": anntoken,
            "cam_ids": cam,
        }
        sample["obj_poses_w_err"] = self._pose_with_err(
            sample, K, obj_pose, masks, tgt_id, data_path)
        if self.out_gt_depth:
            self._add_lidar_pixels(sample, rec, cam, K, box)
        else:
            sample["lidar_u"] = sample["lidar_v"] = sample["lidar_depth"] = \
                np.zeros(0, np.float32)
        if self.debug:
            from supnerf_tpu.data.debug import debug_sample_panel

            lidar_cnt = self.sample_attr[anntoken][cam].get("lidar_cnt", -1)
            print(f"        tgt instance id: {tgt_id}, lidar pts cnt: {lidar_cnt} ")
            try:
                vis_rec = self.nusc.get(
                    "visibility", ann["visibility_token"])
                print(f"        Visibility: {vis_rec}")
            except (KeyError, AttributeError):
                pass  # devkit builds without a visibility table
            debug_sample_panel(sample, save_path=os.path.join(
                self.debug_dir, f"{anntoken}_{cam}.png"))
        return sample

    def _pose_with_err(self, sample, K, obj_pose, masks, tgt_id, data_path):
        if self.add_pose_err == 1:
            yaw_err = self.rng.choice([1.0, -1.0]) * self.init_rot_err
            c, s = np.cos(yaw_err), np.sin(yaw_err)
            rot_err = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)
            t_ratio = 1.0 + self.rng.choice([1.0, -1.0]) * self.init_trans_err
            out = obj_pose.copy()
            out[:, :3] = obj_pose[:, :3] @ rot_err
            out[:, 3] = obj_pose[:, 3] * t_ratio
            return out.astype(np.float32)
        if self.add_pose_err == 3 and self.det3d_path is not None:
            cam = sample["cam_ids"]
            det_file = os.path.join(self.det3d_path, cam,
                                    os.path.basename(data_path)[:-4] + ".json")
            if os.path.exists(det_file):
                objects_pred = json.load(open(det_file))
                aid, iou = get_associate_box_3d(objects_pred, masks[tgt_id],
                                                self.nusc_cat, K)
                if aid >= 0 and iou > 0:
                    ry = objects_pred["boxes_yaw"][aid]
                    c, s = np.cos(ry), np.sin(ry)
                    R_yaw = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float32)
                    R_unit = np.array([[1.0, 0, 0], [0, 0, -1], [0, 1, 0]], np.float32)
                    R_obj = R_yaw @ R_unit
                    T_obj = np.asarray(objects_pred["boxes_center"][aid],
                                       np.float32).reshape(3, 1)
                    return np.concatenate([R_obj, T_obj], axis=1)
        if self.add_pose_err >= 2:
            import jax
            import jax.numpy as jnp

            key = jax.random.PRNGKey(int(self.rng.integers(0, 2**31)))
            return np.asarray(pose_gen.get_random_pose2(
                key, jnp.asarray(K), jnp.asarray(sample["rois"], jnp.float32),
                angle_lim=self.rand_angle_lim, trans_lim=0.3))
        return obj_pose.astype(np.float32)

    def _add_lidar_pixels(self, sample, rec, cam, K, box):
        lidar_im, lidar_depth, _ = self.nusc.explorer.map_pointcloud_to_image(
            rec["data"]["LIDAR_TOP"], rec["data"][cam])
        lidar_cam = np.linalg.inv(K) @ lidar_im * lidar_depth
        in_box = pts_in_box_np(lidar_cam, box.corners(), 0.9)
        u = lidar_im[0, in_box]
        v = lidar_im[1, in_box]
        d = lidar_depth[in_box]
        ui = np.clip(u.astype(np.int32), 0, self.img_w - 1)
        vi = np.clip(v.astype(np.int32), 0, self.img_h - 1)
        on_mask = sample["masks_occ"][vi, ui] > 0
        sample["lidar_u"] = u[on_mask].astype(np.float32)
        sample["lidar_v"] = v[on_mask].astype(np.float32)
        sample["lidar_depth"] = d[on_mask].astype(np.float32)

    # -- multiview / demo -----------------------------------------------------
    def get_ins_samples(self, instoken: str):
        """All samples of one instance (reference get_ins_samples :716 used by
        multiview optimization and cross-view evaluation).

        anntokens_per_ins lists EVERY annotation of the instance, but the
        sample list may have been trimmed (test_size subsetting, num_subset
        sharding) — skip annotations no longer present instead of crashing,
        via an O(1) lookup table instead of a per-call list scan."""
        if not hasattr(self, "_sample_idx"):
            self._sample_idx = {tuple(s): i for i, s
                                in enumerate(self.all_valid_samples)}
        out = []
        for anntoken, cam in self.anntokens_per_ins.get(instoken, []):
            idx = self._sample_idx.get((anntoken, cam))
            if idx is not None:
                out.append(self[idx])
        return out

    def get_objects_in_image(self, img_name: str):
        """Every detected target-category object in one image from mask-rcnn
        predictions only — no GT (reference get_objects_in_image :956, the demo
        input path). Returns {'img', 'objects': [sample dicts]}."""
        from PIL import Image

        sd = self.cam_data_dict[img_name]
        cam = sd["channel"]
        data_path = os.path.join(self.data_dir, sd["filename"])
        img = np.asarray(Image.open(data_path)).astype(np.float32) / 255.0
        K = None
        calib = self.nusc.get("calibrated_sensor", sd["calibrated_sensor_token"])
        K = np.asarray(calib["camera_intrinsic"], np.float32)

        stem = os.path.basename(data_path)[:-4]
        preds, masks = load_instance_masks(os.path.join(self.seg_dir, cam), stem)
        # seg_cat filter FIRST, then occupancy from the FILTERED mask list and
        # predicted boxes enlarged by box2d_rz_ratio — exactly the reference's
        # demo curation (data_nuscenes.py:981-994): other-category detections
        # read as background (-1), not occluders (0), and every ROI is the
        # 1.2x-enlarged box
        from supnerf_tpu.geometry.roi import roi_resize

        ins_masks, boxes = [], []
        for i, label in enumerate(preds["labels"]):
            if self.seg_cat in label:
                ins_masks.append(np.asarray(masks[i]))
                boxes.append(np.asarray(
                    roi_resize(preds["boxes"][i], self.box2d_rz_ratio)))
        objects = []
        for i, (mask, box) in enumerate(zip(ins_masks, boxes)):
            mask_occ = get_mask_occ_from_ins(ins_masks, i).astype(np.float32)
            objects.append({
                "imgs": img,
                "masks_occ": mask_occ,
                "rois": box.astype(np.int32),
                "cam_intrinsics": K,
                "obj_poses": np.concatenate(
                    [np.eye(3, dtype=np.float32),
                     np.asarray([[0.0], [0.0], [20.0]], np.float32)], axis=1),
                "wlh": NUSC_CAR_WLH_MEAN.copy(),
                "instoken": f"demo_{stem}_{i}",
                "anntoken": f"demo_{stem}_{i}",
                "cam_ids": cam,
                "lidar_u": np.zeros(0, np.float32),
                "lidar_v": np.zeros(0, np.float32),
                "lidar_depth": np.zeros(0, np.float32),
            })
        return {"img": img, "objects": objects}
