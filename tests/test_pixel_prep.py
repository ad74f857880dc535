"""Parity of the constant-work batched pixel prep (training.pixel_prep +
UnifiedTrainer._prepare_batch_arrays) against the per-row reference path
(ray_prep.prepare_train_sample): identical rng streams must yield identical
batches up to bilinear fp (~1e-5)."""
import numpy as np
import pytest

from supnerf_tpu.data.synthetic import make_synthetic_object
from supnerf_tpu.geometry.roi import preprocess_img_square, roi_process
from supnerf_tpu.models import build_model
from supnerf_tpu.training import pixel_prep as pp
from supnerf_tpu.training.trainer import UnifiedTrainer

TINY_HP = {
    "arch": "supnerf",
    "net_hyperparams": {"shape_blocks": 1, "texture_blocks": 1,
                        "latent_dim": 32, "pose_shortcut": 1, "pred_wlh": 0},
    "n_rays": 64, "n_samples": 8, "in_img_sz": 64, "roi_margin": 5,
    "shapenet_obj_cood": 1, "sym_aug": 1,
    "lr_schedule": [{"lr": 1e-4, "interval": 1000}] * 2,
}


class _DS:
    def __init__(self, n, seed0=70):
        self.samples = [make_synthetic_object(seed=seed0 + i) for i in range(n)]
        for i, s in enumerate(self.samples):
            s["instoken"] = f"ins_{i}"

    def __len__(self):
        return len(self.samples)

    def __getitem__(self, i):
        return self.samples[i]


def test_resize_masked_from_full_matches_cv2():
    """The full-image gather resample == crop-multiply + cv2 resize + square
    pad (preprocess_img_square), for down- and up-scaling crops."""
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 1, (90, 160, 3)).astype(np.float32)
    mask = rng.choice([-1.0, 0.0, 1.0], (90, 160)).astype(np.float32)
    for roi, out_sz in [((10, 5, 130, 80), 64),   # downscale, non-square
                        ((40, 30, 70, 50), 64),   # upscale
                        ((0, 0, 160, 90), 32)]:   # full frame
        x0, y0, x1, y1 = roi
        crop = img[y0:y1, x0:x1] * (mask[y0:y1, x0:x1, None] > 0)
        want = preprocess_img_square(crop, out_sz)
        got = pp.resize_masked_from_full(
            img, mask, roi, pp.square_resize_hw(y1 - y0, x1 - x0, out_sz),
            out_sz)
        np.testing.assert_allclose(got, want, atol=2e-6)


@pytest.mark.parametrize("aug", [False, True])
def test_batch_arrays_match_per_row(tmp_path, aug):
    """_prepare_batch_arrays == stacked _prepare_batch_rows, same rng salt."""
    model = build_model("supnerf", TINY_HP["net_hyperparams"])
    tr = UnifiedTrainer(model, TINY_HP, _DS(4), str(tmp_path / "ckpt"),
                        batch_size=4, log_writer=False, aug_wlh=aug,
                        aug_box2d=aug, img_upload_dtype=None)
    idxs, salt = [2, 0, 3, 1], 7
    rows = tr._prepare_batch_rows(idxs, salt)
    want = {k: np.stack([r[k] for r in rows]) for k in rows[0]}
    got = tr._prepare_batch_arrays(idxs, salt)
    assert set(got) == set(want)
    for k in want:
        np.testing.assert_allclose(
            got[k], want[k], rtol=2e-5, atol=2e-5,
            err_msg=f"key {k} diverges between batched and per-row prep")
        assert got[k].dtype == want[k].dtype, k


def test_batch_arrays_bf16_cast(tmp_path):
    import ml_dtypes

    model = build_model("supnerf", TINY_HP["net_hyperparams"])
    tr = UnifiedTrainer(model, TINY_HP, _DS(2), str(tmp_path / "ckpt"),
                        batch_size=2, log_writer=False)
    got = tr._prepare_batch_arrays([0, 1], 3)
    assert got["img_in"].dtype == np.dtype(ml_dtypes.bfloat16)


def test_ray_target_gather_matches_crop_gather():
    """gather_targets from the full image == the flattened-crop gather."""
    s = make_synthetic_object(seed=3)
    H, W = s["imgs"].shape[:2]
    roi = roi_process(s["rois"], H, W, 5)
    x0, y0, x1, y1 = [int(v) for v in roi]
    mask_crop = np.asarray(s["masks_occ"], np.float32)[y0:y1, x0:x1][..., None]
    img_crop = np.asarray(s["imgs"], np.float32)[y0:y1, x0:x1] * (mask_crop > 0)
    w = x1 - x0
    ids = np.random.default_rng(1).permutation((y1 - y0) * w)[:50]
    ys, xs = y0 + ids // w, x0 + ids % w
    rgb, occ = pp.gather_targets(s["imgs"], s["masks_occ"], ys, xs)
    np.testing.assert_array_equal(rgb, img_crop.reshape(-1, 3)[ids])
    np.testing.assert_array_equal(occ, mask_crop.reshape(-1, 1)[ids])
