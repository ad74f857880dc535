"""Interop: re-score reference-format torch .pth result files."""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from supnerf_tpu.eval.aggregate import aggregate_metrics, load_result_file


def test_load_reference_style_pth(tmp_path):
    # mimic the reference's save_opts_w_pose dict shapes: psnr lists, R/T as
    # lists of torch scalars, depth/lidar dicts (optimizer_nuscenes.py:1463-1476)
    rng = np.random.default_rng(0)
    saved = {
        "num_obj": 3,
        "psnr_eval": {f"ann{i}_CAM": rng.uniform(5, 20, 100).tolist() for i in range(3)},
        "R_eval": {f"ann{i}_CAM": [torch.tensor(v) for v in rng.uniform(0, 1, 100)]
                   for i in range(3)},
        "T_eval": {f"ann{i}_CAM": [torch.tensor(v) for v in rng.uniform(0, 2, 100)]
                   for i in range(3)},
        "depth_err_mean": {f"ann{i}_CAM": rng.uniform(0, 2, 100).tolist() for i in range(3)},
        "lidar_pts_cnt": {f"ann{i}_CAM": 50 for i in range(3)},
        "optimized_shapecodes": {"x": {"CAM": torch.zeros(6, 256)}},
    }
    path = tmp_path / "codes+poses.pth"
    torch.save(saved, str(path))

    result = load_result_file(str(path))
    assert isinstance(result["optimized_shapecodes"]["x"]["CAM"], np.ndarray)
    agg = aggregate_metrics(result, max_iter=100)
    assert agg["psnr"].shape == (100,)
    assert np.isfinite(agg["rot_err_deg"]).all()
    assert np.isfinite(agg["depth_err"]).all()
