"""TTO object-axis sharding over the virtual 8-device mesh: the vmapped
pipeline must compile and produce per-object results under SPMD partitioning
(replacing the reference's --num_subset manual process sharding)."""
import numpy as np
import jax

from tests.test_tto_driver import SynthDataset, _driver


def test_tto_driver_sharded_over_mesh(tmp_path):
    assert len(jax.devices()) == 8
    ds = SynthDataset(8)
    drv = _driver(tmp_path, ds, n_devices=8)
    drv.batch_size = 8
    res = drv.optimize_object_batch(list(range(8)))
    assert res["psnr"].shape[0] == 8
    assert np.isfinite(np.asarray(res["psnr"])).all()
    assert len(drv.psnr_eval) == 8
