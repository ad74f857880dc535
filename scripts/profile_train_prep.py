"""Profile the host-side train batch prep (the product train path's bound).

The round-4 post-mortem (VALIDATION.md) pinned the epoch loop at 3.47 steps/s
vs 7.4 isolated: ~0.25 s/step of numpy prep for 48 ROI crops on this host's
single core cannot hide under a 0.133 s device step. This script breaks that
0.25 s down: cProfile over UnifiedTrainer._prepare_batch_rows at the published
batch 48 on the bench's synthetic dataset, plus a phase-level timing of the
stages inside prepare_train_sample.

Run on CPU (no TPU needed): JAX_PLATFORMS=cpu python scripts/profile_train_prep.py
"""
import cProfile
import io
import os
import pstats
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np


def main():
    from supnerf_tpu.data.synthetic import (
        CyclingDataset,
        SyntheticTTODataset,
        published_hparams,
    )
    from supnerf_tpu.models import build_model
    from supnerf_tpu.training.trainer import UnifiedTrainer

    B = int(os.environ.get("PROF_BATCH", "48"))
    hp = published_hparams()
    model = build_model("supnerf", hp["net_hyperparams"])
    ds = CyclingDataset(SyntheticTTODataset(48, seed0=500), B * 4)
    import tempfile

    with tempfile.TemporaryDirectory() as tmp:
        tr = UnifiedTrainer(model, hp, ds, tmp, batch_size=B,
                            field_impl="flax", log_writer=False,
                            check_iter=10 ** 9, seed=0)
        idxs = list(range(B))
        # warm the jitted CPU helpers + imports
        tr._prepare_batch_rows(idxs, salt=1)

        t0 = time.perf_counter()
        n_rep = 3
        for rep in range(n_rep):
            rows = tr._prepare_batch_rows(idxs, salt=2 + rep)
        dt = (time.perf_counter() - t0) / n_rep
        print(f"_prepare_batch_rows({B}) = {dt*1000:.1f} ms/batch "
              f"({dt/B*1000:.2f} ms/row)")

        # collate cost (np.stack + jnp.asarray upload)
        t0 = time.perf_counter()
        stacked = {k: np.stack([r[k] for r in rows]) for k in rows[0]}
        t1 = time.perf_counter()
        import jax.numpy as jnp

        dev = {k: jnp.asarray(v) for k, v in stacked.items()}
        jax.block_until_ready(list(dev.values()))
        t2 = time.perf_counter()
        print(f"collate: stack {1000*(t1-t0):.1f} ms, upload {1000*(t2-t1):.1f} ms")

        pr = cProfile.Profile()
        pr.enable()
        tr._prepare_batch_rows(idxs, salt=99)
        pr.disable()
        s = io.StringIO()
        ps = pstats.Stats(pr, stream=s).sort_stats("cumulative")
        ps.print_stats(30)
        print(s.getvalue())


if __name__ == "__main__":
    main()
