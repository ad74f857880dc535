"""2-process jax.distributed smoke for parallel.maybe_init_distributed.

The reference has no multi-host path at all (DataParallel only, README:276);
ours is the standard JAX DCN bootstrap. This test proves the env-var wiring
actually forms a cluster: two subprocesses on the CPU platform rendezvous at
a local coordinator via maybe_init_distributed(), see each other
(process_count == 2), and run ONE real cross-process collective (a global sum
over a mesh spanning both processes' devices, via the gloo CPU collectives
jax 0.9 ships by default)."""
import os
import socket
import subprocess
import sys

_CHILD = r"""
import os
import numpy as np
import jax

# the environment pre-imports jax with the axon (TPU) platform pinned via
# jax.config; env vars at process launch are too late (see tests/conftest.py)
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from supnerf_tpu.parallel import maybe_init_distributed
from supnerf_tpu.parallel.mesh import make_mesh, batch_sharding

assert maybe_init_distributed(), "env vars set but init skipped"
pid = jax.process_index()
assert jax.process_count() == 2, jax.process_count()
assert pid == int(os.environ["JAX_PROCESS_ID"])
n_local = jax.local_device_count()
n_global = jax.device_count()
assert n_global == 2 * n_local, (n_global, n_local)

# one real cross-process collective: global sum of per-device ranks
mesh = make_mesh()     # all GLOBAL devices
local = np.asarray([pid * n_local + i for i in range(n_local)], np.float32)
arr = jax.make_array_from_process_local_data(batch_sharding(mesh), local)
total = jax.jit(jnp.sum, out_shardings=jax.NamedSharding(
    mesh, jax.sharding.PartitionSpec()))(arr)
want = sum(range(n_global))
assert float(total) == want, (float(total), want)
print(f"DIST_SMOKE_OK {pid} procs={jax.process_count()} sum={float(total)}")
"""


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_distributed_init_and_collective():
    port = _free_port()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.pop("PYTEST_CURRENT_TEST", None)
        env.update({
            "JAX_PLATFORMS": "cpu",
            "XLA_FLAGS": "--xla_force_host_platform_device_count=2",
            "JAX_COORDINATOR_ADDRESS": f"127.0.0.1:{port}",
            "JAX_NUM_PROCESSES": "2",
            "JAX_PROCESS_ID": str(pid),
            "PYTHONHASHSEED": "0",
        })
        # each child compiles one tiny program; don't touch the shared
        # persistent caches from two racing processes
        env.pop("JAX_COMPILATION_CACHE_DIR", None)
        procs.append(subprocess.Popen(
            [sys.executable, "-c", _CHILD], env=env, cwd=repo,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True))
    outs = []
    try:
        for p in procs:
            out, err = p.communicate(timeout=240)
            outs.append((p.returncode, out, err))
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for rc, out, err in outs:
        assert rc == 0, f"child failed rc={rc}\nstdout:{out}\nstderr:{err[-2000:]}"
        assert "DIST_SMOKE_OK" in out, out
