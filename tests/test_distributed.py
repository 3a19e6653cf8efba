"""Multi-host path: jax.distributed over two real processes (CPU).

SURVEY.md section 2.9 multi-slice row. Two subprocesses each expose 2
virtual CPU devices and join through `init_distributed` (env-driven), so
`jax.devices()` becomes global (4); each contributes its process-local
half of a batch via `global_batch`, and a data-sharded jitted reduction
must see all hosts' data -- the same code path a TPU pod runs per host.
"""
import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import jax
try:
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
except Exception:
    pass  # newer jax auto-selects; option may be absent
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from open_genie_tpu.parallel.mesh import (
    DATA_AXIS, global_batch, init_distributed, make_mesh,
)

assert init_distributed(), "env-driven init_distributed must trigger"
assert jax.process_count() == 2, jax.process_count()
assert jax.device_count() == 4, jax.device_count()
assert jax.local_device_count() == 2

mesh = make_mesh(n_data=4, n_model=1)
local = np.full((2, 3), jax.process_index(), np.float32)
g = global_batch(local, mesh)
assert g.shape == (4, 3), g.shape

total = jax.jit(
    lambda x: x.sum(),
    in_shardings=NamedSharding(mesh, P(DATA_AXIS)),
    out_shardings=NamedSharding(mesh, P()),
)(g)
print("DIST_OK", float(total))

# Loader path: each process streams ITS stride of the dataset through
# BatchLoader; place_batch assembles global (4, ...) arrays (device_put
# would reject the non-addressable sharding -- the trainer regression).
from open_genie_tpu.data.loader import BatchLoader, DatasetShard
from open_genie_tpu.data.video import SyntheticVideo
from open_genie_tpu.parallel.mesh import batch_sharding

ds = DatasetShard(SyntheticVideo(num_videos=8, num_frames=2, height=8,
                                 width=8), jax.process_index(), 2)
loader = BatchLoader(ds, batch_size=2, num_workers=1, shuffle=False,
                     sharding=batch_sharding(mesh))
shapes = [tuple(b.shape) for b in loader]
assert shapes == [(4, 2, 8, 8, 3)] * 2, shapes
print("LOADER_OK", shapes[0])
"""


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_cpu_mesh():
    port = _free_port()
    env_base = {
        k: v for k, v in os.environ.items()
        if not k.startswith(("PALLAS_AXON", "AXON_", "TPU_", "LIBTPU"))
    }
    env_base["PYTHONPATH"] = REPO
    env_base["JAX_PLATFORMS"] = "cpu"
    env_base["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env_base["OGT_COORDINATOR"] = f"127.0.0.1:{port}"
    env_base["OGT_NUM_PROCESSES"] = "2"

    procs = []
    for pid in range(2):
        env = dict(env_base, OGT_PROCESS_ID=str(pid))
        procs.append(subprocess.Popen(
            [sys.executable, "-c", CHILD], env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        ))
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=150)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("distributed child hung")
        outs.append((p.returncode, out, err))

    for rc, out, err in outs:
        assert rc == 0, f"child failed rc={rc}:\n{err[-2000:]}"
        assert "DIST_OK 6.0" in out, out  # sum = 6*0 + 6*1
        assert "LOADER_OK" in out, out
