"""Device mesh + sharding rules: the framework's communication backend.

The reference delegates all parallelism to Lightning DDP/NCCL
(`/root/reference/config/tokenize.yaml:74-78`); here the communication
backend is XLA/GSPMD itself (SURVEY.md section 2.9): a named `Mesh` with
`data` and `model` axes, `NamedSharding` annotations on batch and params,
and XLA-inserted collectives riding ICI.

  * data parallel  : batch sharded over the `data` axis; gradient
    all-reduce inserted by GSPMD.
  * tensor parallel: attention/FFN Dense kernels partitioned over the
    `model` axis via path-suffix rules (Megatron-style column/row split --
    `to_q/k/v` column, `to_out` row -- so each block needs only one
    all-reduce on its output).
  * sequence parallel: the factorized attention batches spatial attention
    over (B*T) and temporal over (B*H*W); sharding the batch axis of those
    reshapes over `data` IS the sequence shard -- tubes don't interact, so
    no ring is needed (SURVEY.md section 5).
"""
from __future__ import annotations

import re
from typing import Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Initialize the JAX distributed runtime for multi-host / multi-slice.

    SURVEY.md section 2.9's multi-slice row: on a TPU pod each host calls
    this before any jax op; afterwards `jax.devices()` is GLOBAL (all
    hosts' chips) and `make_mesh` + GSPMD shardings span slices with XLA
    routing collectives over ICI/DCN. Explicit args cover CPU/test runs;
    on Cloud TPU all three are auto-detected when omitted.

    Falls back silently to single-process when nothing is configured
    (args or `OGT_COORDINATOR` / `OGT_NUM_PROCESSES` / `OGT_PROCESS_ID`
    env vars), so single-host flows never pay the coordinator handshake.
    Returns True iff the distributed runtime was initialized.
    """
    import os

    coordinator_address = coordinator_address or os.environ.get("OGT_COORDINATOR")
    if num_processes is None and os.environ.get("OGT_NUM_PROCESSES"):
        num_processes = int(os.environ["OGT_NUM_PROCESSES"])
    if process_id is None and os.environ.get("OGT_PROCESS_ID"):
        process_id = int(os.environ["OGT_PROCESS_ID"])
    if coordinator_address is None and num_processes is None:
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True


def place_batch(batch, sharding: Optional[NamedSharding]):
    """Put a host-local batch on device under `sharding`, multi-host aware.

    Single-process: plain (sharded) `device_put`. Multi-process: a
    NamedSharding spans non-addressable devices, which `device_put`
    rejects -- the local batch is each host's shard of the global batch
    and is assembled via `make_array_from_process_local_data` (loaders
    feed disjoint data per host; see `trainer.build_loader`).
    """
    if sharding is None:
        return jax.device_put(batch)
    if jax.process_count() == 1:
        # device_put maps a single sharding over every pytree leaf
        # (batches may be dicts, e.g. token shards).
        return jax.device_put(batch, sharding)
    return jax.tree.map(
        lambda leaf: jax.make_array_from_process_local_data(sharding, leaf),
        batch,
    )


def global_batch(batch, mesh: Mesh):
    """Assemble a GLOBAL batch-sharded array from per-process local data.

    Each host passes its LOCAL shard of the batch and the result is one
    global jax.Array of leading dim `local_batch * num_processes`,
    sharded over the `data` axis -- the multi-host equivalent of the
    reference's DDP per-rank DataLoader split (`config/tokenize.yaml:77`).
    """
    return place_batch(batch, batch_sharding(mesh))


def make_mesh(
    n_data: Optional[int] = None,
    n_model: int = 1,
    devices=None,
) -> Mesh:
    """Build a `(data, model)` mesh over the available devices."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if n_data is None:
        n_data = n // n_model
    want = n_data * n_model
    assert want <= n, f"mesh {n_data}x{n_model} needs {want} devices, have {n}"
    # A mesh smaller than the host's device count uses a leading subset
    # (e.g. single-device configs on a multi-device host).
    dev_array = np.asarray(devices[:want]).reshape(n_data, n_model)
    return Mesh(dev_array, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over `data`, replicate the rest."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


# (path-regex, PartitionSpec) rules for tensor-parallel params. Applied to
# '/'-joined param paths; first match wins; default replicated.
# Dense kernels are (in, out): column-parallel shards the out dim, row-
# parallel the in dim.
TP_RULES: Tuple[Tuple[str, P], ...] = (
    (r"(to_q|to_k|to_v)/kernel$", P(None, MODEL_AXIS)),   # column
    (r"to_out/kernel$", P(MODEL_AXIS, None)),             # row
    (r"ffn/block_0/kernel$", P(None, None, None, None, MODEL_AXIS)),
    (r"head/kernel$", P(None, MODEL_AXIS)),               # big vocab head
    (r"tok_emb/embedding$", P(None, MODEL_AXIS)),
    (r"act_emb/embedding$", P(None, MODEL_AXIS)),
)


def param_shardings(params, mesh: Mesh, rules=TP_RULES):
    """NamedSharding pytree for a param tree via path-regex rules.

    With `n_model == 1` every spec degenerates to replication, so the same
    code path serves pure-DP and DP+TP meshes.
    """
    import flax

    flat = flax.traverse_util.flatten_dict(params)
    out = {}
    for path, leaf in flat.items():
        joined = "/".join(str(p) for p in path)
        spec = P()
        for pat, s in rules:
            if re.search(pat, joined):
                # Only apply if rank and divisibility allow it.
                if len(s) <= leaf.ndim and _divisible(leaf.shape, s, mesh):
                    spec = s
                break
        out[path] = NamedSharding(mesh, spec)
    return flax.traverse_util.unflatten_dict(out)


def _divisible(shape, spec, mesh) -> bool:
    for dim, axis in zip(shape, spec):
        if axis is None:
            continue
        if dim % mesh.shape[axis] != 0:
            return False
    return True
