"""Device mesh construction for DP x TP execution.

Replaces the reference's process-group plumbing
(`/root/reference/ddp_train.py:77-81`, NCCL) with a `jax.sharding.Mesh`:
mesh axes *are* the process groups.  Axis names:

  'data'  — batch sharding (DP; psum of grads is inserted by GSPMD)
  'model' — tensor parallelism of d_inner / heads (the reference's
            ColumnParallel/RowParallelLinear world, `CNN_Mamba.py:386-392`)

On multi-host deployments call `jax.distributed.initialize()` first; the
mesh then spans all hosts and ICI/DCN routing is XLA's problem, not ours.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(tp: int = 1, devices=None, batch_size: Optional[int] = None,
              sp: int = 1) -> Mesh:
    """('data', 'model'[, 'seq']) mesh over the devices.

    ``sp > 1`` adds a sequence-parallel axis (the reference's
    ``sequence_parallel=True`` plumbing, `CNN_Mamba.py:354,365`; here it
    L-shards the SS2D scans via parallel/sequence_parallel.py).
    When ``batch_size`` is given, the data axis shrinks to the largest
    device count that divides it (a 4-image debug batch on an 8-device host
    should run, not crash)."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if n % (tp * sp):
        raise ValueError(f"{n} devices not divisible by tp*sp={tp * sp}")
    dp = n // (tp * sp)
    if batch_size is not None:
        while dp > 1 and batch_size % dp:
            dp -= 1
    arr = np.array(devices[: dp * tp * sp]).reshape(dp, tp, sp)
    mesh = Mesh(arr, axis_names=("data", "model", "seq"))
    set_current_mesh(mesh)
    return mesh


# ambient mesh: modules that need shard_map (sequence parallelism) look the
# mesh up here; trainers/dryruns register it via make_mesh/set_current_mesh.
_CURRENT_MESH: Optional[Mesh] = None


def set_current_mesh(mesh: Optional[Mesh]) -> None:
    global _CURRENT_MESH
    _CURRENT_MESH = mesh


def current_mesh() -> Optional[Mesh]:
    return _CURRENT_MESH


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
