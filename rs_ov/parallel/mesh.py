"""Device-mesh construction (the NCCL/torch.distributed replacement).

The reference scales with `torch.distributed.launch` + NCCL data parallelism
(reference dist_test.sh:11-22, configs/base_config.py:33). TPU-native scaling
is a `jax.sharding.Mesh` over ICI with named axes:

  * 'data'  — images / tiles (data parallel + the spatial analogue of
              sequence parallelism: the tile grid shards across chips)
  * 'model' — tensor parallelism over attention heads / MLP hidden dim

Collectives (psum for metric reduction, all_gather for contrastive loss,
ppermute for the SigLIP neighbour exchange) ride ICI via XLA; nothing in this
framework ever calls NCCL.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "named_sharding", "initialize_distributed"]


def initialize_distributed(coordinator_address: str | None = None,
                           num_processes: int | None = None,
                           process_id: int | None = None) -> None:
    """Multi-host bring-up (the reference's NNODES/NODE_RANK/MASTER_ADDR role,
    reference dist_test.sh:2-12). On TPU pods jax.distributed auto-discovers;
    args cover DCN-connected CPU/GPU fleets. Safe to call twice."""
    import jax

    try:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
    except RuntimeError:
        pass  # already initialised (or single-process)


def make_mesh(data: int | None = None, model: int = 1, devices=None) -> Mesh:
    """Build a ('data', 'model') mesh. Defaults to all devices on 'data'."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None:
        data = n // model
    if data * model != n:
        raise ValueError(f"mesh {data}x{model} != {n} devices")
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, axis_names=("data", "model"))


def named_sharding(mesh: Mesh, *spec) -> NamedSharding:
    return NamedSharding(mesh, P(*spec))
