"""Device mesh / distributed runtime.

Replaces the reference's three-way launcher (single / DP / DDP+MDDP via
mp.spawn + NCCL process groups, reference src/main.py:175-196,
src/utils/misc.py:166-186) with ONE SPMD code path:

  * single chip      -> Mesh((1,), ('data',))
  * one host, N chips-> Mesh((N,), ('data',)) over ICI
  * multi-host       -> jax.distributed.initialize() (env-driven), global
                        mesh over all processes' devices; per-host input
                        sharding via process_index, collectives ride
                        ICI/DCN as laid out by XLA.

DP/DDP/MDDP distinction disappears; sync-BN and loss gathers come from
GSPMD (SURVEY.md §2.8).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


@dataclasses.dataclass
class Runtime:
    mesh: Mesh
    replicated: NamedSharding
    batch: NamedSharding          # shard dim 0 over 'data'
    basket: NamedSharding         # (n_micro, B, ...): shard dim 1
    process_index: int
    process_count: int

    @property
    def num_devices(self) -> int:
        return self.mesh.size

    def local_batch(self, global_batch: int) -> int:
        assert global_batch % self.process_count == 0
        return global_batch // self.process_count


def setup_runtime(total_nodes: int = 1, current_node: int = 0,
                  coordinator: str | None = None) -> Runtime:
    if total_nodes > 1 or os.environ.get("JAX_COORDINATOR_ADDRESS") or coordinator:
        jax.distributed.initialize(
            coordinator_address=coordinator or os.environ.get(
                "JAX_COORDINATOR_ADDRESS"),
            num_processes=int(os.environ.get("JAX_NUM_PROCESSES", total_nodes)),
            process_id=int(os.environ.get("JAX_PROCESS_ID", current_node)))
    devices = np.array(jax.devices())
    mesh = Mesh(devices, ("data",))
    return Runtime(
        mesh=mesh,
        replicated=NamedSharding(mesh, P()),
        batch=NamedSharding(mesh, P("data")),
        basket=NamedSharding(mesh, P(None, "data")),
        process_index=jax.process_index(),
        process_count=jax.process_count(),
    )


def put_basket(rt: Runtime, imgs, labels) -> tuple[Any, Any]:
    """Host numpy basket -> device, batch axis sharded over the mesh.

    Multi-host: each process provides its local shard;
    ``jax.make_array_from_process_local_data`` assembles the global view.
    """
    if rt.process_count == 1:
        return (jax.device_put(imgs, rt.basket),
                jax.device_put(labels, rt.basket))
    gi = jax.make_array_from_process_local_data(rt.basket, imgs)
    gl = jax.make_array_from_process_local_data(rt.basket, labels)
    return gi, gl
