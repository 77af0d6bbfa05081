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
    basket_chunk: NamedSharding   # (n_steps, n_micro, B, ...): shard dim 2
    process_index: int
    process_count: int
    model_size: int = 1           # size of the 'model' (tensor-parallel) axis
    tp_min_size: int = 65536      # smallest leaf worth sharding over 'model'
    fsdp: bool = False            # ZeRO: shard opt/EMA leaves over 'data'
    fsdp_min_size: int = 65536    # smallest leaf worth ZeRO-sharding

    @property
    def num_devices(self) -> int:
        return self.mesh.size

    @property
    def data_size(self) -> int:
        return self.mesh.shape["data"]

    def local_batch(self, global_batch: int) -> int:
        assert global_batch % self.process_count == 0
        return global_batch // self.process_count

    # -- tensor parallelism -------------------------------------------------

    def param_spec(self, leaf, min_size: int | None = None) -> P:
        """Weight-stationary TP rule: shard a large parameter's widest
        weight dimension over the 'model' axis (conv HWIO -> O, dense
        (in,out) -> out, falling back to dim 0), replicate everything
        small (biases, BN vectors, SN u/v, scalars).  GSPMD inserts the
        matching all-gathers/reduce-scatters; on a mesh laid out so
        'model' rides ICI neighbors these are the cheap collectives."""
        shape = getattr(leaf, "shape", ())
        if min_size is None:
            min_size = self.tp_min_size
        if self.model_size == 1 or not shape or leaf.size < min_size:
            return P()
        if shape[-1] % self.model_size == 0:
            return P(*([None] * (len(shape) - 1)), "model")
        if shape[0] % self.model_size == 0:
            return P("model", *([None] * (len(shape) - 1)))
        return P()

    # -- ZeRO / FSDP-style optimizer-state sharding -------------------------

    def zero_spec(self, leaf) -> P:
        """ZeRO rule for optimizer-moment / EMA leaves: on top of the TP
        spec, shard the largest still-unsharded dimension divisible by the
        'data' axis.  These leaves are only READ by elementwise updates
        (Adam moments, EMA lerp), so they stay sharded across the whole
        step — GSPMD reduce-scatters the incoming gradients and
        all-gathers the EMA params only where a full copy is consumed
        (evaluation generation).  Memory: opt+EMA drop ~1/data_size per
        device, the classic ZeRO-1/3 win (reference is DDP-replicated,
        torch main.py:175-196 — no equivalent)."""
        tp = self.param_spec(leaf)
        shape = getattr(leaf, "shape", ())
        if (not self.fsdp or self.data_size == 1 or not shape
                or leaf.size < self.fsdp_min_size):
            return tp
        spec = list(tp) + [None] * (len(shape) - len(tp))
        cands = [i for i, d in enumerate(shape)
                 if spec[i] is None and d % self.data_size == 0]
        if not cands:
            return tp
        spec[max(cands, key=lambda j: shape[j])] = "data"
        return P(*spec)

    _ZERO_FIELDS = ("g_opt", "d_opt", "info_opt", "g_ema_params",
                    "g_ema_state")

    def state_sharding(self, state):
        """NamedSharding tree for a whole TrainState: params follow the TP
        rule; with ``fsdp`` the optimizer moments and EMA copies are
        additionally ZeRO-sharded over 'data'; everything else
        replicated."""
        tp_map = lambda tree: jax.tree.map(
            lambda leaf: NamedSharding(self.mesh, self.param_spec(leaf)),
            tree)
        if not self.fsdp or not dataclasses.is_dataclass(state):
            return tp_map(state)
        out = {}
        for f in dataclasses.fields(state):
            sub = getattr(state, f.name)
            if f.name in self._ZERO_FIELDS:
                out[f.name] = jax.tree.map(
                    lambda leaf: NamedSharding(self.mesh,
                                               self.zero_spec(leaf)), sub)
            else:
                out[f.name] = tp_map(sub)
        return type(state)(**out)


def setup_runtime(total_nodes: int = 1, current_node: int = 0,
                  coordinator: str | None = None,
                  model_axis: int = 1, fsdp: bool = False) -> Runtime:
    """model_axis > 1 carves a 'model' (tensor-parallel) axis out of the
    device array: mesh (n/model_axis, model_axis) with axes
    ('data', 'model').  The trailing mesh dimension maps to neighboring
    devices, keeping TP collectives on the fastest links."""
    if total_nodes > 1 or os.environ.get("JAX_COORDINATOR_ADDRESS") or coordinator:
        jax.distributed.initialize(
            coordinator_address=coordinator or os.environ.get(
                "JAX_COORDINATOR_ADDRESS"),
            num_processes=int(os.environ.get("JAX_NUM_PROCESSES", total_nodes)),
            process_id=int(os.environ.get("JAX_PROCESS_ID", current_node)))
    devices = np.array(jax.devices())
    if model_axis > 1:
        assert len(devices) % model_axis == 0, (len(devices), model_axis)
        mesh = Mesh(devices.reshape(-1, model_axis), ("data", "model"))
    else:
        mesh = Mesh(devices, ("data",))
    return Runtime(
        mesh=mesh,
        replicated=NamedSharding(mesh, P()),
        batch=NamedSharding(mesh, P("data")),
        basket=NamedSharding(mesh, P(None, "data")),
        basket_chunk=NamedSharding(mesh, P(None, None, "data")),
        process_index=jax.process_index(),
        process_count=jax.process_count(),
        model_size=model_axis,
        fsdp=fsdp,
    )


def put_basket(rt: Runtime, imgs, labels, chunked: bool = False) -> tuple[Any, Any]:
    """Host numpy basket -> device, batch axis sharded over the mesh.

    ``chunked``: a whole chunk of baskets (n_steps, n_micro, B, ...) moved
    in ONE transfer — amortizes per-call host->device latency over
    n_steps train steps (feeds TrainEngine.train_steps).

    Multi-host: each process provides its local shard;
    ``jax.make_array_from_process_local_data`` assembles the global view.
    """
    sh = rt.basket_chunk if chunked else rt.basket
    if rt.process_count == 1:
        return jax.device_put(imgs, sh), jax.device_put(labels, sh)
    gi = jax.make_array_from_process_local_data(sh, imgs)
    gl = jax.make_array_from_process_local_data(sh, labels)
    return gi, gl
