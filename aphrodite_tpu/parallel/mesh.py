"""Device-mesh construction and sharding helpers.

This module is the TPU-native replacement for the reference's entire
distributed stack (``aphrodite/distributed/parallel_state.py:128,968``,
``device_communicators/*``): instead of NCCL process groups, custom
all-reduce kernels and shm broadcast, parallelism is a
``jax.sharding.Mesh`` over named axes and XLA emits ICI collectives from
``NamedSharding`` annotations (SURVEY.md §2.5 mapping).

Axes:
  - "data":  replica / data parallelism (requests are partitioned).
  - "model": tensor parallelism (Megatron-style head/column/row sharding).

Multi-host pod slices use ``mesh_utils.create_hybrid_device_mesh`` so the
"model" axis rides ICI within a slice and "data" spans DCN across slices.
"""

from typing import Dict, Optional, Sequence

import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from aphrodite_tpu.common.config import ParallelConfig
from aphrodite_tpu.common.logger import init_logger

logger = init_logger(__name__)

MESH_AXES = ("data", "pipe", "model")


def build_mesh(
    parallel_config: ParallelConfig,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Create a (data, pipe, model) mesh.

    The "model" (TP) axis is laid out over the fastest interconnect
    dimension so TP collectives ride ICI (scaling-book recipe); "pipe"
    (PP stages) sits between so stage hops use the next-fastest links.
    """
    if devices is None:
        devices = jax.devices()
    shape = parallel_config.mesh_shape()
    dp, pp, tp = shape["data"], shape["pipe"], shape["model"]
    want = dp * pp * tp
    if want > len(devices):
        raise ValueError(
            f"mesh needs {want} devices (data={dp} x pipe={pp} x "
            f"model={tp}) but only {len(devices)} are visible")
    devices = list(devices)[:want]
    num_procs = len(set(d.process_index for d in devices))
    num_slices = len(set(getattr(d, "slice_index", 0) for d in devices))
    if num_slices > 1:
        # Multi-slice pod: hybrid ICI x DCN mesh — the outermost ("data")
        # axis crosses the slice boundary so TP/PP collectives stay on ICI.
        mesh_devices = mesh_utils.create_hybrid_device_mesh(
            mesh_shape=(dp, pp, tp),
            dcn_mesh_shape=(num_slices, 1, 1),
            devices=devices,
        )
    elif num_procs > 1:
        # Multi-process without slice topology (one slice spanning hosts,
        # or the CPU multi-process test rig): process-major raw order —
        # the trailing ("model") axis stays within a process wherever
        # tp <= devices-per-process.
        mesh_devices = np.asarray(devices).reshape(dp, pp, tp)
    else:
        mesh_devices = mesh_utils.create_device_mesh((dp, pp, tp),
                                                     devices=devices)
    return Mesh(np.asarray(mesh_devices).reshape(dp, pp, tp), MESH_AXES)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard(mesh: Mesh, *spec) -> NamedSharding:
    return NamedSharding(mesh, P(*spec))


def tp_size(mesh: Mesh) -> int:
    return mesh.shape["model"]


def dp_size(mesh: Mesh) -> int:
    return mesh.shape["data"]
