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

MESH_AXES = ("data", "model")


def build_mesh(
    parallel_config: ParallelConfig,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Create a (data, model) mesh.

    The "model" (TP) axis is laid out over the fastest interconnect
    dimension so TP collectives ride ICI (scaling-book recipe).
    """
    if devices is None:
        devices = jax.devices()
    shape = parallel_config.mesh_shape()
    dp, tp = shape["data"], shape["model"]
    want = dp * tp
    if want > len(devices):
        raise ValueError(
            f"mesh needs {want} devices (data={dp} x model={tp}) but only "
            f"{len(devices)} are visible")
    devices = list(devices)[:want]
    if len(set(d.process_index for d in devices)) > 1:
        # Multi-host: hybrid ICI x DCN mesh.
        mesh_devices = mesh_utils.create_hybrid_device_mesh(
            mesh_shape=(dp, tp),
            dcn_mesh_shape=(len(set(d.process_index for d in devices)), 1),
            devices=devices,
        )
    else:
        mesh_devices = mesh_utils.create_device_mesh((dp, tp),
                                                     devices=devices)
    return Mesh(np.asarray(mesh_devices).reshape(dp, tp), MESH_AXES)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard(mesh: Mesh, *spec) -> NamedSharding:
    return NamedSharding(mesh, P(*spec))


def tp_size(mesh: Mesh) -> int:
    return mesh.shape["model"]


def dp_size(mesh: Mesh) -> int:
    return mesh.shape["data"]
