"""Multi-host initialization and host-sharded input loading.

The reference is single-node; this module is the framework's scale-out
story (SURVEY §2.3 TPU mapping): jax.distributed over DCN for process
coordination, SNP-axis sharding over the global mesh, host-local file
reads of each host's SNP slice (ship bits over the network, never floats),
and XLA collectives over ICI for the GRM partial-product merge.

Typical multi-host driver:

    from janusx_tpu.parallel import distributed as dist
    dist.initialize()                       # env-driven (TPU pods auto-detect)
    mesh = dist.global_snp_mesh()
    lo, hi = dist.host_snp_range(m_total)   # this host's SNP slice
    raw = load_raw_packed(path)             # or a range-limited reader
    ... build global arrays with jax.make_array_from_process_local_data
"""

from __future__ import annotations

import logging

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

log = logging.getLogger("janusx_tpu.distributed")

SNP_AXIS = "snp"


def initialize(coordinator: str | None = None, num_processes: int | None = None,
               process_id: int | None = None) -> None:
    """jax.distributed.initialize — env-driven on TPU pods (no args needed);
    explicit args for CPU/GPU multi-process testing."""
    if jax.process_count() > 1 or jax.distributed.is_initialized():  # pragma: no cover
        return
    try:
        if coordinator is None:
            jax.distributed.initialize()
        else:
            jax.distributed.initialize(
                coordinator_address=coordinator,
                num_processes=num_processes,
                process_id=process_id,
            )
        log.info(
            "distributed: process %d/%d, %d local / %d global devices",
            jax.process_index(), jax.process_count(),
            jax.local_device_count(), jax.device_count(),
        )
    except (ValueError, RuntimeError) as e:
        log.info("single-process mode (%s)", e)


def global_snp_mesh() -> Mesh:
    """1-D mesh over ALL devices (all hosts); SNP-axis data parallelism."""
    return Mesh(np.array(jax.devices()), (SNP_AXIS,))


def host_snp_range(m_total: int) -> tuple[int, int]:
    """This host's contiguous SNP slice (device-count weighted)."""
    pc = jax.process_count()
    pi = jax.process_index()
    per = -(-m_total // pc)
    return pi * per, min((pi + 1) * per, m_total)


def make_global_snp_array(mesh: Mesh, local_block: np.ndarray, m_total: int):
    """Assemble a globally SNP-sharded array from per-host local blocks.

    local_block holds this host's rows (host_snp_range slice, padded so the
    global leading dim is divisible by the device count)."""
    sharding = NamedSharding(mesh, P(SNP_AXIS))
    global_shape = (m_total,) + local_block.shape[1:]
    return jax.make_array_from_process_local_data(
        sharding, local_block, global_shape
    )
