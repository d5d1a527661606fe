"""Multi-host process boundary: ``jax.distributed`` bootstrap + global
array assembly.

Reference parity: the reference crosses a real process boundary for
training — a dedicated Web Worker creates its OWN GPUDevice and the corpus
is transferred to it zero-copy (bpe-worker.js:29-35,
training-manager.js:129-138). The TPU-native equivalent is JAX
multi-process SPMD: every process runs the same program,
``jax.distributed.initialize`` federates each process's local chips into
one global device set, and the sharded train step's psum/all_gather
collectives ride ICI within a host and DCN across hosts. No message
protocol is needed — the "messages" are the collectives inside the jitted
step, and the merge log is replicated so every process reconstructs the
same vocabulary.

Launch recipe (N processes, one per host)::

    # every process runs the same command, differing only in --process-id
    python -m gpu_bpe_tpu.cli train corpus/ --backend dist \\
        --coordinator host0:9876 --num-processes N --process-id $RANK

or via environment variables (read when flags are absent)::

    GPU_BPE_TPU_COORDINATOR=host0:9876
    GPU_BPE_TPU_NUM_PROCESSES=N
    GPU_BPE_TPU_PROCESS_ID=$RANK

CPU smoke mode (no TPUs; used by tests/test_multihost.py): pass
``platform="cpu"`` — collectives run over gloo sockets, exercising the
same ``shard_map`` program that rides ICI/DCN on a pod. The merge list is
bitwise-identical to the single-process run (asserted in CI with a real
2-process launch).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

ENV_COORDINATOR = "GPU_BPE_TPU_COORDINATOR"
ENV_NUM_PROCESSES = "GPU_BPE_TPU_NUM_PROCESSES"
ENV_PROCESS_ID = "GPU_BPE_TPU_PROCESS_ID"


def multihost_requested(args=None) -> bool:
    """True when a multi-process launch is configured via flags or env."""
    if args is not None and getattr(args, "coordinator", None):
        return True
    return bool(os.environ.get(ENV_COORDINATOR))


def init_multihost(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
    platform: str | None = None,
    local_device_count: int | None = None,
) -> tuple[int, int]:
    """Initialize JAX multi-process; returns (process_index, process_count).

    Arguments default to the ``GPU_BPE_TPU_*`` environment variables above.
    Idempotent: calling again after initialization (or in a single-process
    run with nothing configured) just reports the current topology.

    ``platform="cpu"`` forces the CPU backend with gloo collectives —
    the multi-host smoke path (virtual hosts on one machine). On TPU pods
    the backend autodetects its slice topology and ``num_processes`` /
    ``process_id`` may be omitted.

    ``local_device_count`` (CPU only) sets the number of virtual devices
    this process contributes, via ``--xla_force_host_platform_device_count``
    — must be set before any JAX backend initializes.
    """
    coordinator_address = coordinator_address or os.environ.get(ENV_COORDINATOR)
    if num_processes is None and os.environ.get(ENV_NUM_PROCESSES):
        num_processes = int(os.environ[ENV_NUM_PROCESSES])
    if process_id is None and os.environ.get(ENV_PROCESS_ID):
        process_id = int(os.environ[ENV_PROCESS_ID])

    if platform == "cpu":
        if local_device_count:
            flags = [
                f for f in os.environ.get("XLA_FLAGS", "").split()
                if "xla_force_host_platform_device_count" not in f
            ]
            flags.append(f"--xla_force_host_platform_device_count={local_device_count}")
            os.environ["XLA_FLAGS"] = " ".join(flags)
        # this environment pre-imports jax with JAX_PLATFORMS=axon at
        # interpreter start, so the env var alone is too late — override
        # the live config (safe: no backend is initialized yet)
        jax.config.update("jax_platforms", "cpu")
        os.environ["JAX_PLATFORMS"] = "cpu"
        # CPU processes federate only with an explicit cross-process
        # collectives implementation
        jax.config.update("jax_cpu_collectives_implementation", "gloo")

    # NB: jax.process_count() itself initializes the backend, which would
    # make initialize() below impossible — consult the distributed client
    # state instead of the device topology.
    if coordinator_address and not jax.distributed.is_initialized() and num_processes != 1:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    return jax.process_index(), jax.process_count()


def shutdown_multihost() -> None:
    """Block until every process reaches this point, then tear down the
    distributed service (lets process 0 finish artifact writes before the
    coordinator goes away)."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices("gpu_bpe_tpu_shutdown")
        jax.distributed.shutdown()


def make_row_sharded(rows: np.ndarray, mesh: Mesh, axis: str) -> jax.Array:
    """Assemble a global array sharded one-row-per-device along axis 0.

    Every process holds the full host array (the stream split is
    deterministic, so all processes compute it identically) but uploads
    only the rows its local devices own — the process-boundary equivalent
    of the reference's zero-copy corpus transfer.
    """
    spec = P(axis, *([None] * (rows.ndim - 1)))
    sharding = NamedSharding(mesh, spec)
    devices = list(mesh.devices.reshape(-1))
    if jax.process_count() == 1:
        return jax.device_put(jnp.asarray(rows), sharding)
    shards = [
        jax.device_put(rows[i : i + 1], d)
        for i, d in enumerate(devices)
        if d.process_index == jax.process_index()
    ]
    return jax.make_array_from_single_device_arrays(rows.shape, sharding, shards)


def make_replicated(x, mesh: Mesh) -> jax.Array:
    """A fully-replicated global array every process can read back."""
    x = np.asarray(x)
    sharding = NamedSharding(mesh, P())
    if jax.process_count() == 1:
        return jax.device_put(jnp.asarray(x), sharding)
    return jax.make_array_from_callback(x.shape, sharding, lambda idx: x[idx])
