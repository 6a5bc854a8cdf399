"""Multi-host (multi-process) mesh initialization — the DCN/ICI story.

SURVEY §5.8: the reference scales across machines with MPI-style
orchestration; the TPU-native analog is `jax.distributed` + a global
device mesh whose MAJOR axis spans hosts (DCN) and MINOR axis spans the
chips within a host (ICI).  The prover's collectives are laid out so the
heavy traffic rides ICI:

  * sharded MSM partial-fold (parallel/sharded_msm.py): one all-gather
    of [L, 1] partial points per MSM — negligible on either fabric;
    shard the point axis over the FULL mesh.
  * sharded 4-step NTT (parallel/sharded_ntt.py): two all_to_all
    transposes over the sharding axis — bandwidth-bound.  Keep the NTT
    axis WITHIN a host (ICI) and data-parallel replicate across hosts,
    or accept DCN all_to_all for > host-sized domains.

Usage (same program on every host):

    from gnark_tpu.parallel import multihost
    mesh = multihost.init_mesh(ntt_axis="ntt", dp_axis="dp")
    proof = groth16.prove(cs, pk, witness, mesh=mesh, mesh_axis="ntt")

This module only wires topology; it cannot be exercised in a
single-host CI environment (the 8-device CPU mesh tests cover the
collective numerics; see tests/test_sharded*.py).
"""

from __future__ import annotations

import os

import numpy as np


def init_distributed(coordinator: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None) -> None:
    """jax.distributed.initialize with env-var fallbacks
    (JAX_COORDINATOR / JAX_NUM_PROCESSES / JAX_PROCESS_ID); no-op when
    single-process."""
    import jax

    coordinator = coordinator or os.environ.get("JAX_COORDINATOR")
    if coordinator is None:
        return
    num_processes = num_processes or int(
        os.environ.get("JAX_NUM_PROCESSES", "1"))
    process_id = process_id if process_id is not None else int(
        os.environ.get("JAX_PROCESS_ID", "0"))
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id)


def init_mesh(ntt_axis: str = "ntt", dp_axis: str = "dp"):
    """Global 2D mesh: [hosts (DCN), chips-per-host (ICI)].

    The minor (fast, ICI) axis is the NTT/MSM sharding axis; the major
    axis is data-parallel across proofs or replicated.  Falls back to a
    1D mesh when all devices live on one host.
    """
    import jax
    from jax.sharding import Mesh

    init_distributed()
    devs = np.array(jax.devices())
    nproc = getattr(jax, "process_count", lambda: 1)()
    per_host = len(devs) // max(1, nproc)
    if nproc <= 1:
        return Mesh(devs.reshape(-1), (ntt_axis,))
    return Mesh(devs.reshape(nproc, per_host), (dp_axis, ntt_axis))
