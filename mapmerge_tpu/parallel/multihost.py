"""Multi-host setup.

TPU-native replacement for the reference's multi-master ROS story (the
reference delegates cross-host networking entirely to external packages,
doc/wiki.txt:14): here hosts join one jax.distributed job, every host
contributes its local chips to the global mesh, and the pair axis of the
registration graph spans all of them (collectives ride ICI within a slice,
DCN across hosts — XLA inserts them from the shardings).

Each host ingests its own robots' maps (runtime/transport.py); the feature
stage runs where the data lands, and the globally-sharded pair stage
exchanges only keypoint/descriptor blocks, not raw clouds.
"""

from __future__ import annotations

import jax

from mapmerge_tpu.parallel.mesh import make_mesh


def initialize(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
):
    """jax.distributed.initialize wrapper (no-op if already initialized or
    single-process). Safe to call unconditionally at program start."""
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except RuntimeError as e:
        if "already initialized" not in str(e):
            raise


def global_mesh():
    """Mesh over every chip of every host in the job."""
    return make_mesh(jax.devices())


def is_coordinator() -> bool:
    return jax.process_index() == 0
