"""Multi-host launch scaffolding.

The reference has no distributed runtime at all (SURVEY.md §2.9). On TPU
pods, multi-host is jax.distributed + a global mesh: every host runs the
same program, owns its local chips, and GSPMD spans the pod. This module
wraps initialization and encodes the serving-layout decisions:

- Leader/worker engine layout: host 0 runs the scheduler (admission,
  batching, preemption — all host-side Python); its decisions are
  *deterministic* pure functions of the request stream, and the resulting
  fixed-shape step parameters (batch bucket, chunk sizes, slot assignments)
  are broadcast to workers out-of-band (here: jax process broadcast), so
  every host dispatches the identical jitted step — the determinism
  requirement SURVEY.md §7 flags for multi-host batching.
- Mesh layout: 'model' (TP) innermost over intra-host ICI; 'data' across
  hosts (DCN-friendly — only per-request routing crosses hosts, no
  activation collectives).

Cannot be exercised in this single-host image; covered by unit tests for
the layout math + the virtual-mesh tests everywhere else.
"""
from __future__ import annotations

import jax

from .mesh import make_mesh


def initialize_multihost(coordinator_address: str | None = None,
                         num_processes: int | None = None,
                         process_id: int | None = None) -> dict:
    """Initialize jax.distributed (no-op when single-process)."""
    if num_processes is None or num_processes <= 1:
        return {"processes": 1, "process_id": 0,
                "local_devices": len(jax.local_devices()),
                "global_devices": len(jax.devices())}
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
    return {"processes": num_processes, "process_id": jax.process_index(),
            "local_devices": len(jax.local_devices()),
            "global_devices": len(jax.devices())}


def pod_mesh(tp: int | None = None):
    """Build the serving mesh for the current (possibly multi-host) topology:
    TP over the chips of each host (ICI), data-parallel across hosts."""
    n = len(jax.devices())
    local = len(jax.local_devices())
    tp = tp or local
    assert n % tp == 0, f"TP width {tp} must divide {n} devices"
    return make_mesh(data=n // tp, model=tp)


def is_leader() -> bool:
    return jax.process_index() == 0
