"""ICI/DCN collective cost models.

TPU-native port of the reference's analytic NCCL cost models
(ref: ch09/nccl_primitives.py:20-107 — all-reduce/all-gather byte counts, ring
all-reduce step model, compute/comm overlap potential; constants at :143-145).
The executable collectives live in `parallel/` (psum/all_gather/ppermute inside
shard_map); this module predicts their cost so the scheduler and the scaling
benches can compute expected efficiency (the >=90% host-scaling target).

Bandwidth terms use per-direction link bandwidth; a bidirectional ring moving
D bytes across N devices sends 2D(N-1)/N bytes per device for all-reduce.
"""
from __future__ import annotations

from dataclasses import dataclass

from .tpu import TPUSpec, TPU_V5E

# One-way ICI link latency, order of magnitude (µs-scale hop latency).
ICI_LATENCY_S = 1e-6
DCN_LATENCY_S = 10e-6


def all_reduce_bytes(data_bytes: int, num_devices: int) -> float:
    """Bytes each device sends for a ring all-reduce: 2·D·(N-1)/N.

    Same formula the reference derives for NCCL (ch09/nccl_primitives.py:20-42);
    identical on an ICI ring (reduce-scatter + all-gather phases).
    """
    if num_devices <= 1:
        return 0.0
    return 2.0 * data_bytes * (num_devices - 1) / num_devices


def all_gather_bytes(data_bytes: int, num_devices: int) -> float:
    """Bytes each device sends to all-gather D bytes per device (ref :45-67)."""
    if num_devices <= 1:
        return 0.0
    return data_bytes * (num_devices - 1) / num_devices


def reduce_scatter_bytes(data_bytes: int, num_devices: int) -> float:
    if num_devices <= 1:
        return 0.0
    return data_bytes * (num_devices - 1) / num_devices


def all_to_all_bytes(data_bytes: int, num_devices: int) -> float:
    """Bytes each device sends in an all-to-all of D bytes total per device.

    MoE expert dispatch cost (ref ch09/moe_inference.py:141-144 describes it;
    never implemented there).
    """
    if num_devices <= 1:
        return 0.0
    return data_bytes * (num_devices - 1) / num_devices


def ring_all_reduce_time(
    data_bytes: int, num_devices: int,
    link_bandwidth: float, latency: float = ICI_LATENCY_S,
) -> float:
    """Ring all-reduce wall time: 2(N-1) steps of (latency + D/(N·BW)).

    Ref model: ch09/nccl_primitives.py:70-86, with ICI constants substituted
    for NVLink.
    """
    if num_devices <= 1:
        return 0.0
    steps = 2 * (num_devices - 1)
    per_step = latency + data_bytes / (num_devices * link_bandwidth)
    return steps * per_step


def overlap_potential(compute_time: float, comm_time: float) -> float:
    """Fraction of comm hideable under compute (ref :89-107).

    1.0 = fully hidden; 0.0 = fully exposed.
    """
    if comm_time <= 0:
        return 1.0
    return min(compute_time, comm_time) / comm_time


@dataclass
class CollectiveCostModel:
    """Predicts collective times on a mesh built from `spec` chips.

    `ici_axes` lists mesh axes that ride ICI (intra-slice); anything else is
    assumed to cross DCN. Used by the scaling-efficiency bench and by the
    scheduler when deciding TP vs DP layouts.
    """

    spec: TPUSpec = TPU_V5E
    dcn_gbps: float | None = None

    def _bw(self, over_dcn: bool) -> float:
        if over_dcn:
            return (self.dcn_gbps or self.spec.dcn_gbps) * 1e9
        # A 1D ring uses 2 of the torus links (one per direction neighbor).
        return 2 * self.spec.ici_gbps_per_link * 1e9

    def _lat(self, over_dcn: bool) -> float:
        return DCN_LATENCY_S if over_dcn else ICI_LATENCY_S

    def all_reduce_time(self, data_bytes: int, n: int, over_dcn: bool = False) -> float:
        return ring_all_reduce_time(data_bytes, n, self._bw(over_dcn), self._lat(over_dcn))

    def all_gather_time(self, data_bytes: int, n: int, over_dcn: bool = False) -> float:
        if n <= 1:
            return 0.0
        steps = n - 1
        return steps * (self._lat(over_dcn) + data_bytes / (n * self._bw(over_dcn)))

    def all_to_all_time(self, data_bytes: int, n: int, over_dcn: bool = False) -> float:
        if n <= 1:
            return 0.0
        # Each device exchanges (n-1)/n of its data; a torus routes chunks in
        # parallel so model it as one bandwidth-bound shuffle + hop latencies.
        return self._lat(over_dcn) * (n - 1) + all_to_all_bytes(data_bytes, n) / self._bw(over_dcn)

    def tp_layer_comm_time(self, hidden: int, batch_tokens: int, n: int,
                           dtype_bytes: int = 2) -> float:
        """Per-transformer-block TP cost: 2 all-reduces of the activations
        (attention o_proj + MLP down_proj), the Megatron pattern our
        row-parallel layers implement with psum (parallel/tp.py)."""
        act_bytes = batch_tokens * hidden * dtype_bytes
        return 2 * self.all_reduce_time(act_bytes, n)

    def scaling_efficiency(self, compute_time: float, data_bytes: int, n: int,
                           over_dcn: bool = False, overlapped: bool = True) -> float:
        """Predicted efficiency of scaling a step across n devices."""
        comm = self.all_reduce_time(data_bytes, n, over_dcn)
        if overlapped:
            exposed = max(0.0, comm - compute_time)
        else:
            exposed = comm
        return compute_time / (compute_time + exposed) if compute_time > 0 else 0.0
