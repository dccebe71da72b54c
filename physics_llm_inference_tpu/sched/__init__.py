"""Scheduling layer (reference L5: ch07 batchers/scheduler, ch08 chunked
prefill + mixed batches + overlap). Pure host-side logic, one decision per
engine iteration; co-designed with the fixed-shape runtime (every emitted
batch quantizes to a compiled shape bucket — the constraint the dynamic-shape
reference never faces, SURVEY.md §7 hard parts)."""
from .request import Request, RequestState
from .continuous_batcher import ContinuousBatcher, ContinuousBatcherConfig
from .static_batcher import StaticBatcher, analyze_static_batching_waste
from .scheduler import (
    Scheduler, SchedulerConfig, SchedulerOutput, SchedulingPolicy,
)
from .chunked_prefill import ChunkedPrefillScheduler, ChunkConfig
from .mixed_batch import MixedBatchScheduler, MixedBatchConfig, MixedBatch
from .overlap import OverlapScheduler, simulate_overlap_vs_sequential

__all__ = [
    "Request", "RequestState",
    "ContinuousBatcher", "ContinuousBatcherConfig",
    "StaticBatcher", "analyze_static_batching_waste",
    "Scheduler", "SchedulerConfig", "SchedulerOutput", "SchedulingPolicy",
    "ChunkedPrefillScheduler", "ChunkConfig",
    "MixedBatchScheduler", "MixedBatchConfig", "MixedBatch",
    "OverlapScheduler", "simulate_overlap_vs_sequential",
]
