"""Serving frontend (reference L6: ch10 engine, tokenizer pool, OpenAI API).

Unlike the reference — whose engine uses a dummy model, no KV cache, and no
batcher (ch10/engine.py:64-70,129-150) and whose "FastAPI server" does not
exist (SURVEY.md §1) — this engine wires the real pieces: scheduler + paged
KV slots + jitted prefill/decode steps + per-request sampling, plus an actual
HTTP server with SSE streaming.
"""
from .api_types import (
    ChatCompletionRequest, ChatCompletionResponse, ChatCompletionChunk,
    ChatMessage, Usage,
)
from .tokenizer_pool import TokenizerPool
from .engine import InferenceEngine, EngineConfig, GenerationRequest, GenerationResult

__all__ = [
    "ChatCompletionRequest", "ChatCompletionResponse", "ChatCompletionChunk",
    "ChatMessage", "Usage", "TokenizerPool",
    "InferenceEngine", "EngineConfig", "GenerationRequest", "GenerationResult",
]
