"""Profiling / tracing: first-class on TPU (the reference has none —
SURVEY.md §5 notes only hand-written flops() estimators and wall-clock prints).

Provides:
  * `trace(dir)` — context manager around `jax.profiler.trace` (view in
    TensorBoard / Perfetto);
  * `annotate(name)` — TraceAnnotation for host-side phases;
  * `StepTimer` — rolling wall-clock per-step stats with device sync;
  * `flops_estimate` — analytic FLOPs for the SAM encoder (parity with the
    reference's flops() methods, vit_win_rvsa_v3_wsz7.py:447-477).
"""

from __future__ import annotations

import contextlib
import time
from collections import deque
from typing import Deque, Dict, Iterator, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str, with_memory: bool = True) -> Iterator[None]:
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named host-span annotation appearing in profiler timelines."""
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Rolling per-step timing; `.tick(result)` syncs on `result` if given."""

    def __init__(self, window: int = 50):
        self.window = window
        self.times: Deque[float] = deque(maxlen=window)
        self._last: Optional[float] = None

    def start(self) -> None:
        self._last = time.perf_counter()

    def tick(self, sync_on=None) -> float:
        if sync_on is not None:
            jax.block_until_ready(sync_on)
        now = time.perf_counter()
        dt = now - (self._last if self._last is not None else now)
        self._last = now
        self.times.append(dt)
        return dt

    @property
    def mean(self) -> float:
        return sum(self.times) / max(len(self.times), 1)

    def stats(self) -> Dict[str, float]:
        ts = sorted(self.times)
        n = len(ts)
        if n == 0:
            return {"mean": 0.0, "p50": 0.0, "p95": 0.0}
        return {
            "mean": self.mean,
            "p50": ts[n // 2],
            "p95": ts[min(int(n * 0.95), n - 1)],
        }


def sam_encoder_flops(
    embed_dim: int, depth: int, grid: int, window: int, n_global: int, mlp_ratio: float = 4.0
) -> float:
    """Analytic FLOPs of one SAM encoder pass (dense matmuls only)."""
    n = grid * grid
    per_token = 3 * embed_dim * embed_dim + embed_dim * embed_dim  # qkv + proj
    mlp = 2 * embed_dim * int(embed_dim * mlp_ratio)
    win_tokens = window * window
    attn_win = 2 * win_tokens * embed_dim  # per token: qk^T + av
    attn_glob = 2 * n * embed_dim
    n_win = depth - n_global
    flops = depth * n * (per_token + mlp)
    flops += n_win * n * attn_win + n_global * n * attn_glob
    return 2.0 * flops  # MAC -> FLOPs
