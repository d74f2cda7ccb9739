"""Timing + metric collection (reference ``src/misc/benchmarker.py:16-48``).

Wall-clock context manager per tag, metric store, JSON dumps, and device
memory stats (the TPU analog of the reference's CUDA peak-memory dump).
"""
from __future__ import annotations

import json
import time
from collections import defaultdict
from contextlib import contextmanager
from pathlib import Path

import numpy as np


class Benchmarker:
    def __init__(self) -> None:
        self.execution_times: dict[str, list[float]] = defaultdict(list)
        self.metrics: dict[str, list[float]] = defaultdict(list)

    @contextmanager
    def time(self, tag: str, num_calls: int = 1):
        try:
            start = time.time()
            yield
        finally:
            end = time.time()
            for _ in range(num_calls):
                self.execution_times[tag].append((end - start) / num_calls)

    def store(self, tag: str, value: float) -> None:
        self.metrics[tag].append(float(value))

    def dump(self, path: str | Path) -> None:
        path = Path(path)
        path.parent.mkdir(exist_ok=True, parents=True)
        with path.open("w") as f:
            json.dump(dict(self.execution_times), f)

    def dump_memory(self, path: str | Path) -> None:
        path = Path(path)
        path.parent.mkdir(exist_ok=True, parents=True)
        stats = {}
        try:
            import jax

            for i, dev in enumerate(jax.local_devices()):
                mem = dev.memory_stats()
                if mem:
                    stats[f"device_{i}"] = {
                        k: int(v)
                        for k, v in mem.items()
                        if isinstance(v, (int, np.integer))
                    }
        except Exception as exc:  # memory stats unsupported on some backends
            stats["error"] = str(exc)
        with path.open("w") as f:
            json.dump(stats, f)

    def dump_metrics(self, path: str | Path) -> None:
        path = Path(path)
        path.parent.mkdir(exist_ok=True, parents=True)
        with path.open("w") as f:
            json.dump(dict(self.metrics), f)

    def summarize(self) -> dict[str, float]:
        return {
            tag: float(np.mean(times))
            for tag, times in self.execution_times.items()
        }

    def clear_history(self) -> None:
        self.execution_times = defaultdict(list)
        self.metrics = defaultdict(list)
