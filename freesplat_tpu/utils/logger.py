"""Local experiment logger (reference ``src/misc/LocalLogger.py:12-48``):
writes scalar logs to a JSONL file and images as PNGs under
``outputs/local``, with optional tensorboardX event files.
"""
from __future__ import annotations

import json
import time
from pathlib import Path

import numpy as np

LOG_PATH = Path("outputs/local")


class LocalLogger:
    def __init__(self, output_dir: str | Path = LOG_PATH, use_tensorboard: bool = True):
        self.dir = Path(output_dir)
        self.dir.mkdir(parents=True, exist_ok=True)
        self._scalar_file = (self.dir / "metrics.jsonl").open("a")
        self._tb = None
        if use_tensorboard:
            try:
                from tensorboardX import SummaryWriter

                self._tb = SummaryWriter(str(self.dir / "tb"))
            except Exception:
                self._tb = None

    def log_scalars(self, step: int, scalars: dict[str, float]) -> None:
        record = {"step": int(step), "time": time.time(), **{
            k: float(v) for k, v in scalars.items()
        }}
        self._scalar_file.write(json.dumps(record) + "\n")
        self._scalar_file.flush()
        if self._tb is not None:
            for k, v in scalars.items():
                self._tb.add_scalar(k, float(v), int(step))

    def log_image(self, tag: str, step: int, image: np.ndarray) -> None:
        """image: (h, w, 3) float in [0, 1]; saved under <tag>/<step>.png."""
        from PIL import Image

        path = self.dir / tag / f"{step:0>7}.png"
        path.parent.mkdir(parents=True, exist_ok=True)
        Image.fromarray(
            (np.clip(np.asarray(image), 0, 1) * 255).astype(np.uint8)
        ).save(path)

    def close(self) -> None:
        self._scalar_file.close()
        if self._tb is not None:
            self._tb.close()
