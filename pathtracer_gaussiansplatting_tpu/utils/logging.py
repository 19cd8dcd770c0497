"""Structured logging + metrics (SURVEY.md §5: replaces the reference's
scattered std::cout prints with leveled, structured output)."""
from __future__ import annotations

import json
import logging
import sys
import time
from typing import Any, Dict, Optional

_FORMAT = "%(asctime)s %(levelname).1s %(name)s] %(message)s"


def get_logger(name: str = "gspt") -> logging.Logger:
    logger = logging.getLogger(name)
    if not logger.handlers:
        h = logging.StreamHandler(sys.stderr)
        h.setFormatter(logging.Formatter(_FORMAT, datefmt="%H:%M:%S"))
        logger.addHandler(h)
        logger.setLevel(logging.INFO)
        logger.propagate = False
    return logger


class MetricsLogger:
    """Append-only JSONL metrics stream (rays/s, spp, losses, flux stats —
    the observability the reference lacks, SURVEY.md §5)."""

    def __init__(self, path: Optional[str] = None):
        self.path = path
        self._fh = open(path, "a") if path else None

    def log(self, step: int, **metrics: Any):
        rec: Dict[str, Any] = dict(step=step, ts=time.time(), **metrics)
        if self._fh:
            self._fh.write(json.dumps(rec) + "\n")
            self._fh.flush()
        else:
            get_logger().info("step %d %s", step, json.dumps(metrics))

    def close(self):
        if self._fh:
            self._fh.close()
