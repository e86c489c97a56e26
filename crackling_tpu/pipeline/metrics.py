"""Run metrics and batch-granular resume manifest.

The reference has neither (SURVEY.md §5): a crashed run leaves partial
output that blocks re-running (ConfigManager.py:172-175), and observability
is wall-clock prints. Here:

* :class:`Metrics` — per-stage wall time + counters, serialized to
  ``<output>.metrics.json`` after every batch (observability survives a
  crash); optionally wraps stages in a ``jax.profiler`` trace when
  ``[tpu] profile-dir`` is set.
* :class:`ResumeManifest` — records completed batches next to the output
  CSV. With ``[output] resume = True`` a re-run with the same config skips
  completed batches (candidate extraction is deterministic, so batch
  contents are reproducible) and appends where it left off.
"""

from __future__ import annotations

import hashlib
import json
import os
import time
from contextlib import contextmanager


class Metrics:
    def __init__(self, path: str | None = None):
        self.path = path
        self.stages: dict[str, float] = {}
        self.counters: dict[str, int] = {}
        self._t0 = time.time()

    @contextmanager
    def stage(self, name: str):
        t0 = time.time()
        try:
            yield
        finally:
            self.stages[name] = self.stages.get(name, 0.0) + time.time() - t0
            self.flush()

    def count(self, name: str, n: int = 1):
        self.counters[name] = self.counters.get(name, 0) + int(n)

    def to_dict(self):
        return {
            "total_seconds": time.time() - self._t0,
            "stage_seconds": {k: round(v, 3) for k, v in self.stages.items()},
            "counters": self.counters,
        }

    def flush(self):
        if self.path:
            try:
                with open(self.path, "w") as fp:
                    json.dump(self.to_dict(), fp, indent=1)
            except OSError:
                pass


def config_fingerprint(config_parser) -> str:
    """Stable hash of the effective configuration (for resume safety)."""
    items = []
    for section in sorted(config_parser.sections()):
        for key in sorted(config_parser[section]):
            items.append(f"{section}.{key}={config_parser[section][key]}")
    return hashlib.sha256("\n".join(items).encode()).hexdigest()[:16]


class ResumeManifest:
    def __init__(self, output_file: str, fingerprint: str):
        self.path = output_file + ".resume.json"
        self.fingerprint = fingerprint
        self.completed = -1

    def exists(self) -> bool:
        return os.path.exists(self.path)

    def load(self) -> int:
        """Number of already-completed batches (0 when no usable manifest)."""
        try:
            with open(self.path) as fp:
                d = json.load(fp)
            if d.get("fingerprint") == self.fingerprint:
                self.completed = int(d.get("completed_batches", 0))
                return self.completed
        except (OSError, ValueError):
            pass
        return 0

    def mark(self, completed_batches: int, total: int):
        self.completed = completed_batches
        with open(self.path, "w") as fp:
            json.dump({
                "fingerprint": self.fingerprint,
                "completed_batches": completed_batches,
                "total_batches": total,
            }, fp)

    def finish(self):
        try:
            os.remove(self.path)
        except OSError:
            pass
