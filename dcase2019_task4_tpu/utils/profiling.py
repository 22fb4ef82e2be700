"""Profiling / observability hooks.

The reference's only instrumentation is wall-clock epoch timing
(main.py:71,159); this module adds the TPU-native equivalents (SURVEY.md
§5 tracing/profiling plan):

  * `trace(dir)` — context manager around jax.profiler.trace producing a
    tensorboard-compatible xplane + trace.json.gz.
  * `top_device_ops(trace_dir)` — parse the trace and return the top device
    ops by total time (what the fused-kernel work in ops/ was driven by).
  * `Throughput` — steady-state clips/sec meter with warmup discard.
"""

from __future__ import annotations

import collections
import contextlib
import glob
import gzip
import json
import time
from typing import List, Tuple


@contextlib.contextmanager
def trace(trace_dir: str):
    import jax

    with jax.profiler.trace(trace_dir):
        yield


def top_device_ops(trace_dir: str, top: int = 20) -> List[Tuple[str, float, str]]:
    """→ [(op name, total ms, hlo long name)] sorted by time."""
    paths = sorted(glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True))
    if not paths:
        return []
    with gzip.open(paths[-1]) as f:
        tr = json.load(f)
    durs: dict = collections.defaultdict(float)
    args: dict = {}
    for e in tr.get("traceEvents", []):
        if e.get("ph") == "X":
            n = e.get("name", "?")
            durs[n] += e.get("dur", 0)
            if "args" in e and n not in args:
                args[n] = e["args"]
    out = []
    for n, d in sorted(durs.items(), key=lambda kv: -kv[1]):
        if n.startswith(("$", "np.", "jit_", "Pjit")) or n.isdigit():
            continue  # host-side python frames / queue rows
        out.append((n, d / 1000.0, str(args.get(n, {}).get("long_name", ""))[:120]))
        if len(out) >= top:
            break
    return out


class Throughput:
    """Steady-state items/sec: discards `warmup` updates, then rates the
    rest. Used for the clips/sec/chip accounting (BASELINE.json metric)."""

    def __init__(self, warmup: int = 3):
        self.warmup = warmup
        self.count = 0
        self.items = 0
        self._t0 = None

    def update(self, n_items: int):
        self.count += 1
        if self.count == self.warmup:
            self._t0 = time.time()
            self.items = 0
        elif self.count > self.warmup:
            self.items += n_items

    @property
    def items_per_sec(self) -> float:
        if self._t0 is None or self.items == 0:
            return 0.0
        return self.items / (time.time() - self._t0)
