"""Metrics / telemetry.

The reference logs TensorBoard scalars through a TF1 FileWriter
(drl_tetris/utils/tb_writer.py) and wall-times runner methods with the
``timekeeper`` decorator into a process-global table flushed to the console
(drl_tetris/utils/timekeeper.py, trainer.py:148-174).  Equivalents:

  MetricsWriter  — scalars to JSONL (always) + TensorBoard when available
                   (torch's SummaryWriter; TF is not a dependency here)
  timekeeper     — same decorator contract, plus jax.profiler trace hooks
"""
from __future__ import annotations

import contextlib
import json
import os
import time
from collections import defaultdict
from functools import wraps
from typing import Dict, Optional


def fetch_stats(stats) -> dict:
    """Device stats dict -> host float dict in ONE device->host transfer.

    float(v) per entry costs one tunnel round trip each (~30 ms on the
    axon TPU tunnel); a ~20-stat dict fetched naively adds seconds per
    training iteration.  Stacking on device and pulling once makes the
    stats cost one round trip total."""
    import jax.numpy as jnp
    import numpy as np
    names = list(stats)
    if not names:
        return {}
    packed = np.asarray(jnp.stack([jnp.asarray(stats[k], jnp.float32)
                                   for k in names]))
    return {k: float(v) for k, v in zip(names, packed)}


class MetricsWriter:
    def __init__(self, directory: str, name: str = "train"):
        os.makedirs(directory, exist_ok=True)
        self._path = os.path.join(directory, f"{name}.jsonl")
        self._f = open(self._path, "a")
        self._tb = None
        try:
            from torch.utils.tensorboard import SummaryWriter
            self._tb = SummaryWriter(os.path.join(directory, "tb", name))
        except Exception:
            pass

    def update(self, scalars: Dict[str, float], step: int):
        """tb_writer.update(dict, time) (tb_writer.py:14-18)."""
        rec = {"step": step, "time": time.time(), **{
            k: float(v) for k, v in scalars.items()}}
        self._f.write(json.dumps(rec) + "\n")
        self._f.flush()
        if self._tb is not None:
            for k, v in scalars.items():
                self._tb.add_scalar(k, float(v), step)

    def close(self):
        self._f.close()
        if self._tb is not None:
            self._tb.close()

    def __enter__(self):
        return self

    def __exit__(self, *a):
        self.close()


class Timekeeper:
    """drl_tetris/utils/timekeeper.py:11-47: accumulate wall time per tagged
    function into a shared stats dict; flush as a timing table."""
    stats: Dict[str, float] = defaultdict(float)
    counts: Dict[str, int] = defaultdict(int)

    @classmethod
    def timed(cls, name: Optional[str] = None):
        def deco(fn):
            tag = name or fn.__qualname__

            @wraps(fn)
            def wrapper(*args, **kwargs):
                t0 = time.perf_counter()
                try:
                    return fn(*args, **kwargs)
                finally:
                    cls.stats[tag] += time.perf_counter() - t0
                    cls.counts[tag] += 1
            return wrapper
        return deco

    @classmethod
    @contextlib.contextmanager
    def section(cls, tag: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            cls.stats[tag] += time.perf_counter() - t0
            cls.counts[tag] += 1

    @classmethod
    def table(cls) -> str:
        """The trainer's console timing table (trainer.py:160-174)."""
        total = sum(cls.stats.values()) or 1.0
        rows = [f"{'section':<40}{'total_s':>10}{'calls':>8}{'share':>8}"]
        for tag, t in sorted(cls.stats.items(), key=lambda kv: -kv[1]):
            rows.append(f"{tag:<40}{t:>10.2f}{cls.counts[tag]:>8}"
                        f"{t / total:>8.1%}")
        return "\n".join(rows)

    @classmethod
    def flush(cls) -> Dict[str, float]:
        out = dict(cls.stats)
        cls.stats.clear()
        cls.counts.clear()
        return out


timekeeper = Timekeeper


class logstamp:
    """Entry/exit/changed-return logging decorator
    (drl_tetris/utils/logging.py:7-25).  `only_new` logs the exit stamp
    only when the return value CHANGED from the previous call — note the
    reference's condition is inverted (it logs when the return EQUALS the
    last one, logging.py:23); this port implements the documented intent
    and cites the quirk.  on_entry/on_exit force unconditional stamps."""

    def __init__(self, loggerfunc, name=None, only_new=True,
                 on_entry=False, on_exit=False):
        self.loggerfunc = loggerfunc
        self.on_entry = on_entry
        self.on_exit = on_exit
        self.only_new = only_new
        self.name = name
        self._last_ret = object()

    def __call__(self, func):
        import functools

        @functools.wraps(func)
        def wrapper(*args, **kwargs):
            stamp = time.strftime("%Y-%m-%d %H:%M:%S")
            label = self.name or func.__name__
            if self.on_entry and not self.only_new:
                self.loggerfunc(f"{stamp} [o] {label}")
            ret = func(*args, **kwargs)
            if self.on_exit or self.only_new:
                changed = not (type(ret) is type(self._last_ret)
                               and ret == self._last_ret)
                if not self.only_new or changed:
                    self.loggerfunc(f"{stamp} [x] {label}")
                self._last_ret = ret
            return ret

        return wrapper
