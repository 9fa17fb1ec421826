"""Progress reporting and optional device profiling.

The reference relies on tqdm progress bars only (SURVEY.md §5); we add a
``jax.profiler`` trace option around hot loops for TPU performance work.
"""

from __future__ import annotations

import contextlib
import os
import sys
import time


def progress(iterable, desc: str = "", every: int = 1):
    """tqdm-free progress reporter (single-line, low overhead)."""
    try:
        total = len(iterable)
    except TypeError:
        total = None
    start = time.time()
    for i, item in enumerate(iterable):
        yield item
        if i % every == 0 or (total is not None and i == total - 1):
            el = time.time() - start
            rate = (i + 1) / el if el > 0 else 0
            msg = f"\r{desc}: {i + 1}" + (f"/{total}" if total else "") + f" [{el:.0f}s, {rate:.2f} it/s]"
            sys.stderr.write(msg)
            sys.stderr.flush()
    sys.stderr.write("\n")


@contextlib.contextmanager
def maybe_profile(trace_dir: str | None):
    """Wrap a hot loop in a jax.profiler trace when ``trace_dir`` is set
    (also honors AGENDA_TPU_PROFILE_DIR)."""
    import jax

    trace_dir = trace_dir or os.environ.get("AGENDA_TPU_PROFILE_DIR")
    if not trace_dir:
        yield
        return
    with jax.profiler.trace(trace_dir):
        yield


class StepTimer:
    """Rolling steps/sec metering for training loops.

    ``tick(step)`` may be called less often than once per step (e.g. only at
    log boundaries): the rate is computed from the STEP COUNTER delta over
    the window, not from the number of tick calls — calling it every
    ``log_interval`` steps without passing ``step`` used to report
    log-events/sec, a ``log_interval``-fold underestimate."""

    def __init__(self, window: int = 50):
        self.window = window
        self.times = []  # (step, time) pairs

    def tick(self, step: int | None = None) -> float:
        now = time.time()
        prev_step = self.times[-1][0] if self.times else -1
        self.times.append((step if step is not None else prev_step + 1, now))
        if len(self.times) > self.window:
            self.times.pop(0)
        if len(self.times) < 2:
            return 0.0
        (s0, t0), (s1, t1) = self.times[0], self.times[-1]
        if t1 <= t0:
            return 0.0
        return (s1 - s0) / (t1 - t0)


def image_grid(images, rows: int, cols: int):
    """Tile (N, H, W, 3) uint8 images into one grid image (PIL).

    Equivalent of the reference's utils_attndb.image_grid (22-29)."""
    from PIL import Image
    import numpy as np

    assert len(images) == rows * cols
    h, w = images[0].shape[:2]
    grid = Image.new("RGB", (cols * w, rows * h))
    for i, im in enumerate(images):
        grid.paste(Image.fromarray(np.asarray(im)), ((i % cols) * w, (i // cols) * h))
    return grid
