"""Simple wall-clock timer (tic/toc with running average)."""

import time


class Timer(object):
    def __init__(self):
        self.reset()

    def tic(self):
        self.start_time = time.perf_counter()

    def toc(self, average=True):
        self.diff = time.perf_counter() - self.start_time
        self.total_time += self.diff
        self.calls += 1
        self.average_time = self.total_time / self.calls
        return self.average_time if average else self.diff

    def reset(self):
        self.total_time = 0.0
        self.calls = 0
        self.start_time = 0.0
        self.diff = 0.0
        self.average_time = 0.0


def slope_time(fn, consume=None, iters=20, warmup=3):
    """Tunnel-safe device timing: dispatch N executions and force
    completion with ONE scalar readback, for two values of N; the
    per-iteration time is the slope.  `block_until_ready` on an unchained
    output can return before execution finishes through tunneled PJRT
    plugins, and blocking per iteration adds the tunnel RTT to every
    sample (CLAUDE.md timing protocol; shared by bench.py and the
    tools/bench_* scripts).

    fn: nullary callable returning a jax array (or pytree).
    consume: optional callable(out) forcing completion; defaults to
      float(jnp.sum(first_leaf)).
    Returns seconds per iteration.
    """
    import jax
    import jax.numpy as jnp

    if consume is None:
        def consume(out):
            leaf = jax.tree_util.tree_leaves(out)[0]
            float(jnp.sum(leaf))

    def run(n):
        out = None
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn()
        consume(out)
        return time.perf_counter() - t0

    for _ in range(warmup):
        run(1)
    t_small = run(2)
    t_big = run(2 + iters)
    return (t_big - t_small) / iters
