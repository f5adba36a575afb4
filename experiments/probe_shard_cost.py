#!/usr/bin/env python
"""Isolate where the sharded CPU-mesh step's time goes.

MULTICHIP_OVERHEAD.json showed the 8-shard step at 13.7s vs 0.23s for
a single device at the same per-chip batch (58x) — far beyond any
plausible collective cost. This probe times, on the virtual 8-device
CPU mesh: (a) a trivial psum collective, (b) the sharded step with
collectives, (c) the same per-shard body vmapped WITHOUT shard_map
(pure compute, no communication), to split compute vs backend
serialization vs collective cost.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
from jax import shard_map  # noqa: E402
from jax.sharding import Mesh, PartitionSpec as P  # noqa: E402

import numpy as np  # noqa: E402


def timeit(fn, *args, n=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def main():
    devs = np.array(jax.devices())
    assert devs.size >= 8
    mesh = Mesh(devs[:8], ("rays",))

    # (a) trivial collective: pmean of a 3M-float vector
    x = jnp.ones((8, 3_000_000), jnp.float32)
    pmean_fn = jax.jit(shard_map(
        lambda v: jax.lax.pmean(v, "rays"), mesh=mesh,
        in_specs=P("rays"), out_specs=P("rays")))
    t = timeit(pmean_fn, x)
    print(f"pmean 3M floats x8: {t*1e3:.1f} ms")

    # (a2) heavier per-shard compute, no collective: is the CPU backend
    # running shard programs in parallel at all?
    y = jnp.ones((8, 2048, 2048), jnp.float32)
    mm = jax.jit(shard_map(
        lambda v: (v[0] @ v[0])[None], mesh=mesh,
        in_specs=P("rays"), out_specs=P("rays")))
    t_s = timeit(mm, y)
    mm1 = jax.jit(lambda v: v @ v)
    t_1 = timeit(mm1, y[0])
    print(f"8x 2048-matmul sharded: {t_s*1e3:.1f} ms vs single: "
          f"{t_1*1e3:.1f} ms (parallel if ~equal)")

    from experiments.multichip_overhead import build, time_steps
    tr8, cfg8 = build(8, 4096)
    tr8.mark_invisible_cells()
    t8 = time_steps(tr8, cfg8, n=5)
    print(f"sharded step (batch 4096 over 8): {t8:.3f} s")


if __name__ == "__main__":
    main()
