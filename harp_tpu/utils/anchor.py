"""Container-fingerprint microbenchmark.

Every measured protocol run on this environment rides a different axon
tunnel/container, and cross-container variance of 25-40% was measured on
identical code (RESULTS.md round 3). A fixed in-process microbench executed
immediately before a protocol gives each recorded run an anchor that makes
its wall-clock numbers normalizable across containers instead of merely
caveated (VERDICT r4 weak #6).

Three numbers, chosen to separate the three variance sources:

- ``dispatch_ms``  — median round-trip of a trivial jitted op: tunnel
  latency per dispatch (dominates per-epoch logging / eager overheads).
- ``matmul_ms``    — median of a fixed bf16 matmul chain (8x 2048^3 MACs,
  ~137 GFLOP/call): pure MXU device speed, tunnel-insensitive.
- ``transfer_ms``  — median device->host pull of a fixed 16 MB buffer:
  tunnel bandwidth (dominates image logging / eval pulls).

The shapes are fixed forever; do not "improve" them — comparability across
rounds is the whole point. Compile cost is a few seconds and is excluded
(one warmup call per program before timing).
"""

from __future__ import annotations

import time

import numpy as np


def container_anchor(reps: int = 10) -> dict:
    """Run the fixed fingerprint microbench on the default backend.

    Returns {"anchor_dispatch_ms", "anchor_matmul_ms", "anchor_transfer_ms",
    "anchor_matmul_tflops"} (medians over `reps`).
    """
    import jax
    import jax.numpy as jnp

    @jax.jit
    def tiny(x):
        return x + 1.0

    @jax.jit
    def chain(a, b):
        def body(_, ab):
            a, b = ab
            return (jnp.dot(a, b, preferred_element_type=jnp.bfloat16), b)

        a, b = jax.lax.fori_loop(0, 8, body, (a, b))
        return a

    a = jnp.ones((2048, 2048), jnp.bfloat16)
    b = jnp.ones((2048, 2048), jnp.bfloat16)
    big = jnp.ones((4 * 1024 * 1024,), jnp.float32)  # 16 MB

    # Warmups (compile + first-dispatch) excluded from timing.
    jax.block_until_ready(tiny(jnp.float32(0.0)))
    jax.block_until_ready(chain(a, b))
    np.asarray(big[:8])

    def med(fn):
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            fn()
            ts.append((time.perf_counter() - t0) * 1e3)
        return float(np.median(ts))

    dispatch = med(lambda: jax.block_until_ready(tiny(jnp.float32(0.0))))
    matmul = med(lambda: jax.block_until_ready(chain(a, b)))
    transfer = med(lambda: np.asarray(big))
    flops = 8 * 2 * 2048**3  # 137.4 GFLOP per chain call
    return {
        "anchor_dispatch_ms": round(dispatch, 3),
        "anchor_matmul_ms": round(matmul, 3),
        "anchor_transfer_ms": round(transfer, 3),
        "anchor_matmul_tflops": round(flops / (matmul * 1e-3) / 1e12, 2),
    }
