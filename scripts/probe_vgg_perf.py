"""Where does the VGG block's 17.7% MFU go? (RESULTS round 5 roofline)

Isolates the perceptual-loss pyramid at protocol shape (B18, 448², bf16,
chunk 6) into pieces and times each on the chip:

  fwd          — one pyramid forward (the GT-cache precompute cost)
  fwd+bwd      — d/d(image) of the feature sum (conv + transposed-conv)
  loss-path    — the exact chunked/remat loss delta as in compute_losses
  variants     — conv dtype / remat toggles

Each piece reports achieved TFLOP/s against its analytic conv FLOPs so
the gap decomposes into (conv efficiency) vs (remat recompute) vs
(chunk-loop overhead).

Usage: python scripts/probe_vgg_perf.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

B, IMG = 18, 448
PEAK_BF16 = 197.0


def fwd_flops(img):
    from scripts.mfu_roofline import vgg_conv_flops_per_frame

    return vgg_conv_flops_per_frame(img)


def timeit(fn, *args, n=8):
    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.mean(sorted(ts)[: max(n - 2, 1)]))


def main():
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".jax_cache"),
    )
    from harp_tpu.losses.perceptual import Vgg16Features

    vgg = Vgg16Features.create(compute_dtype="bfloat16")
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(B, IMG, IMG, 3).astype(np.float32))
    f1 = fwd_flops(IMG) * B

    rows = []

    def report(name, dt, flops):
        tf = flops / dt / 1e12
        rows.append({"name": name, "ms": round(dt * 1e3, 1),
                     "tflops": round(tf, 1),
                     "mfu_pct": round(100 * tf / PEAK_BF16, 1)})
        print(rows[-1], flush=True)

    # E1: plain forward, whole batch (no chunking).
    fwd = jax.jit(lambda x: sum(f.astype(jnp.float32).sum() for f in vgg.slices(x)))
    report("fwd_b18", timeit(fwd, x), f1)

    # E2: forward in chunks of 6 via lax.map (the precompute/loss shape).
    def fwd_chunked(x):
        g = x.reshape(3, 6, IMG, IMG, 3)
        return jax.lax.map(
            lambda c: sum(f.astype(jnp.float32).sum() for f in vgg.slices(c)), g
        ).sum()

    report("fwd_b18_chunk6", timeit(jax.jit(fwd_chunked), x), f1)

    # E3: fwd+bwd wrt the input image (2x fwd analytic: one transposed conv
    # per conv; filters are constants).
    g_plain = jax.jit(jax.grad(lambda x: fwd(x)))
    report("fwd_bwd_b18", timeit(g_plain, x), 3 * f1)  # grad runs fwd+bwd

    # E4: the loss path exactly as compute_losses runs it: chunked lax.map
    # with jax.checkpoint around each chunk's pyramid.
    def loss_chunked(x):
        g = x.reshape(3, 6, IMG, IMG, 3)

        def one(c):
            return sum(f.astype(jnp.float32).sum()
                       for f in jax.checkpoint(vgg.slices)(c))

        return jax.lax.map(one, g).sum()

    g_remat = jax.jit(jax.grad(loss_chunked))
    # analytic: fwd + remat-fwd + bwd = 4x fwd FLOPs (grad(f) = fwd+bwd = 3x,
    # checkpoint adds one more fwd).
    report("fwd_bwd_b18_chunk6_remat", timeit(g_remat, x), 4 * f1)

    print("RESULT " + repr(rows))


if __name__ == "__main__":
    main()
