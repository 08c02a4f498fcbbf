"""Where does the VGG block's step cost go? (RESULTS round 5 roofline)

Isolates the perceptual-loss pyramid at protocol shape (B18, 448², bf16,
chunk 6) and times each piece on the chip against its analytic conv
FLOPs.

Axon-tunnel measurement gotchas this script encodes (both measured):
- block_until_ready() on a jit's SCALAR output returns immediately on the
  axon backend — completion must be observed via an np.asarray() pull.
- Repeated executions with bit-identical inputs appear to be deduped
  (0.0 ms "runs"); vary an input scalar per iteration.

Usage: python scripts/probe_vgg_perf.py

Round-5 measured results (v5e, bf16 peak 197 TF/s):
  fwd_b18:                48.3 ms   41.6 TF/s  21.1% MFU
  grad_plain (3x):        85.3 ms   70.7 TF/s  35.9% MFU
  grad_chunk6_remat (4x) 114.2 ms   70.4 TF/s  35.8% MFU
  f32 variant (4x):      151.2 ms   53.2 TF/s  (27% of bf16 peak)
So the conv pyramid's grad path runs at ~36% MFU; the step's larger VGG
delta (173 ms) additionally carries the feature-L1 against the cached GT
pyramid, masking, and scheduling overlap with the raster portion.
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


def main():
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".jax_cache"),
    )
    from harp_tpu.losses.perceptual import Vgg16Features

    vgg = Vgg16Features.create(compute_dtype="bfloat16")
    x0 = jnp.asarray(np.random.RandomState(0).rand(B, IMG, IMG, 3).astype(np.float32))
    scales = [jnp.asarray(1.0 + 1e-4 * i, jnp.float32) for i in range(10)]
    F = fwd_flops(IMG) * B

    def t(build, flops, name, n=6):
        fn = jax.jit(lambda x, s: jnp.reshape(build(x, s), (1,)))
        np.asarray(fn(x0, scales[0]))  # warmup + completion barrier
        ts = []
        for i in range(n):
            t0 = time.perf_counter()
            np.asarray(fn(x0, scales[i + 1]))  # pull = true completion
            ts.append(time.perf_counter() - t0)
        dt = float(np.mean(sorted(ts)[: n - 1]))
        print(f"{name}: {dt*1e3:.1f} ms  {flops/dt/1e12:.1f} TF/s  "
              f"{100*flops/dt/1e12/PEAK_BF16:.1f}% MFU", flush=True)

    def fwd(x, s):
        return sum(f.astype(jnp.float32).sum() for f in vgg.slices(x * s))

    t(fwd, F, "fwd_b18")
    t(lambda x, s: jax.grad(fwd)(x, s).sum(), 3 * F, "grad_plain(3x)")

    def loss_chunked(x, s):
        g = (x * s).reshape(B // 6, 6, IMG, IMG, 3)

        def one(c):
            return sum(f.astype(jnp.float32).sum()
                       for f in jax.checkpoint(vgg.slices)(c))

        return jax.lax.map(one, g).sum()

    t(lambda x, s: jax.grad(loss_chunked)(x, s).sum(), 4 * F,
      "grad_chunk6_remat(4x)")


if __name__ == "__main__":
    main()
