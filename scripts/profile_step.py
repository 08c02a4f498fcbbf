"""Op-level TPU profile of the full train step via jax.profiler + xplane.

Round-2 recipe (RESULTS.md): tensorboard_plugin_profile's converter is broken
in this image; parse the raw vm.xplane.pb with tsl's xplane_pb2 directly
(PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python).

Usage: BENCH_B=18 python scripts/profile_step.py [--top 30]
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")
import glob
import re
from collections import defaultdict

import jax, jax.numpy as jnp, numpy as np


def run_and_trace(tmpdir):
    from harp_tpu.data.synthetic import make_synthetic_sequence
    from harp_tpu.fit import init_params
    from harp_tpu.fit.optimizer import build_optimizers
    from harp_tpu.fit.driver import make_train_step
    from harp_tpu.render import pipeline
    from __graft_entry__ import _build

    B = int(os.environ.get('BENCH_B', '18'))
    assets, config, rcfg, _ = _build(448, 512, n_frames=B)
    images, masks, masks_er, gt, init = make_synthetic_sequence(
        assets, config, rcfg, n_frames=B, seed=0)
    params, aux = init_params(init, assets, config)
    txs, opt_states, gm = build_optimizers(params, config)
    vgg = None
    if os.environ.get("BENCH_VGG", "0") == "1":
        from harp_tpu.losses.perceptual import Vgg16Features
        vgg = Vgg16Features.create(weights_path=config.vgg_weights or None,
                                   compute_dtype=config.vgg_compute_dtype)
    train_step = make_train_step(assets, config, rcfg, vgg, txs)
    ref_verts, _ = pipeline.mesh_forward(params, jnp.asarray([0]), assets, config)
    fids = jnp.arange(B)
    key = jax.random.PRNGKey(0)
    one = jnp.asarray(1.0, jnp.float32)

    def run(p, s):
        return train_step(p, s, aux, fids, images, masks, masks_er,
                          ref_verts[0], key, one, coarse_on=True, app_on=True)

    p, s, total, _ = run(params, opt_states)
    jax.block_until_ready(total)
    with jax.profiler.trace(tmpdir):
        for _ in range(3):
            p, s, total, _ = run(p, s)
        jax.block_until_ready(total)


def parse(tmpdir, top):
    from tensorflow.compiler.tf2xla.python import xla  # noqa: F401  (ensures tsl protos importable)
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    fn = sorted(glob.glob(os.path.join(tmpdir, "**", "*.xplane.pb"),
                          recursive=True))[-1]
    xs = xplane_pb2.XSpace()
    with open(fn, "rb") as f:
        xs.ParseFromString(f.read())
    for plane in xs.planes:
        if "TPU" not in plane.name:
            continue
        evmeta = {m.id: m.name for m in plane.event_metadata.values()}
        dur = defaultdict(float)
        cnt = defaultdict(int)
        total_ns = 0.0
        for line in plane.lines:
            lname = line.name.lower()
            if "xla op" in lname or "xla ops" in lname:
                for ev in line.events:
                    name = evmeta.get(ev.metadata_id, "?")
                    dur[name] += ev.duration_ps / 1e9  # ms... ps->ms = 1e9
                    cnt[name] += 1
                    total_ns += ev.duration_ps
        if not dur:
            continue
        print(f"== plane: {plane.name}  (busy {total_ns/1e9:.1f} ms over 3 steps)")
        # Group by stripped fusion names.
        grouped = defaultdict(float)
        for k, v in dur.items():
            g = re.sub(r"\.\d+$", "", k)
            grouped[g] += v
        for k, v in sorted(grouped.items(), key=lambda kv: -kv[1])[:top]:
            print(f"{v/3:9.2f} ms  {k}")


if __name__ == "__main__":
    top = 30
    if "--top" in sys.argv:
        top = int(sys.argv[sys.argv.index("--top") + 1])
    import tempfile

    d = os.environ.get("PROFILE_DIR") or tempfile.mkdtemp(prefix="prof_")
    run_and_trace(d)
    print("trace at", d)
    parse(d, top)
