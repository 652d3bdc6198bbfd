#!/usr/bin/env python
"""Remote-Mosaic compile probe for the Pallas blend BACKWARD (TODO_TPU #6).

Round 3's forward Mosaic hang was fixed by rewriting the chunk walk as a
while loop; `pallas_blend._bwd_kernel` already carries the same form, but
its remote compile was never re-attempted (PERF.md round-3 note).  This
probes ONLY the compile+one-dispatch of `blend_bwd_pallas` at a tiny
(T_tiles, Kt) so a hang wastes minutes, not half an hour:

    timeout 900 python scripts/pallas_bwd_probe.py            # real TPU
    python scripts/pallas_bwd_probe.py --interpret --platform cpu  # sanity

Record the outcome (compile ms + dispatch ok, or the precise timeout) in
PERF.md either way.
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiles", type=int, default=4)
    ap.add_argument("--kt", type=int, default=256)
    ap.add_argument("--interpret", action="store_true")
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    import numpy as np
    import jax.numpy as jnp

    from rtgslam_tpu.ops.rasterize.pallas_blend import CHUNK, blend_bwd_pallas

    T, Kt = args.tiles, args.kt
    n_chunks = Kt // CHUNK
    rng = np.random.default_rng(0)
    feat = jnp.asarray(rng.normal(size=(T, Kt, 11)).astype(np.float32))
    gidx = jnp.asarray(
        rng.integers(0, 100, size=(T, Kt)).astype(np.int32))
    origins = jnp.zeros((T, 2), jnp.float32)
    entry_T = jnp.ones((T, n_chunks, 256), jnp.float32)
    done = jnp.full((T,), n_chunks, jnp.int32)
    g_color = jnp.asarray(rng.normal(size=(T, 256, 3)).astype(np.float32))
    g_depth = jnp.asarray(rng.normal(size=(T, 256)).astype(np.float32))
    tfin_gt = jnp.zeros((T, 256), jnp.float32)
    depth_index = jnp.full((T, 256), -1, jnp.int32)

    print(f"[probe] lowering blend_bwd_pallas T={T} Kt={Kt} "
          f"interpret={args.interpret} on {jax.devices()[0].platform}...",
          flush=True)
    t0 = time.time()
    lowered = blend_bwd_pallas.lower(
        feat, gidx, origins, entry_T, done, g_color, g_depth, tfin_gt,
        depth_index, opaque_threshold=0.6, interpret=args.interpret)
    compiled = lowered.compile()
    t1 = time.time()
    print(f"[probe] COMPILED in {t1 - t0:.1f} s; dispatching once...",
          flush=True)
    out = np.asarray(compiled(
        feat, gidx, origins, entry_T, done, g_color, g_depth, tfin_gt,
        depth_index))
    t2 = time.time()
    print(f"[probe] DISPATCH OK in {t2 - t1:.1f} s; grad norm "
          f"{float(np.linalg.norm(out)):.3e}, shape {out.shape}")


if __name__ == "__main__":
    main()
