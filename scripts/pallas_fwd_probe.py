#!/usr/bin/env python
"""XLA-vs-Pallas blend FORWARD A/B at parametric tile counts (VERDICT r4 #9).

Round 4 measured the Pallas forward 3.5x slower at 384 tiles (the serial
per-tile grid lost to the batched XLA while-loop at that size) — but the
full-res operating point is 680x1200 = 3,225 tiles, where the grid is long
enough to amortize and PERF.md predicted the trade may flip.  This probes
both implementations of `blend_tiles_fused`'s forward at several tile
counts and prints one JSON line per (T, impl).

    timeout 900 python scripts/pallas_fwd_probe.py                 # real TPU
    python scripts/pallas_fwd_probe.py --platform cpu --interpret  # sanity

Synthetic per-tile features follow the bench's regime: ~uniform means
inside the tile, opacities 0.3-0.9, so early-exit depth is realistic
rather than worst-case.
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiles", type=int, nargs="*", default=[384, 3225])
    ap.add_argument("--kt", type=int, default=256)
    ap.add_argument("--reps", type=int, default=7)
    ap.add_argument("--interpret", action="store_true")
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    import numpy as np
    import jax.numpy as jnp

    from rtgslam_tpu.ops.rasterize import blend

    rng = np.random.default_rng(0)

    for T in args.tiles:
        Kt = args.kt
        cols = {
            "mean_x": rng.uniform(0, 16, (T, Kt)),
            "mean_y": rng.uniform(0, 16, (T, Kt)),
            "conic_a": rng.uniform(0.05, 0.3, (T, Kt)),
            "conic_b": rng.uniform(-0.02, 0.02, (T, Kt)),
            "conic_c": rng.uniform(0.05, 0.3, (T, Kt)),
            "depth": rng.uniform(0.5, 5.0, (T, Kt)),
            "r": rng.uniform(0, 1, (T, Kt)),
            "g": rng.uniform(0, 1, (T, Kt)),
            "b": rng.uniform(0, 1, (T, Kt)),
            "opacity": rng.uniform(0.3, 0.9, (T, Kt)),
            "elig": np.ones((T, Kt)),
        }
        feat = blend.FeatCols(**{k: jnp.asarray(v, jnp.float32)
                                 for k, v in cols.items()})
        gidx = jnp.asarray(rng.integers(0, 60000, (T, Kt)), jnp.int32)
        counts = jnp.asarray(rng.integers(Kt // 2, Kt + 1, (T,)), jnp.int32)
        # grid-row-major origins of a ~W=1200 image
        tx = 1200 // 16
        origins = jnp.stack([(jnp.arange(T) % tx) * 16.0,
                             (jnp.arange(T) // tx) * 16.0], axis=-1)

        for impl, use_pallas in (("xla", False), ("pallas", True)):
            fn = jax.jit(lambda f, g, c, o, up=use_pallas:
                         blend.blend_tiles_fused(
                             f, g, c, o, 0.6, 0.0001, up, args.interpret))
            t0 = time.time()
            try:
                out = fn(feat, gidx, counts, origins)
                np.asarray(out.color)
            except Exception as e:  # Mosaic rejection / crash — record it
                print(json.dumps({"T": T, "impl": impl,
                                  "error": str(e)[:200]}), flush=True)
                continue
            compile_s = time.time() - t0
            ts = []
            for _ in range(args.reps):
                t0 = time.time()
                out = fn(feat, gidx, counts, origins)
                np.asarray(out.color)
                ts.append((time.time() - t0) * 1e3)
            print(json.dumps({
                "T": T, "Kt": Kt, "impl": impl,
                "compile_s": round(compile_s, 1),
                "median_ms": round(sorted(ts)[len(ts) // 2], 2),
                "reps_ms": [round(t, 1) for t in ts],
            }), flush=True)


if __name__ == "__main__":
    main()
