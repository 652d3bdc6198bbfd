#!/usr/bin/env python
"""Attribute HBM traffic of a hot executable to individual HLO instructions.

Context (see ROOFLINE.json / PERF.md): the measured executables run at
~0.4-0.8x of the HBM speed-of-light implied by `cost_analysis()['bytes
accessed']` — they are bandwidth-bound, and the byte counts are LOGICAL
(dense) sizes, so tens of GB per call means some instruction(s) move
enormous dense intermediates.  This script compiles a hot executable from
the specs pickled by scripts/roofline.py, dumps the optimized HLO, and
ranks instructions by operand+output bytes (logical, with the TPU
(8, 128)-tiled padded size alongside) so fixes target the real offenders.

Usage:
  python scripts/roofline.py --no-measure --frames 8   # writes the pickle
  python scripts/hlo_traffic.py [frame_chain|optimize_chain|icp_track]
"""

from __future__ import annotations

import collections
import glob
import os
import pickle
import re
import shutil
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

DUMP = "/tmp/xla_traffic_dump"
SPECS = "/tmp/roofline_bench_specs.pkl"

DTYPE_BYTES = {"f32": 4, "s32": 4, "u32": 4, "bf16": 2, "f16": 2,
               "s16": 2, "u16": 2, "pred": 1, "s8": 1, "u8": 1,
               "f64": 8, "s64": 8, "u64": 8}
# f32 tiling (8, 128); sub-word dtypes pack more sublanes
SUBLANE = {4: 8, 2: 16, 1: 32, 8: 8}

_SHAPE_RE = re.compile(r"(\w+)\[([\d,]*)\](?:\{([\d,]+)[^}]*\})?")


def padded_bytes(dtype: str, dims, minor_to_major):
    """Physical size under TPU (sublane, 128) tiling of the two
    minor-most physical dimensions."""
    b = DTYPE_BYTES.get(dtype)
    if b is None or not dims:
        return 0
    phys = [dims[i] for i in minor_to_major]  # minor first
    n = 1
    sub = SUBLANE[b]
    for pos, d in enumerate(phys):
        if pos == 0:
            d = -(-d // 128) * 128
        elif pos == 1:
            d = -(-d // sub) * sub
        n *= d
    if len(phys) == 1:
        n = max(n, 128 * sub)  # 1-D arrays still occupy full tiles
    return n * b


def parse_shapes(text):
    """Yield (dtype, dims, minor_to_major) for every shape literal."""
    for m in _SHAPE_RE.finditer(text):
        dtype, dims_s, layout_s = m.groups()
        if dtype not in DTYPE_BYTES:
            continue
        dims = [int(x) for x in dims_s.split(",")] if dims_s else []
        mtm = ([int(x) for x in layout_s.split(",")] if layout_s
               else list(range(len(dims) - 1, -1, -1)))
        if len(mtm) != len(dims):
            mtm = list(range(len(dims) - 1, -1, -1))
        yield dtype, dims, mtm


def main():
    argv = sys.argv[1:]
    platform = None
    if "--platform" in argv:
        i = argv.index("--platform")
        platform = argv[i + 1]
        del argv[i:i + 2]
    target = argv[0] if argv else "frame_chain"
    shutil.rmtree(DUMP, ignore_errors=True)
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + f" --xla_dump_to={DUMP}").strip()
    # note: must set XLA_FLAGS before jax import; a compilation-cache hit
    # would skip the XLA pipeline and produce no dump
    import jax  # noqa: E402

    if platform:
        # CPU lowering while the tunnel is down: fusion boundaries differ
        # from TPU but the dominant dense intermediates are the same
        jax.config.update("jax_platforms", platform)
    jax.config.update("jax_enable_compilation_cache", False)

    with open(SPECS, "rb") as f:
        specs = pickle.load(f)
    a, k = specs[target]

    if target == "frame_chain":
        from rtgslam_tpu.models.map_ops import frame_chain as fn
    elif target == "optimize_chain":
        from rtgslam_tpu.models.optimize import optimize_chain as fn
    elif target == "optimize_prepare":
        from rtgslam_tpu.models.optimize import optimize_prepare as fn
    elif target == "optimize_execute":
        from rtgslam_tpu.models.optimize import optimize_execute as fn
    else:
        from rtgslam_tpu.slam.tracker import fused_icp_track_step as fn
    print(f"[hlo_traffic] compiling {target} for "
          f"{jax.devices()[0].platform}...")
    compiled = fn.lower(*a, **k).compile()

    # Prefer the dump (has layouts); the axon plugin compiles on the REMOTE
    # worker so --xla_dump_to writes nothing locally — fall back to the
    # serialized optimized module, which round-trips fine.
    files = sorted(glob.glob(os.path.join(DUMP, "*after_optimizations.txt")),
                   key=os.path.getmtime)
    if files:
        text = open(files[-1]).read()
    else:
        print("[hlo_traffic] no local dump (remote compile) — "
              "using compiled.as_text()")
        text = compiled.as_text()

    per_line = []
    by_kind = collections.Counter()
    for line in text.splitlines():
        line = line.strip()
        m = re.match(r"(?:ROOT )?%?([\w.\-]+) = ", line)
        if not m or "parameter(" in line:
            continue
        name = m.group(1)
        opm = re.search(r"= [^ ]+ ([a-z\-]+)\(", line)
        kind = opm.group(1) if opm else "?"
        if kind in ("tuple", "get-tuple-element", "bitcast", "parameter",
                    "constant", "after-all"):
            continue
        logical = sum(
            DTYPE_BYTES[s[0]] * max(1, int(__import__("numpy").prod(s[1])))
            for s in parse_shapes(line))
        padded = sum(padded_bytes(*s) for s in parse_shapes(line))
        if logical:
            per_line.append((logical, padded, name, kind, line[:150]))
            by_kind[kind] += logical

    per_line.sort(reverse=True)
    grand = sum(t for t, *_ in per_line)
    print(f"\ntotal logical instruction traffic: {grand/1e9:.1f} GB "
          f"(operand+output, once per instruction — loop bodies count once)")
    print("\n== by op kind (logical) ==")
    for kind, t in by_kind.most_common(12):
        print(f"  {kind:24s} {t/1e9:8.2f} GB  ({100*t/grand:4.1f}%)")
    print("\n== top instructions (logical MB | padded MB) ==")
    for t, tp, name, kind, line in per_line[:30]:
        print(f"  {t/1e6:9.1f} | {tp/1e6:9.1f}  {line}")


if __name__ == "__main__":
    main()
