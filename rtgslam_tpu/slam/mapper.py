"""Mapping back-end: incremental Gaussian map construction + optimization.

Host-side orchestrator mirroring the reference ``Mapping``
(``SLAM/multiprocess/mapper.py:19-1139``) over the fixed-capacity
``MapState``.  Per mapped frame:

  gaussians_add      three-type spawning (newly-observed / depth-error /
                     color-error pixels, mapper.py:715-794) -> dedup ->
                     stable-attach -> KNN scale init -> scatter into free slots
  local_optimize     fused on-device loop over the recent-frame memory
  global_optimization keyframe-driven stable-map refinement
  gaussians_fix      confidence promotion to stable
  error_gaussians_remove   per-gaussian error strikes -> delete/release
  gaussians_delete   oversized / expired gaussian recycling

All heavy steps are jitted with static shapes; this class only sequences
them and keeps the host-side bookkeeping (keyframes, recorder, checkpoints).
"""

from __future__ import annotations

import os
import threading
import time as time_mod
from collections import deque
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config.loader import GroupParams
from ..data.camera import Camera
from ..models import map_ops, optimize
from ..models.gaussian_map import (
    STABLE, UNSTABLE, GaussianMapConfig, MapState, alive_mask, render_inputs,
    stable_mask, unstable_mask, to_numpy_dict,
)
from ..ops import preprocess
from ..ops.rasterize import RasterSettings, render
from ..utils import ply as ply_utils
from ..utils.geometry import rot_compare, trans_compare
from ..utils import perf


class Mapper:
    # starting KNN reference-scan bucket; doubles as occupancy grows
    # (class attr so tests can shrink it to exercise bucket crossings)
    REF_LIMIT_FLOOR = 4096

    def __init__(self, args: GroupParams, recorder=None):
        self.args = args
        self.config = GaussianMapConfig.from_args(args)
        self.state = MapState.create(self.config)
        self.recorder = recorder

        self.time = 0
        self.iter = 0
        self.gaussian_update_iter = int(args.gaussian_update_iter)
        self.gaussian_update_frame = int(args.gaussian_update_frame)
        self.final_global_iter = int(args.final_global_iter)
        self.memory_length = int(args.memory_length)
        self.global_keyframe_num = int(args.global_keyframe_num)
        self.keyframe_trans_thes = float(args.keyframe_trans_thes)
        self.keyframe_theta_thes = float(args.keyframe_theta_thes)
        self.history_merge_max_weight = float(args.history_merge_max_weight)
        self.freeze_binning = bool(
            getattr(args, "optimize_freeze_binning", False))
        # compact two-stage optimize path (prepare -> bucket fetch ->
        # execute); supersedes freeze_binning when on (see _optimize_compact)
        self.optimize_compact = bool(
            getattr(args, "optimize_compact", False))

        self.uniform_sample_num = int(args.uniform_sample_num)
        self.add_depth_thres = float(args.add_depth_thres)
        self.add_normal_thres = float(args.add_normal_thres)
        self.add_color_thres = float(args.add_color_thres)
        self.add_transmission_thres = float(args.add_transmission_thres)
        self.transmission_sample_ratio = float(args.transmission_sample_ratio)
        self.error_sample_ratio = float(args.error_sample_ratio)
        self.stable_confidence_thres = float(args.stable_confidence_thres)
        self.unstable_time_window = float(args.unstable_time_window)

        self.feature_lr_coef = float(getattr(args, "feature_lr_coef", 1.0))
        self.scaling_lr_coef = float(getattr(args, "scaling_lr_coef", 1.0))
        self.rotation_lr_coef = float(getattr(args, "rotation_lr_coef", 1.0))

        self.save_path = args.save_path
        self.save_step = int(args.save_step)
        self.verbose = bool(args.verbose)
        self.dataset_type = getattr(args, "type", "Replica")
        self.min_depth, self.max_depth = float(args.min_depth), float(args.max_depth)

        # frame memory + keyframes (maps kept on host to bound HBM,
        # reference mapper.py:658-711 keeps keyframes on CPU likewise)
        self.processed_frames: deque = deque(maxlen=self.memory_length)
        self.keyframe_list: List[Dict] = []
        self.keyframe_ids: List[int] = []
        self.optimize_frames_ids: List[int] = []

        self.settings: Optional[RasterSettings] = None
        self.model_map: Dict[str, jnp.ndarray] = {}
        self.frame_map: Dict[str, jnp.ndarray] = {}
        # occupancy counters computed ON DEVICE at the end of each frame's
        # lifecycle and fetched lazily next frame (no fresh dispatch+sync)
        self._hwm_dev = None
        self._stable_dev = None

        # optional multi-chip mesh: standalone renders go tile-sharded
        # (parallel/sp_render.py) and keyframe global optimization goes
        # frame-parallel (parallel/sharded.py)
        self.mesh = None
        if bool(getattr(args, "multi_device", False)) and len(jax.devices()) > 1:
            from ..parallel import make_mesh

            self.mesh = make_mesh()
        self.key = jax.random.PRNGKey(2024)
        self.rng = np.random.default_rng(2024)
        self.max_spawn = self.config.temp_capacity // 2
        self._cached_render = None
        # ref_limit buckets already compiled (or being compiled) ahead of
        # need — see _maybe_prewarm_bucket
        self._warmed_buckets = set()
        # run-wide high-water mark of render bin overflow: capacities are a
        # pure cost knob ONLY while this stays 0 (test_capacity_invariance);
        # folded from the per-frame render lazily, surfaced by slam.py
        self.max_overflow = 0
        self._overflow_dev = None
        self._cached_render_key = None

        # optional tensorboard scalars (reference mapper.py:928-931,968-980)
        self.tb_writer = None
        if bool(getattr(args, "use_tensorboard", False)) and \
                getattr(args, "mode", "single process") == "single process":
            try:
                from torch.utils.tensorboard import SummaryWriter

                self.tb_writer = SummaryWriter(self.save_path)
            except Exception:
                self.tb_writer = None

    def train_report(self, iteration: int, losses: Dict[str, float]) -> None:
        if self.tb_writer is not None:
            for k, v in losses.items():
                self.tb_writer.add_scalar(f"train/{k}", float(v), iteration)

    def eval_report(self, iteration: int, metrics: Dict[str, float]) -> None:
        if self.tb_writer is not None:
            for k, v in metrics.items():
                self.tb_writer.add_scalar(f"eval/{k}", float(v), iteration)

    # ------------------------------------------------------------------
    def _next_key(self):
        self.key, sub = jax.random.split(self.key)
        return sub

    def _ensure_settings(self, frame: Camera):
        if self.settings is None:
            self.settings = RasterSettings.from_args(
                self.args, frame.image_height, frame.image_width)
            self.H, self.W = frame.image_height, frame.image_width

    @property
    def get_unstable_num(self) -> int:
        return int(jnp.sum(self.state.status == UNSTABLE))

    @property
    def get_stable_num(self) -> int:
        return int(jnp.sum(self.state.status == STABLE))

    @property
    def get_total_iter(self) -> int:
        return self.iter + self.time * self.gaussian_update_iter

    # ------------------------------------------------------------------
    def _render(self, cam_dev, which: str, tile_mask=None, settings=None):
        masks = {"global": alive_mask, "unstable": unstable_mask, "stable": stable_mask}
        gauss = render_inputs(self.state, masks[which](self.state))
        if self.mesh is not None:
            from ..parallel.sp_render import sp_render

            cam = {k: jnp.asarray(v) for k, v in cam_dev.items()}
            return sp_render(gauss, cam, settings or self.settings,
                             self.mesh, tile_mask=tile_mask)
        return render(gauss, cam_dev, settings or self.settings,
                      tile_mask=tile_mask, differentiable=False)

    def get_render_output(self, frame: Camera, reuse: bool = True):
        """Full global render for the model map (mapper.py:982-996).

        When ``reuse`` and the error-check pass already rendered this frame
        at the current map state, its output is recycled (saves one full
        render per frame; the only divergence from the reference is that the
        handful of gaussians error-deleted in between still appear)."""
        if reuse and self._cached_render is not None \
                and self._cached_render_key == (self.time, frame.uid):
            out = self._cached_render
            self._set_model_map(out)
            return out
        out = self._render(frame.device_dict(), "global")
        self._set_model_map(out)
        return out

    def _set_model_map(self, out):
        self.model_map = {
            "render_color": out["render"],
            "render_depth": out["depth"],
            "render_normal": out["normal"],
            "render_color_index": out["color_index_map"],
            "render_depth_index": out["depth_index_map"],
            "render_transmission": out["T_map"],
        }

    # ------------------------------------------------------------------
    # spawning
    # ------------------------------------------------------------------
    def _cached_hwm(self) -> int:
        """High-water mark as of the end of the previous frame's lifecycle —
        exact for this frame's spawn (nothing inserts in between)."""
        if self._overflow_dev is not None:
            self.max_overflow = max(self.max_overflow, int(self._overflow_dev))
            self._overflow_dev = None
        return int(self._hwm_dev) if self._hwm_dev is not None else 0

    def _cached_stable_num(self) -> int:
        return int(self._stable_dev) if self._stable_dev is not None else 0

    def gaussians_add(self, frame: Camera):
        """Three-type spawning INCLUDING its model/stable renders, one device
        call (reference mapper.py:128-132,728,849)."""
        fm = self.frame_map
        first_frame = self.time == 0

        # bound the KNN reference scans to the occupied slot prefix,
        # bucketed to powers of two so retraces stay rare
        _t0 = time_mod.perf_counter()
        hwm = self._cached_hwm()
        has_stable = self._cached_stable_num() > 0
        perf.count("map.counter_fetch", time_mod.perf_counter() - _t0)
        ref_limit = self.REF_LIMIT_FLOOR
        while ref_limit < hwm:
            ref_limit *= 2
        ref_limit = min(ref_limit, self.config.capacity)

        cam = frame.device_dict()
        _t0 = time_mod.perf_counter()
        args = (
            self._next_key(), self.state,
            fm["vertex_map_w"], fm["normal_map_w"], fm["color_map"],
            fm["depth_map"],
            jnp.asarray(cam["w2c"]), jnp.asarray(cam["K"]),
            jnp.asarray(cam["campos"]), self.time,
            self.uniform_sample_num, self.transmission_sample_ratio,
            self.error_sample_ratio, self.add_transmission_thres,
            self.add_depth_thres, self.add_color_thres,
            self.config, self.max_spawn, self.H, self.W,
            first_frame, has_stable, ref_limit, self.settings)
        self._maybe_prewarm_bucket(map_ops.spawn_chain_donated, args,
                                   len(args) - 2, ref_limit, hwm, "spawn")
        self.state, n_inserted, model_out, _base, _slots = \
            map_ops.spawn_chain_donated(*args)
        perf.count("map.spawn_chain", time_mod.perf_counter() - _t0)
        if model_out is not None:
            self._set_model_map(model_out)
        if self.verbose:
            print(f"add new gaussian num: {int(n_inserted)}")

    @staticmethod
    def _aval_spec(x):
        """Array -> ShapeDtypeStruct (so the prewarm thread never holds a
        reference to a donated buffer); everything else passes through and
        retraces exactly like the real call (python scalars, statics)."""
        if isinstance(x, jax.Array):
            return jax.ShapeDtypeStruct(x.shape, x.dtype)
        return x

    def _maybe_prewarm_bucket(self, fn, args: tuple, ref_limit_pos: int,
                              ref_limit: int, hwm: int, tag: str) -> None:
        """The KNN reference-scan bound is bucketed to powers of two so the
        static-shape executables stay cacheable; the price is an XLA
        recompile the frame the high-water mark crosses a bucket (minutes on
        first encounter — the dominant stall in the 220-frame trace, see
        PERF.md).  When occupancy passes 3/4 of the current bucket, compile
        the NEXT bucket's executable in a daemon thread: XLA compilation is
        host-side C++ (GIL released) and overlaps device execution, so the
        crossing frame finds a warm cache instead of stalling."""
        nxt = ref_limit * 2
        if hwm * 4 <= ref_limit * 3 or nxt > self.config.capacity:
            return
        key = (tag, nxt, args[-3])   # has_stable is part of the trace
        if key in self._warmed_buckets:
            return
        self._warmed_buckets.add(key)
        specs = [self._aval_spec(a) for a in args]
        specs[ref_limit_pos] = nxt

        def warm():
            try:
                fn.lower(*specs).compile()
            except Exception:   # pragma: no cover - warmup is best-effort
                pass

        threading.Thread(target=warm, daemon=True,
                         name=f"prewarm-{tag}-{nxt}").start()

    def _mapping_fused_frame(self, frame: Camera):
        """Non-optimize frame: spawn + lifecycle as ONE device call
        (map_ops.frame_chain) — same host bookkeeping as
        ``gaussians_add`` + ``lifecycle`` run back to back."""
        fm = self.frame_map
        _t0 = time_mod.perf_counter()
        hwm = self._cached_hwm()
        has_stable = self._cached_stable_num() > 0
        perf.count("map.counter_fetch", time_mod.perf_counter() - _t0)
        ref_limit = self.REF_LIMIT_FLOOR
        while ref_limit < hwm:
            ref_limit *= 2
        ref_limit = min(ref_limit, self.config.capacity)

        cam = frame.device_dict()
        _t0 = time_mod.perf_counter()
        args = (
            self._next_key(), self.state,
            fm["vertex_map_w"], fm["normal_map_w"], fm["color_map"],
            fm["depth_map"],
            jnp.asarray(cam["w2c"]), jnp.asarray(cam["K"]),
            jnp.asarray(cam["campos"]), self.time,
            self.uniform_sample_num, self.transmission_sample_ratio,
            self.error_sample_ratio, self.add_transmission_thres,
            self.add_depth_thres, self.add_color_thres,
            self.stable_confidence_thres, self.unstable_time_window,
            self.config, self.max_spawn, self.H, self.W,
            has_stable, ref_limit, self.settings)
        self._maybe_prewarm_bucket(map_ops.frame_chain_donated, args,
                                   len(args) - 2, ref_limit, hwm, "frame")
        (self.state, n_inserted, model_out, out,
         self._hwm_dev, self._stable_dev) = map_ops.frame_chain_donated(*args)
        perf.count("map.frame_chain", time_mod.perf_counter() - _t0)
        self._prefetch_counters()
        if model_out is not None:
            self._set_model_map(model_out)
        self._cache_render(out, (self.time, frame.uid))
        if self.verbose:
            print(f"add new gaussian num: {int(n_inserted)}")

    # ------------------------------------------------------------------
    # keyframes
    # ------------------------------------------------------------------
    def _keyframe_predicate(self, frame: Camera) -> bool:
        """Pure host pose math half of the keyframe test (mapper.py:336-368).
        Split out so ``mapping`` can start the D2H offload *before* any
        mapping work is enqueued (the tunneled device serializes fetches
        behind queued chains; a blocking ``np.asarray`` after the spawn
        chain was measured at 30 s/keyframe on the 220-frame run)."""
        if self.time == 0:
            return True
        prev = self.keyframe_list[-1]["frame"]
        _, theta_diff = rot_compare(prev.R.T, frame.R.T)
        _, l2_diff = trans_compare(prev.T, frame.T)
        return (theta_diff > self.keyframe_theta_thes
                or l2_diff > self.keyframe_trans_thes)

    def prefetch_keyframe_maps(self, frame: Camera) -> None:
        """If this frame will become a keyframe, start the async D2H copy of
        its tracker-produced maps now, while the device queue is empty."""
        if not self._keyframe_predicate(frame):
            return
        for key in ("color_map", "depth_map", "normal_map_w"):
            arr = self.frame_map.get(key)
            if hasattr(arr, "copy_to_host_async"):
                arr.copy_to_host_async()

    def check_keyframe(self, frame: Camera, frame_id: int) -> bool:
        """Rotation/translation-threshold keyframing (mapper.py:336-368).
        The host-RAM map offload only happens for frames that actually
        become keyframes (the check itself is pure host pose math)."""
        is_first = self.time == 0
        if not self._keyframe_predicate(frame):
            return False
        fm = self.frame_map
        _t0 = time_mod.perf_counter()
        keymap = {
            "color_map": np.asarray(fm["color_map"]),
            "depth_map": np.asarray(fm["depth_map"]),
            "normal_map": np.asarray(fm["normal_map_w"]),
        }
        perf.count("map.keyframe_offload", time_mod.perf_counter() - _t0)
        self.keyframe_list.append({"frame": frame.drop_images(), "map": keymap})
        self.keyframe_ids.append(frame_id)
        return not is_first

    def update_poses(self, new_poses) -> None:
        """Re-apply backend-refined historical poses (mapper.py:134-141)."""
        if new_poses is None:
            return
        for entry in self.processed_frames:
            cam = entry["camera"]
            cam.update_pose(new_poses[cam.uid])
            entry["cam_dev"] = cam.device_dict()
        for kf in self.keyframe_list:
            if kf["frame"].uid < len(new_poses):
                kf["frame"].update_pose(new_poses[kf["frame"].uid])

    # ------------------------------------------------------------------
    # optimization
    # ------------------------------------------------------------------
    def _lrs(self, opt, scale_overrides=None):
        lrs = {
            "xyz": opt.position_lr,
            "features_dc": opt.feature_lr,
            "features_rest": opt.feature_lr / 20.0,
            "opacity": opt.opacity_lr,
            "scaling": opt.scaling_lr,
            "rotation": opt.rotation_lr,
        }
        if scale_overrides:
            for k, s in scale_overrides.items():
                lrs[k] = lrs[k] * s if s >= 0 else 0.0
        return {k: jnp.float32(v) for k, v in lrs.items()}

    def _weights(self, opt, depth_weight=None):
        return {
            "color_weight": jnp.float32(opt.color_weight),
            "depth_weight": jnp.float32(
                opt.depth_weight if depth_weight is None else depth_weight),
            "normal_weight": jnp.float32(opt.normal_weight),
            "add_depth_thres": jnp.float32(self.add_depth_thres),
        }

    @staticmethod
    def _stack_entries(entries):
        pick = lambda k: jnp.stack([e[k] for e in entries])
        return (pick("color"), pick("depth"), pick("normal"),
                pick("w2c"), pick("K"), pick("campos"))

    # ------------------------------------------------------------------
    # compact optimize path (optimize_prepare -> bucket fetch -> execute)
    # ------------------------------------------------------------------
    @staticmethod
    def _pow2_bucket(n: int, floor: int, cap: int) -> int:
        b = floor
        while b < n:
            b *= 2
        return min(b, cap)

    def _maybe_prewarm_execute(self, args, statics, Ac, Ktc, n_pool, cmax,
                               L, Kt, Tc, n_tiles, T_full) -> None:
        """Background-compile the NEXT (Ac, Ktc, Tc) bucket once occupancy
        passes 3/4 of the current one (same rationale as
        _maybe_prewarm_bucket: the crossing frame then finds a warm
        compilation cache instead of stalling for the XLA compile)."""
        candidates = []
        if n_pool * 4 > Ac * 3 and Ac * 2 <= L:
            candidates.append((Ac * 2, Ktc, Tc))
        if cmax * 4 > Ktc * 3 and Ktc * 2 <= Kt:
            candidates.append((Ac, Ktc * 2, Tc))
        if n_tiles * 4 > Tc * 3 and Tc * 2 <= T_full:
            candidates.append((Ac, Ktc, min(Tc * 2, T_full)))
        for na, nk, nt in candidates:
            key = ("exec", na, nk, nt, statics["mode"])
            if key in self._warmed_buckets:
                continue
            self._warmed_buckets.add(key)
            # a Tc change resizes the tile_rows ARG, not just a static
            specs = [self._aval_spec(a) for a in args]
            if nt != Tc:
                import jax

                tr = args[12]   # tile_rows (state, 6x stacked, rmasks,
                #                lists, counts, pool_rows, n_pool, THIS)
                specs[12] = jax.ShapeDtypeStruct(
                    (tr.shape[0], nt), tr.dtype)
            st = dict(statics, Ac=na, Ktc=nk, Tc=nt)

            def warm(specs=specs, st=st):
                try:
                    optimize.optimize_execute_donated.lower(
                        *specs, **st).compile()
                except Exception:   # pragma: no cover - warmup best-effort
                    pass

            threading.Thread(target=warm, daemon=True,
                             name=f"prewarm-exec-{na}-{nk}-{nt}").start()

    def _optimize_compact(self, entries, seq, n_iters, lrs, weights, mode,
                          sample_ratio, max_weight):
        """Two-dispatch compact optimization (PERF.md round 4): stage 1
        computes masks + one frozen binning pass per frame (shared
        projection/sort in local mode) and the occupancy scalars; the host
        fetches the 2 scalars, picks static power-of-two buckets (pool size
        Ac, per-tile list length Ktc), and stage 2 runs the whole loop in
        pool-compact space.  Measured per-iteration slope 25.0 (plain) ->
        ~5 ms (compact) at the bench point (OPT_COMPACT_PROBE.json).

        DIVERGENCE from the reference (which re-sorts/re-bins every
        iteration, mapper.py:143-210): blend order and tile membership are
        frozen per call — the freeze_binning approximation, quality-bounded
        by test_freeze_binning_quality; given the buckets the compact math
        is identical to the freeze_binning path
        (test_compact_matches_freeze)."""
        stacked = self._stack_entries(entries)
        mdp = self.dataset_type == "Scannetpp"
        # the cached high-water mark predates this frame's spawn — cover the
        # worst-case insertion so fresh rows stay inside the prefix
        hwm = (int(self._hwm_dev) if self._hwm_dev is not None else 0) \
            + self.max_spawn
        L = self.REF_LIMIT_FLOOR
        while L < hwm:
            L *= 2
        L = min(L, self.config.capacity)
        prep_args = (self.state, *stacked)
        prep_statics = dict(settings=self.settings, mode=mode,
                            sample_ratio=sample_ratio,
                            mask_depth_positive=mdp, row_limit=L)
        if hwm * 4 > L * 3 and L * 2 <= self.config.capacity:
            self._prewarm_prepare(prep_args, prep_statics, L * 2)
        (rmasks, tiles, lists_orig, counts, pool_order, tile_order,
         n_pool_dev, cnt_max_dev, n_tiles_dev) = optimize.optimize_prepare(
            *prep_args, **prep_statics)
        for dev in (n_pool_dev, cnt_max_dev, n_tiles_dev):
            if hasattr(dev, "copy_to_host_async"):
                dev.copy_to_host_async()
        n_pool, cm = int(n_pool_dev), int(cnt_max_dev)
        n_live_tiles = int(n_tiles_dev)
        Kt = lists_orig.shape[-1]
        T_full = counts.shape[-1]
        Ac = self._pow2_bucket(n_pool, 256, self.config.capacity)
        Ktc = self._pow2_bucket(cm, 64, Kt)
        Tc = self._pow2_bucket(n_live_tiles, 32, T_full)
        # crop the compact basis OUTSIDE execute: its executable then
        # depends only on (Ac, Ktc, Tc), not on the prepare stage's row_limit
        pool_rows = pool_order[:Ac] if Ac <= pool_order.shape[0] else \
            jnp.pad(pool_order, (0, Ac - pool_order.shape[0]),
                    constant_values=self.config.capacity - 1)
        args = (self.state, *stacked, rmasks, lists_orig, counts,
                pool_rows, n_pool_dev, tile_order[:, :Tc],
                jnp.asarray(seq, jnp.int32),
                n_iters, lrs, weights)
        statics = dict(settings=self.settings, mode=mode,
                       max_weight=max_weight, Ac=Ac, Ktc=Ktc, Tc=Tc)
        self._maybe_prewarm_execute(args, statics, Ac, Ktc, n_pool, cm,
                                    self.config.capacity, Kt,
                                    Tc, n_live_tiles, T_full)
        self.state, report = optimize.optimize_execute_donated(
            *args, **statics)
        return report

    def _prewarm_prepare(self, args, statics, next_L) -> None:
        """Background-compile the next row_limit bucket's prepare executable
        before the high-water mark crosses it."""
        key = ("prep", next_L, statics["mode"])
        if key in self._warmed_buckets:
            return
        self._warmed_buckets.add(key)
        specs = [self._aval_spec(a) for a in args]
        st = dict(statics, row_limit=next_L)

        def warm(specs=specs, st=st):
            try:
                optimize.optimize_prepare.lower(*specs, **st).compile()
            except Exception:       # pragma: no cover - warmup best-effort
                pass

        threading.Thread(target=warm, daemon=True,
                         name=f"prewarm-prep-{next_L}").start()

    def local_optimize(self, frame: Camera, opt):
        """Whole local pass (masks + loop + history merge) = 1 dispatch."""
        entries = []
        for rec in self.processed_frames:
            fm = rec["frame_map"]
            entries.append({
                "color": fm["color_map"], "depth": fm["depth_map"][..., 0],
                "normal": fm["normal_map_w"],
                "w2c": jnp.asarray(rec["cam_dev"]["w2c"]),
                "K": jnp.asarray(rec["cam_dev"]["K"]),
                "campos": jnp.asarray(rec["cam_dev"]["campos"]),
            })
        n_actual = len(entries)
        while len(entries) < self.memory_length:
            entries.append(entries[-1])

        n_iters = self.gaussian_update_iter
        _t0 = time_mod.perf_counter()
        if self.mesh is not None:
            # frame-parallel over the memory window: one memory frame per
            # device, pmean'd gradients — the #1 hot loop on the mesh
            # (parallel/sharded.py::dp_local_optimize)
            from ..parallel import dp_local_optimize

            n_dev = self.mesh.devices.size
            if len(entries) > n_dev:
                entries = entries[-n_dev:]      # newest frames win
            while len(entries) < n_dev:
                entries.append(entries[len(entries) % n_actual])
            self.state, total = dp_local_optimize(
                self.state, *self._stack_entries(entries[:n_dev]),
                n_iters, self._lrs(opt), self._weights(opt), self.settings,
                self.mesh,
                mask_depth_positive=(self.dataset_type == "Scannetpp"),
                max_weight=self.history_merge_max_weight)
            report = {"total": total}
        else:
            seq = self.rng.integers(0, n_actual, size=n_iters)
            seq[n_iters // 2 + 1:] = n_actual - 1  # late iters: newest frame
            if self.optimize_compact:
                report = self._optimize_compact(
                    entries, seq, n_iters, self._lrs(opt), self._weights(opt),
                    mode="local", sample_ratio=-1.0,
                    max_weight=self.history_merge_max_weight)
            else:
                self.state, report = optimize.optimize_chain_donated(
                    self.state, *self._stack_entries(entries),
                    jnp.asarray(seq, jnp.int32), n_iters,
                    self._lrs(opt), self._weights(opt), self.settings,
                    mode="local", sample_ratio=-1.0,
                    mask_depth_positive=(self.dataset_type == "Scannetpp"),
                    max_weight=self.history_merge_max_weight,
                    freeze_binning=self.freeze_binning)
        perf.count("map.local_optimize", time_mod.perf_counter() - _t0)
        if self.tb_writer is not None:
            self.train_report(self.get_total_iter,
                              {k: float(v) for k, v in report.items()})
        return report

    def global_optimization(self, opt, select_keyframe_num=-1, is_end=False):
        """Stable-map refinement over recent keyframes; final pass sweeps all
        keyframes with all gaussians fixed (mapper.py:594-712)."""
        is_final = select_keyframe_num == -1
        if is_final:
            self.state = map_ops.fix_all_donated(self.state)
            if self.get_stable_num == 0:     # exact count, once per run
                return None
        elif self._cached_stable_num() == 0:
            return None

        if is_final:
            lrs = self._lrs(opt, {
                "xyz": -1,
                "features_dc": self.feature_lr_coef,
                "features_rest": self.feature_lr_coef,
                "scaling": self.scaling_lr_coef,
                "rotation": self.rotation_lr_coef,
            })
            depth_weight = 0.0
            sample_ratio = -1.0
            select_keyframe_num = len(self.keyframe_list)
        else:
            lrs = self._lrs(opt, {k: 0.1 for k in
                                  ("features_dc", "features_rest", "opacity",
                                   "scaling", "rotation")})
            lrs["xyz"] = jnp.float32(0.0)
            depth_weight = None
            sample_ratio = float(getattr(self.args, "global_opt_top_ratio", 0.4))
        select_keyframe_num = min(select_keyframe_num, len(self.keyframe_list))

        weights = self._weights(opt, depth_weight=depth_weight)

        # newest-first keyframe selection (mapper.py:647-649)
        selected = [self.keyframe_list[-(i + 1)] for i in range(select_keyframe_num)]

        def make_entry(kf):
            m = kf["map"]
            cam_dev = kf["frame"].device_dict()
            return {
                "color": jnp.asarray(m["color_map"]),
                "depth": jnp.asarray(m["depth_map"])[..., 0],
                "normal": jnp.asarray(m["normal_map"]),
                "w2c": jnp.asarray(cam_dev["w2c"]),
                "K": jnp.asarray(cam_dev["K"]),
                "campos": jnp.asarray(cam_dev["campos"]),
            }

        report = None
        if not is_final:
            entries = [make_entry(kf) for kf in selected]
            n_actual = len(entries)
            _t0 = time_mod.perf_counter()
            if self.mesh is not None:
                # frame-parallel over the mesh: one keyframe per device,
                # pmean'd gradients (parallel/sharded.py)
                from ..parallel import dp_global_optimize

                n_dev = self.mesh.devices.size
                while len(entries) < n_dev:
                    entries.append(entries[len(entries) % n_actual])
                self.state, total = dp_global_optimize(
                    self.state, *self._stack_entries(entries[:n_dev]),
                    self.gaussian_update_iter, lrs, weights, self.settings,
                    self.mesh, sample_ratio=sample_ratio,
                    mask_depth_positive=(self.dataset_type == "Scannetpp"))
                report = {"total": total}
            else:
                while len(entries) < self.global_keyframe_num:
                    entries.append(entries[-1])
                n_iters = self.gaussian_update_iter
                seq = self.rng.integers(0, n_actual, size=n_iters)
                seq[n_iters // 2 + 1:] = n_actual - 1
                if self.optimize_compact:
                    report = self._optimize_compact(
                        entries, seq, n_iters, lrs, weights,
                        mode="global", sample_ratio=sample_ratio,
                        max_weight=0.0)
                else:
                    self.state, report = optimize.optimize_chain_donated(
                        self.state, *self._stack_entries(entries),
                        jnp.asarray(seq, jnp.int32), n_iters, lrs, weights,
                        self.settings, mode="global", sample_ratio=sample_ratio,
                        mask_depth_positive=(self.dataset_type == "Scannetpp"),
                        max_weight=0.0, freeze_binning=self.freeze_binning)
            perf.count("map.global_optimize", time_mod.perf_counter() - _t0)
        else:
            # final sweep: shuffled keyframes, a chunk of iterations each
            # (host-chunked so all keyframe maps never co-reside in HBM)
            order = self.rng.permutation(select_keyframe_num)
            for kf_idx in order:
                entry = make_entry(selected[int(kf_idx)])
                n_iters = self.final_global_iter
                seq = np.zeros(n_iters, np.int64)
                self.state, report = optimize.optimize_chain_donated(
                    self.state, *self._stack_entries([entry]),
                    jnp.asarray(seq, jnp.int32), n_iters, lrs, weights,
                    self.settings, mode="global", sample_ratio=-1.0,
                    mask_depth_positive=(self.dataset_type == "Scannetpp"),
                    max_weight=0.0, freeze_binning=self.freeze_binning)
        return report

    # ------------------------------------------------------------------
    # error-driven self-healing
    # ------------------------------------------------------------------
    def lifecycle(self):
        """fix -> error strikes -> unstable delete, fused WITH its render and
        the next frame's occupancy counters into one device call
        (mapper.py:123-126,510-591)."""
        if not self.processed_frames:
            self.state = map_ops.fix_confident(
                self.state, self.stable_confidence_thres)
            self.state = map_ops.delete_gaussians_donated(
                self.state, self.time, self.unstable_time_window, unstable=True)
            self._refresh_counters()
            return
        rec = self.processed_frames[-1]
        cd = rec["cam_dev"]
        fm = rec["frame_map"]
        _t0 = time_mod.perf_counter()
        self.state, out, self._hwm_dev, self._stable_dev = map_ops.lifecycle_chain_donated(
            self.state,
            jnp.asarray(cd["w2c"]), jnp.asarray(cd["K"]), jnp.asarray(cd["campos"]),
            fm["color_map"], fm["depth_map"],
            self.stable_confidence_thres, self.add_color_thres,
            self.add_depth_thres, self.time, self.unstable_time_window,
            self.config.capacity, self.settings)
        perf.count("map.lifecycle_chain", time_mod.perf_counter() - _t0)
        self._prefetch_counters()
        # recycle as this frame's model render (state differs only by the
        # gaussians the strike pass deleted/released)
        self._cache_render(out, (self.time, rec["camera"].uid))

    def _refresh_counters(self):
        self._hwm_dev, self._stable_dev = map_ops.map_counters(self.state)
        self._prefetch_counters()

    def _prefetch_counters(self):
        """Kick off the D2H of the occupancy scalars as soon as they're
        enqueued so the next frame's blocking ``int()`` finds them local
        (each synchronous fetch costs a full round trip on this link)."""
        for dev in (self._hwm_dev, self._stable_dev):
            try:
                dev.copy_to_host_async()
            except AttributeError:
                pass

    def _cache_render(self, out, key) -> None:
        """Stash this frame's lifecycle render + start the async D2H of its
        overflow counter (folded into ``max_overflow`` next frame)."""
        self._cached_render = out
        self._cached_render_key = key
        self._overflow_dev = out.get("overflow")
        if hasattr(self._overflow_dev, "copy_to_host_async"):
            self._overflow_dev.copy_to_host_async()

    def drain(self):
        """Block until this frame's mapping chain has executed (fetches one
        scalar already produced by lifecycle_chain).  Used by timing code so
        mapping compute is charged to the mapping stage instead of leaking
        into the next frame's tracking fetch."""
        if self._hwm_dev is not None:
            int(self._hwm_dev)

    # ------------------------------------------------------------------
    # top-level per-frame entry
    # ------------------------------------------------------------------
    def mapping(self, frame: Camera, frame_map: Dict, frame_id: int, opt) -> None:
        self._ensure_settings(frame)
        self.frame_map = frame_map
        optimize_frame = ((self.time + 1) % self.gaussian_update_frame == 0
                          or self.time == 0)
        if optimize_frame:
            self.prefetch_keyframe_maps(frame)
        if not optimize_frame:
            # no host decision between spawn and lifecycle on these frames:
            # run both as ONE device call (map_ops.frame_chain)
            self._mapping_fused_frame(frame)
            self.processed_frames.append({
                "camera": frame.drop_images(),
                "cam_dev": frame.device_dict(),
                "frame_map": frame_map,
            })
            return
        self.gaussians_add(frame)
        self.processed_frames.append({
            "camera": frame.drop_images(),
            "cam_dev": frame.device_dict(),
            "frame_map": frame_map,
        })

        self.optimize_frames_ids.append(frame_id)
        is_keyframe = self.check_keyframe(frame, frame_id)
        if self.dataset_type == "Scannetpp":
            self.local_optimize(frame, opt)
            if is_keyframe:
                self.global_optimization(
                    opt, select_keyframe_num=self.global_keyframe_num)
        else:
            if not is_keyframe or self._cached_stable_num() <= 0:
                self.local_optimize(frame, opt)
            else:
                self.global_optimization(
                    opt, select_keyframe_num=self.global_keyframe_num)
            self.state = map_ops.delete_gaussians_donated(
                self.state, self.time, self.unstable_time_window, unstable=False)

        self.lifecycle()

    # ------------------------------------------------------------------
    # checkpoints
    # ------------------------------------------------------------------
    def snapshot_host(self):
        """Host copy of both pools' PLY rows + the (time, iter) stamp.

        Taken on the mapping thread — the donated chains invalidate the live
        device buffers on the NEXT mapping step, so the copy cannot be
        deferred — and handed to the system drainer thread which writes the
        PLY trail without blocking mapping (the reference system process
        drains save-model requests the same way,
        multiprocess/system.py:57-87,108-146)."""
        return {"unstable": to_numpy_dict(self.state, UNSTABLE),
                "stable": to_numpy_dict(self.state, STABLE),
                "time": self.time, "iter": self.iter}

    def save_snapshot(self, snap, path=None, save_data=True, save_sibr=True,
                      save_merge=True):
        """Write one host snapshot as PLYs in the reference layout
        (``save_model/frame_*/iter_*[.ply|_stable.ply|_sibr.ply|_merge.ply]``,
        reference mapper.py:933-966)."""
        if path is None:
            frame_name = f"frame_{snap['time']:04d}"
            model_dir = os.path.join(self.save_path, "save_model", frame_name)
            os.makedirs(model_dir, exist_ok=True)
            path = os.path.join(model_dir, f"iter_{snap['iter']:04d}")

        def dump(pool, suffix, confidence):
            data = snap[pool]
            if data["xyz"].shape[0] == 0:
                return False
            ply_utils.save_gaussian_ply(
                path + suffix, data["xyz"], data["features_dc"],
                data["features_rest"], data["opacity"], data["scaling"],
                data["rotation"],
                data["confidence"] if confidence else None)
            return True

        has_u = has_s = False
        if save_data:
            has_u = dump("unstable", ".ply", True)
            has_s = dump("stable", "_stable.ply", True)
        if save_sibr:
            dump("unstable", "_sibr.ply", False)
            dump("stable", "_stable_sibr.ply", False)
        if has_u and has_s and save_merge:
            ply_utils.merge_gaussian_ply(
                path + ".ply", path + "_stable.ply", path + "_merge.ply")

    def save_model(self, path=None, save_data=True, save_sibr=True, save_merge=True):
        """PLY snapshots in the reference layout (mapper.py:933-966)."""
        self.save_snapshot(self.snapshot_host(), path=path,
                           save_data=save_data, save_sibr=save_sibr,
                           save_merge=save_merge)

    def load_model(self, ply_path: str):
        """Load a checkpoint into the stable pool (metric.py:154 contract)."""
        data = ply_utils.read_gaussian_ply(ply_path)
        from ..models.gaussian_map import load_numpy_dict
        self.state = load_numpy_dict(MapState.create(self.config), data, STABLE)
        self._refresh_counters()
