"""Two-stage tracker/mapper pipeline (the reference's multi-process mode).

The reference (``slam_mp.py`` + ``SLAM/multiprocess/system.py``) runs the
tracker and mapper as separate CUDA processes bridged by
``torch.multiprocessing`` queues.  On TPU the natural equivalent is two host
*threads* over one device: jitted tracker and mapper steps are dispatched
asynchronously and overlap on the device queue, while map snapshots hand off
as device arrays with zero copies.  The three synchronization policies are
preserved (``system.py:19-24``, ``tracker.py:469-487``):

  strict  tracker blocks every ``sync_tracker2mapper_frames`` frames until
          the mapper catches up;
  loose   tracker may run ahead by at most that many frames;
  free    no synchronization.

``device_list`` (reference ``configs/base.yaml:3``, there a
``CUDA_VISIBLE_DEVICES`` selector) extends to true pipeline parallelism
over chips: with two entries the mapper runs on ``devices[device_list[0]]``
and the tracker on ``devices[device_list[1]]`` (reference rank order,
``system.py:49-54``), each thread pinning placement via
``jax.default_device``; the per-frame maps and the map snapshots are the
only arrays that cross chips (one ``device_put`` each way per frame — ICI
on a real slice).
"""

from __future__ import annotations

import os
import queue
import threading
import time
from typing import Optional

import jax
import numpy as np

from ..config.loader import GroupParams
from ..data import Dataset
from ..utils.monitor import Recorder
from .mapper import Mapper
from .tracker import Tracker


class SLAM:
    def __init__(self, args: GroupParams, dataset: Dataset,
                 optimization_params: GroupParams):
        self.args = args
        self.dataset = dataset
        self.optimization_params = optimization_params
        self.sync_method = args.sync_tracker2mapper_method
        self.sync_frames = int(args.sync_tracker2mapper_frames)
        self.tracker_max_fps = float(getattr(args, "tracker_max_fps", 30))

        self.recorder = Recorder(0)
        self.tracker = Tracker(args)
        self.mapper = Mapper(args, self.recorder)

        self._t2m: queue.Queue = queue.Queue()
        self._m2t: queue.Queue = queue.Queue()
        # mapper -> saver: host SoA snapshots drained to PLY mid-run (the
        # reference system process's save-model queue,
        # multiprocess/system.py:57-87)
        self._save_q: queue.Queue = queue.Queue()
        self._mapper_caught_up = threading.Condition()
        self._last_mapped_frame = -1
        self._errors: list = []
        self._track_settings = None

        # chip placement: mapper = device_list[0], tracker = device_list[1]
        # (single entry -> both share one device, the round-1 behavior)
        devs = jax.devices()
        dl = list(getattr(args, "device_list", None) or [0])
        self.mapper_device = devs[dl[0] % len(devs)]
        self.tracker_device = (devs[dl[1] % len(devs)]
                               if len(dl) > 1 else self.mapper_device)
        self.two_device = self.mapper_device != self.tracker_device

    # ------------------------------------------------------------------
    def _tracking_loop(self):
        with jax.default_device(self.tracker_device):
            self._tracking_loop_impl()

    def _tracking_loop_impl(self):
        try:
            infos = self.dataset.scene_info.train_cameras
            from ..config import DatasetParams
            from ..data.loader import FrameLoader

            dataset_params = DatasetParams().extract(self.args)
            min_frame_time = 1.0 / self.tracker_max_fps
            loader = FrameLoader(dataset_params, infos, prefetch=4)
            for frame_id, frame in enumerate(loader):
                start = time.time()
                frame_map = self.tracker.map_preprocess(frame, frame_id)
                self.tracker.tracking(frame, frame_map)
                self.recorder.update_mean("tracking", time.time() - start, 1)
                self._t2m.put((frame, frame_map, frame_id,
                               self.tracker.get_new_poses()))

                # sync policies (reference tracker.py:469-487)
                if self.sync_method == "strict":
                    if (frame_id + 1) % self.sync_frames == 0:
                        with self._mapper_caught_up:
                            while self._last_mapped_frame < frame_id:
                                self._mapper_caught_up.wait(timeout=30.0)
                elif self.sync_method == "loose":
                    with self._mapper_caught_up:
                        while frame_id - self._last_mapped_frame > self.sync_frames:
                            self._mapper_caught_up.wait(timeout=30.0)

                # consume the mapper's latest map snapshot and re-render it
                # at the TRACKER's current pose for frame-to-model ICP
                # (reference update_last_mapper_render, tracker.py:522-538)
                snapshot = None
                while not self._m2t.empty():
                    snapshot = self._m2t.get_nowait()
                if snapshot is not None:
                    from ..ops.rasterize import RasterSettings, render

                    if self.two_device:
                        # map snapshot crosses mapper -> tracker chip (ICI)
                        snapshot["gauss"] = jax.device_put(
                            snapshot["gauss"], self.tracker_device)

                    if self._track_settings is None:
                        self._track_settings = RasterSettings.from_args(
                            self.args, frame.image_height, frame.image_width)
                    out = render(snapshot["gauss"], frame.device_dict(),
                                 self._track_settings)
                    self.tracker.update_last_status(
                        frame, out["depth"], frame_map["depth_map"],
                        out["normal"], frame_map["normal_map_w"])

                elapsed = time.time() - start
                if elapsed < min_frame_time:
                    time.sleep(min_frame_time - elapsed)
            self._t2m.put(None)  # end sentinel (reference time == -1)
        except Exception as e:  # pragma: no cover - surfaced in run()
            self._errors.append(e)
            self._t2m.put(None)

    def _mapping_loop(self):
        with jax.default_device(self.mapper_device):
            self._mapping_loop_impl()

    def _mapping_loop_impl(self):
        try:
            while True:
                item = self._t2m.get()
                if item is None:
                    break
                frame, frame_map, frame_id, new_poses = item
                start = time.time()
                if self.two_device:
                    # per-frame maps cross tracker -> mapper chip (ICI)
                    frame_map = jax.device_put(frame_map, self.mapper_device)
                self.mapper.update_poses(new_poses)
                self.mapper.mapping(frame, frame_map, frame_id,
                                    self.optimization_params)
                # mid-run checkpoint + eval, same cadence as the
                # single-process loop (slam.py; reference system process
                # saves every save step during the run,
                # multiprocess/system.py:108-146).  The host snapshot is
                # taken HERE (the next donated chain invalidates the
                # buffers); the PLY writing drains on the saver thread; the
                # eval render also runs here — it reads the live state and
                # must not race the donated mapping chains.
                if (self.mapper.time + 1) % self.mapper.save_step == 0 \
                        or self.mapper.time == 0:
                    self._save_q.put(self.mapper.snapshot_host())
                    from .eval import eval_frame

                    metrics = eval_frame(
                        self.mapper, frame,
                        os.path.join(self.args.save_path, "eval_render"),
                        min_depth=self.args.min_depth,
                        max_depth=self.args.max_depth, save_picture=True)
                    print(f"[EVAL] frame {frame_id}: "
                          f"psnr {metrics['psnr']:.2f} "
                          f"depthL1 {metrics['depth_l1_cm']:.2f}cm")
                self.mapper.time += 1
                self.recorder.update_mean("mapping", time.time() - start, 1)
                # publish a detached map snapshot (device arrays are shared
                # zero-copy across threads — the reference ships tensors
                # through mp queues instead, mapper.py:1211-1220)
                from ..models.gaussian_map import alive_mask, render_inputs

                gauss = render_inputs(self.mapper.state,
                                      alive_mask(self.mapper.state))
                # render_inputs aliases state.xyz; the mapper's chains donate
                # the state (map_ops donated twins), which would invalidate
                # that buffer under the tracker — snapshot a private copy
                gauss["xyz"] = gauss["xyz"].copy()
                self._m2t.put({
                    "gauss": gauss,
                    "frame_id": frame_id,
                })
                with self._mapper_caught_up:
                    self._last_mapped_frame = frame_id
                    self._mapper_caught_up.notify_all()
            # final global optimization (reference mapper.py:1246)
            self.mapper.global_optimization(self.optimization_params, is_end=True)
        except Exception as e:  # pragma: no cover
            self._errors.append(e)
            with self._mapper_caught_up:
                self._last_mapped_frame = 10 ** 9
                self._mapper_caught_up.notify_all()

    def _saver_loop(self):
        """Drain mid-run snapshots to the reference PLY layout — the system
        process role in the reference (multiprocess/system.py:57-87): file
        I/O never blocks the mapping loop."""
        try:
            while True:
                snap = self._save_q.get()
                if snap is None:
                    break
                self.mapper.save_snapshot(snap)
        except Exception as e:  # pragma: no cover - surfaced in run()
            self._errors.append(e)

    # ------------------------------------------------------------------
    def run(self):
        if self.two_device:
            # the map SoA was created on the default device at construction;
            # commit it to the mapper's chip before the threads start
            self.mapper.state = jax.device_put(self.mapper.state,
                                               self.mapper_device)
        # Both loops jit-compile on their own thread; XLA's (LLVM's) compile
        # passes recurse deeply and have segfaulted by overflowing the
        # default pthread stack under the CPU backend (observed twice in
        # long suite runs, both with the stack parked in
        # backend_compile_and_load on this thread).  Give pipeline threads
        # an explicit 64 MiB stack; restore the default afterwards.
        prev_stack = threading.stack_size(64 * 1024 * 1024)
        try:
            mapper_thread = threading.Thread(target=self._mapping_loop, name="mapper")
            tracker_thread = threading.Thread(target=self._tracking_loop, name="tracker")
            saver_thread = threading.Thread(target=self._saver_loop, name="saver")
            saver_thread.start()     # stack_size applies at start()
            mapper_thread.start()
            tracker_thread.start()
        finally:
            threading.stack_size(prev_stack)
        tracker_thread.join()
        mapper_thread.join()
        self._save_q.put(None)      # drain remaining snapshots, then stop
        saver_thread.join()
        if self._errors:
            raise self._errors[0]

        self.mapper.save_model(save_data=True)
        ate = self.tracker.save_traj(self.args.save_path)
        fps = self.recorder.cal_fps()
        self.recorder.save(self.args.save_path)
        print(f"[LOG] ATE RMSE: {ate:.3f} cm  mapping FPS: {fps:.2f}")
        return ate, fps
