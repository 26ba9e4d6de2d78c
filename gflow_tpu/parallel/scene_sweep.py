"""Scene-parallel dataset sweeps: fit multiple sequences concurrently, one
per device (SURVEY 2.3: the reference's only multi-GPU story is bash loops
with CUDA_VISIBLE_DEVICES; here each sequence's compiled stages are pinned
to a mesh device with `jax.default_device` and the host loops run in
threads, overlapping IO/hull work with on-device optimization).
"""
from __future__ import annotations

import glob
import os
import threading
from concurrent.futures import ThreadPoolExecutor

import jax

from ..viz.colormap import print_color


def fit_scenes(scene_paths, fit_kwargs=None, devices=None, log_suffix="logs"):
    """Fit every sequence in `scene_paths` (each a <scene>/<scene> dir),
    round-robin over devices. Returns {scene: log_dir}."""
    from ..pipeline.fit_video import main as fit_main

    fit_kwargs = dict(fit_kwargs or {})
    devices = devices or jax.devices()
    results = {}
    lock = threading.Lock()

    def run(i, seq):
        dev = devices[i % len(devices)]
        name = os.path.basename(str(seq))
        print_color(f"[sweep] {name} -> {dev}")
        kwargs = dict(fit_kwargs)
        kwargs.setdefault("logs_suffix", str(seq) + f"_{log_suffix}")
        kwargs.setdefault("common_logs", True)
        with jax.default_device(dev):
            trainer = fit_main(sequence_path=seq, **kwargs)
        with lock:
            results[str(seq)] = trainer.dir

    with ThreadPoolExecutor(max_workers=len(devices)) as ex:
        futs = [ex.submit(run, i, s) for i, s in enumerate(scene_paths)]
        for f in futs:
            f.result()
    return results


def main(path: str, log_suffix: str = "logs", num_points: int = 50000,
         iterations_first: int = 500, iterations_camera: int = 150,
         iterations_after: int = 300, resize: int = 480):
    """Sweep a benchmark_multi-style dataset root (<root>/<scene>/<scene>)."""
    folders = sorted(glob.glob(os.path.join(path, "*")))
    scenes = [
        os.path.join(f, os.path.basename(f))
        for f in folders
        if os.path.isdir(os.path.join(f, os.path.basename(f)))
    ]
    if not scenes:
        raise FileNotFoundError(f"no <scene>/<scene> dirs under {path}")
    print_color(f"[sweep] {len(scenes)} scenes over {len(jax.devices())} devices")
    return fit_scenes(
        scenes,
        fit_kwargs=dict(
            num_points=num_points, iterations_first=iterations_first,
            camera_first=True, iterations_camera=iterations_camera,
            iterations_after=iterations_after, resize=resize,
            lambda_depth=0.1, lambda_var=50.0, lambda_flow=0.01,
            densify_interval=150, densify_times=2, traj_num=200,
        ),
        log_suffix=log_suffix,
    )
