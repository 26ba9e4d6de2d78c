"""Quality benchmark: canonical-config fit of a 480p synthetic moving-object
scene + the FULL evaluation suite (PSNR/SSIM/LPIPS, TAP-Vid tracking,
J/F segmentation, ATE/RPE camera), with per-tile truncation telemetry.

Complements bench.py (which measures wall-clock only on a single-frame
image): this is the quality artifact VERDICT round-1 asked for. Writes
QUALITY_r{N}.json at the repo root.

Round 3: the synthetic scene has a MOVING ground-truth camera (translate +
yaw — ATE/RPE are non-vacuous, VERDICT r2 item 5) and a real occlusion
episode (background queries the square passes in front of, item 4); the
artifact records platform + a device-vs-host wall-clock phase breakdown
(item 6) and residual-transmittance truncation telemetry (item 3).

Usage: python scripts/bench_quality.py [--frames 6] [--out QUALITY_r03.json]
"""
import argparse
import glob
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=6)
    ap.add_argument("--points", type=int, default=50_000)
    ap.add_argument("--out", default="QUALITY_r04.json")
    ap.add_argument("--width", type=int, default=854)
    ap.add_argument("--height", type=int, default=480)
    ap.add_argument("--traj-num", type=int, default=100)
    args = ap.parse_args()

    # Persistent XLA compile cache (verified supported by the tunneled TPU
    # plugin): frame-0 + the K-escalation recompiles otherwise dominate a
    # short 6-frame run (first QUALITY_r04 capture: every full_stage call was
    # a fresh ~60-90 s compile on the 1-CPU host). A cache-warm run measures
    # steady state; the artifact records which one it was.
    cache_dir = os.environ.setdefault(
        "GFLOW_COMPILE_CACHE", "/tmp/gflow_quality_xla_cache")
    cache_warm = os.path.isdir(cache_dir) and len(os.listdir(cache_dir)) > 0

    from synth import make_sequence

    from gflow_tpu.pipeline import fit_video
    from gflow_tpu.eval import benchmark

    tmp = tempfile.mkdtemp(prefix="gflow_quality_")
    seq = make_sequence(tmp, n_frames=args.frames, W=args.width,
                        H=args.height, seed=0, texture_octaves=3,
                        moving_camera=True, occlusion_queries=True)

    t0 = time.time()
    # canonical config — scripts/fit_video.sh == reference fit_video.sh:15-48
    trainer = fit_video.main(
        num_points=args.points,
        sequence_path=seq,
        resize=None,                     # sequence is already target size
        lr=4e-3, lr_camera=0.0,
        iterations_first=500,
        lr_after=4e-3, iterations_after=300,
        camera_first=True, lr_camera_after=1e-3, iterations_camera=150,
        load_extr=False,
        densify_interval=150, densify_times=2, densify_occ_percent=0.5,
        densify_interval_after=100, densify_times_after=2,
        densify_err_thre=1e-2, densify_err_percent=1.0,
        lambda_rgb=1.0, lambda_depth=0.1, lambda_var=50.0,
        lambda_still=0.0, lambda_flow=0.01, lambda_scale=0.0,
        background="black",
        traj_num=args.traj_num, traj_offset=2,
        common_logs=False, logs_suffix="logs_cam_init_only",
    )
    fit_seconds = time.time() - t0
    sec_per_frame = fit_seconds / args.frames

    log_root = str(seq) + "_logs_cam_init_only"
    runs = sorted(
        p for p in glob.glob(os.path.join(log_root, "*"))
        if os.path.isdir(p) and not p.endswith("0_latest")
    )
    log_path = runs[-1]

    metrics = benchmark.main(
        log_path=log_path, sequence_path=str(seq), csv_name="metrics",
        eval_recon=True, eval_track=True, eval_seg=True,
        eval_camera_flag=True,
    )

    # telemetry from the fit run: truncation gauges + device/host phase split
    telemetry_path = os.path.join(log_path, "telemetry.json")
    tile_overflow = t_final = phases = platform = None
    k_escalations = final_k = None
    if os.path.exists(telemetry_path):
        with open(telemetry_path) as f:
            tel = json.load(f)
        tile_overflow = tel.get("tile_overflow_last")
        t_final = tel.get("t_final_overflow_last")
        platform = tel.get("platform")
        phases = tel.get("phases")
        k_escalations = tel.get("k_escalations")
        final_k = tel.get("final_max_per_tile")

    # Truncation error DIRECTLY, on the final fitted state of THIS scene
    # (VERDICT r3 item 3): render the last frame at the shipped config vs a
    # K=512 oracle (nearest-K keeps strictly more splats; the PSNR between
    # the two bounds what the per-tile truncation costs in image space).
    import dataclasses

    import numpy as np

    shipped = trainer.render_views(("rgb",))["rgb"]
    oracle_cfg = dataclasses.replace(trainer.render_config, max_per_tile=512)
    saved_cfg = trainer.render_config
    trainer.render_config = oracle_cfg
    try:
        oracle = trainer.render_views(("rgb",))["rgb"]
    finally:
        trainer.render_config = saved_cfg
    diff = np.asarray(shipped, np.float32) - np.asarray(oracle, np.float32)
    psnr_vs_oracle = float(-10 * np.log10(np.mean(diff ** 2) + 1e-12))

    out = {
        "config": {
            "W": args.width, "H": args.height, "frames": args.frames,
            "points": args.points,
            "iters": "500 first / 150 camera / 300 full (canonical)",
            "scene": "moving GT camera (translate+yaw) + occlusion episode",
        },
        "platform": platform,
        "compile_cache": {"dir": cache_dir, "warm_at_start": cache_warm},
        "sec_per_frame_incl_io": round(sec_per_frame, 3),
        # device init over the 1-CPU tunnel is pure environment variance
        # (measured 17 s / 154 s / 474 s across three otherwise-identical
        # runs on 2026-08-19) — report the fit rate with it excluded too so
        # runs remain comparable; incl_io stays the headline
        "sec_per_frame_excl_device_init": (
            round((fit_seconds - phases["host/init"]["sec"]) / args.frames, 3)
            if phases and "host/init" in phases else None),
        "wallclock_phases": phases,
        "tile_overflow_last_frame": tile_overflow,
        "t_final_overflow_last_frame": t_final,
        "k_escalations": k_escalations,
        "final_max_per_tile": final_k,
        "truncation_psnr_vs_k512_oracle": round(psnr_vs_oracle, 2),
        "metrics": {k: (None if v is None or isinstance(v, str) else float(v))
                    for k, v in metrics.items()},
    }
    # carry string annotations (e.g. LPIPS_note) through unchanged
    for k, v in metrics.items():
        if isinstance(v, str):
            out["metrics"][k] = v
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
