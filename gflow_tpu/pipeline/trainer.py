"""GFlowTrainer — the user-facing scene/optimization driver.

Capability parity with the reference's SimpleGaussian class
(gflow/trainer.py:17-955): same lifecycle (init from image -> per-frame
train stages -> post-stage still/move bookkeeping -> checkpoints), same
checkpoint payload, same log-directory layout (logs/<timestamp> +
"0_latest" link, trainer.py:89-112), same train() output surface.

The device-side work (rendering, losses, Adam, densification) lives in
gflow_tpu.opt.train_stage as one compiled loop; this class handles host-side
orchestration: IO, the concave-hull move segmentation, trajectory line sets,
and checkpointing.
"""
from __future__ import annotations

import functools
import os
import threading
from datetime import datetime
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from ..core.camera import (
    default_intrinsics,
    extr_to_pose,
    pose_to_extr,
)
from ..core.scene import activate_inv
from ..opt import (
    FrameState,
    LossWeights,
    Params,
    StageConfig,
    StageDynamics,
    Targets,
    init_frame_state,
    train_stage,
)
from ..opt.initialize import init_params_from_image
from ..ops.render import (RenderConfig, DEFAULT_CONFIG, render2img,
                          render2img_async, render_jit)
from ..ops.projection import project_gaussians
from ..utils.hull import FastConcaveHull2D
from ..viz.colormap import apply_float_colormap, print_color

BACKGROUNDS = {"black": 0.0, "white": 1.0, "cyan": 0.33}  # "cyan" is grey 0.33
                                                          # (trainer.py:33-34)


@functools.lru_cache(maxsize=32)
def _compiled_stage(cfg: StageConfig):
    """Module-level jit cache keyed on the static StageConfig only — an
    lru_cache on a *method* would key on (and pin alive) trainer instances
    with their full parameter arrays."""
    return jax.jit(functools.partial(train_stage, cfg=cfg))


@functools.lru_cache(maxsize=1)
def _compiled_world2pix():
    from ..core.camera import world2pix

    def go(points, intr, pose):
        return world2pix(points, intr, pose_to_extr(pose))

    return jax.jit(go)


@functools.lru_cache(maxsize=1)
def _compiled_gather_project():
    """Gather a fixed query subset of xyz AND project it, in ONE dispatch.

    The per-frame traj-eval path previously paid separate round trips for
    the gather, the projection, and an eager pose_to_extr chain — each
    eager op / device_get is a full tunnel round trip on this rig."""
    from ..core.camera import world2pix

    def go(xyz_all, idx, intr, pose):
        sel = jnp.take(xyz_all, idx, axis=0)
        uv, _ = world2pix(sel, intr, pose_to_extr(pose))
        return sel, uv

    return jax.jit(go)


@functools.lru_cache(maxsize=4)
def _compiled_traj_render(bg: float, W: int, H: int, point_num: int,
                          line_scale: float, point_scale: float,
                          config: RenderConfig, cap: int):
    """ONE dispatch for the per-frame trajectory overlay render.

    The padded line-set xyz/opacity/rgb ride along as call arguments
    (~110 KB total); the constant scale/rotation columns and the uint8
    quantization are built on device instead of being uploaded / chained
    as eager ops (render_traj_jit's host caller paid ~6 extra tunnel
    round trips per frame for them)."""
    from ..ops.render import render_traj

    def go(xyz_p, op_p, rgb_p, intr, pose, n_actual):
        scale = jnp.full((cap, 3), 1e-6, jnp.float32)
        rot = jnp.tile(jnp.asarray([1.0, 0.0, 0.0, 0.0], jnp.float32),
                       (cap, 1))
        img = render_traj(xyz_p, scale, rot, op_p, rgb_p, intr,
                          pose_to_extr(pose), bg, W, H, point_num,
                          line_scale, point_scale, config, n_actual)
        return (jnp.clip(img, 0.0, 1.0) * 255).astype(jnp.uint8)

    return jax.jit(go)


@functools.lru_cache(maxsize=16)
def _compiled_diag(bg: float, W: int, H: int, config: RenderConfig):
    """ONE fused, jit-cached dispatch for all post-stage diagnostic renders
    (reference trainer.py:627-697): full-scene rgb/center/depth_map_color
    plus the still-only and move-only subset views, activation included,
    quantized to uint8 on device.

    Replaces three separate render_jit dispatches plus eager activation and
    quantize op chains per saved stage — each eager op is a tunnel
    round-trip on this rig (QUALITY_r03: host/diag_renders 22.5 s +
    host/save_images 25.6 s over 9 calls, mostly dispatch latency). The
    projection/binning subgraphs of the three renders are identical, so XLA
    CSE shares them. Subset selection masks opacity exactly like the
    reference's array slicing selects rows (still i < last_num with
    still_mask; moving i < last_num without)."""
    from ..core.scene import activate
    from ..ops.render import render

    def go(params, state, intr):
        C = params.xyz.shape[0]
        alive = (jnp.arange(C) < state.n_alive)[:, None]
        scale = jnp.abs(params.scale)
        rotate = activate("rotate", params.rotate)
        opacity = activate("opacity", params.opacity) * alive
        rgb = activate("rgb", params.rgb)
        extr = pose_to_extr(params.pose)

        full = render(params.xyz, scale, rotate, opacity, rgb, intr, extr,
                      bg, W, H, ("rgb", "center", "depth_map_color"), config,
                      as_uint8=True)
        out = {"rgb": full["rgb"], "center": full["center"],
               "depth_map_color": full["depth_map_color"]}
        in_prev = jnp.arange(C) < state.last_num
        for name, sel in (("still", in_prev & state.still_mask),
                          ("move", in_prev & ~state.still_mask)):
            sub = render(params.xyz, scale, rotate, opacity * sel[:, None],
                         rgb, intr, extr, bg, W, H, ("rgb", "center"),
                         config, as_uint8=True)
            out[name + "_rgb"] = sub["rgb"]
            out[name + "_center"] = sub["center"]
        return out

    return jax.jit(go)


class _LazyFrames:
    """Sequence view over a stacked snapshot array whose device->host copy
    was started with copy_to_host_async.

    The frame-0 fit produces ~150 full-res uint8 snapshot maps (~185 MB);
    pulling them synchronously cost 17 s of tunnel time on the critical
    path (QUALITY_r05 host/snapshot_transfer). Their only consumers are
    the training-progress mp4s (encoded on the background writer thread)
    and the end-of-run sequence_optimize videos, so the transfer can
    stream behind the rest of the run. len()/bool() and single-element
    access are cheap (a device slice); iteration materializes the one
    stacked transfer, thread-safely, wherever it is first consumed.
    """

    def __init__(self, stack):
        self._stack = stack
        self._mat = None
        self._lock = threading.Lock()

    def __len__(self):
        return int(self._stack.shape[0])

    def __bool__(self):
        return len(self) > 0

    def _materialize(self):
        with self._lock:
            if self._mat is None:
                self._mat = list(np.asarray(self._stack))
            return self._mat

    def __getitem__(self, i):
        if self._mat is not None:
            return self._mat[i]
        return self._stack[i]

    def __iter__(self):
        return iter(self._materialize())


def _imwrite_np(path, arr):
    """Background-writer imwrite: materializes device arrays on the writer
    thread (their D2H copies were started with copy_to_host_async, so this
    blocks the writer, not the per-frame loop)."""
    import imageio.v2 as imageio

    imageio.imwrite(path, np.asarray(arr))


def _erode(mask_u8: np.ndarray, size: int = 20) -> np.ndarray:
    from scipy.ndimage import binary_erosion

    er = binary_erosion(mask_u8 > 0, structure=np.ones((size, size), bool))
    return (er * 255).astype(np.uint8)


class GFlowTrainer:
    def __init__(
        self,
        gt_image: np.ndarray,          # (H, W, 3) float [0, 1]
        gt_depth: np.ndarray | None = None,   # (H, W)
        gt_flow: np.ndarray | None = None,
        num_points: int = 100000,
        background: str = "black",
        sequence_path=None,
        logs_suffix: str = "_logs",
        common_logs: bool = True,
        capacity: int | None = None,
        render_config: RenderConfig | None = None,  # None: RenderConfig.for_scene
        seed: int = 0,
        make_logs: bool = True,
        rebin_every: int = 1,  # >1: amortize tile binning across iterations
                               # (opt/train.StageConfig.rebin_every)
    ):
        self.rebin_every = int(rebin_every)
        self.gt_image = np.asarray(gt_image, np.float32)
        self.gt_depth = None if gt_depth is None else np.asarray(gt_depth, np.float32)
        self.gt_flow = None if gt_flow is None else np.asarray(gt_flow, np.float32)
        self.num_points = int(num_points)
        self.H, self.W = self.gt_image.shape[:2]
        self.bg = BACKGROUNDS.get(background, 0.0)
        if render_config is None:
            render_config = RenderConfig.for_scene(self.W, self.H,
                                                   self.num_points,
                                                   image=self.gt_image)
        self.render_config = render_config
        self.rng = np.random.default_rng(seed)
        self.key = jax.random.PRNGKey(seed)

        if capacity is None:
            # num_points + 50% densification headroom, rounded up to 1024
            # lanes. Every capacity-shaped op (sort stream, projection, Adam)
            # scales with this, so tight-but-sufficient beats next-pow2
            # (131k for 50k points cost ~20% extra per iteration); densify
            # clamps to free slots and _grow_capacity re-pads on checkpoint
            # load if a sequence outgrows it.
            capacity = max(1024, -(-int(self.num_points * 1.5) // 1024) * 1024)
        self.capacity = capacity

        self.intr = default_intrinsics(self.W, self.H)

        # random init (replaced by init_gaussians_from_image on the real path;
        # reference does the same: trainer.py:79-86)
        C = capacity
        self.params = Params(
            xyz=jnp.asarray(self.rng.random((C, 3), np.float32) * 2 - 1),
            scale=jnp.asarray(self.rng.random((C, 3), np.float32)),
            rotate=jnp.asarray(_unit(self.rng.random((C, 4)).astype(np.float32))),
            opacity=jnp.full((C, 1), float(activate_inv("opacity", jnp.float32(0.99)))),
            rgb=jnp.asarray(self.rng.random((C, 3), np.float32)),
            pose=jnp.asarray([0, 0, 0, 1, 0, 0, 0], jnp.float32),
            depth_ab=jnp.asarray([1.0, 0.0], jnp.float32),
        )
        self.state = init_frame_state(capacity)._replace(
            n_alive=jnp.asarray(self.num_points if self.num_points <= C else C,
                                jnp.int32)
        )
        self.move_seg: np.ndarray | None = None
        self.move_seg_erode: np.ndarray | None = None
        self.propagate_seg: np.ndarray | None = None
        self.mask_prompt_pts: np.ndarray | None = None
        self._traj = None
        self._last_views = None  # last _compiled_diag render (one-shot reuse
                                 # by eval(); cleared by any state mutation)
        self.pose_list = None  # optional accumulated per-frame pose list —
                               # saved in checkpoints when set (reference
                               # trainer.py:265-266 saves it if present)
        self.telemetry = None  # optional utils.profiling.Telemetry — when
                               # set, train() attributes device vs host time
        self._last_num_host = 0  # host mirror of state.last_num (see train)
        self._dev_targets = {}  # name -> (host array ref, device copy):
                                # per-frame target uploads are cached so the
                                # camera + full stages of one frame share ONE
                                # ~10MB tunnel transfer, started eagerly at
                                # set_gt_* time (overlaps the previous
                                # frame's host phases)
        self.last_t_final = None  # residual-transmittance stats on
                                  # K-overflowing tiles (every full stage)
        # truncation guardrail (see train()): escalate max_per_tile when the
        # measured truncation leak exceeds this mean residual transmittance
        # on overflowing tiles; None disables
        self.k_escalate_threshold: float | None = 0.01
        self.k_escalate_max: int = 192
        self.k_escalations: list = []
        # frame-0 pre-seed: the first measured stage escalates at
        # k_preseed_fraction * threshold so borderline scenes pick the
        # policed K before any low-K steady variant is compiled
        self.k_preseed_fraction: float = 0.5
        self._k_seen_first_stage = False

        # log directory + "0_latest" link (trainer.py:89-112)
        self.dir = None
        if make_logs:
            now = datetime.now().strftime("%Y_%m_%d-%H_%M_%S")
            if common_logs:
                logs_path = logs_suffix if logs_suffix else "logs"
            else:
                logs_path = f"{sequence_path}_{logs_suffix}" if logs_suffix else f"{sequence_path}_logs"
            log_now = os.path.join(logs_path, now)
            os.makedirs(log_now, exist_ok=True)
            latest = os.path.join(logs_path, "0_latest")
            os.makedirs(latest, exist_ok=True)
            for e in Path(latest).iterdir():
                if e.is_symlink() or e.is_file():
                    e.unlink()
            os.symlink(os.path.abspath(log_now), os.path.join(latest, now))
            self.dir = log_now

    # ------------------------------------------------------------------
    # camera
    # ------------------------------------------------------------------

    def get_extr(self) -> jax.Array:
        return pose_to_extr(self.params.pose)

    def load_camera(self, focal=None, pp=None, extr=None, scale=None, show=False):
        """(reference: trainer.py:164-183)"""
        if focal is not None:
            self.intr = self.intr.at[:2].set(jnp.asarray([focal, focal]))
        if pp is not None:
            self.intr = self.intr.at[2:].set(jnp.asarray(pp, jnp.float32))
        if extr is not None:
            extr = np.asarray(extr, np.float32)
            t = extr[:3, 3] * (scale if scale is not None else 1.0)
            pose = np.concatenate(
                [np.asarray(extr_to_pose(jnp.asarray(extr)))[:4], t]
            )
            self.params = self.params._replace(pose=jnp.asarray(pose, jnp.float32))
            self._last_views = None  # cached diag render is view-stale
        if show:
            print_color(f"[camera] intr: {np.asarray(self.intr)}")
            print_color(f"[camera] extr:\n{np.asarray(self.get_extr())}")

    # ------------------------------------------------------------------
    # init / gt setters
    # ------------------------------------------------------------------

    def _dev_target(self, name: str, src, transform):
        """Device copy of a per-frame target, cached on the HOST array's
        identity (the host ref is held so `is` stays sound). jax.device_put
        is async — calling this from set_gt_* starts the tunnel transfer
        while the host is still doing the previous frame's work."""
        cached = self._dev_targets.get(name)
        if cached is not None and cached[0] is src:
            return cached[1]
        dev = jax.device_put(transform(src))
        self._dev_targets[name] = (src, dev)
        return dev

    def set_gt_image(self, img):
        self.gt_image = np.asarray(img, np.float32)
        self._dev_target("image", self.gt_image, lambda x: x)

    def set_gt_depth(self, d):
        self.gt_depth = np.asarray(d, np.float32).reshape(self.H, self.W)
        self._dev_target("depth", self.gt_depth, lambda x: x[..., None])

    def set_gt_flow(self, f):
        self.gt_flow = np.asarray(f, np.float32)
        self._dev_target("flow", self.gt_flow, lambda x: x[..., :2])

    def init_gaussians_from_image(self, gt_image=None, gt_depth=None,
                                  num_points=None, mask=None, drop_to=None):
        """(reference: trainer.py:206-238)"""
        img = self.gt_image if gt_image is None else np.asarray(gt_image, np.float32)
        depth = self.gt_depth if gt_depth is None else np.asarray(gt_depth, np.float32)
        depth = depth.reshape(self.H, self.W)
        self.gt_depth = depth
        n_pts = num_points or self.num_points
        new_params, n = init_params_from_image(
            img, depth, n_pts, self.capacity, np.asarray(self.intr),
            np.asarray(self.get_extr()), mask=mask, drop_to=drop_to,
            rng=self.rng,
        )
        self.params = new_params._replace(pose=self.params.pose,
                                          depth_ab=self.params.depth_ab)
        self.state = self.state._replace(n_alive=jnp.asarray(n, jnp.int32))
        self._last_views = None
        xyz = np.asarray(self.params.xyz[:n])
        print_color(
            f"[init] n={n} x range ({xyz[:,0].min():.3f},{xyz[:,0].max():.3f}) "
            f"y ({xyz[:,1].min():.3f},{xyz[:,1].max():.3f}) "
            f"z ({xyz[:,2].min():.3f},{xyz[:,2].max():.3f})"
        )

    def current_pts_num(self) -> int:
        return int(self.state.n_alive)

    def get_attribute(self, name: str) -> jax.Array:
        from ..core.scene import activate

        raw = getattr(self.params, name)
        if name == "opacity":
            alive = (jnp.arange(self.capacity) < self.state.n_alive)[:, None]
            return activate(name, raw) * alive
        return activate(name, raw)

    # ------------------------------------------------------------------
    # train
    # ------------------------------------------------------------------

    def _targets(self, move_mask=None, occ_mask=None) -> Targets:
        H, W = self.H, self.W
        # big per-frame maps ride the identity-keyed device cache — one
        # upload per frame, shared by the camera and full stages (the None
        # fallbacks key on the sentinel string so zeros upload once ever)
        if self.gt_flow is not None:
            flow = self._dev_target("flow", self.gt_flow, lambda x: x[..., :2])
        else:
            flow = self._dev_target(
                "flow", "zeros", lambda _: np.zeros((H, W, 2), np.float32))
        if self.gt_depth is not None:
            depth = self._dev_target("depth", self.gt_depth,
                                     lambda x: x[..., None])
        else:
            depth = self._dev_target(
                "depth", "ones", lambda _: np.ones((H, W, 1), np.float32))
        mm = np.zeros((H, W), bool) if move_mask is None else np.asarray(move_mask) > 0
        om = np.zeros((H, W), bool) if occ_mask is None else np.asarray(occ_mask) > 0
        return Targets(
            image=self._dev_target("image", self.gt_image, lambda x: x),
            depth=depth,
            flow=flow,
            move_mask=jnp.asarray(mm),
            occ_mask=jnp.asarray(om),
        )

    def _stage_fn(self, cfg: StageConfig):
        return _compiled_stage(cfg)

    def train(
        self,
        iterations=500,
        lr=1e-2,
        lr_camera=0.0,
        lambda_rgb=1.0,
        lambda_depth=0.0,
        lambda_flow=0.0,
        lambda_var=0.0,
        lambda_still=0.0,
        lambda_scale=0.0,
        save_imgs=False,
        save_videos=False,
        save_ckpt=False,
        move_mask=None,
        ckpt_name="ckpt",
        densify_interval=0,
        densify_times=1,
        mask=None,
        camera_only=False,
        densify_occ_percent=0.1,
        densify_err_thre=1e-2,
        densify_err_percent=0.2,
        max_densify=None,
    ):
        """One optimization stage (reference: trainer.py:332-711). Returns a
        dict: frames/frames_center/frames_depth (training snapshots, empty
        unless save_videos), still/move renders, move_seg."""
        # host mirror of state.last_num — updated from every stage's batched
        # pull and at checkpoint load; saves a blocking scalar round trip
        # per train() call over the tunnel
        has_last = self._last_num_host > 0
        cfg = StageConfig(
            W=self.W,
            H=self.H,
            iterations=int(iterations),
            camera_only=bool(camera_only),
            propagate=bool(has_last and not camera_only),
            densify_interval=int(densify_interval or 0),
            densify_times=int(densify_times),
            densify_occ=bool(has_last and not camera_only and mask is not None),
            max_densify=int(max_densify or min(self.capacity, 16384)),
            bg=self.bg,
            render=self.render_config,
            snapshot_every=10 if save_videos else 0,
            rebin_every=self.rebin_every,
            # residual-transmittance stats on K-overflowing tiles (one extra
            # feature channel on the post-loop diagnostic forward only) —
            # always on for full stages: they feed both telemetry and the
            # K-escalation guardrail below
            telemetry_t_final=not camera_only,
        )
        dyn = StageDynamics.make(
            lr=lr, lr_camera=lr_camera,
            weights=LossWeights.make(
                rgb=lambda_rgb, depth=lambda_depth, var=lambda_var,
                scale=lambda_scale, still=lambda_still, flow=lambda_flow,
            ),
            num_points=self.num_points,
            densify_occ_percent=densify_occ_percent,
            densify_err_thre=densify_err_thre,
            densify_err_percent=densify_err_percent,
        )
        targets = self._targets(move_mask=move_mask, occ_mask=mask)
        self.key, sub = jax.random.split(self.key)
        fn = self._stage_fn(cfg)

        import contextlib

        tel = self.telemetry
        phase = tel.phase if tel is not None else (
            lambda name: contextlib.nullcontext())

        with phase("device/stage"):
            self.params, self.state, info = fn(
                self.params, self.state, targets, self.intr, sub, dyn=dyn
            )
            # ONE batched device_get for every host consumer of this stage's
            # results: telemetry scalars, the loss-metric dict, and the
            # hull-segmentation inputs. Sequential float()/int() pulls pay a
            # tunnel round trip EACH (~0.1-0.2 s here) — the scalar pulls
            # alone were ~1 s/stage of the QUALITY_r05 overhead above pure
            # iteration time (STAGE_COST_r05.json finding 3). The get also
            # blocks until the stage finishes, attributing device time to
            # this phase.
            pull = {
                "tile_overflow": info.get("tile_overflow", 0.0),
                "metrics": info["metrics"],
                "last_num": self.state.last_num,
            }
            if "t_final_overflow_mean" in info:
                pull["t_final_mean"] = info["t_final_overflow_mean"]
                pull["t_final_max"] = info["t_final_overflow_max"]
            if not camera_only:
                pull["uv"] = info["uv"]
                pull["n_alive"] = info["n_alive"]
                pull["still_mask"] = self.state.still_mask
            pulled = jax.device_get(pull)
        self._last_info = info
        self.last_tile_overflow = float(pulled["tile_overflow"])
        if "t_final_mean" in pulled:
            self.last_t_final = {
                "mean": float(pulled["t_final_mean"]),
                "max": float(pulled["t_final_max"]),
            }
            # K-escalation guardrail: the depth-sorted nearest-K truncation
            # is only safe while the residual transmittance on overflowing
            # tiles stays negligible (the dropped farther splats can shift a
            # pixel by at most T_final). The scene-adaptive K=96 default was
            # validated on a static probe; on moving-camera scenes the leak
            # can grow (QUALITY_r03: mean 0.0285). When the end-of-stage
            # mean exceeds the threshold, bump K for subsequent stages
            # (bounded; one recompile per step). msplat has no truncation at
            # all (reference gflow/utils/render.py:52-54) — this keeps the
            # static-shape design honest about matching that.
            # Pre-seed on the FIRST measured stage (frame 0's fit): use a
            # halved threshold so a borderline scene jumps to the policed K
            # *before* any steady-state stage variant is compiled at the low
            # K — the escalated variants are then the only ones ever built,
            # instead of paying both ramps (QUALITY_r04 paid a K=96 AND a
            # K=192 compile of every steady variant). K=192 costs ~1.5x
            # K=96 per iter (K_PERF.json), so the margin is 0.5x, not 0.
            thr = self.k_escalate_threshold
            preseed = thr is not None and not self._k_seen_first_stage
            self._k_seen_first_stage = True
            if preseed:
                thr = thr * self.k_preseed_fraction
            if (thr is not None
                    and self.last_t_final["mean"] > thr
                    and self.render_config.max_per_tile < self.k_escalate_max):
                import dataclasses

                # jump straight to the policed max: the measured leak almost
                # always means the scene's splat stacks are deep everywhere,
                # and each intermediate rung is a full stage recompile
                # (QUALITY_r04 paid three: 128->160->192). One recompile per
                # sequence; K_PERF measures the per-K stage cost and
                # K_QUALITY shows K beyond the leak point is pure headroom
                # (truncation PSNR vs the K=512 oracle stays > 40 dB).
                new_k = self.k_escalate_max
                print_color(
                    f"\t[render] t_final on overflow tiles "
                    f"{self.last_t_final['mean']:.4f} > {thr}"
                    f"{' (frame-0 pre-seed)' if preseed else ''}"
                    f" — escalating max_per_tile "
                    f"{self.render_config.max_per_tile} -> {new_k}",
                    color="yellow")
                self.render_config = dataclasses.replace(
                    self.render_config, max_per_tile=new_k)
                self.k_escalations.append(
                    {"ckpt": ckpt_name, "to_k": new_k, "preseed": preseed,
                     "t_final_mean": self.last_t_final["mean"]})

        out = {
            "frames": [],
            "frames_center": [],
            "frames_depth": [],
            "still_rgb": None,
            "still_center": None,
            "move_rgb": None,
            "move_center": None,
            "metrics": {k: float(v) for k, v in pulled["metrics"].items()},
        }
        if "snapshots" in info:
            # snapshots arrive as device-quantized uint8 (incl. the turbo
            # depth colormap); kick off the D2H copy now and let it stream
            # behind subsequent compute — consumers (video mux on the
            # background writer thread, end-of-run finalize) materialize
            # the finished transfer via _LazyFrames
            snaps = info["snapshots"]
            with phase("host/snapshot_transfer"):
                for leaf in jax.tree_util.tree_leaves(snaps):
                    leaf.copy_to_host_async()
            out["frames"] = _LazyFrames(snaps["rgb"])
            out["frames_center"] = _LazyFrames(snaps["center"])
            out["frames_depth"] = _LazyFrames(snaps["depth_map"])

        # ---- post-update host work: move segmentation via concave hull
        # (trainer.py:604-609) ----
        if not camera_only:
            with phase("host/hull_seg"):
                # inputs rode the stage's single batched device_get
                uv, n, still = (pulled["uv"], int(pulled["n_alive"]),
                                pulled["still_mask"])
                within = (
                    (uv[:, 0] > 0) & (uv[:, 0] < self.W - 1)
                    & (uv[:, 1] > 0) & (uv[:, 1] < self.H - 1)
                )
                within[n:] = False
                moving = within & ~still
                ratio = still[:n].sum() / max(n, 1)
                print_color(f"\t[still] mask ratio is {ratio:.4f}")
                if moving.sum() > 5:
                    hull = FastConcaveHull2D(uv[moving])
                    self.move_seg = (hull.mask(self.W, self.H) * 255).astype(np.uint8)
                    self.move_seg_erode = _erode(self.move_seg, 20)
                if self.mask_prompt_pts is not None:
                    sel = np.zeros(len(uv), bool)
                    m = self.mask_prompt_pts
                    sel[: len(m)] = m
                    sel &= within
                    if sel.sum() > 4:
                        hull = FastConcaveHull2D(uv[sel])
                        self.propagate_seg = (hull.mask(self.W, self.H) * 255).astype(np.uint8)

        # ---- diagnostic renders + still/move decomposition (trainer.py:627-697)
        out["last_rgb"] = render2img_async(info["rgb"])
        # ONE fused device dispatch renders the full views AND the still/move
        # subsets; uint8 leaves the chip (see _compiled_diag)
        subsets = None
        views = None
        last_num = self._last_num_host = int(pulled["last_num"])
        if (save_imgs and self.dir) or last_num > 0:
            with phase("host/diag_renders"):
                d = _compiled_diag(self.bg, self.W, self.H,
                                   self.render_config)(
                    self.params, self.state, self.intr)
                # ~8.6 MB of uint8 maps over an ~11 MB/s tunnel: start the
                # copies (rgb first — eval()'s traj overlay consumes it
                # within this frame) and let them stream behind the rest of
                # the frame; consumers (background PNG writer, traj eval,
                # finalize) materialize the finished transfers
                d["rgb"].copy_to_host_async()
                for leaf in jax.tree_util.tree_leaves(d):
                    leaf.copy_to_host_async()
                views = d
                self._last_views = views  # eval() reuses this render
            if last_num > 0:
                subsets = ((views["still_rgb"], views["still_center"]),
                           (views["move_rgb"], views["move_center"]))
        if save_imgs and self.dir:
            with phase("host/save_images"):
                self._save_stage_images(views, ckpt_name, subsets=subsets)
        if save_videos and self.dir and out["frames"]:
            from ..viz.video import save_video
            from ..utils.bgwriter import get_writer

            with phase("host/video_mux"):
                # PNG/video encoding happens on the background writer thread
                # (one CPU core here — encoding on the critical path blocked
                # the next frame's device dispatch)
                w = get_writer()
                for nm, fr in [("training_rgb", out["frames"]),
                               ("training_center", out["frames_center"]),
                               ("training_depth", out["frames_depth"])]:
                    w.submit(save_video,
                             os.path.join(self.dir, f"{nm}.mp4"), fr, 30)
        if save_ckpt:
            with phase("host/checkpoint"):
                self.save_checkpoint(ckpt_name=ckpt_name)

        out["move_seg"] = self.move_seg
        if subsets is not None:
            (out["still_rgb"], out["still_center"]) = subsets[0]
            (out["move_rgb"], out["move_center"]) = subsets[1]
        return out

    # ------------------------------------------------------------------
    # rendering helpers
    # ------------------------------------------------------------------

    def _activated(self):
        from ..core.scene import activate

        alive = (jnp.arange(self.capacity) < self.state.n_alive)[:, None]
        return (
            self.params.xyz,
            jnp.abs(self.params.scale),
            activate("rotate", self.params.rotate),
            activate("opacity", self.params.opacity) * alive,
            activate("rgb", self.params.rgb),
        )

    def render_views(self, outputs=("rgb", "center", "depth_map_color"),
                     as_uint8=False):
        xyz, scale, rotate, opacity, rgb = self._activated()
        return render_jit(
            xyz, scale, rotate, opacity, rgb, self.intr, self.get_extr(),
            self.bg, self.W, self.H, outputs, self.render_config,
            as_uint8=as_uint8,
        )

    def _save_stage_images(self, views, ckpt_name, subsets=None):
        """Queue the stage's diagnostic PNGs on the background writer —
        pixels come pre-rendered (one _compiled_diag dispatch) with their
        D2H copies already streaming, so this costs one enqueue per file;
        the writer thread materializes each finished transfer."""
        from ..utils.bgwriter import get_writer

        w = get_writer()
        img_dir = os.path.join(self.dir, "images")
        os.makedirs(img_dir, exist_ok=True)
        w.submit(_imwrite_np,
                 os.path.join(img_dir, f"img_{ckpt_name}.png"), views["rgb"])
        w.submit(_imwrite_np,
                 os.path.join(img_dir, f"img_center_{ckpt_name}.png"),
                 views["center"])
        w.submit(_imwrite_np,
                 os.path.join(img_dir, f"img_depth_{ckpt_name}.png"),
                 views["depth_map_color"])
        if subsets is not None:
            (srgb, scen), (mrgb, mcen) = subsets
            for nm, arr in (("still", srgb), ("still_center", scen),
                            ("move", mrgb), ("move_center", mcen)):
                w.submit(_imwrite_np,
                         os.path.join(img_dir, f"img_{nm}_{ckpt_name}.png"),
                         arr)
        seg_dir = os.path.join(self.dir, "images_seg")
        for nm, arr in (("move_mask", self.move_seg),
                        ("move_mask_erode", self.move_seg_erode),
                        ("propagate_mask", self.propagate_seg)):
            if arr is not None:
                os.makedirs(seg_dir, exist_ok=True)
                w.submit(_imwrite_np,
                         os.path.join(seg_dir, f"{nm}_{ckpt_name}.png"),
                         arr.copy())

    def flush_io(self):
        """Drain the background diagnostic-image/video writer. fit_video
        calls this once at end of run; direct GFlowTrainer users should call
        it before reading the files train() queued (an atexit hook also
        drains at interpreter exit, surfacing any deferred write errors)."""
        from ..utils.bgwriter import flush_writes

        flush_writes()

    def project_points(self, points):
        # jitted: eager world2pix dispatches ~10 ops through the device
        # tunnel per call, and this sits on the per-frame traj-eval path
        return _compiled_world2pix()(jnp.asarray(points), self.intr,
                                     self.params.pose)

    def gather_xyz(self, index) -> np.ndarray:
        """Current positions of a fixed query subset, gathered ON DEVICE.

        `np.asarray(self.params.xyz)[index]` pulls the full capacity-shaped
        array (65k x 3 floats) through the device tunnel just to keep ~100
        rows; on the per-frame traj-eval path that was two ~0.8 MB transfers
        per frame. The gather runs on device and only the selected rows
        leave the chip. The index array is uploaded once and cached (the
        traj query set is fixed for the whole sequence)."""
        index = np.asarray(index, np.int32)
        key = index.tobytes()
        if getattr(self, "_gather_idx_key", None) != key:
            self._gather_idx_key = key
            self._gather_idx_dev = jnp.asarray(index)
        return np.asarray(self.params.xyz[self._gather_idx_dev])

    def gather_project(self, index):
        """(xyz, uv) of a fixed query subset — one fused dispatch, one
        transfer (see _compiled_gather_project). Index upload cached as in
        gather_xyz."""
        index = np.asarray(index, np.int32)
        key = index.tobytes()
        if getattr(self, "_gather_idx_key", None) != key:
            self._gather_idx_key = key
            self._gather_idx_dev = jnp.asarray(index)
        sel, uv = jax.device_get(_compiled_gather_project()(
            self.params.xyz, self._gather_idx_dev, self.intr,
            self.params.pose))
        return sel, uv

    # ------------------------------------------------------------------
    # mask-prompt propagation (reference: trainer.py:290-330)
    # ------------------------------------------------------------------

    def init_mask_prompt_pts(self, mask_prompt: np.ndarray, ckpt_name: str):
        uv, _ = self.project_points(np.asarray(self.params.xyz))
        uv = np.asarray(uv)
        n = int(self.state.n_alive)
        within = (
            (uv[:, 0] > 0) & (uv[:, 0] < self.W - 1)
            & (uv[:, 1] > 0) & (uv[:, 1] < self.H - 1)
        )
        within[n:] = False
        sel = np.zeros(len(uv), bool)
        xi = np.clip(uv[:, 0].astype(int), 0, self.W - 1)
        yi = np.clip(uv[:, 1].astype(int), 0, self.H - 1)
        sel[within] = np.asarray(mask_prompt)[yi[within], xi[within]] > 0
        self.mask_prompt_pts = sel
        if self.dir:
            import imageio.v2 as imageio

            seg_dir = os.path.join(self.dir, "images_seg")
            os.makedirs(seg_dir, exist_ok=True)
            imageio.imwrite(
                os.path.join(seg_dir, f"propagate_mask_{ckpt_name}.png"),
                (np.asarray(mask_prompt) > 0).astype(np.uint8) * 255,
            )

    # ------------------------------------------------------------------
    # checkpoints (reference: trainer.py:252-288; npz instead of torch .tar)
    # ------------------------------------------------------------------

    def _grow_capacity(self, new_capacity: int):
        """Re-pad every capacity-shaped array (params attrs + frame state) to
        a larger capacity. Triggers one recompile per new capacity."""
        if new_capacity <= self.capacity:
            return
        old = self.capacity

        def pad_arr(x, fill):
            x = np.asarray(x)
            out = np.full((new_capacity,) + x.shape[1:], fill, x.dtype)
            out[:old] = x
            return jnp.asarray(out)

        self.params = self.params._replace(
            xyz=pad_arr(self.params.xyz, 0.0),
            scale=pad_arr(self.params.scale, 1e-8),
            rotate=pad_arr(self.params.rotate, 0.5),
            opacity=pad_arr(self.params.opacity, -10.0),
            rgb=pad_arr(self.params.rgb, 0.0),
        )
        self.state = self.state._replace(
            still_mask=pad_arr(self.state.still_mask, True),
            still_mask_tentative=pad_arr(self.state.still_mask_tentative, True),
            last_uv=pad_arr(self.state.last_uv, 0.0),
            last_depth=pad_arr(self.state.last_depth, 0.0),
            last_xyz=pad_arr(self.state.last_xyz, 0.0),
        )
        if self.mask_prompt_pts is not None:
            self.mask_prompt_pts = np.concatenate(
                [self.mask_prompt_pts,
                 np.zeros(new_capacity - old, bool)]
            )
        self.capacity = new_capacity

    def save_checkpoint(self, ckpt_name="ckpt"):
        os.makedirs(os.path.join(self.dir, "ckpt"), exist_ok=True)
        path = os.path.join(self.dir, "ckpt", f"{ckpt_name}.npz")
        # ONE batched device_get of the FULL capacity-shaped arrays, sliced
        # on host: per-array np.asarray costs a full tunnel round-trip each,
        # and device-side [:n] slices recompile for every new n — densify
        # changes n every frame, so that was one fresh XLA compile per frame
        # per array. Full capacity is ~3 MB; the slice is free on host.
        # n_alive rides the same batch (a separate int() was one extra
        # blocking round-trip per checkpoint).
        pulled = jax.device_get({
            "n_alive": self.state.n_alive,
            "xyz": self.params.xyz,
            "scale": self.params.scale,
            "rotate": self.params.rotate,
            "opacity": self.params.opacity,
            "rgb": self.params.rgb,
            "intr": self.intr,
            "extr": self.get_extr(),
            "still_mask": self.state.still_mask,
            "last_uv": self.state.last_uv,
        })
        n = int(pulled.pop("n_alive"))
        for k in ("xyz", "scale", "rotate", "opacity", "rgb",
                  "still_mask", "last_uv"):
            pulled[k] = pulled[k][:n]
        extras = {}
        if self.pose_list is not None:
            # optional accumulated pose list (reference trainer.py:265-266)
            extras["pose_list"] = np.asarray(self.pose_list, np.float32)
        # uncompressed: zlib of the ~12MB payload costs ~4s per frame on a
        # 1-CPU host (measured in the QUALITY phase split) for a ~30%
        # size win; the reference's torch.save is uncompressed too
        np.savez(
            path,
            move_seg=self.move_seg if self.move_seg is not None else np.zeros(0),
            width=self.W,
            height=self.H,
            **extras,
            **pulled,
        )
        self.checkpoint_path = path

    def load_checkpoint(self, path, show=False):
        d = np.load(path, allow_pickle=False)
        n = d["xyz"].shape[0]
        if n > self.capacity:
            # Real runs (50k pts + densification) routinely exceed the shell
            # trainer's default capacity (reference reloads into a fresh
            # SimpleGaussian the same way: gflow/benchmark.py:75,96-97) —
            # grow to the next power of two and rebuild capacity-shaped
            # arrays before padding below.
            self._grow_capacity(1 << int(np.ceil(np.log2(n))))

        def pad(x, fill=0.0):
            out = np.full((self.capacity,) + x.shape[1:], fill, np.float32)
            out[:n] = x
            return jnp.asarray(out)

        self.params = self.params._replace(
            xyz=pad(d["xyz"]),
            scale=pad(d["scale"], 1e-8),
            rotate=pad(d["rotate"], 0.5),
            opacity=pad(d["opacity"], -10.0),
            rgb=pad(d["rgb"]),
        )
        self.intr = jnp.asarray(d["intr"])
        self.load_camera(extr=d["extr"], show=show)
        still = np.ones(self.capacity, bool)
        still[:n] = d["still_mask"]
        lu = np.zeros((self.capacity, 2), np.float32)
        lu[:n] = d["last_uv"]
        self.state = self.state._replace(
            n_alive=jnp.asarray(n, jnp.int32),
            last_num=jnp.asarray(n, jnp.int32),
            still_mask=jnp.asarray(still),
            last_uv=jnp.asarray(lu),
        )
        self._last_num_host = n
        if d["move_seg"].size:
            self.move_seg = d["move_seg"]
        if "pose_list" in d:
            self.pose_list = list(d["pose_list"])
        self._last_views = None

    # ------------------------------------------------------------------
    # trajectory eval (reference: trainer.py:713-811)
    # ------------------------------------------------------------------

    def eval(self, traj_index, line_scale=0.1, point_scale=0.3, alpha=0.5,
             split_interval=None, need_center_depth=True,
             return_query_uv=False):
        traj_index = np.asarray(traj_index, int)
        num_traj = len(traj_index)
        # one fused gather+project dispatch; uv is also what fit_video's
        # traj bookkeeping records, so return it on request instead of
        # paying a second gather+projection round trip after eval
        xyz_now, uv_now = self.gather_project(traj_index)

        if self._traj is None:
            # exact-count ramps: np.arange(0, 1, 1/n) emits n+1 elements for
            # some n due to float step rounding, desyncing rgb from xyz
            if split_interval is None or num_traj == split_interval:
                ramp = (np.arange(num_traj, dtype=np.float32)
                        / num_traj)[:, None]
            else:
                n2 = num_traj - split_interval
                r1 = np.arange(split_interval, dtype=np.float32) / split_interval
                r2 = np.arange(n2, dtype=np.float32) / n2
                ramp = np.concatenate([r1, r2])[:, None]
            rgb = np.asarray(
                apply_float_colormap(jnp.asarray(ramp), colormap="gist_rainbow")
            )
            self._traj = {
                "xyz": xyz_now.copy(),
                "opacity": np.full((num_traj, 1), 0.99, np.float32),
                "rgb": rgb,
                "last_xyz": xyz_now.copy(),
                "last_rgb": rgb.copy(),
            }
            # FIXED line-set capacity (sized properly at the first append,
            # when the per-frame growth is known) + a lean frozen render
            # config: the round-4 pow-2 repadding recompiled render_traj_jit
            # at every capacity crossing AND at every K escalation — 12.5
            # s/frame of host/traj_eval, ~3x the whole optimization budget
            # (QUALITY_r04; VERDICT r4 item 1). Traj splats are points/thin
            # lines a few px wide, so M=8 binning always covers them
            # regardless of the scene policy's M, and the config never
            # changes mid-run.
            import dataclasses

            self._traj_cap = max(4096, _pow2ceil(num_traj))
            self._traj_cfg = dataclasses.replace(
                self.render_config, max_tiles_per_gaussian=8,
                max_per_tile=128)
        else:
            t = self._traj
            line_xyz, line_rgb = _gen_line_set(t["last_xyz"], xyz_now, t["last_rgb"])
            t["xyz"] = np.concatenate([t["xyz"], line_xyz])
            t["opacity"] = np.concatenate(
                [t["opacity"] * alpha, np.full((len(line_xyz), 1), 0.99, np.float32)]
            )
            t["rgb"] = np.concatenate([t["rgb"], line_rgb])
            t["last_xyz"] = xyz_now.copy()
            # final capacity from the measured per-frame growth (>= 3
            # frames of slack beyond frame 1's total; at most ONE further
            # compile, and only if this exceeds the initial 4096)
            self._traj_cap = max(
                self._traj_cap,
                _pow2ceil(len(t["xyz"]) + 3 * (len(line_xyz) + num_traj)))
            if len(t["xyz"]) > self._traj_cap:
                # drop the oldest (most-faded) prefix: entries are appended
                # chronologically and old opacity decays by `alpha` per
                # frame, so the dropped trails contribute < alpha^k — the
                # capacity is sized so k is far past visibility (0.8^15
                # < 4%). Keeps the shape fixed forever (zero recompiles).
                drop = len(t["xyz"]) - self._traj_cap
                for k in ("xyz", "opacity", "rgb"):
                    t[k] = t[k][drop:]

        # Reuse the stage's own diagnostic render (same params, same view —
        # _compiled_diag in train()) instead of paying a second full
        # render dispatch + transfer per frame; one-shot, so any state
        # mutation between train() and eval() falls back to a fresh render.
        views = self._last_views
        self._last_views = None
        if views is None or (need_center_depth and "center" not in views):
            outs = (("rgb", "center", "depth_map_color")
                    if need_center_depth else ("rgb",))
            views = jax.device_get(self.render_views(outs, as_uint8=True))
        out_img = render2img(views["rgb"])
        out_center = (render2img(views["center"])
                      if need_center_depth else None)
        out_depth = (render2img(views["depth_map_color"])
                     if need_center_depth else None)

        t = self._traj
        nt = len(t["xyz"])
        cap = self._traj_cap
        xyz_p = np.zeros((cap, 3), np.float32)
        xyz_p[:nt] = t["xyz"]
        xyz_p[nt:, 2] = -1.0  # behind the camera
        op_p = np.zeros((cap, 1), np.float32)
        op_p[:nt] = t["opacity"]
        rgb_p = np.zeros((cap, 3), np.float32)
        rgb_p[:nt] = t["rgb"]
        traj_img = _compiled_traj_render(
            float(self.bg), self.W, self.H, num_traj, float(line_scale),
            float(point_scale), self._traj_cfg, cap,
        )(xyz_p, op_p, rgb_p, self.intr, self.params.pose,
          jnp.asarray(nt, jnp.int32))
        out_traj = np.asarray(traj_img)
        # screen blending (trainer.py:798-806)
        a1 = out_img.astype(np.float32) / 255
        a2 = out_traj.astype(np.float32) / 255
        upon = ((1 - (1 - a1) * (1 - a2)) * 255).astype(np.uint8)
        if return_query_uv:
            return out_img, out_center, out_depth, out_traj, upon, uv_now
        return out_img, out_center, out_depth, out_traj, upon


def _unit(q):
    return q / np.linalg.norm(q, axis=-1, keepdims=True)


def _pow2ceil(n: int) -> int:
    return 1 << max(0, int(n) - 1).bit_length()


def _gen_line_set(xyz1: np.ndarray, xyz2: np.ndarray, rgb: np.ndarray):
    """Densify segments between consecutive trajectory positions into point
    strips; returns (line+endpoint xyz, rgb) with endpoints LAST (reference:
    gflow/utils/trainer_functions.py:5-40). Vectorized over queries: one
    (Q, max_len) grid masked per-row — the per-query Python loop cost
    O(queries) host milliseconds every frame on the traj-eval critical path."""
    diff = xyz2 - xyz1                          # (Q, 3)
    dist = np.linalg.norm(diff, axis=1)
    # reference: L = max(2, int(dist*100)); emits L-1 points at t = k/(L-1)
    n_seg = np.maximum(2, (dist * 100).astype(np.int64)) - 1   # (Q,)
    max_n = int(n_seg.max()) if len(n_seg) else 1
    ts = (np.arange(max_n, dtype=np.float32)[None, :]
          / np.maximum(n_seg, 1)[:, None])                     # (Q, max_n)
    valid = np.arange(max_n)[None, :] < n_seg[:, None]
    pts = xyz1[:, None, :] + ts[..., None] * diff[:, None, :]  # (Q, max_n, 3)
    cols = np.broadcast_to(rgb[:, None, :], pts.shape)
    return (
        np.concatenate([pts[valid], xyz2]).astype(np.float32),
        np.concatenate([cols[valid], rgb]).astype(np.float32),
    )
