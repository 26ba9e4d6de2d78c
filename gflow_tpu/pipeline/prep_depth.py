"""Depth + camera prior preparation (parity with utility/depth_mast3r.py):
chunk the sequence (seg_size 200), build the logwin pair graph, run the
two-view model per pair, globally align, and write per frame:

- <seq>_depth_mast3r_s2/<name>.npy        dense depth (original resolution)
- <seq>_depth_mast3r_s2/<name>.png        colorized depth
- <seq>_pts3d_mast3r_s2/<name>.npy        canonical pointmap
- <seq>_camera_mast3r_s2/<name>.json      {focal, pose (w2c 4x4), pp}

Gated on a converted MASt3R checkpoint (.npz; models/mast3r/convert.py).
"""
from __future__ import annotations

import glob
import os

import numpy as np

from ..core.io import load_image, resize_image, write_camera
from ..models.mast3r import Mast3rModel, Mast3rConfig, make_pairs_logwin, global_align
from ..viz.colormap import print_color

CKPT_ENV = "GFLOW_MAST3R_WEIGHTS"


def load_params(path=None):
    import jax.numpy as jnp
    from flax.traverse_util import unflatten_dict

    path = path or os.environ.get(CKPT_ENV)
    if not path or not os.path.exists(path):
        return None
    d = np.load(path)
    flat = {tuple(k.split("/")): jnp.asarray(d[k]) for k in d.files}
    return {"params": unflatten_dict(flat)}


def model_for_params(params) -> "Mast3rModel":
    """Pick the head family from a converted tree: MASt3R catmlp+dpt (the
    reference's checkpoint) vs DUSt3R linear (+ optional desc head)."""
    h1 = params["params"].get("downstream_head1", {})
    if "dpt" in h1:
        return Mast3rModel(Mast3rConfig(head="catmlp+dpt"))
    return Mast3rModel(Mast3rConfig(with_desc="desc_proj" in h1))


def main(img_dir: str, checkpoint: str = None, inference_size: int = 512,
         seg_size: int = 200, winsize: int = 3, mesh_devices: int = 0,
         model=None, params=None):
    """mesh_devices > 0 shards the logwin pair-graph inference (the offline
    hot loop, SURVEY 2.3(i)) across a device mesh's data axis — one edge
    per chip. model/params injectable for tests with tiny configs."""
    import jax

    if params is None:
        params = load_params(checkpoint)
    if params is None:
        raise FileNotFoundError(
            "no MASt3R checkpoint: pass --checkpoint or set "
            f"${CKPT_ENV} to a converted .npz (models/mast3r/convert.py)"
        )

    img_dir = str(img_dir)
    depth_dir = img_dir + "_depth_mast3r_s2"
    pts_dir = img_dir + "_pts3d_mast3r_s2"
    cam_dir = img_dir + "_camera_mast3r_s2"
    for d in (depth_dir, pts_dir, cam_dir):
        os.makedirs(d, exist_ok=True)

    paths = sorted(glob.glob(os.path.join(img_dir, "*.jpg"))) + sorted(
        glob.glob(os.path.join(img_dir, "*.png"))
    )
    if model is None:
        model = model_for_params(params)

    import jax.numpy as jnp

    if mesh_devices:
        from ..parallel import make_mesh, sharded_batch_apply

        mesh = make_mesh(mesh_devices, data_parallel=mesh_devices)
        B = mesh.shape["data"]
        run_batch = sharded_batch_apply(
            lambda p, a, b: model.apply(p, a, b), mesh)
    else:
        B = 1
        jitted = jax.jit(model.apply)
        run_batch = lambda p, a, b: jitted(p, a, b)

    for c0 in range(0, len(paths), seg_size):
        chunk = paths[c0 : c0 + seg_size]
        imgs = [load_image(p, resize=inference_size) for p in chunk]
        orig0 = load_image(chunk[0])
        H, W = imgs[0].shape[:2]
        ratio = orig0.shape[1] / W  # new-to-orig scaling for focal/pp

        pairs = make_pairs_logwin(len(chunk), winsize)
        edge_preds = {}
        for e0 in range(0, len(pairs), B):
            batch = pairs[e0 : e0 + B]
            n_real = len(batch)
            while len(batch) < B:  # pad tail batch (results discarded)
                batch.append(batch[-1])
            A = jnp.asarray(np.stack([imgs[i] for i, _ in batch]), jnp.float32)
            Bi = jnp.asarray(np.stack([imgs[j] for _, j in batch]), jnp.float32)
            o1, o2 = run_batch(params, A, Bi)
            o1 = {k: np.asarray(v) for k, v in o1.items()}
            o2 = {k: np.asarray(v) for k, v in o2.items()}
            for bi in range(n_real):
                i, j = batch[bi]
                edge_preds[(i, j)] = (
                    {k: v[bi] for k, v in o1.items()},
                    {k: v[bi] for k, v in o2.items()},
                )
                print_color(f"[mast3r] pair ({c0+i},{c0+j}) done")

        res = global_align(edge_preds, len(chunk), (H, W))

        import matplotlib

        cmap = matplotlib.colormaps["turbo"]
        import imageio.v2 as imageio

        for f, p in enumerate(chunk):
            name = os.path.splitext(os.path.basename(p))[0]
            orig = load_image(p)
            d = resize_image(res["depths"][f], min(orig.shape[:2]))
            d = d[: orig.shape[0], : orig.shape[1]]
            np.save(os.path.join(depth_dir, f"{name}.npy"), d)
            dn = (d - d.min()) / max(d.max() - d.min(), 1e-8)
            imageio.imwrite(os.path.join(depth_dir, f"{name}.png"),
                            (cmap(dn)[..., :3] * 255).astype(np.uint8))
            np.save(os.path.join(pts_dir, f"{name}.npy"),
                    res["depths"][f])  # canonical z (pointmap z)
            w2c = np.linalg.inv(res["poses_c2w"][f])
            write_camera(
                os.path.join(cam_dir, f"{name}.json"),
                focal=res["focal"] * ratio,
                pose_w2c_4x4=w2c,
                pp=(res["pp"][0] * ratio, res["pp"][1] * ratio),
            )
        print_color(
            f"[mast3r] chunk {c0}: focal {res['focal']:.1f}, "
            f"align loss {res['final_loss']:.5f}"
        )
    return depth_dir
