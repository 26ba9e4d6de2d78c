"""Optical-flow prior preparation (parity with scripts/flow_unimatch.sh):
run the GMFlow model over consecutive frame pairs in both directions,
fwd/bwd-consistency occlusion check, write <seq>_flow_unimatch/
{name}_pred.flo, {name}_pred_bwd.flo, {name}_occ_bwd.png.

Gated on a converted checkpoint (.npz flax params, see
models/unimatch/convert.py) — this environment ships no pretrained weights.
"""
from __future__ import annotations

import glob
import os

import numpy as np

from ..core.io import load_image, write_flow
from ..models.unimatch import GMFlow, GMFlowConfig, forward_backward_consistency
from ..viz.colormap import print_color

CKPT_ENV = "GFLOW_UNIMATCH_WEIGHTS"


def load_params(path=None):
    import jax.numpy as jnp
    from flax.traverse_util import unflatten_dict

    path = path or os.environ.get(CKPT_ENV)
    if not path or not os.path.exists(path):
        return None
    d = np.load(path)
    flat = {tuple(k.split("/")): jnp.asarray(d[k]) for k in d.files}
    return {"params": unflatten_dict(flat)}


def main(img_dir: str, checkpoint: str = None, resize: int = None,
         padding_factor: int = 32, mesh_devices: int = 0, model=None,
         params=None):
    """mesh_devices > 0 shards directed frame-pair batches across a device
    mesh's data axis (SURVEY 2.3(i): prior-model inference is the offline
    hot loop — one directed pair per chip). model/params injectable for
    tests with tiny configs."""
    import jax
    import jax.numpy as jnp

    if params is None:
        params = load_params(checkpoint)
    if params is None:
        raise FileNotFoundError(
            "no UniMatch checkpoint: pass --checkpoint or set "
            f"${CKPT_ENV} to a converted .npz (models/unimatch/convert.py)"
        )

    out_dir = str(img_dir) + "_flow_unimatch"
    os.makedirs(out_dir, exist_ok=True)
    paths = sorted(glob.glob(os.path.join(str(img_dir), "*.jpg"))) + sorted(
        glob.glob(os.path.join(str(img_dir), "*.png"))
    )
    if model is None:
        model = GMFlow(GMFlowConfig(padding_factor=padding_factor))

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

    def pad_to(img):
        H, W = img.shape[:2]
        ph = -H % padding_factor
        pw = -W % padding_factor
        return np.pad(img, ((0, ph), (0, pw), (0, 0))), (H, W)

    # directed jobs: (pair index, direction); fwd and bwd of each pair are
    # independent inferences that batch across the mesh
    jobs = []
    sizes = {}
    for i in range(len(paths) - 1):
        a = load_image(paths[i], resize=resize)
        b = load_image(paths[i + 1], resize=resize)
        ap, hw = pad_to(a)
        bp, _ = pad_to(b)
        sizes[i] = hw
        jobs.append(((i, "fwd"), ap, bp))
        jobs.append(((i, "bwd"), bp, ap))

    flows = {}
    for c0 in range(0, len(jobs), B):
        chunk = jobs[c0 : c0 + B]
        n_real = len(chunk)
        while len(chunk) < B:  # pad the tail batch (results discarded)
            chunk.append(chunk[-1])
        A = jnp.asarray(np.stack([c[1] for c in chunk]), jnp.float32)
        Bm = jnp.asarray(np.stack([c[2] for c in chunk]), jnp.float32)
        out = np.asarray(run_batch(params, A, Bm))
        for k in range(n_real):
            (i, d), _, _ = chunk[k]
            H, W = sizes[i]
            flows[(i, d)] = out[k, :H, :W]

    import imageio.v2 as imageio

    for i in range(len(paths) - 1):
        fwd, bwd = flows[(i, "fwd")], flows[(i, "bwd")]
        occ_f, occ_b = forward_backward_consistency(
            jnp.asarray(fwd)[None], jnp.asarray(bwd)[None]
        )
        name = os.path.splitext(os.path.basename(paths[i]))[0]
        write_flow(os.path.join(out_dir, f"{name}_pred.flo"), fwd)
        write_flow(os.path.join(out_dir, f"{name}_pred_bwd.flo"), bwd)
        imageio.imwrite(
            os.path.join(out_dir, f"{name}_occ_bwd.png"),
            (np.asarray(occ_b)[0] * 255).astype(np.uint8),
        )
        print_color(f"[flow] {name}: |flow| mean {np.abs(fwd).mean():.2f}")
    return out_dir
