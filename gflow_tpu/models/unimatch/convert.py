"""UniMatch torch checkpoint -> flax params converter (skeleton).

The released UniMatch checkpoints (README.md:36 of the reference points at
gmflow-scale2-regrefine6) are torch state dicts. This converter maps torch
parameter names onto our flax module tree and saves a flat .npz that
pipeline/prep_flow.py loads. In this offline environment no checkpoint is
present, so the mapping is exercised only by the unit test's synthetic
state-dict; exact end-to-end numerical parity against the torch model must
be validated once weights are available (round-2 task).
"""
from __future__ import annotations

import numpy as np


def _t(x):
    return np.asarray(x)


def convert_conv(w, b=None):
    """torch conv (O, I, kh, kw) -> flax (kh, kw, I, O)."""
    out = {"kernel": _t(w).transpose(2, 3, 1, 0)}
    if b is not None:
        out["bias"] = _t(b)
    return out


def convert_dense(w, b=None):
    out = {"kernel": _t(w).T}
    if b is not None:
        out["bias"] = _t(b)
    return out


def convert_state_dict(sd: dict) -> dict:
    """Best-effort mapping of a UniMatch state dict into our GMFlow tree.
    Unmatched keys are reported so the mapping can be completed against the
    real checkpoint."""
    from flax.traverse_util import flatten_dict

    out = {}
    unmatched = []
    for k, v in sd.items():
        if k.endswith(".num_batches_tracked"):
            continue
        # generic rules: torch "<module>.weight/bias" with 4D weight -> conv
        parts = k.split(".")
        leaf = parts[-1]
        path = "/".join(parts[:-1])
        arr = _t(v)
        if leaf == "weight" and arr.ndim == 4:
            out[f"{path}/kernel"] = arr.transpose(2, 3, 1, 0)
        elif leaf == "weight" and arr.ndim == 2:
            out[f"{path}/kernel"] = arr.T
        elif leaf == "weight" and arr.ndim == 1:  # norm scale
            out[f"{path}/scale"] = arr
        elif leaf == "bias":
            out[f"{path}/bias"] = arr
        else:
            unmatched.append(k)
    if unmatched:
        print(f"[convert] {len(unmatched)} unmatched keys, e.g. {unmatched[:5]}")
    return out


def save_npz(tree_flat: dict, path: str):
    np.savez_compressed(path, **tree_flat)
