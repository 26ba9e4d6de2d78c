"""MASt3R torch checkpoint -> flax params converter (skeleton; same caveats
as models/unimatch/convert.py — no weights ship in this environment, so the
name mapping is completed/validated once a real .pth is available)."""
from __future__ import annotations

import numpy as np


def convert_state_dict(sd: dict) -> dict:
    out = {}
    unmatched = []
    for k, v in sd.items():
        arr = np.asarray(v)
        parts = k.split(".")
        leaf = parts[-1]
        path = "/".join(parts[:-1])
        if leaf == "weight" and arr.ndim == 4:   # patch-embed conv
            out[f"{path}/kernel"] = arr.transpose(2, 3, 1, 0)
        elif leaf == "weight" and arr.ndim == 2:
            out[f"{path}/kernel"] = arr.T
        elif leaf == "weight" and arr.ndim == 1:
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
