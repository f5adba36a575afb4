"""Prediction visualization and artifact export.

Reference-equivalent of the NeRFSystem vis/save machinery (reference:
train_nerf.py:74-82 depth2img, :553-676 vis packing, :736-805 pred
tar.gz export): task-specific colorization (depth turbo map over the
fixed [0, 1.74] ~ sqrt(3) range, normals (n+1)/2, semantic colormap),
horizontal concat panels, per-image PNG saves, and the
`{split}_{pred,gt}.tar.gz` of raw .npy predictions with `.done`
markers consumed by the batch-experiment failure accounting.
"""
from __future__ import annotations

import io
import os
import tarfile
from typing import Dict, List, Optional

import numpy as np


def label_colormap(n: int) -> np.ndarray:
    """Pascal-VOC-style colormap (the imgviz convention the reference
    uses, train_nerf.py:660)."""
    cmap = np.zeros((max(n, 1), 3), np.uint8)
    for i in range(max(n, 1)):
        r = g = b = 0
        c = i
        for j in range(8):
            r |= ((c >> 0) & 1) << (7 - j)
            g |= ((c >> 1) & 1) << (7 - j)
            b |= ((c >> 2) & 1) << (7 - j)
            c >>= 3
        cmap[i] = [r, g, b]
    return cmap


def depth2img(depth, vmin=0.0, vmax=1.74):
    """Turbo-colormapped depth (reference: train_nerf.py:74-82; range
    fixed to the unit-cube diagonal)."""
    import cv2
    d = np.clip((depth - vmin) / (vmax - vmin), 0, 1)
    img = cv2.applyColorMap((d * 255).astype(np.uint8), cv2.COLORMAP_TURBO)
    return cv2.cvtColor(img, cv2.COLOR_BGR2RGB)


def pred_to_vis(pred: np.ndarray, which: str, n_classes: int = 3) -> np.ndarray:
    """One prediction map -> uint8 RGB (train_nerf.py:650-670)."""
    if which == "depth":
        return depth2img(pred)
    if which in ("norm_nn", "norm_depth", "normals", "normals_depth"):
        norm = np.linalg.norm(pred, axis=-1, keepdims=True)
        unit = np.where(np.abs(pred).sum(-1, keepdims=True) == 0,
                        pred, pred / np.maximum(norm, 1e-12))
        return ((unit + 1.0) / 2.0 * 255).astype(np.uint8)
    if which in ("sem", "semantics", "sem_WF", "semantics_WF"):
        if pred.ndim == 3:
            pred = np.argmax(pred, axis=-1)
        return label_colormap(n_classes + 1)[pred.astype(np.int64)]
    if which == "rgb":
        return (np.clip(pred, 0, 1) * 255).astype(np.uint8)
    if which == "opacity":
        g = (np.clip(pred, 0, 1) * 255).astype(np.uint8)
        return np.repeat(g[..., None], 3, axis=-1)
    raise NotImplementedError(which)


def pack_vis_panel(pred_dict: Dict[str, np.ndarray], n_classes: int = 3,
                   downsample: float = 1.0) -> np.ndarray:
    """Horizontal concat of all task visualizations, key-sorted
    (train_nerf.py:570-581)."""
    import cv2
    panels = []
    for k in sorted(pred_dict):
        if k in ("total_samples",):
            continue
        vis = pred_to_vis(pred_dict[k], k, n_classes)
        if downsample != 1.0:
            h, w = vis.shape[:2]
            interp = (cv2.INTER_NEAREST if "sem" in k else cv2.INTER_LINEAR)
            vis = cv2.resize(vis, (int(w * downsample), int(h * downsample)),
                             interpolation=interp)
        panels.append(vis)
    return np.concatenate(panels, axis=1)


def save_vis_png(path: str, panel: np.ndarray):
    import cv2
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    cv2.imwrite(path, cv2.cvtColor(panel, cv2.COLOR_RGB2BGR))


def save_preds_tar_gz(save_dir: str, save_dict: Dict[str, List[np.ndarray]],
                      img_ids: List[str], which_split: str, tag: str,
                      scene_name: str = "scene"):
    """`{split}_{tag}.tar.gz` of .npy predictions + `.done` marker
    (reference: train_nerf.py:781-805)."""
    os.makedirs(save_dir, exist_ok=True)
    tar_fname = f"{which_split}_{tag}"
    tar_path = os.path.join(save_dir, f"{tar_fname}.tar.gz")
    with tarfile.open(tar_path, "w:gz") as tar:
        for k, preds in save_dict.items():
            if k == "opacity":
                continue
            k_name = {"sem": "semantics", "norm": "normals"}.get(k, k)
            for pred, img_id in zip(preds, img_ids):
                b = io.BytesIO()
                np.save(b, pred)
                b.seek(0)
                info = tarfile.TarInfo(
                    name=f"{tag}.{which_split}.{k_name}.{scene_name}.{img_id}.npy")
                info.size = len(b.getvalue())
                tar.addfile(tarinfo=info, fileobj=b)
                b.close()
    with open(os.path.join(save_dir, f"{tar_fname}.done"), "w"):
        pass
    return tar_path
