"""On-device ray-batch sampling strategies.

TPU-native re-design of the reference's DataLoader-worker sampling
(reference: datasets/base.py:84-182): instead of 16 host worker
processes drawing numpy indices per step, the sampler is a jittable
pure function of a PRNG key, so batch construction fuses into the
training step and runs on-chip. (A C++ host-side sampler with the same
semantics lives in native/ for streaming datasets that exceed HBM.)

Strategies (reference: opt.py:140-144):
  all_images / same_image           — independent random pixels
  *_triang                          — batch//3 right-angle pixel triangles
                                      (x1 corner, x2 above, x3 left;
                                      base.py:15-33,102-140), optional
                                      `max_expand` dilation
  *_triang_patch                    — 8x8 patches; all (p-1)^2 triangles
                                      inside each patch via local offset
                                      tables (base.py:35-66,142-171)
"""
from __future__ import annotations

from typing import Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np


class TriangTables(NamedTuple):
    x1: jnp.ndarray
    x2: jnp.ndarray
    x3: jnp.ndarray


class PatchTables(NamedTuple):
    corners: jnp.ndarray          # valid upper-left pixel indices
    offsets: jnp.ndarray          # (p^2,) flat offsets inside a patch
    x1_local: jnp.ndarray         # ((p-1)^2,) local triangle corners
    x2_local: jnp.ndarray
    x3_local: jnp.ndarray


def build_triang_tables(h: int, w: int) -> TriangTables:
    """Valid triangle-corner index maps (reference: base.py:15-33)."""
    img = np.arange(h * w, dtype=np.int32).reshape(h, w)
    # host numpy on purpose: these tables are closed over by the jitted
    # train step; a closed-over DEVICE array would be fetched at trace
    # time, which permanently degrades the axon TPU tunnel (see
    # training/trainer.py mark_invisible_cells note)
    return TriangTables(
        x1=np.ascontiguousarray(img[1:-1, 1:-1].reshape(-1)),
        x2=np.ascontiguousarray(img[:-2, 1:-1].reshape(-1)),
        x3=np.ascontiguousarray(img[1:-1, :-2].reshape(-1)),
    )


def build_patch_tables(h: int, w: int, patch_size: int = 8) -> PatchTables:
    """Patch corner/offset tables (reference: base.py:35-66)."""
    img = np.arange(h * w, dtype=np.int32).reshape(h, w)
    p = patch_size
    corners = img[: h - p + 1, : w - p + 1].reshape(-1)
    offsets = img[:p, :p].reshape(-1)
    local = np.arange(p * p, dtype=np.int32).reshape(p, p)
    # host numpy on purpose (see build_triang_tables)
    return PatchTables(
        corners=np.ascontiguousarray(corners),
        offsets=np.ascontiguousarray(offsets),
        x1_local=np.ascontiguousarray(local[1:, 1:].reshape(-1)),
        x2_local=np.ascontiguousarray(local[:-1, 1:].reshape(-1)),
        x3_local=np.ascontiguousarray(local[1:, :-1].reshape(-1)),
    )


class RaySampler:
    """Strategy-dispatching jittable batch sampler."""

    def __init__(
        self,
        strategy: str,
        batch_size: int,
        img_wh,
        n_images: int,
        *,
        max_expand: int = 0,
        patch_size: int = 8,
        n_random_poses: int = 0,
    ):
        self.strategy = strategy
        self.batch_size = batch_size
        self.W, self.H = img_wh
        self.N = self.W * self.H
        self.n_images = n_images
        self.max_expand = max_expand
        self.patch_size = patch_size
        self.n_random_poses = n_random_poses
        self.triang = None
        self.patch = None
        if strategy.endswith("_triang") or strategy.endswith("_triang_val"):
            self.triang = build_triang_tables(self.H, self.W)
        elif strategy.endswith("_triang_patch"):
            self.patch = build_patch_tables(self.H, self.W, patch_size)

    # ------------------------------------------------------------------
    def sample(self, key) -> Dict[str, jnp.ndarray]:
        """Draw one batch of (img_idxs, pix_idxs[, rnd_img_idxs])
        (reference: base.py:84-173)."""
        s = self.strategy
        k_img, k_pix, k_rnd = jax.random.split(key, 3)
        if s == "all_images":
            return {
                "img_idxs": jax.random.randint(
                    k_img, (self.batch_size,), 0, self.n_images),
                "pix_idxs": jax.random.randint(
                    k_pix, (self.batch_size,), 0, self.N),
            }
        if s == "same_image":
            img = jax.random.randint(k_img, (), 0, self.n_images)
            return {
                "img_idxs": jnp.full((self.batch_size,), img, jnp.int32),
                "pix_idxs": jax.random.randint(
                    k_pix, (self.batch_size,), 0, self.N),
            }
        if s in ("all_images_triang", "same_image_triang", "all_images_triang_val"):
            return self._sample_triang(k_img, k_pix, k_rnd, same=s.startswith("same"))
        if s in ("all_images_triang_patch", "same_image_triang_patch"):
            return self._sample_patch(k_img, k_pix, k_rnd, same=s.startswith("same"))
        raise NotImplementedError(s)

    def _img_idxs(self, key, n_groups, group_size, same):
        if same:
            img = jax.random.randint(key, (), 0, self.n_images)
            return jnp.full((n_groups * group_size,), img, jnp.int32)
        imgs = jax.random.randint(key, (n_groups,), 0, self.n_images)
        return jnp.repeat(imgs, group_size)

    def _sample_triang(self, k_img, k_pix, k_rnd, same):
        n_triang = self.batch_size // 3
        out = {}
        if self.n_random_poses > 0:
            n_triang //= 2
            if same:
                r = jax.random.randint(k_rnd, (), 0, self.n_random_poses)
                out["rnd_img_idxs"] = jnp.full((3 * n_triang,), r, jnp.int32)
            else:
                r = jax.random.randint(k_rnd, (n_triang,), 0, self.n_random_poses)
                out["rnd_img_idxs"] = jnp.repeat(r, 3)
        out["img_idxs"] = self._img_idxs(k_img, n_triang, 3, same)

        tr = jax.random.randint(
            k_pix, (n_triang,), 0, self.triang.x1.shape[0])
        # jnp.asarray on host tables embeds them as HLO constants at
        # trace time (numpy can't be indexed by tracers)
        x1 = jnp.asarray(self.triang.x1)[tr]
        x2 = jnp.asarray(self.triang.x2)[tr]
        x3 = jnp.asarray(self.triang.x3)[tr]
        if self.max_expand > 0:
            # dilate the unit triangle (reference: base.py:128-138)
            e = self.max_expand
            x1n = x1 + e * self.W
            x1 = jnp.where(x1n < self.N, x1n, x1)
            x2n = x2 - e * self.W
            x2 = jnp.where(x2n >= 0, x2n, x2)
            x3n = x3 - e
            x3 = jnp.where((x3n // self.W) == (x3 // self.W), x3n, x3)
        out["pix_idxs"] = jnp.stack([x1, x2, x3], axis=1).reshape(-1)
        return out

    def _sample_patch(self, k_img, k_pix, k_rnd, same):
        pa = self.patch_size ** 2
        n_patches = self.batch_size // pa
        out = {}
        if self.n_random_poses > 0:
            n_patches //= 2
            if same:
                r = jax.random.randint(k_rnd, (), 0, self.n_random_poses)
                out["rnd_img_idxs"] = jnp.full((pa * n_patches,), r, jnp.int32)
            else:
                r = jax.random.randint(k_rnd, (n_patches,), 0, self.n_random_poses)
                out["rnd_img_idxs"] = jnp.repeat(r, pa)
        out["img_idxs"] = self._img_idxs(k_img, n_patches, pa, same)
        ci = jax.random.randint(k_pix, (n_patches,), 0, self.patch.corners.shape[0])
        corners = jnp.asarray(self.patch.corners)[ci]
        out["pix_idxs"] = (corners[:, None]
                           + jnp.asarray(self.patch.offsets)[None, :]).reshape(-1)
        return out

    # static triangle-extraction metadata consumed by the loss
    @property
    def patch_area(self) -> Optional[int]:
        return self.patch_size ** 2 if self.patch is not None else None

    @property
    def offsets_local(self) -> Optional[Dict[str, np.ndarray]]:
        if self.patch is None:
            return None
        return {
            "x1": np.asarray(self.patch.x1_local),
            "x2": np.asarray(self.patch.x2_local),
            "x3": np.asarray(self.patch.x3_local),
        }
