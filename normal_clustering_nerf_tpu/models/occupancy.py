"""Occupancy-grid maintenance as pure functions over explicit state.

TPU-native re-design of the reference's buffer-mutating methods
(reference: models/ngp_mt.py:231-368): the density grid, count grid and
bitfield live in an explicit `OccupancyState` pytree; every update is a
jitted pure function, so the periodic grid refresh composes with pjit
and the multi-chip `pmax` merge (parallel/).

Cell indexing: linear x-fastest within each cascade, matching
`ops.ray_march.occupancy_lookup` (the reference uses Morton order for
GPU locality, models/ngp_mt.py:240; layout is internal so we pick the
TPU-cheaper one — ops/morton.py still provides the codes for parity
tests and the sampling path below mirrors the reference's logic).
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import ModelConfig
from ..ops.packbits import packbits


class OccupancyState(NamedTuple):
    density_grid: jnp.ndarray    # (C, G^3) float32; -1 marks invisible cells
    density_bitfield: jnp.ndarray  # (C*G^3/8,) uint8
    count_grid: jnp.ndarray      # (C, G^3) float32 camera-coverage fraction
    # 1-dilated (G/8)^3 supervoxel occupancy (uint8 0/1) of cascade 0,
    # consumed by the blocked two-level ray march (ops/ray_march.py):
    # coarse probes prune empty 16-step blocks before the exact
    # fine-cell lookups. Always kept in sync with density_bitfield.
    coarse_occ: jnp.ndarray      # ((G/8)^3,) uint8
    # Supervoxel-run march tables (ops/ray_march.py sv path), cascade 0:
    # sv_mask is UNdilated supervoxel occupancy; sv_payload packs each
    # supervoxel's 8^3 fine bits as 16 lanes of 32-bit words (int32),
    # bit L = (lz*8+ly)*8+lx at word L>>5, bit L&31 — one row gather
    # yields every fine bit of a supervoxel.
    sv_mask: jnp.ndarray         # ((G/8)^3,) uint8
    sv_payload: jnp.ndarray      # ((G/8)^3, 16) int32


def coarse_occupancy(bitfield: jnp.ndarray, grid_size: int) -> jnp.ndarray:
    """Dilated supervoxel mask from the packed cascade-0 bitfield.

    Max-pools the G^3 occupancy bits into (G/8)^3 supervoxels and
    dilates by one supervoxel in each axis so a probe at any point
    within one supervoxel edge of an occupied cell tests positive —
    the conservativeness contract of the blocked march.
    """
    G = grid_size
    Gc = G // 8
    # static-mask AND instead of a dynamic vector shift (see packbits)
    masks = jnp.asarray([1, 2, 4, 8, 16, 32, 64, 128], jnp.uint8)
    bits = ((bitfield[: G ** 3 // 8, None] & masks) > 0).astype(jnp.uint8)
    occ = bits.reshape(G, G, G)                       # [z, y, x] layout
    coarse = occ.reshape(Gc, 8, Gc, 8, Gc, 8).max(axis=(1, 3, 5))
    for axis in range(3):
        lo = jnp.roll(coarse, 1, axis=axis).at[
            (slice(None),) * axis + (0,)].set(0)
        hi = jnp.roll(coarse, -1, axis=axis).at[
            (slice(None),) * axis + (Gc - 1,)].set(0)
        coarse = jnp.maximum(coarse, jnp.maximum(lo, hi))
    return coarse.reshape(-1).astype(jnp.uint8)


def supervoxel_tables(bitfield: jnp.ndarray, grid_size: int):
    """(sv_mask, sv_payload) for the supervoxel-run march.

    sv_payload row for supervoxel (zc, yc, xc) (flat id
    (zc*Gc + yc)*Gc + xc, matching the fine [z, y, x]-linear layout)
    packs its 8^3 fine occupancy bits into 16 int32 lanes holding full
    32-bit words: local cell (lx, ly, lz) is bit L = (lz*8+ly)*8+lx,
    stored at lane L>>5, bit L&31 (extracted with an integer vector
    shift in ops/ray_march.py — exact, unlike float exp2 tricks; the
    two's-complement arithmetic shift delivers bit 31 correctly).
    16 wide words instead of the r4 32 half-words: the per-step
    one-hot word select in _sv_scan phase B is O(lanes) VPU work and
    was 1.0 ms/step at 32 lanes (PROFILE_r05.md).
    sv_mask is the UNdilated per-supervoxel any-bit mask.
    """
    G = grid_size
    Gc = G // 8
    masks = jnp.asarray([1, 2, 4, 8, 16, 32, 64, 128], jnp.uint8)
    bits = ((bitfield[: G ** 3 // 8, None] & masks) > 0).astype(jnp.int32)
    occ = bits.reshape(G, G, G)                        # [z, y, x]
    blk = occ.reshape(Gc, 8, Gc, 8, Gc, 8)             # (zc,lz,yc,ly,xc,lx)
    blk = blk.transpose(0, 2, 4, 1, 3, 5)              # (zc,yc,xc,lz,ly,lx)
    flat = blk.reshape(Gc ** 3, 512)                   # bit L ordering
    # 1 << 31 wraps to int32 min: exact two's-complement bit pattern
    # (each power appears at most once, so the sum has no carries)
    w32 = jnp.left_shift(jnp.int32(1),
                         jnp.arange(32, dtype=jnp.int32))
    payload = jnp.sum(flat.reshape(Gc ** 3, 16, 32) * w32, axis=-1,
                      dtype=jnp.int32)
    mask = (jnp.max(flat, axis=-1) > 0).astype(jnp.uint8)
    return mask, payload


class OccupancyGrid:
    """Static geometry + pure update functions (state passed explicitly)."""

    def __init__(self, cfg: ModelConfig):
        self.cfg = cfg
        self.G = cfg.grid_size
        self.cascades = cfg.cascades
        self.scale = cfg.scale

    def init_state(self) -> OccupancyState:
        G3 = self.G ** 3
        Gc3 = (self.G // 8) ** 3
        return OccupancyState(
            density_grid=jnp.zeros((self.cascades, G3), jnp.float32),
            density_bitfield=jnp.zeros((self.cascades * G3 // 8,), jnp.uint8),
            count_grid=jnp.zeros((self.cascades, G3), jnp.float32),
            coarse_occ=jnp.zeros((Gc3,), jnp.uint8),
            sv_mask=jnp.zeros((Gc3,), jnp.uint8),
            sv_payload=jnp.zeros((Gc3, 16), jnp.int32),
        )

    # ------------------------------------------------------------ geometry
    def cell_coords(self, indices):
        """Flat linear cell index -> integer (x, y, z) grid coords."""
        G = self.G
        x = indices % G
        y = (indices // G) % G
        z = indices // (G * G)
        return jnp.stack([x, y, z], axis=-1)

    def cell_world_pos(self, coords, cascade: int, jitter=None):
        """Cell coords -> world position at a cascade, optionally jittered
        inside the cell (reference: models/ngp_mt.py:350-354)."""
        G = self.G
        s = min(2.0 ** (cascade - 1), self.scale)
        half = s / G
        xyz = (coords.astype(jnp.float32) / (G - 1) * 2.0 - 1.0) * (s - half)
        if jitter is not None:
            xyz = xyz + (jitter * 2.0 - 1.0) * half
        return xyz

    # ------------------------------------------------------- cell sampling
    def sample_update_cells(self, state: OccupancyState, key, density_threshold):
        """M = G^3/4 uniform + M occupied cells per cascade
        (reference: models/ngp_mt.py:245-271). Occupied cells are drawn
        with probability proportional to (density > threshold); when none
        qualify the draw degenerates to uniform (the reference keeps the
        raw nonzero() indices in that case — an empty set; masking by
        weight-sum handles it equivalently here).

        Returns (indices (C, 2M), coords (C, 2M, 3)).
        """
        G3 = self.G ** 3
        M = G3 // 4
        keys = jax.random.split(key, 2 * self.cascades)
        all_idx, all_coords = [], []
        for c in range(self.cascades):
            k_u, k_o = keys[2 * c], keys[2 * c + 1]
            uniform_idx = jax.random.randint(k_u, (M,), 0, G3)
            occ = state.density_grid[c] > density_threshold
            n_occ = jnp.sum(occ.astype(jnp.int32))
            # uniform-over-occupied via compacted id list + randint:
            # same distribution as choice(p=occ/sum) but without its
            # inverse-CDF searchsorted (21 gather rounds over G^3)
            pos = jnp.cumsum(occ.astype(jnp.int32)) - 1
            occ_list = jnp.zeros((G3 + 1,), jnp.int32).at[
                jnp.where(occ, pos, G3)].set(
                    jnp.arange(G3, dtype=jnp.int32), mode="drop")[:G3]
            r = jax.random.randint(k_o, (M,), 0, jnp.maximum(n_occ, 1))
            occ_idx = jnp.where(n_occ > 0, occ_list[r],
                                jax.random.randint(
                                    jax.random.fold_in(k_o, 1), (M,), 0, G3))
            idx = jnp.concatenate([uniform_idx, occ_idx]).astype(jnp.int32)
            all_idx.append(idx)
            all_coords.append(self.cell_coords(idx))
        return jnp.stack(all_idx), jnp.stack(all_coords)

    # ------------------------------------------------------------- updates
    def update(
        self,
        state: OccupancyState,
        density_fn,
        key,
        density_threshold: float,
        warmup: bool,
        decay: float = 0.95,
        erode: bool = False,
    ) -> OccupancyState:
        """EMA-merge fresh sigma samples into the grid and repack bits
        (reference: models/ngp_mt.py:339-368).

        Args:
          density_fn: params-closed callable (M, 3) -> (M,) sigma.
          warmup: evaluate all cells (steps < 256, train_nerf.py:319).
        """
        G3 = self.G ** 3
        tmp = jnp.zeros_like(state.density_grid)
        if warmup:
            idx = jnp.arange(G3, dtype=jnp.int32)
            coords = self.cell_coords(idx)
            for c in range(self.cascades):
                k = jax.random.fold_in(key, c)
                jit_pos = jax.random.uniform(k, coords.shape)
                xyz = self.cell_world_pos(coords, c, jit_pos)
                tmp = tmp.at[c, idx].set(density_fn(xyz))
        else:
            k_cells, k_jit = jax.random.split(key)
            idxs, coords = self.sample_update_cells(state, k_cells, density_threshold)
            for c in range(self.cascades):
                k = jax.random.fold_in(k_jit, c)
                jit_pos = jax.random.uniform(k, coords[c].shape)
                xyz = self.cell_world_pos(coords[c], c, jit_pos)
                # duplicate indices: keep max (reference overwrites; max is
                # deterministic under XLA scatter and at least as tight)
                tmp = tmp.at[c, idxs[c]].max(density_fn(xyz))
        if erode:
            # decay more the cells seen by few cameras (ngp_mt.py:357-359)
            decay_arr = jnp.clip(
                decay ** (1.0 / jnp.maximum(state.count_grid, 1e-8)), 0.1, 0.95
            )
        else:
            decay_arr = decay
        grid = jnp.where(
            state.density_grid < 0,
            state.density_grid,
            jnp.maximum(state.density_grid * decay_arr, tmp),
        )
        pos = grid > 0
        mean_density = jnp.sum(jnp.where(pos, grid, 0.0)) / jnp.maximum(
            jnp.sum(pos), 1
        )
        thr = jnp.minimum(mean_density, density_threshold)
        bitfield = packbits(grid, thr)
        coarse = coarse_occupancy(bitfield, self.G)
        sv_mask, sv_payload = supervoxel_tables(bitfield, self.G)
        return OccupancyState(grid, bitfield, state.count_grid, coarse,
                              sv_mask, sv_payload)

    # ---------------------------------------------------- visibility marks
    def mark_invisible_cells(
        self,
        state: OccupancyState,
        poses,                    # (N_cams, 3, 4) c2w
        img_wh: Tuple[int, int],
        near_distance: float,
        K: Optional[jnp.ndarray] = None,
        proj: Optional[Tuple] = None,  # Hypersim (M_ndc_from_cam, M_uv_from_ndc, shift, scale)
    ) -> OccupancyState:
        """Mark cells never covered by any camera with density -1 and build
        the per-cell camera-coverage count grid
        (reference: models/ngp_mt.py:273-337). Supports both pinhole K and
        the Hypersim projection-matrix tuple (ngp_mt.py:291-321).
        """
        G3 = self.G ** 3
        w2c_R = jnp.swapaxes(poses[:, :3, :3], 1, 2)          # (N, 3, 3)
        w2c_T = -w2c_R @ poses[:, :3, 3:]                     # (N, 3, 1)
        idx = jnp.arange(G3, dtype=jnp.int32)
        coords = self.cell_coords(idx)

        density = state.density_grid
        counts = state.count_grid
        for c in range(self.cascades):
            xyzs_w = self.cell_world_pos(coords, c).T          # (3, G3)
            xyzs_c = w2c_R @ xyzs_w + w2c_T                    # (N, 3, G3)
            if proj is not None:
                M_ndc, M_uv, _shift, scale = proj
                xc = xyzs_c * (2.0 * scale)                    # back to metric
                ones = jnp.ones_like(xc[:, :1])
                xc_h = jnp.concatenate([xc, ones], axis=1)     # (N, 4, G3)
                clip = M_ndc @ xc_h
                ndc = clip / clip[:, 3:]
                uvd = M_uv @ ndc
                uv = uvd[:, :2]
            else:
                uvd = K @ xyzs_c                               # (N, 3, G3)
                uv = uvd[:, :2] / uvd[:, 2:]
            in_image = (
                (uvd[:, 2] >= 0)
                & (uv[:, 0] >= 0) & (uv[:, 0] < img_wh[0])
                & (uv[:, 1] >= 0) & (uv[:, 1] < img_wh[1])
            )
            covered = (uvd[:, 2] >= near_distance) & in_image  # (N, G3)
            count = jnp.sum(covered, axis=0) / poses.shape[0]
            too_near = jnp.any((uvd[:, 2] < near_distance) & in_image, axis=0)
            valid = (count > 0) & (~too_near)
            counts = counts.at[c].set(count)
            density = density.at[c].set(jnp.where(valid, 0.0, -1.0))
        return OccupancyState(
            density, state.density_bitfield, counts, state.coarse_occ,
            state.sv_mask, state.sv_payload,
        )

    # ------------------------------------------------------ multi-chip sync
    @staticmethod
    def merge_across_chips(state: OccupancyState, axis_name: str) -> OccupancyState:
        """Merge per-chip grid updates (SURVEY.md §5.8): each chip samples
        different cells; the union of their evidence is pmax over the
        density grid and bitwise-OR over occupancy bits. NOTE: pmax over
        PACKED bytes/words is NOT bitwise-OR (max(0b01, 0b10) = 0b10),
        so packed fields are unpacked to bits, pmax'd, and rebuilt."""
        grid = jax.lax.pmax(state.density_grid, axis_name)
        masks = jnp.asarray([1, 2, 4, 8, 16, 32, 64, 128], jnp.uint8)
        bits = ((state.density_bitfield[:, None] & masks) > 0)
        bits = jax.lax.pmax(bits.astype(jnp.uint8), axis_name)
        bitfield = jnp.sum(bits * masks, axis=-1, dtype=jnp.uint8)
        # dilation/any-reduction commute with the bitwise union, so the
        # derived tables are exactly those of the merged bitfield
        grid_size = round(state.density_grid.shape[1] ** (1.0 / 3.0))
        coarse = coarse_occupancy(bitfield, grid_size)
        sv_mask, sv_payload = supervoxel_tables(bitfield, grid_size)
        return OccupancyState(grid, bitfield, state.count_grid, coarse,
                              sv_mask, sv_payload)
