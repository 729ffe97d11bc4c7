"""Incremental binning: static-scene bin cache + per-frame dynamic overlay.

The reference rebuilds the entire hash grid from all 162k entities every
frame (alternative.cpp:690-693) even though only the player (entity 0) ever
moves.  The sort-based rebuild in ops/binning.py faithfully reproduces that,
but costs a ~2M-element sort per frame.  This module exploits scene
structure: bin the static entities once, then merge the few dynamic entities
per frame in O(hash_volume * window) elementwise work — while producing
*bit-identical* tables to the full rebuild.

Exactness argument: bin slot contents are determined by each entry's rank in
the bin's insertion sequence, which is ordered by entity index.  If all
dynamic entities come first (indices [0, n_dynamic) — the reference's player
is entity 0), then in every bin the dynamic entries precede all static ones,
so a static entry's rank is its static rank plus the number of dynamic
entries in that bin, and a dynamic entry's rank is its index among the
dynamics covering the bin.  The wrap keeps ranks >= total - capacity in slot
``rank & (capacity-1)`` with visible count ``total & (capacity-1)`` (quirk
Q3), so it suffices to cache, per bin, the static total and the last
``capacity + n_dynamic`` static entries.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..config import RenderConfig
from . import binning


class StaticBins:
    """Precomputed static-entity bin cache.

    Args:
      pos, ext: full scene arrays (host or device); entities
                [0, n_dynamic) are the movable ones and are *excluded* from
                the cache.
      n_dynamic: number of leading dynamic entities.
    """

    def __init__(self, pos, ext, n_dynamic: int, config: RenderConfig,
                 spans: tuple[int, int, int]):
        if n_dynamic < 1:
            raise ValueError("need at least one dynamic entity")
        self.config = config
        self.spans = spans
        self.n_dynamic = n_dynamic
        cap = config.bin_capacity
        self.window = cap + n_dynamic

        pos = jnp.asarray(pos, jnp.int32)
        ext = jnp.asarray(ext, jnp.int32)
        # Bin the static tail with a widened capacity so the last
        # ``window`` static entries per bin survive, then recover true
        # totals.  A second full-capacity pass would lose them.  Jitted:
        # eager op-by-op dispatch is pathological on remote backends.
        build = jax.jit(functools.partial(
            _bin_statics, id_offset=n_dynamic, config=config, spans=spans,
            window=self.window))
        self.static_total, self.static_ids = build(pos[n_dynamic:],
                                                   ext[n_dynamic:])

    def merge(self, dyn_pos: jax.Array, dyn_ext: jax.Array):
        """Merge per-frame dynamic entities; returns (bins_ent, counts)
        bit-identical to ``binning.build_bins`` on the full scene."""
        cfg = self.config
        cap = cfg.bin_capacity
        V = cfg.hash_volume
        D = self.n_dynamic
        Ws = self.window
        Ax, Ay, Az = self.spans
        K = Ax * Ay * Az

        flat, valid = _covered_bins(dyn_pos, dyn_ext, cfg, self.spans)
        flat = jnp.where(valid, flat, V)                    # (D, K)

        n_dyn_bin = jnp.zeros(V + 1, jnp.int32).at[flat.reshape(-1)].add(1)
        n_dyn = n_dyn_bin[:V]                               # (V,)
        total = self.static_total + n_dyn                   # (V,)
        counts = total & (cap - 1)

        # Static entries: stored id list is rank-ordered; global rank =
        # (static_total - stored_len) + i + n_dyn_bin.
        stored_valid = self.static_ids >= 0                 # (V, Ws)
        stored_len = stored_valid.sum(axis=1)               # (V,)
        i_idx = jnp.arange(Ws, dtype=jnp.int32)[None, :]
        rank_s = ((self.static_total - stored_len + n_dyn)[:, None] + i_idx)
        keep_s = stored_valid & (rank_s >= (total[:, None] - cap))
        slot_s = rank_s & (cap - 1)
        bin_idx = jnp.broadcast_to(
            jnp.arange(V, dtype=jnp.int32)[:, None], (V, Ws))
        target_s = jnp.where(keep_s, bin_idx * cap + slot_s, V * cap)

        bins_ent = jnp.full(V * cap, -1, jnp.int32)
        bins_ent = bins_ent.at[target_s.reshape(-1)].set(
            self.static_ids.reshape(-1), mode="drop")

        # Dynamic entries: rank among dynamics covering the bin = number of
        # earlier dynamic pairs hitting the same bin.  D is small, so an
        # unrolled prefix count is cheapest.
        seen = jnp.zeros(V + 1, jnp.int32)
        for d in range(D):
            fd = flat[d]                                    # (K,)
            # rank of this entity's entry within each covered bin
            rank_d = seen[fd] + _prefix_dups(fd, V)
            tot_d = total[jnp.minimum(fd, V - 1)]
            keep_d = (fd < V) & (rank_d >= tot_d - cap)
            slot_d = rank_d & (cap - 1)
            target_d = jnp.where(keep_d, fd * cap + slot_d, V * cap)
            bins_ent = bins_ent.at[target_d].set(d, mode="drop")
            seen = seen.at[fd].add(1)

        return bins_ent.reshape(V, cap), counts


def _prefix_dups(flat: jax.Array, V: int) -> jax.Array:
    """For each pair position, how many earlier pairs hit the same bin.

    One entity's covered bins are distinct, so this is always zero — kept as
    an explicit guard for K-grid enumerations that might repeat a bin.
    """
    return jnp.zeros_like(flat)


def _covered_bins(pos, ext, config: RenderConfig, spans):
    """(flat_bin_ids, valid) over the static offset grid, matching
    ops/binning.py's enumeration exactly."""
    cfg = config
    bs = cfg.bin_size
    vh = jnp.int32(cfg.view_height)
    from .cstyle import c_div

    Ax, Ay, Az = spans
    x0, y0, z0 = pos[:, 0], pos[:, 1], pos[:, 2]
    x1, y1, z1 = x0 + ext[:, 0], y0 + ext[:, 1], z0 + ext[:, 2]
    culled = ((x1 < 0) | (x0 >= cfg.view_width)
              | (y1 < -z1)
              | (y0 >= vh - z0 + bs)
              | (z1 < -ext[:, 2] - bs)
              | (z0 > cfg.view_length + bs))
    min_xi = jnp.maximum(0, c_div(x0, bs))
    min_yi = jnp.maximum(0, c_div(vh - y1 - z1, bs))
    min_zi = jnp.maximum(0, c_div(z0, bs))
    max_xi = jnp.minimum(cfg.hash_width, c_div(x1 + bs - 1, bs))
    max_yi = jnp.minimum(cfg.hash_height, c_div(vh - y0 - z0 + bs - 1, bs))
    max_zi = jnp.minimum(cfg.hash_length, c_div(z1 + bs - 1, bs))

    oa, ob, oc = np.meshgrid(np.arange(Ax), np.arange(Ay), np.arange(Az),
                             indexing="ij")
    oa = jnp.asarray(oa.reshape(-1), jnp.int32)
    ob = jnp.asarray(ob.reshape(-1), jnp.int32)
    oc = jnp.asarray(oc.reshape(-1), jnp.int32)
    bx = min_xi[:, None] + oa[None, :]
    by = min_yi[:, None] + ob[None, :]
    bz = min_zi[:, None] + oc[None, :]
    valid = (~culled[:, None]
             & (bx < max_xi[:, None]) & (by < max_yi[:, None])
             & (bz < max_zi[:, None]))
    flat = (bx * cfg.hash_height + by) * cfg.hash_length + bz
    return flat, valid


def _bin_statics(pos, ext, id_offset: int, config: RenderConfig, spans,
                 window: int):
    """Bin static entities keeping the last ``window`` entries per bin.

    Returns (static_total (V,), static_ids (V, window) sorted by rank,
    -1-padded at the FRONT of each row is not used — padding sits at
    invalid slots marked -1 wherever the bin holds fewer than window).
    """
    cfg = config
    V = cfg.hash_volume
    N = pos.shape[0]
    K = spans[0] * spans[1] * spans[2]

    flat, valid = _covered_bins(pos, ext, cfg, spans)
    flat = jnp.where(valid, flat, V).reshape(N * K)

    order = jnp.argsort(flat, stable=True)
    sorted_bin = flat[order]
    pair_ent = (order // K).astype(jnp.int32) + id_offset

    idx = jnp.arange(N * K, dtype=jnp.int32)
    seg_start = jnp.concatenate(
        [jnp.ones((1,), bool), sorted_bin[1:] != sorted_bin[:-1]])
    rank = idx - jax.lax.cummax(jnp.where(seg_start, idx, 0))

    totals = jnp.zeros(V + 1, jnp.int32).at[flat].add(1)
    tot_here = totals[sorted_bin]
    keep = (sorted_bin < V) & (rank >= tot_here - window)
    # Position inside the stored window: for bins with >= window entries the
    # stored list is exactly the last ``window`` ranks; for smaller bins the
    # list is left-aligned (positions 0..total-1).
    stored_pos = jnp.where(tot_here >= window, rank - (tot_here - window),
                           rank)
    target = jnp.where(keep, sorted_bin * window + stored_pos, V * window)
    ids = jnp.full(V * window, -1, jnp.int32)
    ids = ids.at[target].set(pair_ent, mode="drop")
    return totals[:V], ids.reshape(V, window)
