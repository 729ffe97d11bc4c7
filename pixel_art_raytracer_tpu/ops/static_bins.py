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
        # Static-only slot layout (the merge result with zero dynamic
        # coverage): per-frame merges only patch the few bins the dynamics
        # cover, so this is the base everywhere else.
        self.bins_static, self.counts_static = jax.jit(
            lambda: self._static_layout())()

    def _static_rows(self, stored, st_total, n_dyn):
        """Slot rows for bins given their stored static ids, static totals,
        and dynamic counts — the rank arithmetic of the scatter formulation,
        expressed as a select chain over the ``window`` stored entries (no
        scatters: TPU scatter throughput made the old formulation the single
        most expensive pipeline stage at ~0.4 ms/frame).

        stored (B, Ws) int32, st_total (B,), n_dyn (B,) -> rows (B, cap).
        """
        cap = self.config.bin_capacity
        Ws = self.window
        stored_valid = stored >= 0
        stored_len = stored_valid.sum(axis=1)
        total = st_total + n_dyn
        i_idx = jnp.arange(Ws, dtype=jnp.int32)[None, :]
        rank_s = (st_total - stored_len + n_dyn)[:, None] + i_idx
        keep_s = stored_valid & (rank_s >= (total[:, None] - cap))
        slot_s = rank_s & (cap - 1)
        slots = jnp.arange(cap, dtype=jnp.int32)[None, :]
        rows = jnp.full(stored.shape[:-1] + (cap,), -1, jnp.int32)
        for i in range(Ws):
            place = keep_s[:, i:i + 1] & (slot_s[:, i:i + 1] == slots)
            rows = jnp.where(place, stored[:, i:i + 1], rows)
        return rows

    def _static_layout(self):
        cap = self.config.bin_capacity
        V = self.config.hash_volume
        zero = jnp.zeros(V, jnp.int32)
        rows = self._static_rows(self.static_ids, self.static_total, zero)
        return rows, self.static_total & (cap - 1)

    def merge(self, dyn_pos: jax.Array, dyn_ext: jax.Array):
        """Merge per-frame dynamic entities; returns (bins_ent, counts)
        bit-identical to ``binning.build_bins`` on the full scene.

        Scatter-free: recomputes slot rows only for the <= D*K bins the
        dynamics cover and selects them into the precomputed static layout
        — all elementwise, so it batches perfectly under vmap (the old
        full-grid scatter formulation didn't).
        """
        cfg = self.config
        cap = cfg.bin_capacity
        V = cfg.hash_volume
        D = self.n_dynamic
        Ax, Ay, Az = self.spans
        K = Ax * Ay * Az

        flat, valid = _covered_bins(dyn_pos, dyn_ext, cfg, self.spans)
        flatf = jnp.where(valid, flat, V).reshape(-1)       # (D*K,)
        DK = D * K
        flatc = jnp.minimum(flatf, V - 1)
        validf = flatf < V

        # Per covered pair: how many valid pairs share its bin (n_dyn), and
        # this pair's dynamic rank (pairs of earlier entities, same bin).
        eq = (flatf[:, None] == flatf[None, :]) & validf[None, :]  # (DK, DK)
        n_dyn_here = eq.sum(axis=1).astype(jnp.int32)
        d_of = jnp.arange(DK, dtype=jnp.int32) // K
        rank_dyn = (eq & (d_of[None, :] < d_of[:, None])).sum(
            axis=1).astype(jnp.int32)

        stored = self.static_ids[flatc]                     # (DK, Ws)
        st_total = self.static_total[flatc]
        total = st_total + n_dyn_here
        rows = self._static_rows(stored, st_total, n_dyn_here)

        # Dynamics overlay (written after statics, ascending entity order —
        # same overwrite sequence as the reference's insertion loop).
        slots = jnp.arange(cap, dtype=jnp.int32)[None, :]
        keep_dyn = validf & (rank_dyn >= total - cap)
        slot_dyn = rank_dyn & (cap - 1)
        for jp in range(DK):
            place = (eq[:, jp][:, None] & keep_dyn[jp]
                     & (slots == slot_dyn[jp]))
            rows = jnp.where(place, d_of[jp], rows)

        # Select the patched rows into the static base (covered bins only).
        bins_ent = self.bins_static
        counts = self.counts_static
        binsv = jnp.arange(V, dtype=jnp.int32)
        for j in range(DK):
            m = binsv == flatf[j]                           # all-false if invalid
            counts = jnp.where(m, total[j] & (cap - 1), counts)
            bins_ent = jnp.where(m[:, None], rows[j][None, :], bins_ent)
        return bins_ent, counts


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
