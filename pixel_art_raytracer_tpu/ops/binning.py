"""Spatial-hash binning as a JAX array program.

The reference rebuilds its uniform hash grid every frame with a serial
scatter loop over all entities (``count_entities_in_bins``,
alternative.cpp:195-269).  A serial scatter does not vectorise, so here the
rebuild is expressed TPU-style:

  1. enumerate (entity, covered-bin) pairs over a *static* per-entity offset
     grid (the grid bound comes from the scene's maximum extents, so shapes
     stay static under jit),
  2. stable-sort the pairs by flat bin id — pair order inside a bin is then
     exactly the reference's insertion order (entity-major, bin offsets
     x-major/y/z),
  3. per-bin ranks come from the sorted order; the wrap-at-capacity overwrite
     (quirk Q3, alternative.cpp:259-264) reduces to "rank r survives iff
     r >= total - capacity, landing in slot r & (capacity-1)", and the
     tracer-visible occupancy is ``total & (capacity-1)``,
  4. one deterministic scatter (all surviving (bin, slot) targets are unique)
     builds the dense ``(hash_volume, capacity)`` table.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..config import RenderConfig
from .cstyle import c_div


def entity_span_bound(ext_max: np.ndarray, config: RenderConfig) -> tuple[int, int, int]:
    """Static per-axis bound on how many bins one entity can cover.

    ``ext_max`` is the elementwise max extent over the scene (host numpy).
    The y range shears with z (screen-space), so its bound uses ey+ez.
    """
    bs = config.bin_size
    ex, ey, ez = (int(v) for v in ext_max)
    return (ex // bs + 2, (ey + ez) // bs + 2, ez // bs + 2)


def bin_totals_numpy(pos, ext, config: RenderConfig) -> np.ndarray:
    """Host-side per-bin insertion totals (before the wrap), pure numpy.

    Mirrors the cull + covered-range enumeration of :func:`build_bins`
    (alternative.cpp:195-269) without touching any JAX backend — static
    scene analysis (table derivation, sharding envelope checks) must work
    even when the only initialised backend is a remote TPU.
    """
    cfg = config
    bs = cfg.bin_size
    vh = cfg.view_height
    pos = np.asarray(pos, np.int64)
    ext = np.asarray(ext, np.int64)
    x0, y0, z0 = pos[:, 0], pos[:, 1], pos[:, 2]
    x1, y1, z1 = x0 + ext[:, 0], y0 + ext[:, 1], z0 + ext[:, 2]
    culled = ((x1 < 0) | (x0 >= cfg.view_width)
              | (y1 < -z1)
              | (y0 >= vh - z0 + bs)
              | (z1 < -ext[:, 2] - bs)
              | (z0 > cfg.view_length + bs))
    min_xi = np.maximum(0, c_div(x0, bs))
    min_yi = np.maximum(0, c_div(vh - y1 - z1, bs))
    min_zi = np.maximum(0, c_div(z0, bs))
    max_xi = np.minimum(cfg.hash_width, c_div(x1 + bs - 1, bs))
    max_yi = np.minimum(cfg.hash_height, c_div(vh - y0 - z0 + bs - 1, bs))
    max_zi = np.minimum(cfg.hash_length, c_div(z1 + bs - 1, bs))

    Ax, Ay, Az = entity_span_bound(np.asarray(ext).max(axis=0), cfg)
    oa, ob, oc = np.meshgrid(np.arange(Ax), np.arange(Ay), np.arange(Az),
                             indexing="ij")
    oa, ob, oc = (o.reshape(-1) for o in (oa, ob, oc))
    bx = min_xi[:, None] + oa[None, :]
    by = min_yi[:, None] + ob[None, :]
    bz = min_zi[:, None] + oc[None, :]
    valid = (~culled[:, None]
             & (bx < max_xi[:, None]) & (by < max_yi[:, None])
             & (bz < max_zi[:, None]))
    flat = (bx * cfg.hash_height + by) * cfg.hash_length + bz
    totals = np.zeros(cfg.hash_volume, np.int64)
    np.add.at(totals, flat[valid], 1)
    return totals


def unique_entity_word_pairs(pos, ext, config: RenderConfig) -> int:
    """Host-side count of distinct (entity, membership word) pairs.

    A membership word covers 32 consecutive flat bins (whole z-columns —
    ``hash_length`` divides 32), and the merged candidate compaction
    (shadow_fast.Candidates) emits ONE candidate per (entity, word) among
    the live slots.  Live slots are a subset of all insertions for any
    wrap phase, so the distinct-pair count over all covered bins is a true
    upper bound on merged candidates — usually tighter than the
    wrap-visible slot total when entities span several bins of one word.
    """
    cfg = config
    bs = cfg.bin_size
    vh = cfg.view_height
    pos = np.asarray(pos, np.int64)
    ext = np.asarray(ext, np.int64)
    x0, y0, z0 = pos[:, 0], pos[:, 1], pos[:, 2]
    x1, y1, z1 = x0 + ext[:, 0], y0 + ext[:, 1], z0 + ext[:, 2]
    culled = ((x1 < 0) | (x0 >= cfg.view_width)
              | (y1 < -z1)
              | (y0 >= vh - z0 + bs)
              | (z1 < -ext[:, 2] - bs)
              | (z0 > cfg.view_length + bs))
    min_xi = np.maximum(0, c_div(x0, bs))
    min_yi = np.maximum(0, c_div(vh - y1 - z1, bs))
    max_xi = np.minimum(cfg.hash_width, c_div(x1 + bs - 1, bs))
    max_yi = np.minimum(cfg.hash_height, c_div(vh - y0 - z0 + bs - 1, bs))
    # z never splits words (HL | 32): an entity covering any z of a column
    # contributes that column's word.  Word id = (bx*HH + by) // 32*... —
    # enumerate covered (bx, by) pairs and count distinct words.
    has_z = (np.minimum(cfg.hash_length, c_div(z1 + bs - 1, bs))
             > np.maximum(0, c_div(z0, bs)))
    Ax, Ay, _ = entity_span_bound(np.asarray(ext).max(axis=0), cfg)
    oa, ob = np.meshgrid(np.arange(Ax), np.arange(Ay), indexing="ij")
    oa, ob = oa.reshape(-1), ob.reshape(-1)
    bx = min_xi[:, None] + oa[None, :]
    by = min_yi[:, None] + ob[None, :]
    valid = (~culled[:, None] & has_z[:, None]
             & (bx < max_xi[:, None]) & (by < max_yi[:, None]))
    cols_per_word = 32 // cfg.hash_length
    word = (bx * cfg.hash_height + by) // cols_per_word
    n_words = -(-cfg.hash_volume // 32)
    eidx = np.broadcast_to(np.arange(len(pos))[:, None], word.shape)
    pair = np.where(valid, eidx * n_words + word, -1)
    return int(len(np.unique(pair[pair >= 0])))


def build_bins(pos: jax.Array, ext: jax.Array, config: RenderConfig,
               spans: tuple[int, int, int]):
    """Rebuild the hash grid.  jit-friendly; ``config`` and ``spans`` static.

    Args:
      pos, ext: (N, 3) int32 device arrays.
      spans: static (Ax, Ay, Az) offset-grid bound from ``entity_span_bound``.

    Returns:
      bins_ent: (hash_volume, capacity) int32, -1 for empty slots.
      counts:   (hash_volume,) int32 — the wrap-visible occupancy.
    """
    cfg = config
    bs = cfg.bin_size
    vh = jnp.int32(cfg.view_height)
    cap = cfg.bin_capacity
    V = cfg.hash_volume
    N = pos.shape[0]
    Ax, Ay, Az = spans
    K = Ax * Ay * Az

    x0, y0, z0 = pos[:, 0], pos[:, 1], pos[:, 2]
    x1, y1, z1 = x0 + ext[:, 0], y0 + ext[:, 1], z0 + ext[:, 2]

    # View cull (alternative.cpp:212-219).
    culled = ((x1 < 0) | (x0 >= cfg.view_width)
              | (y1 < -z1)
              | (y0 >= vh - z0 + bs)
              | (z1 < -ext[:, 2] - bs)
              | (z0 > cfg.view_length + bs))

    # Covered bin ranges with C-truncating division (alternative.cpp:222-240).
    min_xi = jnp.maximum(0, c_div(x0, bs))
    min_yi = jnp.maximum(0, c_div(vh - y1 - z1, bs))
    min_zi = jnp.maximum(0, c_div(z0, bs))
    max_xi = jnp.minimum(cfg.hash_width, c_div(x1 + bs - 1, bs))
    max_yi = jnp.minimum(cfg.hash_height, c_div(vh - y0 - z0 + bs - 1, bs))
    max_zi = jnp.minimum(cfg.hash_length, c_div(z1 + bs - 1, bs))

    # Static offset grid, lexicographic in (x, y, z) to match the reference's
    # scatter loop nesting (alternative.cpp:243-245).
    oa, ob, oc = np.meshgrid(np.arange(Ax), np.arange(Ay), np.arange(Az),
                             indexing="ij")
    oa = jnp.asarray(oa.reshape(-1), jnp.int32)   # (K,)
    ob = jnp.asarray(ob.reshape(-1), jnp.int32)
    oc = jnp.asarray(oc.reshape(-1), jnp.int32)

    bx = min_xi[:, None] + oa[None, :]            # (N, K)
    by = min_yi[:, None] + ob[None, :]
    bz = min_zi[:, None] + oc[None, :]
    valid = (~culled[:, None]
             & (bx < max_xi[:, None]) & (by < max_yi[:, None])
             & (bz < max_zi[:, None]))

    flat = (bx * cfg.hash_height + by) * cfg.hash_length + bz
    flat = jnp.where(valid, flat, V).reshape(N * K)

    # Stable sort keeps insertion order within each bin.
    order = jnp.argsort(flat, stable=True)
    sorted_bin = flat[order]
    pair_ent = (order // K).astype(jnp.int32)

    # Rank within each bin segment.
    idx = jnp.arange(N * K, dtype=jnp.int32)
    seg_start = jnp.concatenate(
        [jnp.ones((1,), bool), sorted_bin[1:] != sorted_bin[:-1]])
    rank = idx - jax.lax.cummax(jnp.where(seg_start, idx, 0))

    # Total insertions per bin (before the wrap).
    totals = jnp.zeros(V + 1, jnp.int32).at[flat].add(1)

    tot_here = totals[sorted_bin]
    keep = (sorted_bin < V) & (rank >= tot_here - cap)
    slot = rank & (cap - 1)
    target = jnp.where(keep, sorted_bin * cap + slot, V * cap)

    bins_ent = jnp.full(V * cap, -1, jnp.int32)
    bins_ent = bins_ent.at[target].set(pair_ent, mode="drop")
    counts = totals[:V] & (cap - 1)
    return bins_ent.reshape(V, cap), counts
