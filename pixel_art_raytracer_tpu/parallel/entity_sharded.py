"""Tensor-parallel analog: shard the ENTITY LIST across the mesh.

The reference has no weight matrices, so the closest TP analog (SURVEY.md
§2 checklist) is splitting the scene's AABB list: every chip bins and
traces only its entity shard, then the partial per-pixel winners merge by
depth key — a two-collective argmax (pmax on the depth, pmin on the global
entity id among depth-tied shards) — and shadow occlusion ORs across
shards.  Scene memory and binning/tracing FLOPs scale 1/n_shards; the
collectives move only (H, W)-sized maps over ICI.

Exactness caveat (documented, tested): the reference's depth compare keeps
the FIRST candidate in global bin (bin_z, slot) visit order
(alternative.cpp:344-346), and bin slot order is a function of global
insertion order incl. the wrap-at-8 overwrite (quirk Q3).  Per-shard bins
visit each shard's entities in relative order, so the sharded render is
pixel-identical to the unsharded one whenever (a) no bin overflows its
capacity with entities from different shards, and (b) depth ties between
different shards' entities resolve to the lower global entity id (which IS
the reference's rule when the tied candidates sit in the same bin in
insertion order).  Scenes violating that are exactly the ones whose
reference output depends on insertion-order accidents; the replicated
paths (mesh.py) remain the parity-exact option.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import RenderConfig
from ..ops import binning, shade as shade_ops, trace
from ..ops.trace import INT32_MIN

INT32_MAX = jnp.iinfo(jnp.int32).max

entity_axis = "entities"


def make_entity_mesh(n_devices: int | None = None) -> Mesh:
    devices = jax.devices()
    n = n_devices or len(devices)
    import numpy as np

    return Mesh(np.asarray(devices[:n]), (entity_axis,))


def envelope_ok(pos, ext, config: RenderConfig) -> tuple[bool, str]:
    """Host-side static check of the exactness envelope (module docstring).

    Sufficient conditions verified:
      * ``early_exit`` off — per-shard exit counters see only local
        occupancy, so the culling heuristic (quirk Q5) would diverge from
        the global scan (alternative.cpp:293-300, 368-374);
      * no bin's insertion total exceeds the capacity — a wrapped bin's
        surviving slots depend on *global* insertion ranks (quirk Q3,
        alternative.cpp:259-264), which per-shard binning cannot see.

    Returns (ok, reason); reason is "" when ok.
    """
    if config.early_exit:
        return False, ("early_exit is on: per-shard exit counters diverge "
                       "from the reference's global bin scan")
    totals = binning.bin_totals_numpy(pos, ext, config)
    if int(totals.max()) > config.bin_capacity:
        return False, (f"bin overflow (max {int(totals.max())} insertions > "
                       f"capacity {config.bin_capacity}): wrap-at-capacity "
                       "slot survival depends on global insertion ranks")
    return True, ""


def render_frame_entity_sharded(renderer, dscene, light, mesh: Mesh,
                                unchecked: bool = False) -> jax.Array:
    """Render one frame with the scene's entities sharded over ``mesh``.

    The entity count must divide by the mesh size (pad the scene with
    culled boxes otherwise).  Returns the (H, W, 3) uint8 frame.

    The exactness envelope (module docstring) is verified host-side before
    launch: scenes with overflowing bins or early-exit enabled raise —
    their reference output depends on global insertion-order accidents that
    per-shard binning cannot reproduce; use the replicated paths
    (parallel/mesh.py) for those.  ``unchecked=True`` skips the check for
    callers that accept the documented divergence.
    """
    if not unchecked:
        ok, reason = envelope_ok(np.asarray(dscene.pos),
                                 np.asarray(dscene.ext), renderer.config)
        if not ok:
            raise ValueError(
                "entity-sharded rendering would silently diverge from the "
                f"reference on this scene: {reason}. Render with the "
                "replicated frame/row sharding (parallel/mesh.py), or pass "
                "unchecked=True to accept the divergence.")
    from jax import shard_map

    r = renderer
    cfg: RenderConfig = r.config
    n_shards = mesh.shape[entity_axis]
    N = dscene.pos.shape[0]
    assert N % n_shards == 0, "entity count must divide the mesh"
    Np = N // n_shards

    def shard_fn(pos_l, ext_l, sid_l, atlas_color, atlas_depth, atlas_normal,
                 palette, light):
        offset = jax.lax.axis_index(entity_axis) * Np

        # Local accel structure + partial primary visibility.
        be, cnt = binning.build_bins(pos_l, ext_l, cfg, r.spans)
        best, winner_l = trace.trace_winner(pos_l, ext_l, sid_l, atlas_depth,
                                            be, cnt, cfg)

        # Merge winners across shards: greatest depth wins; depth ties keep
        # the lowest global entity id.
        gwin = jnp.where(winner_l >= 0, winner_l + offset, INT32_MAX)
        dmax = jax.lax.pmax(best, entity_axis)
        tied = jnp.where((best == dmax) & (gwin < INT32_MAX), gwin,
                         INT32_MAX)
        gw = jax.lax.pmin(tied, entity_axis)
        hit = (dmax > INT32_MIN) & (gw < INT32_MAX)
        mine = hit & (gw >= offset) & (gw < offset + Np)

        # Winning shards materialise their pixels' G-buffer attributes;
        # a psum assembles the full maps (losers contribute zeros).
        gbuf_l = trace.materialize_gbuffer(
            jnp.where(mine, gw - offset, -1), pos_l, ext_l, sid_l,
            atlas_color, atlas_depth, atlas_normal, palette, cfg)

        def merge(x, zero_where):
            return jax.lax.psum(jnp.where(zero_where, x, 0), entity_axis)

        normal = jax.lax.psum(
            jnp.where(mine[..., None], gbuf_l.normal, 0.0), entity_axis)
        color_i = jax.lax.psum(
            jnp.where(mine[..., None], gbuf_l.color.astype(jnp.int32), 0),
            entity_axis)
        bg = jnp.asarray(cfg.background, jnp.int32)
        color = jnp.where(hit[..., None], color_i, bg).astype(jnp.uint8)
        y = merge(gbuf_l.y, mine)
        z = merge(gbuf_l.z, mine)
        ent_g = jnp.where(hit, gw, 0)
        gbuf = trace.GBufferArrays(normal=normal, color=color, y=y, z=z,
                                   entity_index=ent_g)

        # Shadow: every shard marches its own entities; occlusion ORs.
        tl, inv, origin, rb, lb = shade_ops.light_geometry(gbuf, light, cfg)
        # Self-intersection skip needs LOCAL ids: pixels owned by another
        # shard map outside [0, Np) and never match local candidates.
        start_ent_l = gbuf.entity_index - offset
        from ..ops.shadow import trace_light_dynamic

        lit_l = trace_light_dynamic(pos_l, ext_l, be, cnt, rb, lb,
                                    start_ent_l, origin, inv, cfg)
        occluded = jax.lax.pmax((~lit_l).astype(jnp.int32), entity_axis)
        lit = occluded == 0

        factor = shade_ops.brightness_factor(gbuf.normal, tl, lit, cfg)
        rgb = gbuf.color[..., :3].astype(jnp.float32) * factor[..., None]
        return rgb.astype(jnp.uint8)

    fn = shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(entity_axis), P(entity_axis), P(entity_axis),
                  P(), P(), P(), P(), P()),
        out_specs=P(),
        check_vma=False)
    return jax.jit(fn)(dscene.pos, dscene.ext, dscene.sprite_id,
                       dscene.atlas_color, dscene.atlas_depth,
                       dscene.atlas_normal, dscene.palette,
                       jnp.asarray(light, jnp.int32))
