"""Device-mesh scaling for batched rendering and training.

The reference is single-threaded, single-process (SURVEY.md §2 checklist);
there is nothing to translate, so the multi-chip design is native
``jax.sharding``:

  * **frame axis ("data parallel")** — frames of an animation batch are
    independent, so the batch dimension shards across the mesh with zero
    communication (frames are this renderer's analog of a training batch).
  * **row axis ("spatial/sequence parallel")** — within one frame every
    pixel row is independent given the (replicated, small) bin table, so the
    image H dimension shards across the second mesh axis; XLA partitions the
    per-pixel compute and inserts no collectives on the forward pass.
  * Scene arrays and bin tables are replicated: they are a few MB and every
    shard reads all of them (same reasoning that keeps them in VMEM on one
    chip).
  * The training step (inverse rendering) is classic DP: per-shard gradient
    then a mean — XLA inserts the psum over the mesh from the sharding
    annotations alone.

Tensor/pipeline/expert parallelism do not apply to this model family: there
are no weight matrices to split (TP), the three pipeline stages are fused
into one kernel-sized program per frame (PP), and there is no routed
sparsity (EP).  The closest TP analog — sharding the entity list with an
argmin-by-depth merge — loses to replication at every scene size that fits
in HBM, and is documented here rather than built.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

frame_axis = "frames"
row_axis = "rows"


def make_mesh(n_devices: int | None = None,
              frame_parallel: int | None = None) -> Mesh:
    """Build an (frames, rows) mesh over the first n devices.

    ``frame_parallel`` fixes the frame-axis size; by default the mesh is
    split as evenly as possible (frames-major).
    """
    devices = jax.devices()
    n = n_devices or len(devices)
    if len(devices) < n:
        raise ValueError(
            f"make_mesh({n}): backend supplies only {len(devices)} devices "
            f"({devices[0].platform}); for a virtual CPU mesh set XLA_FLAGS="
            f"--xla_force_host_platform_device_count={n} before jax "
            f"initialises")
    devices = np.asarray(devices[:n])
    if frame_parallel is None:
        frame_parallel = 1
        for cand in range(int(np.sqrt(n)), 0, -1):
            if n % cand == 0:
                frame_parallel = cand
                break
    assert n % frame_parallel == 0
    grid = devices.reshape(frame_parallel, n // frame_parallel)
    return Mesh(grid, (frame_axis, row_axis))


def render_frames_sharded(anim_renderer, dscene, player_pos, lights,
                          mesh: Mesh) -> jax.Array:
    """Render an animation batch sharded over (frames, rows).

    player_pos, lights: (F, 3) int32 with F divisible by the frame-axis
    size; the image height must divide by the row-axis size.  Returns
    (F, H, W, 3) uint8 sharded P(frames, rows).
    """
    rep = NamedSharding(mesh, P())
    state_sh = NamedSharding(mesh, P(frame_axis))
    out_sh = NamedSharding(mesh, P(frame_axis, row_axis))

    def render(ds, players, lights):
        frames = jax.vmap(lambda p, l: anim_renderer._frame(ds, p, l))(
            players, lights)
        return jax.lax.with_sharding_constraint(frames, out_sh)

    fn = jax.jit(render,
                 in_shardings=(rep, state_sh, state_sh),
                 out_shardings=out_sh)
    return fn(dscene, player_pos, lights)


def render_frames_shardmap(anim_renderer, dscene, player_pos, lights,
                           mesh: Mesh) -> jax.Array:
    """Render an animation batch with the *Pallas fast path* sharded over
    (frames, rows) via shard_map.

    GSPMD cannot partition a ``pallas_call``, so the flagship kernels run
    inside an explicit shard_map: each shard scans its local frames and
    renders its own row window through the unchanged single-chip kernels
    (the trace kernel takes the shard's absolute row offset via scalar
    prefetch; the shadow driver offsets its per-block tables).  Scene
    arrays and bin tables are replicated — same reasoning that keeps them
    in VMEM on one chip — so the forward pass needs no collectives.

    Requires: F divisible by the frame axis, and H / row-axis-size a
    multiple of the bin size (row blocks must stay inside one bin row).
    Returns (F, H, W, 3) uint8 sharded P(frames, rows).
    """
    from jax import shard_map

    cfg = anim_renderer.config
    H, W = cfg.view_height, cfg.view_width
    RP = mesh.shape[row_axis]
    n_rows = H // RP
    assert n_rows % cfg.bin_size == 0 or RP == 1, \
        f"rows-per-shard {n_rows} must be a multiple of bin_size"
    r = anim_renderer.renderer
    cache = anim_renderer.static_bins

    def shard_fn(ds, players_l, lights_l):
        row0 = jax.lax.axis_index(row_axis) * n_rows

        if RP == 1 and anim_renderer._batched_capable(ds):
            # Frame-only sharding: each shard renders its local frames
            # through the whole-batch pipeline (models/batched.py) — both
            # kernels launch once per shard on a (local_frames, row_blocks)
            # grid.
            from ..models.batched import render_states_batched

            return render_states_batched(r, cache, ds, players_l, lights_l)

        def body(_, pl):
            p, l = pl
            scene_f = ds._replace(pos=ds.pos.at[0].set(p))
            if cache is not None:
                d = cache.n_dynamic
                be, cnt = cache.merge(scene_f.pos[:d], scene_f.ext[:d])
            else:
                be, cnt = r.build_bins(scene_f)
            gbuf = r.trace(scene_f, be, cnt, row0=row0, n_rows=n_rows)
            frame = r.shade(scene_f, gbuf, be, cnt, l, row0=row0)
            return None, frame.reshape(n_rows, W * 3)

        _, frames = jax.lax.scan(body, None, (players_l, lights_l))
        return frames.reshape(-1, n_rows, W, 3)

    fn = shard_map(shard_fn, mesh=mesh,
                   in_specs=(P(), P(frame_axis), P(frame_axis)),
                   out_specs=P(frame_axis, row_axis),
                   check_vma=False)
    return jax.jit(fn)(dscene, player_pos, lights)


def sharded_train_step(fitter, light, opt_state, dscene, targets,
                       mesh: Mesh):
    """One data-parallel inverse-rendering step over a sharded target batch.

    targets: (F, H, W, 3) float32, F divisible by the frame axis; the
    per-shard gradients mean-reduce across the mesh (XLA inserts the psum).
    Returns (light, opt_state, loss).
    """
    rep = NamedSharding(mesh, P())
    tgt_sh = NamedSharding(mesh, P(frame_axis, row_axis))

    fn = jax.jit(
        lambda l, o, d, t: fitter.train_step_impl(l, o, d, t),
        in_shardings=(rep, rep, rep, tgt_sh),
        out_shardings=(rep, rep, rep))
    return fn(light, opt_state, dscene, targets)
