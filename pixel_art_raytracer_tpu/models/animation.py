"""Animation runtime: jitted step + batched multi-frame rendering.

The reference's interactivity is integer field writes driven by key events,
picked up by the next frame's rebin/trace (alternative.cpp:628-687; SURVEY.md
§3.5).  The framework equivalent is a ``WorldState`` pytree evolved by a pure
``step`` function and a ``lax.scan`` over frames, so a whole animation batch
compiles into one device program.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import RenderConfig, DEFAULT_CONFIG
from .deferred import DeferredRenderer, DeviceScene

# Key step size (alternative.cpp:643-678): every binding moves by 5 units.
KEY_STEP = 5

# Key -> (target, axis, sign): arrows/page move the player box (entity 0),
# a/k/j/u/h/o move the light.
KEY_BINDINGS = {
    "left": ("player", 0, -1),
    "right": ("player", 0, +1),
    "up": ("player", 2, +1),
    "down": ("player", 2, -1),
    "pagedown": ("player", 1, -1),
    "pageup": ("player", 1, +1),
    "a": ("light", 2, -1),
    "k": ("light", 2, +1),
    "j": ("light", 1, -1),
    "u": ("light", 1, +1),
    "h": ("light", 0, -1),
    "o": ("light", 0, +1),
}


class WorldState(NamedTuple):
    """Per-frame mutable world state (the rest of the scene is static)."""

    player_pos: jax.Array  # (3,) int32 — entity 0 position
    light: jax.Array       # (3,) int32


def apply_keys(state: WorldState, keys: list[str]) -> WorldState:
    """Host-side event application, one frame's worth of key presses."""
    player = np.asarray(state.player_pos)
    light = np.asarray(state.light)
    for key in keys:
        target, axis, sign = KEY_BINDINGS[key]
        if target == "player":
            player = player.copy()
            player[axis] += sign * KEY_STEP
        else:
            light = light.copy()
            light[axis] += sign * KEY_STEP
    return WorldState(player_pos=jnp.asarray(player, jnp.int32),
                      light=jnp.asarray(light, jnp.int32))


def scene_with_player(dscene: DeviceScene, player_pos: jax.Array) -> DeviceScene:
    """Functionally update entity 0's position (the reference's player)."""
    return dscene._replace(pos=dscene.pos.at[0].set(player_pos))


class AnimationRenderer:
    """Batched multi-frame renderer: scan(step -> render) fully on device."""

    def __init__(self, renderer: DeferredRenderer | None = None,
                 config: RenderConfig = DEFAULT_CONFIG,
                 static_bins=None, frames_per_step: int = 1,
                 batched: bool = True):
        """``static_bins``: an ops.static_bins.StaticBins cache for the
        scene's static tail; when given, per-frame binning merges only the
        dynamic entities (bit-identical tables, far cheaper).

        ``frames_per_step``: frames vmapped inside each scan step (scan
        path only).  Grouping amortises per-step overhead but vmapped
        Pallas kernels measured slower on v5e (160 vs 176 Mrays/s at G=4),
        so the default stays 1.

        ``batched``: render the batch as one phase-decomposed device
        program (models/batched.py) — both Pallas kernels launch once on a
        (frames, row_blocks) grid and all XLA prep is frame-batched.
        Pixel-identical to the scan path and ~2x faster on v5e; requires
        the Pallas trace + Pallas shadow configuration (other
        configurations silently use the scan path)."""
        self.renderer = renderer or DeferredRenderer(config)
        self.config = self.renderer.config
        self.static_bins = static_bins
        self.frames_per_step = frames_per_step
        self.batched = batched
        # Shadow-kernel rows per block for the batched path (must divide
        # the bin size and view height and be a sublane multiple; falls
        # back to 8 otherwise).  Whole-bin-row blocks amortise the
        # per-candidate scalar loads (190 vs 182 Mrays/s on v5e graybox).
        self.shadow_rows = 40
        # Lane tiles per shadow row block, each with its own exact pruned
        # candidate list (per-corridor pruning, vectorized).  G=2 vs G=4
        # measured EQUAL within noise on v5e graybox (interleaved A/B at
        # F=64; sequential comparisons drift by up to 0.07 ms/frame with
        # ambient tunnel load — see CLAUDE.md round-3 notes).  Post
        # winner-direct, G=1 edged G=2 in two separate interleaved
        # sessions (0.801 vs 0.813, then 0.807 vs 0.826 ms/frame FULL at
        # F=64) — half the grid steps now wins since the per-step window
        # floor dominates the kernel body.
        self.shadow_lane_groups = 1
        # Trace-kernel screen rows per block (must divide bin_size and the
        # view height, sublane multiple).  Whole-bin-row blocks read each
        # bin row's candidate table slice ONCE instead of bin_size/R times
        # (~1.5 MB per re-read on graybox): R=40 measured 0.864 vs 0.888
        # ms/frame full-pipeline at F=64.  The keys stash
        # (R * n_cands * lane_tile * 4 B, 5.2 MB at R=40) must leave room
        # for the table slices and outputs in the ~16 MB VMEM budget —
        # _default_trace_rows falls back to 8 when it wouldn't.
        self.trace_rows = self._default_trace_rows()
        # Trace-kernel column compaction bound (opt-in via
        # enable_trace_compaction()): fewer candidate rows, but the per-bin
        # masked maxima the early-exit bookkeeping then needs measured
        # SLOWER than the structured full-width kernel on v5e (187 vs 265
        # Mrays/s on graybox) — default off; a runtime guard reroutes
        # overflowing frames to the uncompacted kernel either way.
        self.trace_compact = None
        # Structured slot compaction: keep only the first k slots of every
        # bin in the trace tables (live entries are a slot prefix; the
        # early-exit bookkeeping stays slice-based).  Derived bound =
        # static per-bin max + one per dynamic entity (exactness comes
        # from the runtime max(counts) guard either way — a frame beyond
        # the bound reroutes to the full-cap kernel); graybox: 6+1=7 of 8
        # (-12.5% trace rows).  None = full capacity.
        #
        # DEFAULT OFF since round 3: with whole-bin-row trace blocks
        # (TR=40) and the static field table, an interleaved A/B measured
        # the compacted tables SLOWER (cap=7 0.866 vs cap=8/off 0.801
        # ms/frame full-pipeline, F=64 graybox) — the narrower table
        # slices no longer pay for the extra prep slicing.  Opt back in
        # via enable_slot_compaction() for capacity-bound scenes where
        # the smaller NC makes a kernel layout feasible at all.
        self.trace_slot_cap = None
        self._derived_slot_cap = None
        if static_bins is not None:
            cap = self.config.bin_capacity
            smax = int((np.asarray(static_bins.static_total)
                        & (cap - 1)).max())
            sc = min(cap, smax + static_bins.n_dynamic)
            self._derived_slot_cap = sc if sc < cap else None
        self._render_states_jit = jax.jit(
            self._render_states, static_argnames=("directional",))

    def _default_trace_rows(self) -> int:
        """Largest legal trace-kernel row block that fits VMEM.

        Legal: sublane multiple (8) dividing both the bin size and the
        view height (trace_keys_pallas asserts the same).  Fit: keys
        stash + per-bin maxima scratch + double-buffered table slice and
        outputs within a conservative 12 MB of the ~16 MB VMEM budget
        (13 table rows bounds every field layout, compact included).
        """
        cfg = self.config
        w_pad = -(-cfg.view_width // 128) * 128
        wt = min(512, w_pad)
        n_cands = cfg.hash_length * cfg.bin_capacity
        best = 8
        for R in range(8, cfg.bin_size + 1, 8):
            if cfg.bin_size % R or cfg.view_height % R:
                continue
            vmem = 4 * wt * (R * n_cands            # keys stash
                             + cfg.hash_length * R  # per-bin maxima
                             + 2 * 13 * n_cands     # table slice (x2)
                             + 2 * 7 * R)           # outputs (x2)
            if vmem <= 12 * 2 ** 20:
                best = R
        return best

    def enable_slot_compaction(self) -> "AnimationRenderer":
        """Opt back into structured trace slot compaction with the bound
        derived at construction (see the constructor note: measured slower
        than full capacity on graybox since the whole-bin-row trace
        blocks, but the smaller candidate-row count can matter for
        capacity-bound scenes)."""
        self.trace_slot_cap = self._derived_slot_cap
        return self

    def enable_trace_compaction(self) -> "AnimationRenderer":
        """Derive the column-compaction bound from the static bin cache:
        worst-case live candidates per (bin_x, bin_y) column plus the
        dynamics' z-span margin, rounded to a sublane multiple."""
        assert self.static_bins is not None, "needs a StaticBins cache"
        cfg = self.config
        cap = cfg.bin_capacity
        counts = np.asarray(self.static_bins.static_total) & (cap - 1)
        col_max = int(counts.reshape(cfg.hash_width, cfg.hash_height,
                                     cfg.hash_length).sum(axis=2).max())
        bound = col_max + self.static_bins.n_dynamic * self.renderer.spans[2]
        ncc = min(-(-bound // 8) * 8, cfg.hash_length * cap)
        if ncc < cfg.hash_length * cap:
            self.trace_compact = ncc
        return self

    def _batched_capable(self, dscene) -> bool:
        r = self.renderer
        cfg = self.config
        kernel_ok = (cfg.bin_size % 8 == 0 and cfg.view_height % 8 == 0)
        depth_ok = (dscene.depth_d0 is not None
                    or r.depth_segments is not None)
        return (self.batched and r.shadow_impl == "pallas"
                and r.trace_impl in ("auto", "pallas")
                and kernel_ok and depth_ok
                and (self.static_bins is None
                     or self.static_bins.n_dynamic == 1))

    def _directional_capable(self) -> bool:
        """The directional fast path extends the membership row axis by
        VY*VZ variants, multiplying the shadow kernel's per-block t_row
        VMEM slice; require the (double-buffered) slice to stay within
        ~6 MB of the ~16 MB budget.  Scenes beyond it (huge grids) run
        the per-frame scan extension instead."""
        from ..ops import shadow_dir, shadow_fast

        cfg = self.config
        r = self.renderer
        tables = r.shadow_tables or shadow_fast.default_tables(
            cfg, max_steps=r.shadow_max_steps)
        SZ = tables.sz_hi - tables.sz_lo
        ez = SZ * shadow_dir.VY * shadow_dir.VZ
        n_words = -(-cfg.hash_volume // 32)
        w_pad = -(-cfg.view_width // 128) * 128
        gw = w_pad // max(1, self.shadow_lane_groups)
        return 2 * 4 * ez * n_words * gw <= 6 * 2 ** 20

    def render_states(self, dscene: DeviceScene, player_pos: jax.Array,
                      lights: jax.Array,
                      directional: bool = False) -> jax.Array:
        """Render one frame per state row.

        player_pos: (F, 3) int32; lights: (F, 3) int32 — or (F, L, 3) for
        additive multi-light frames (the batched pipeline runs its shadow
        phases once per light; see models/batched.py).  With
        ``directional=True``, lights is (F, 3) float32 per-frame light
        *directions* (ops.shade.shade_directional semantics; the batched
        pipeline runs the extended-start-space fast path,
        ops/shadow_dir.py).
        Returns (F, H, W, 3) uint8.  Compiled once per (scene shape, F).
        """
        return self._render_states_jit(dscene, player_pos, lights,
                                       directional=directional)

    def _frame(self, dscene, player, light, directional: bool = False):
        r = self.renderer
        scene_f = scene_with_player(dscene, player)
        if self.static_bins is not None:
            d = self.static_bins.n_dynamic
            bins_ent, counts = self.static_bins.merge(scene_f.pos[:d],
                                                      scene_f.ext[:d])
        else:
            bins_ent, counts = r.build_bins(scene_f)
        gbuf = r.trace(scene_f, bins_ent, counts)
        if directional:
            from ..ops import shade as shade_ops

            return shade_ops.shade_directional(
                scene_f.pos, scene_f.ext, gbuf, bins_ent, counts, light,
                self.config)
        if light.ndim == 2:
            # Multi-light frame on the scan path (ops.shade.shade_multi).
            from ..ops import shade as shade_ops

            return shade_ops.shade_multi(
                scene_f.pos, scene_f.ext, gbuf, bins_ent, counts, light,
                self.config, r.shadow_max_steps, r.shadow_impl,
                r.shadow_tables)
        return r.shade(scene_f, gbuf, bins_ent, counts, light)

    def _render_states(self, dscene, player_pos, lights,
                       directional: bool = False):
        cfg = self.config
        H, W = cfg.view_height, cfg.view_width
        F = player_pos.shape[0]
        if self._batched_capable(dscene) and not (
                directional and not self._directional_capable()):
            from .batched import render_states_batched

            return render_states_batched(self.renderer, self.static_bins,
                                         dscene, player_pos, lights,
                                         shadow_rows=self.shadow_rows,
                                         trace_compact=self.trace_compact,
                                         lane_groups=self.shadow_lane_groups,
                                         trace_rows=self.trace_rows,
                                         trace_slot_cap=self.trace_slot_cap,
                                         directional=directional)
        G = (self.frames_per_step
             if lights.ndim == 2 and not directional else 1)
        while F % G:
            G -= 1

        def one(player, light):
            frame = self._frame(dscene, player, light,
                                directional=directional)
            # Flatten (W, 3) so the scan-stacked uint8 buffer has a dense
            # minor dimension — TPU tiling would pad a minor dim of 3 to
            # 128 (a 42x memory and bandwidth blowup).
            return frame.reshape(H, W * 3)

        if G == 1:
            def body(_, pl):
                return None, one(*pl)

            _, frames = jax.lax.scan(body, None, (player_pos, lights))
            return frames.reshape(-1, H, W, 3)

        def body(_, pl):
            player, light = pl
            return None, jax.vmap(one)(player, light)

        _, frames = jax.lax.scan(
            body, None, (player_pos.reshape(F // G, G, 3),
                         lights.reshape(F // G, G, 3)))
        return frames.reshape(-1, H, W, 3)

    # -- scripted sweeps ---------------------------------------------------

    def light_sweep_states(self, n_frames: int, player_pos,
                           center=None, radius: int = 140):
        """A circular light sweep (the demo-gif-style camera/light motion)."""
        cfg = self.config
        if center is None:
            center = (cfg.view_width // 2, cfg.view_height // 2,
                      cfg.view_length // 4)
        t = np.linspace(0.0, 2.0 * np.pi, n_frames, endpoint=False)
        lx = (center[0] + radius * np.cos(t)).astype(np.int32)
        ly = np.full(n_frames, center[1], np.int32)
        lz = (center[2] + (radius // 2) * np.sin(t)).astype(np.int32)
        lights = np.stack([lx, ly, lz], axis=1)
        players = np.broadcast_to(np.asarray(player_pos, np.int32),
                                  (n_frames, 3))
        return (jnp.asarray(players), jnp.asarray(lights))

    def render_long(self, dscene: DeviceScene, player_pos, lights,
                    checkpoint_dir, chunk_size: int = 16):
        """Long animation render with chunked checkpoint/resume.

        Renders ``player_pos/lights`` (F, 3) in fixed-size chunks; completed
        chunks persist to ``checkpoint_dir`` and are skipped on restart
        (utils/checkpoint.py).  Returns all (F, H, W, 3) frames.
        """
        import numpy as np

        from ..utils.checkpoint import render_with_checkpoints

        F = player_pos.shape[0]
        pad = (-F) % chunk_size
        players_p = jnp.concatenate(
            [jnp.asarray(player_pos),
             jnp.broadcast_to(jnp.asarray(player_pos)[-1:], (pad, 3))])
        lights_p = jnp.concatenate(
            [jnp.asarray(lights),
             jnp.broadcast_to(jnp.asarray(lights)[-1:], (pad, 3))])

        def render_chunk(start, count):
            p = players_p[start:start + chunk_size]
            l = lights_p[start:start + chunk_size]
            frames = self.render_states(dscene, p, l)
            return np.asarray(frames)[:count]

        return render_with_checkpoints(render_chunk, F, checkpoint_dir,
                                       chunk_size)

    def render_script(self, dscene: DeviceScene, initial: WorldState,
                      script: list[list[str]]) -> tuple[jax.Array, WorldState]:
        """Apply a per-frame key-event script, render each resulting frame.

        Mirrors the reference event loop: events mutate state, the next
        frame renders the mutated world.  Returns (frames, final_state).
        """
        players, lights = [], []
        state = initial
        for keys in script:
            state = apply_keys(state, keys)
            players.append(np.asarray(state.player_pos))
            lights.append(np.asarray(state.light))
        frames = self.render_states(
            dscene,
            jnp.asarray(np.stack(players), jnp.int32),
            jnp.asarray(np.stack(lights), jnp.int32))
        return frames, state
