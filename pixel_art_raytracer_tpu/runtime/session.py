"""Interactive session runtime: the reference event loop, headless.

The reference runs an SDL window: poll events -> mutate player/light ->
render -> blit, printing the hovered pixel's G-buffer fields and drawing a
red cursor-to-light debug line (alternative.cpp:628-817).  This runtime keeps
those capabilities without a display: events come from a script (or are fed
interactively via ``feed``), frames accumulate in memory or stream to
GIF/PNG, and the mouse inspector + overlay line work on the host copy.
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax.numpy as jnp

from ..config import RenderConfig, DEFAULT_CONFIG
from ..scene import Scene, Light
from ..models.deferred import DeferredRenderer, DeviceScene
from ..models.animation import WorldState, apply_keys, scene_with_player
from ..oracle.cpu_renderer import draw_line
from ..utils.gif import write_gif


@dataclasses.dataclass
class FrameRecord:
    image: np.ndarray                    # (H, W, 3) uint8, with overlay
    mouse_pixel_y: int
    mouse_pixel_z: int


class Session:
    """Headless interactive loop over a scene.

    Example::

        s = Session(graybox_world())
        s.feed(["left", "left"])    # one frame with two key events
        s.feed([])                  # one idle frame
        s.save_gif("out.gif")
    """

    def __init__(self, scene: Scene, light: Light | None = None,
                 config: RenderConfig = DEFAULT_CONFIG,
                 renderer: DeferredRenderer | None = None):
        self.config = config
        self.renderer = renderer or DeferredRenderer(config)
        self.renderer.spans = self.renderer.spans_for(scene)
        self.dscene = DeviceScene.from_scene(scene, config)
        if light is None:
            light = Light(config.view_width, config.view_height // 2,
                          config.view_length // 4)
        self.state = WorldState(
            player_pos=jnp.asarray(scene.pos[0], jnp.int32),
            light=jnp.asarray(light.as_array(), jnp.int32))
        self.mouse = (0, 0)
        self.frames: list[FrameRecord] = []
        self.running = True

    # -- event handling (alternative.cpp:630-687) --------------------------

    def feed(self, keys: list[str], mouse: tuple[int, int] | None = None
             ) -> FrameRecord:
        """Apply one frame's events, render, record, return the frame."""
        if "escape" in keys:
            self.running = False
            keys = [k for k in keys if k != "escape"]
        self.state = apply_keys(self.state, keys)
        if mouse is not None:
            self.mouse = mouse
        return self._render_frame()

    def run_script(self, script: list[list[str]]) -> list[FrameRecord]:
        for keys in script:
            if not self.running:
                break
            self.feed(keys)
        return self.frames

    # -- rendering ---------------------------------------------------------

    def _render_frame(self) -> FrameRecord:
        scene_f = scene_with_player(self.dscene, self.state.player_pos)
        gbuf, frame = self.renderer.render_with_gbuffer(scene_f,
                                                        self.state.light)
        image = np.asarray(frame).copy()
        cfg = self.config

        # Mouse-pixel inspector (alternative.cpp:380-382, 698-700).
        mx = min(max(self.mouse[0], 0), cfg.view_width - 1)
        my = min(max(self.mouse[1], 0), cfg.view_height - 1)
        mp_y = int(np.asarray(gbuf.y)[my, mx])
        mp_z = int(np.asarray(gbuf.z)[my, mx])

        # Debug overlay: red line from hovered pixel to the light
        # (alternative.cpp:762-772).
        light = np.asarray(self.state.light)
        draw_line(image, self.mouse[0],
                  cfg.view_height - (mp_y + mp_z),
                  int(light[0]), cfg.view_height - int(light[1] + light[2]),
                  (255, 0, 0))

        rec = FrameRecord(image=image, mouse_pixel_y=mp_y, mouse_pixel_z=mp_z)
        self.frames.append(rec)
        return rec

    # -- debug / observability --------------------------------------------

    def debug_report(self) -> str:
        """Debug-build state dump (alternative.cpp:790-813 equivalent):
        player AABB corners plus the bin-occupancy slice through the
        player's bin column."""
        cfg = self.config
        player = np.asarray(self.state.player_pos)
        ext = np.asarray(self.dscene.ext[0])
        scene_f = scene_with_player(self.dscene, self.state.player_pos)
        _, counts = self.renderer.build_bins(scene_f)
        counts = np.asarray(counts).reshape(cfg.hash_width, cfg.hash_height,
                                            cfg.hash_length)
        bx = min(max(int(player[0]) // cfg.bin_size, 0), cfg.hash_width - 1)
        lines = [
            f"<{player[0]}, {player[1]}, {player[2]}>",
            f"<{player[0] + ext[0]}, {player[1] + ext[1]}, "
            f"{player[2] + ext[2]}>",
        ]
        for j in range(cfg.hash_height):
            lines.append(" ".join(str(counts[bx, j, k])
                                  for k in range(cfg.hash_length)))
        return "\n".join(lines)

    def normal_view(self) -> np.ndarray:
        """Debug normal visualisation using the reference's Vector->Color
        cast (sprites.hpp:37-51)."""
        from ..ops.cstyle import normal_to_debug_color

        scene_f = scene_with_player(self.dscene, self.state.player_pos)
        gbuf, _ = self.renderer.render_with_gbuffer(scene_f, self.state.light)
        n = np.asarray(gbuf.normal)
        with np.errstate(invalid="ignore"):
            r, g, b = normal_to_debug_color(n[..., 0], n[..., 1], n[..., 2])
        return np.stack([r, g, b], axis=-1)

    # -- writeback ---------------------------------------------------------

    def save_gif(self, path, delay_cs: int = 4) -> str:
        assert self.frames, "no frames rendered"
        stack = np.stack([f.image for f in self.frames])
        return write_gif(path, stack, delay_cs=delay_cs)
