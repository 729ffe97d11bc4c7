"""Interactive session runtime tests (reference event loop semantics)."""

import numpy as np
import pytest

from pixel_art_raytracer_tpu.config import RenderConfig
from pixel_art_raytracer_tpu.scene import SceneBuilder, Light
from pixel_art_raytracer_tpu.runtime.session import Session

SMALL = RenderConfig(view_width=80, view_height=80, view_length=80)


def small_scene():
    b = SceneBuilder(config=SMALL)
    b.insert((30, 20, 20), (20, 20, 20))
    for i in range(3):
        for j in range(3):
            b.insert((i * 24, 0, j * 24), (16, 16, 16))
    return b.build()


class TestSession:
    def make(self):
        from pixel_art_raytracer_tpu.models.deferred import DeferredRenderer

        r = DeferredRenderer(SMALL, shadow_max_steps=8)
        return Session(small_scene(), Light(60, 60, 20), SMALL, renderer=r)

    def test_key_events_move_player(self):
        s = self.make()
        s.feed(["right", "right"])
        assert int(s.state.player_pos[0]) == 40
        s.feed(["pagedown"])
        assert int(s.state.player_pos[1]) == 15
        assert len(s.frames) == 2

    def test_escape_stops(self):
        s = self.make()
        s.run_script([[], ["escape"], []])
        # escape frame still renders; the frame after does not
        assert len(s.frames) == 2
        assert not s.running

    def test_overlay_line_drawn(self, tmp_path):
        s = self.make()
        rec = s.feed([], mouse=(10, 70))
        # red overlay pixels exist
        assert (rec.image == np.array([255, 0, 0])).all(-1).any()
        out = tmp_path / "session.gif"
        s.save_gif(out)
        assert out.exists() and out.stat().st_size > 50

    def test_mouse_inspector_reads_gbuffer(self):
        s = self.make()
        rec = s.feed([], mouse=(5, 79))   # bottom-left: floor tile expected
        assert rec.mouse_pixel_y >= 0


class TestDebugObservability:
    def test_debug_report(self):
        from pixel_art_raytracer_tpu.models.deferred import DeferredRenderer

        r = DeferredRenderer(SMALL, shadow_max_steps=8)
        s = Session(small_scene(), Light(60, 60, 20), SMALL, renderer=r)
        report = s.debug_report()
        lines = report.splitlines()
        assert lines[0] == "<30, 20, 20>"
        assert lines[1] == "<50, 40, 40>"
        assert len(lines) == 2 + SMALL.hash_height

    def test_normal_view(self):
        from pixel_art_raytracer_tpu.models.deferred import DeferredRenderer

        r = DeferredRenderer(SMALL, shadow_max_steps=8)
        s = Session(small_scene(), Light(60, 60, 20), SMALL, renderer=r)
        img = s.normal_view()
        assert img.shape == (80, 80, 3)
        # top faces (0,1,0): length 1, shifted (1,2,1)/4*255 -> (63,127,63)
        assert (img.reshape(-1, 3) == (63, 127, 63)).all(-1).any()
