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


class TestLiveViewer:
    """Terminal live viewer (runtime/viewer.py) — the reference's
    interactive present loop (alternative.cpp:604-687, 774-788)."""

    def make(self):
        from pixel_art_raytracer_tpu.models.deferred import DeferredRenderer
        from pixel_art_raytracer_tpu.runtime.viewer import LiveViewer

        r = DeferredRenderer(SMALL, shadow_max_steps=8)
        return LiveViewer(small_scene(), Light(60, 60, 20), SMALL,
                          renderer=r, scale=2)

    def test_decode_keys(self):
        from pixel_art_raytracer_tpu.runtime.viewer import decode_keys

        keys, quit_, rest = decode_keys("\x1b[A\x1b[D\x1b[5~ah")
        assert keys == ["up", "left", "pageup", "a", "h"]
        assert not quit_ and rest == ""
        # a bare trailing escape is held as a possible split sequence
        assert decode_keys("\x1b") == ([], False, "\x1b")
        assert decode_keys("\x1b[") == ([], False, "\x1b[")
        assert decode_keys("q")[1]
        assert decode_keys("\x1b\x1b")[1]      # Esc + non-CSI byte quits
        # a held partial sequence completed by the next chunk
        assert decode_keys("\x1b" + "[C")[0] == ["right"]

    def test_decode_mouse_events(self):
        from pixel_art_raytracer_tpu.runtime.viewer import decode_events

        # SGR any-motion report: ESC [ < 35 ; col ; row M (1-based cells).
        keys, mouse, quit_, rest = decode_events("\x1b[<35;11;6M\x1b[C")
        assert mouse == (10, 5) and keys == ["right"]
        assert not quit_ and rest == ""
        # The LAST motion in a chunk wins (the reference overwrites
        # mouse_x/mouse_y per event, alternative.cpp:683-685).
        assert decode_events("\x1b[<35;2;2M\x1b[<35;7;3M")[1] == (6, 2)
        # A split report is held for the next chunk.
        keys, mouse, quit_, rest = decode_events("a\x1b[<35;4")
        assert keys == ["a"] and mouse is None and rest == "\x1b[<35;4"
        assert decode_events(rest + ";9M")[1] == (3, 8)

    def test_live_mouse_overlay(self):
        # Mouse motion must move the red cursor-to-light line in the LIVE
        # loop (the reference draws it every frame, alternative.cpp:762-772)
        # and update the hovered pixel readout (alternative.cpp:698-700).
        v = self.make()
        frames = []
        v.step("")
        frames.append(v._render_with_overlay())
        v.step("\x1b[<35;20;10M")             # move cursor to cell (19, 9)
        assert v.mouse == (19 * 2, 9 * 4)     # scale=2: x2 cols, x4 rows
        frames.append(v._render_with_overlay())
        red0 = (frames[0] == np.array([255, 0, 0], np.uint8)).all(-1)
        red1 = (frames[1] == np.array([255, 0, 0], np.uint8)).all(-1)
        assert red0.any() and red1.any()      # line drawn both frames
        assert (red0 != red1).any()           # ...and it moved
        assert isinstance(v.mouse_pixel, tuple)

    def test_ansi_frame_halfblocks(self):
        from pixel_art_raytracer_tpu.runtime.viewer import ansi_frame

        img = np.zeros((4, 3, 3), np.uint8)
        img[0, :, 0] = 255                     # top row red
        text = ansi_frame(img)
        lines = text.split("\n")
        assert len(lines) == 2                 # 4 rows -> 2 half-block rows
        assert "▀" in lines[0]
        assert "38;2;255;0;0" in lines[0]      # red foreground
        assert lines[0].endswith("\x1b[0m")

    def test_live_loop_keys_change_frame(self):
        v = self.make()
        blits = []
        inputs = iter(["", "\x1b[C" * 4 + "o" * 4, "", "\x1b"])
        n = v.run(input_fn=lambda: next(inputs, ""),
                  output_fn=lambda t: blits.append(t),
                  max_frames=10)
        # the bare Esc is held one frame (split-sequence buffering), then
        # promoted to quit when no continuation bytes arrive
        assert n == 5
        assert int(v.state.player_pos[0]) == 50   # 4 x right (+5)
        assert int(v.state.light[0]) == 60 + 20   # 4 x o (+5)
        # the blit after movement differs from the first
        assert blits[1] != blits[2]
        assert "ms/frame" in blits[-1]
