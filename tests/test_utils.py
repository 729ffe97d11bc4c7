"""GIF/PNG writeback, checkpointing, metrics."""

import numpy as np
import pytest
from PIL import Image

from pixel_art_raytracer_tpu.utils import gif as gif_utils
from pixel_art_raytracer_tpu.utils.png import write_png
from pixel_art_raytracer_tpu.utils.checkpoint import (FrameCheckpointer,
                                                      render_with_checkpoints)
from pixel_art_raytracer_tpu.utils.metrics import RenderStats
from pixel_art_raytracer_tpu.runtime import native


def demo_frames(f=3, h=24, w=32):
    rng = np.random.default_rng(0)
    # few-color frames, like shaded palette output
    lut = np.array([[31, 31, 31], [100, 100, 100], [200, 200, 200],
                    [255, 0, 0]], np.uint8)
    idx = rng.integers(0, 4, size=(f, h, w))
    return lut[idx]


class TestGif:
    @pytest.mark.parametrize("encoder", ["python", "native"])
    def test_roundtrip(self, tmp_path, encoder):
        if encoder == "native" and not native.native_available():
            pytest.skip("no native lib")
        frames = demo_frames()
        path = tmp_path / "out.gif"
        used = gif_utils.write_gif(path, frames,
                                   prefer_native=(encoder == "native"))
        assert used == encoder
        img = Image.open(path)
        assert img.size == (32, 24)
        out = []
        try:
            while True:
                out.append(np.asarray(img.convert("RGB")))
                img.seek(img.tell() + 1)
        except EOFError:
            pass
        assert len(out) == 3
        for k in range(3):
            np.testing.assert_array_equal(out[k], frames[k])

    def test_quantize_exact_under_256(self):
        frames = demo_frames()
        idx, pal = gif_utils.quantize_frames(frames)
        assert len(pal) <= 256
        np.testing.assert_array_equal(pal[idx], frames)

    def test_quantize_fallback_over_256(self):
        rng = np.random.default_rng(1)
        frames = rng.integers(0, 256, size=(1, 32, 32, 3)).astype(np.uint8)
        idx, pal = gif_utils.quantize_frames(frames)
        assert len(pal) <= 256
        err = np.abs(pal[idx].astype(int) - frames.astype(int)).mean()
        assert err < 32  # coarse cube, but sane


class TestPng:
    def test_roundtrip(self, tmp_path):
        img = demo_frames(1)[0]
        p = tmp_path / "x.png"
        write_png(p, img)
        np.testing.assert_array_equal(np.asarray(Image.open(p)), img)


class TestCheckpoint:
    def test_resume_skips_rendered_chunks(self, tmp_path):
        calls = []

        def render_chunk(start, count):
            calls.append((start, count))
            return np.full((count, 4, 4, 3), start, np.uint8)

        out1 = render_with_checkpoints(render_chunk, 10, tmp_path,
                                       chunk_size=4)
        assert [c[0] for c in calls] == [0, 4, 8]
        assert out1.shape == (10, 4, 4, 3)

        calls.clear()
        out2 = render_with_checkpoints(render_chunk, 10, tmp_path,
                                       chunk_size=4)
        assert calls == []  # fully resumed from disk
        np.testing.assert_array_equal(out1, out2)

    def test_partial_resume(self, tmp_path):
        ck = FrameCheckpointer(tmp_path, chunk_size=2)
        ck.save_chunk(0, np.zeros((2, 4, 4, 3), np.uint8))
        assert ck.resume_frame() == 2


class TestMetrics:
    def test_rays_accounting(self):
        s = RenderStats(frames=10, height=320, width=480, seconds=1.0)
        assert s.rays_per_frame == 2 * 320 * 480
        assert abs(s.mrays_per_sec - 3.072) < 1e-6
        assert "mrays_per_sec" in s.to_json()


class TestDeviceProbe:
    def test_require_device_cpu(self, monkeypatch):
        # The bounded subprocess probe (utils/device.py) must succeed on
        # the CPU backend; a downed remote tunnel instead raises
        # SystemExit after the timeout (not testable here).  The probe
        # subprocess reads the ENV (conftest's in-process platform switch
        # doesn't reach it), so pin it to cpu explicitly.
        import os

        from pixel_art_raytracer_tpu.utils.device import require_device

        monkeypatch.setenv("JAX_PLATFORMS", "cpu")
        # The ambient sitecustomize (axon_site on PYTHONPATH) re-registers
        # the remote backend inside the subprocess regardless of
        # JAX_PLATFORMS; strip it so this unit test never touches the
        # tunnel.
        pp = os.pathsep.join(
            p for p in os.environ.get("PYTHONPATH", "").split(os.pathsep)
            if p and "axon_site" not in p)
        monkeypatch.setenv("PYTHONPATH", pp)
        monkeypatch.delenv("PALLAS_AXON_POOL_IPS", raising=False)
        assert require_device(timeout_s=120) == "cpu"
