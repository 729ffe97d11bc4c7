"""CPU oracle renderers used as the parity anchor for golden tests."""

from .cpu_renderer import (
    GBuffer, build_bins, trace_pixels, shade, draw_line, render_frame,
)

__all__ = [
    "GBuffer", "build_bins", "trace_pixels", "shade", "draw_line",
    "render_frame",
]
