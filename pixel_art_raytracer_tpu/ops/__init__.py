"""Device-side array ops: binning, tracing, shading, overlays."""
