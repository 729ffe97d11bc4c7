"""Renderer models (pipelines) built from the ops layer."""

from .deferred import DeviceScene, DeferredRenderer

__all__ = ["DeviceScene", "DeferredRenderer"]
