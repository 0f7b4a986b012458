"""Deployment surface: AOT-exported serving artifacts (jax.export)."""

from .export import (ServingModel, build_serving_fn, export_serving,
                     load_serving)

__all__ = ["ServingModel", "build_serving_fn", "export_serving",
           "load_serving"]
