"""Serving-side deployment tooling: AOT program export and compiled-
executable caching for the inference pipelines."""

from d3roma_tpu.serving.aot import (
    ExecutableCache,
    ServingProgram,
    ServingSignature,
    export_serving,
    load_serving,
    save_serving,
)

__all__ = [
    "ExecutableCache",
    "ServingProgram",
    "ServingSignature",
    "export_serving",
    "load_serving",
    "save_serving",
]
