"""Param pytree persistence (msgpack via flax.serialization).

The facekit analog of the reference's serialized ``.engine`` files
(``src/arcface.cpp:45-69`` loads them at startup): model "checkpoints" are
msgpack-serialized pytrees loaded once at server start, then jit-compiled.
"""

from __future__ import annotations

from typing import Any

from flax import serialization


def save_params(params: Any, path: str) -> None:
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(params))


def load_params(template: Any, path: str) -> Any:
    """Load params into the structure of ``template`` (e.g. a random init)."""
    with open(path, "rb") as f:
        return serialization.from_bytes(template, f.read())
