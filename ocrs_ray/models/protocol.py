"""Model protocol: any inference backend with a declared input shape.

Mirrors the extension surface of the reference's `Model` trait
(/root/reference/ocrs/src/model.rs:6-17): `input_shape()` returns a mix
of fixed and symbolic dims; `run(input)` maps a float32 tensor to a
float32 tensor. Fake numpy models implement it for hermetic tests; a
real ONNX backend can implement it without touching pipeline code.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Protocol, runtime_checkable

import numpy as np


@dataclass(frozen=True)
class Dim:
    """One input dimension: fixed size or symbolic name."""

    size: int | None = None
    name: str | None = None

    @property
    def is_fixed(self) -> bool:
        return self.size is not None

    @staticmethod
    def fixed(size: int) -> "Dim":
        return Dim(size=size)

    @staticmethod
    def symbolic(name: str) -> "Dim":
        return Dim(name=name)


@runtime_checkable
class Model(Protocol):
    def input_shape(self) -> list[Dim]:
        """Expected input shape (fixed + symbolic dims)."""
        ...

    def run(self, input: np.ndarray) -> np.ndarray:
        """Run inference on a float32 tensor."""
        ...
