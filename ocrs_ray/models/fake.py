"""Deterministic fake models for hermetic pipeline tests.

Numpy ports of the behavioral contracts of the reference's test fakes
(/root/reference/ocrs/src/lib.rs:335-422) — identical input/output
semantics, vectorized implementation:

- FakeDetectionModel: adds +0.5 to the normalized input, turning a
  [-0.5, 0.5] image into a [0, 1] "probability map"; declares a fixed
  (200, 100) HxW input so tests exercise the pad+resize path.
- FakeRecognitionModel: NCHW (C=1, H=64) input; max-pools width by 4 and
  permutes to [W/4, N, H] so each input column acts as a vector of class
  scores.
"""

from __future__ import annotations

import numpy as np

from ocrs_ray import DEFAULT_ALPHABET

from .protocol import Dim


class FakeDetectionModel:
    """Identity + 0.5 bias "detector" with a fixed 200x100 input."""

    def __init__(self, height: int = 200, width: int = 100):
        self._h = height
        self._w = width

    def input_shape(self) -> list[Dim]:
        return [Dim.symbolic("batch"), Dim.fixed(1), Dim.fixed(self._h), Dim.fixed(self._w)]

    def run(self, input: np.ndarray) -> np.ndarray:
        return (input + 0.5).astype(np.float32)


class FakeRecognitionModel:
    """Max-pool width/4 and reinterpret rows as class scores."""

    W_SCALE = 4

    def input_shape(self) -> list[Dim]:
        return [Dim.symbolic("batch"), Dim.fixed(1), Dim.fixed(64), Dim.symbolic("seq")]

    def run(self, input: np.ndarray) -> np.ndarray:
        n, c, h, w = input.shape
        assert c == 1 and h == 64
        nhw = input[:, 0]
        w_out = w // self.W_SCALE
        pooled = nhw[:, :, : w_out * self.W_SCALE].reshape(n, h, w_out, self.W_SCALE).max(axis=3)
        # [N, H, W/4] -> [W/4, N, H]; last axis = class scores.
        return np.ascontiguousarray(pooled.transpose(2, 0, 1)).astype(np.float32)


def make_fake_alphabet() -> str:
    """First 63 chars of the default alphabet (64 output classes - blank).

    Parity: /root/reference/ocrs/src/lib.rs:424-427.
    """
    return DEFAULT_ALPHABET[:63]
