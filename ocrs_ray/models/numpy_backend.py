"""Checkpoint-backed numpy inference runtime: the real-model seam.

Mirrors the reference's model loading surface
(/root/reference/ocrs-cli/src/models.rs:44-64 download-and-cache,
:100-107 `Model::load_file`): `resolve_model` turns a URL-or-path
source into a local file (cache-first; downloading needs network and
fails loudly without it), and `NumpyModel.load_file` deserializes a
checkpoint and runs inference — here a small sequential-op interpreter
over numpy kernels instead of an ONNX runtime, since numpy is the only
inference backend guaranteed in this environment. A real ONNX/rten
backend implements the same `Model` protocol and drops into the same
actor `__init__` without touching pipeline code.

Checkpoint format (`.npz`):
- ``__spec__``: JSON (uint8 bytes) with ``input_shape`` (list of
  ``["fixed", n]`` / ``["sym", name]``) and ``layers`` (list of op
  dicts, see ``_OPS``);
- one array entry per weight, referenced by name from the op dicts.
"""

from __future__ import annotations

import json
import os
import shutil
from urllib.parse import urlparse

import numpy as np

from .protocol import Dim

__all__ = ["NumpyModel", "save_checkpoint", "resolve_model", "default_cache_dir"]


def _conv2d(x: np.ndarray, w: np.ndarray, b: np.ndarray | None, stride: int, pad: int) -> np.ndarray:
    """NCHW conv via im2col (kernels here are small; clarity over BLAS
    tricks — the matmul itself is the hot part and is vectorized)."""
    n, c, h, ww = x.shape
    oc, ic, kh, kw = w.shape
    assert ic == c, f"channel mismatch: {ic} vs {c}"
    if pad:
        x = np.pad(x, ((0, 0), (0, 0), (pad, pad), (pad, pad)))
    oh = (x.shape[2] - kh) // stride + 1
    ow = (x.shape[3] - kw) // stride + 1
    s0, s1, s2, s3 = x.strides
    windows = np.lib.stride_tricks.as_strided(
        x,
        shape=(n, c, oh, ow, kh, kw),
        strides=(s0, s1, s2 * stride, s3 * stride, s2, s3),
        writeable=False,
    )
    out = np.einsum("nchwij,ocij->nohw", windows, w, optimize=True)
    if b is not None:
        out = out + b[None, :, None, None]
    return out.astype(np.float32)


def _maxpool2d(x: np.ndarray, k: int, stride: int) -> np.ndarray:
    n, c, h, w = x.shape
    oh, ow = (h - k) // stride + 1, (w - k) // stride + 1
    s0, s1, s2, s3 = x.strides
    win = np.lib.stride_tricks.as_strided(
        x,
        shape=(n, c, oh, ow, k, k),
        strides=(s0, s1, s2 * stride, s3 * stride, s2, s3),
        writeable=False,
    )
    return win.max(axis=(4, 5))


def _maxpool_w(x: np.ndarray, k: int) -> np.ndarray:
    """Max-pool the width axis of NCHW by factor k (recognition stem)."""
    n, c, h, w = x.shape
    w_out = w // k
    return x[:, :, :, : w_out * k].reshape(n, c, h, w_out, k).max(axis=4)


_OPS = {
    "conv2d": lambda x, ws, op: _conv2d(
        x, ws[op["w"]], ws.get(op.get("b")), op.get("stride", 1), op.get("pad", 0)
    ),
    "relu": lambda x, ws, op: np.maximum(x, 0.0),
    "sigmoid": lambda x, ws, op: 1.0 / (1.0 + np.exp(-x)),
    "add": lambda x, ws, op: x + np.float32(op["value"]),
    "mul": lambda x, ws, op: x * np.float32(op["value"]),
    "maxpool2d": lambda x, ws, op: _maxpool2d(x, op["k"], op.get("stride", op["k"])),
    "maxpool_w": lambda x, ws, op: _maxpool_w(x, op["k"]),
    "squeeze": lambda x, ws, op: np.squeeze(x, axis=op["axis"]),
    "permute": lambda x, ws, op: np.ascontiguousarray(
        np.transpose(x, axes=op["axes"])
    ),
}


class NumpyModel:
    """A `Model` deserialized from an `.npz` checkpoint.

    Load once per actor in `__init__` (the pipeline's engine_factory
    runs there); `run` executes the layer list sequentially.
    """

    def __init__(self, input_shape: list[Dim], layers: list[dict], weights: dict):
        self._input_shape = input_shape
        self._layers = layers
        self._weights = weights

    @classmethod
    def load_file(cls, path: str) -> "NumpyModel":
        with np.load(path) as z:
            spec = json.loads(bytes(z["__spec__"]).decode("utf-8"))
            weights = {k: z[k].astype(np.float32) for k in z.files if k != "__spec__"}
        dims = [
            Dim.fixed(v) if kind == "fixed" else Dim.symbolic(v)
            for kind, v in spec["input_shape"]
        ]
        return cls(dims, spec["layers"], weights)

    def input_shape(self) -> list[Dim]:
        return self._input_shape

    def run(self, input: np.ndarray) -> np.ndarray:
        x = input.astype(np.float32)
        for op in self._layers:
            x = _OPS[op["op"]](x, self._weights, op)
        return x.astype(np.float32)


def save_checkpoint(
    path: str, input_shape: list[tuple], layers: list[dict], weights: dict
) -> str:
    """Serialize a NumpyModel checkpoint; returns `path`."""
    spec = json.dumps({"input_shape": input_shape, "layers": layers})
    np.savez(
        path,
        __spec__=np.frombuffer(spec.encode("utf-8"), dtype=np.uint8),
        **{k: np.asarray(v, dtype=np.float32) for k, v in weights.items()},
    )
    return path if path.endswith(".npz") else path + ".npz"


def default_cache_dir() -> str:
    """~/.cache/ocrs-ray (mirrors the reference's ~/.cache/ocrs,
    models.rs:13-27)."""
    root = os.environ.get("XDG_CACHE_HOME", os.path.expanduser("~/.cache"))
    d = os.path.join(root, "ocrs-ray")
    os.makedirs(d, exist_ok=True)
    return d


def resolve_model(source: str, cache_dir: str | None = None) -> str:
    """URL-or-path model source -> local checkpoint path.

    Local paths pass through (must exist). URLs resolve cache-first by
    filename (models.rs:44-54); a cache miss downloads via urllib —
    which in this offline environment raises with a clear message
    rather than silently substituting a fake.
    """
    parsed = urlparse(source)
    if parsed.scheme in ("http", "https"):
        cache = cache_dir or default_cache_dir()
        fname = os.path.basename(parsed.path)
        if not fname:
            raise ValueError(f"cannot derive a filename from URL {source!r}")
        cached = os.path.join(cache, fname)
        if os.path.exists(cached):
            return cached
        # Download to a process-unique temp file and atomically rename
        # into place: concurrent actors cold-starting the same cache
        # never interleave writes into one path, a completed peer file
        # is never truncated or deleted, and a killed download can
        # never masquerade as a cache hit (the final path only ever
        # holds complete files).
        tmp = f"{cached}.tmp-{os.getpid()}-{id(object())}"
        try:
            from urllib.request import urlopen

            with urlopen(source, timeout=60) as resp, open(tmp, "wb") as f:
                shutil.copyfileobj(resp, f)
            os.replace(tmp, cached)
            return cached
        except Exception as exc:
            try:
                os.remove(tmp)
            except OSError:
                pass
            raise RuntimeError(
                f"model download failed for {source!r} (offline environment?); "
                f"place the file at {cached} to use the cache"
            ) from exc
    if not os.path.exists(source):
        raise FileNotFoundError(f"model checkpoint not found: {source}")
    return source
