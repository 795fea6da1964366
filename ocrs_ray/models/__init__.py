from .protocol import Dim, Model
from .fake import FakeDetectionModel, FakeRecognitionModel, make_fake_alphabet
from .numpy_backend import (
    NumpyModel,
    default_cache_dir,
    resolve_model,
    save_checkpoint,
)

__all__ = [
    "Dim",
    "Model",
    "FakeDetectionModel",
    "FakeRecognitionModel",
    "make_fake_alphabet",
    "NumpyModel",
    "save_checkpoint",
    "resolve_model",
    "default_cache_dir",
]
