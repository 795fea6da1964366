from .protocol import Dim, Model
from .fake import FakeDetectionModel, FakeRecognitionModel, make_fake_alphabet

__all__ = [
    "Dim",
    "Model",
    "FakeDetectionModel",
    "FakeRecognitionModel",
    "make_fake_alphabet",
]
