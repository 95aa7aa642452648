from .keras_h5 import (ImportedModel, read_h5, build_forward, save_native,
                       load_native, KerasImportError)
from .registry import get_remote, load_patch_model, ModelNotFoundError, DMODELS

__all__ = ["ImportedModel", "read_h5", "build_forward", "save_native",
           "load_native", "KerasImportError", "get_remote", "load_patch_model",
           "ModelNotFoundError", "DMODELS"]
