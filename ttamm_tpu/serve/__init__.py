from .flat_index import FlatIndex, build_flat_index
from .native_bridge import native_available, native_flat_search
from .service import RetrievalService

__all__ = [
    "FlatIndex",
    "RetrievalService",
    "build_flat_index",
    "native_available",
    "native_flat_search",
]
