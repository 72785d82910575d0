from .flat_index import FlatIndex, build_flat_index
from .native_bridge import native_available, native_flat_search

__all__ = [
    "FlatIndex",
    "build_flat_index",
    "native_available",
    "native_flat_search",
]
