from .flat_index import FlatIndex, build_flat_index
from .http_server import make_server, serve_forever, start_in_thread
from .native_bridge import native_available, native_flat_search
from .service import RetrievalService

__all__ = [
    "FlatIndex",
    "RetrievalService",
    "build_flat_index",
    "make_server",
    "native_available",
    "native_flat_search",
    "serve_forever",
    "start_in_thread",
]
