"""SQL function surface: st_* UDFs (WKB BinaryType convention)."""

from .codec import decode_geoms, encode_geoms, encode_points, try_decode_points
from .registry import dwithin_geoms, dwithin_points, register_functions

__all__ = [
    "decode_geoms", "encode_geoms", "encode_points", "try_decode_points",
    "dwithin_geoms", "dwithin_points", "register_functions",
]
