from .exact import bp, cents, e4_to_dollars, e6_to_dollars, epoch_s
from .casts import strict_bool, try_double, try_int
from .geo import haversine_km

__all__ = [
    "bp",
    "cents",
    "e4_to_dollars",
    "e6_to_dollars",
    "epoch_s",
    "strict_bool",
    "try_double",
    "try_int",
    "haversine_km",
]
