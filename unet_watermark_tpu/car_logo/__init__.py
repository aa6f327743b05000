"""Car-logo dataset tooling (reference src/car_logo/)."""
from .logo_placement import LogoPlacer
from .logo_process import remove_background_and_resize

__all__ = ["LogoPlacer", "remove_background_and_resize"]
