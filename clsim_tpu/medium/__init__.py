from . import (anisotropy, functions, ice_parser, photonics,  # noqa: F401
               properties, tilt)
