from . import anisotropy, functions, ice_parser, properties, tilt  # noqa: F401
