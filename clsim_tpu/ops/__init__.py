from . import rng, rotations, samplers, spectrum  # noqa: F401
