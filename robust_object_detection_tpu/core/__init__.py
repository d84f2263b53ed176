from . import artifacts, config, rng  # noqa: F401
