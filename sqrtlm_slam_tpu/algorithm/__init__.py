from . import pnp  # noqa: F401
