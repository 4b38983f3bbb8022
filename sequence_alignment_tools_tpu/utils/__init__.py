from . import iupac  # noqa: F401
