from .scalar import dec_to_double  # noqa: F401
