from . import segmented  # noqa: F401
