from . import coo, csr  # noqa: F401
