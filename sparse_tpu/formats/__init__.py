from . import coo, csr, mono  # noqa: F401
