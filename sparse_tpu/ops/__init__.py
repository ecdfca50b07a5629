from . import segmented, spgemm, spmm  # noqa: F401
