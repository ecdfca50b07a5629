# NOTE: only leaf modules here; spgemm/spmm import the format modules and are
# re-exported from the package root after formats initialize (avoids cycles).
from . import segmented  # noqa: F401
