from .bsr_lu import (  # noqa: F401
    bsr_backsolve,
    bsr_forsolve,
    bsr_lower,
    bsr_lu,
    bsr_lu_find_fills,
    bsr_lu_nofill,
    bsr_lup,
    bsr_lup_nofill,
    bsr_ols,
    bsr_upper,
)
