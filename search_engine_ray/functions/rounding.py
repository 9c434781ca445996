"""Pinned float -> integer conversion conventions.

These are the repo's cross-language numeric contracts: every stage whose
output carries an irrational-derived score (ln, cosine of a log, ...) must
integerize through ONE of these so the DuckDB oracle can reproduce the value
exactly (same IEEE double in, same integer out).
"""

from __future__ import annotations

import numpy as np


def ln_microunits(x):
    """floor(x * 1e6 + 0.5) as int64 — the pinned convention for
    irrational-derived scores (ln-microunits); ONE definition shared by the
    LM and DSIR stages and mirrored by the DuckDB oracles."""
    return np.floor(x * 1_000_000.0 + 0.5).astype(np.int64)
