"""Backend guard shared by the Pallas kernels.

Pallas TPU kernels only *compile* on TPU backends; on CPU (the test mesh,
or any fallback environment) they must run in interpret mode or they fail
at lowering time with "Only interpret mode is supported on CPU backend".
Every kernel entry point in this package therefore takes
``interpret: bool | None = None`` and resolves ``None`` through
:func:`resolve_interpret`, so ``use_pallas=True`` is safe on any backend —
it degrades to interpreted execution instead of a hard lowering error.
"""

from __future__ import annotations

import jax


def resolve_interpret(interpret: bool | None) -> bool:
    """Resolve an ``interpret`` kernel flag against the active backend.

    Explicit True/False is honored; ``None`` means "interpret iff the
    default backend cannot compile Mosaic kernels" (currently: CPU).
    """
    if interpret is not None:
        return bool(interpret)
    try:
        return jax.default_backend() == "cpu"
    except Exception:
        return True
