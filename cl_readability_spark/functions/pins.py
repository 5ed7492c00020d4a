"""Release handles for operator-internal executor-storage pins.

Several operators persist an internal frame so a branching plan evaluates
the expensive subtree once (curation's flagged frame, the dedup stats
paths).  The persisted frame is function-local, so the release handle is
attached to the RETURNED DataFrame as a python-side attribute.

Contract: call ``release_pinned`` on exactly the object the operator
returned — python attributes do not survive ``.filter()``/``.select()``
etc. (each returns a new DataFrame object), so release first, then derive,
or keep a reference to the original.  Pins are also dropped with the
session; the handle only matters for long-lived sessions processing many
corpora."""

from __future__ import annotations

from pyspark.sql import DataFrame


def attach_pins(df: DataFrame, *pinned: DataFrame) -> DataFrame:
    df._clrs_pinned = [p for p in pinned if p is not None]
    return df


def release_pinned(df: DataFrame) -> None:
    """Unpersist every pin an operator attached to this returned frame
    (no-op for frames without pins)."""
    for p in getattr(df, "_clrs_pinned", []) or []:
        p.unpersist()
