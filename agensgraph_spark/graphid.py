"""graphid: 64-bit element identity = ``labid(16 bits) << 48 | locid(48 bits)``.

Mirrors the reference's graphid layout so ids are stable, sortable,
joinable LongType values (reference: src/include/utils/graph.h:18-39,
GraphidGetLabid / GraphidGetLocid). Because the label id occupies the
high bits, range predicates on ``id`` prune by label for free — the
Spark analog of the reference's per-label heap tables.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

LOCID_BITS = 48
LOCID_MASK = (1 << LOCID_BITS) - 1
# The reference packs labid into 16 bits of a uint64
# (graph.h:18-39). Spark's LongType is SIGNED, so a labid >= 2^15
# would set the sign bit and break id ordering (labid-range pruning
# relies on gid order being label-major). We therefore cap labid at
# 15 bits — 32767 labels per graph, far beyond practical use.
LABID_MAX = (1 << 15) - 1


def make_graphid(labid: int, locid: int) -> int:
    """Python-side encode (labid << 48 | locid)."""
    if not 0 <= labid <= LABID_MAX:
        raise ValueError(f"labid out of range: {labid}")
    if not 0 <= locid <= LOCID_MASK:
        raise ValueError(f"locid out of range: {locid}")
    return (labid << LOCID_BITS) | locid


def graphid_labid(gid: int) -> int:
    return (gid >> LOCID_BITS) & 0xFFFF


def graphid_locid(gid: int) -> int:
    return gid & LOCID_MASK


def graphid_col(labid: int, locid: Column) -> Column:
    """Column-side encode: JVM-side arithmetic, no UDF."""
    return (F.lit(labid).cast("long") * F.lit(1 << LOCID_BITS) + locid.cast("long")).cast("long")


def labid_col(gid: Column) -> Column:
    return F.shiftrightunsigned(gid.cast("long"), LOCID_BITS).cast("int")


def locid_col(gid: Column) -> Column:
    return gid.cast("long").bitwiseAND(F.lit(LOCID_MASK)).cast("long")


def graphid_range(labid: int) -> tuple[int, int]:
    """[lo, hi] id range covered by one label — enables min/max pruning."""
    lo = labid << LOCID_BITS
    return lo, lo | LOCID_MASK
