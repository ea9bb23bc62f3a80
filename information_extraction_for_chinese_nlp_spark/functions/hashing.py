"""The ONE engine-portable hash primitive behind every deterministic
decision in this engine (splits, sampling, packing, mention seeding,
hyperplane weights).

``md5_long`` is reproduced bit-for-bit by DuckDB as
``('0x' || substring(md5(x), 1, 8))::BIGINT``, which is what keeps all
of those decisions oracle-checkable; ``xxhash64`` would be Spark-only
and partition-independent decisions built on it could never be verified
by the driver's DuckDB gate. Each call site owns its SALT format
(``concat`` vs ``concat_ws`` and the tag layout are part of that site's
oracle contract) — only the hex→long core is shared, so a change here
desynchronizes every oracle at once and is caught by every gate at once,
instead of drifting copy by copy.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def md5_long(expr):
    """First 8 hex chars of md5(expr) as a long in [0, 2^32)."""
    return F.conv(F.substring(F.md5(expr), 1, 8), 16, 10).cast("long")
