"""Small shared session helpers.

The session-scoped metadata-cache pattern appears in multiple places
(read_table, stream harness); it lives here once.
"""

from __future__ import annotations


def session_cache(spark, attr: str) -> dict:
    """A dict cached as an attribute on the SparkSession object — the
    metadata-catalog memo pattern (read_table / stream_events): survives
    exactly as long as the session object, so cross-session isolation
    (e.g. check.py --vanilla's bare session) is automatic and nothing
    outlives the engine that created it."""
    cache = getattr(spark, attr, None)
    if cache is None:
        cache = {}
        setattr(spark, attr, cache)
    return cache
