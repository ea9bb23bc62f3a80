"""Two-tier gate registry invariants: the driver checks only the FIRST
50 registered queries, so the primary tier must sit at EXACTLY
MAX_PRIMARY and an accidental 51st registration must degrade loudly
(extra tier + warning), never crash the import and take all 50 driver
gates down with it."""

import warnings

from information_extraction_for_chinese_nlp_spark.plans import registry


def test_primary_tier_is_exactly_full():
    """Exactly MAX_PRIMARY driver-facing gates (fewer = wasted driver
    slots, more is impossible by construction) and every primary has an
    oracle unless deliberately rows-only."""
    qs = registry.queries()
    assert len(qs) == registry.MAX_PRIMARY
    # extras never shadow a primary name
    assert not set(qs) & set(registry.extra_queries())


def test_overflow_registration_routes_to_extra_with_warning():
    """The 51st register() lands in the extra tier with a
    RuntimeWarning instead of raising at import time (a raise inside
    the registry modules' import would break queries() wholesale)."""
    registry._load()
    assert len(registry._REGISTRY) == registry.MAX_PRIMARY
    name = "_overflow_probe_gate"
    try:
        with warnings.catch_warnings(record=True) as caught:
            warnings.simplefilter("always")
            registry.register(name, "SELECT 1 AS one")(lambda spark, sf: None)
        assert name not in registry._REGISTRY
        assert name in registry._EXTRA
        assert any(
            issubclass(w.category, RuntimeWarning) and name in str(w.message)
            for w in caught
        )
    finally:
        registry._EXTRA.pop(name, None)


def test_overflow_never_clobbers_an_existing_extra():
    """A full primary tier + a name collision with an established extra
    gate must DROP the overflowing registration (with its own warning),
    never silently replace the extra's (fn, sql)."""
    registry._load()
    name = next(iter(registry._EXTRA))
    orig = registry._EXTRA[name]
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        registry.register(name, "SELECT 2 AS two")(lambda spark, sf: None)
    assert registry._EXTRA[name] == orig
    assert name not in registry._REGISTRY or registry._REGISTRY[name] == orig
    assert any("DROPPED" in str(w.message) for w in caught)


def test_re_registration_of_existing_primary_stays_primary():
    """Overwriting an existing primary name is an update, not an
    overflow — it must stay in the primary tier."""
    registry._load()
    name = next(iter(registry._REGISTRY))
    fn, sql = registry._REGISTRY[name]
    try:
        with warnings.catch_warnings(record=True) as caught:
            warnings.simplefilter("always")
            registry.register(name, sql)(fn)
        assert not caught
        assert registry._REGISTRY[name] == (fn, sql)
        assert name not in registry._EXTRA
    finally:
        registry._REGISTRY[name] = (fn, sql)
