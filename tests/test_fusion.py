"""Knowledge fusion: noisy-or math against hand-computed values, the
monotonicity invariant, top-k determinism, and the one-shuffle plan."""

import math

from pyspark.sql import functions as F

from information_extraction_for_chinese_nlp_spark.operators.fusion import (
    fuse_triples,
    top_k_objects,
)


def _rows(spark):
    return spark.createDataFrame(
        [
            # fact A: three mentions across two docs
            ("s1", "p", "a", 0.5, 10),
            ("s1", "p", "a", 0.5, 10),
            ("s1", "p", "a", 0.2, 11),
            # fact B: one mention, p=1.0 (the ln(0) guard path)
            ("s1", "p", "b", 1.0, 12),
            # fact C: different subject entirely
            ("s2", "q", "c", 0.3, 13),
        ],
        "subj string, pred string, obj string, prob double, doc_id long",
    )


def test_noisy_or_hand_computed(spark):
    got = {
        (r.subj, r.pred, r.obj): r
        for r in fuse_triples(_rows(spark)).collect()
    }
    a = got[("s1", "p", "a")]
    # 1 - (0.5 * 0.5 * 0.8) = 0.8
    assert abs(a.fused_prob - 0.8) < 1e-9
    assert a.n_mentions == 3 and a.n_docs == 2
    assert a.max_prob == 0.5 and a.first_doc == 10

    b = got[("s1", "p", "b")]
    # p=1.0: eps guards the ln(0), then the max_prob clamp restores
    # the exact certainty — fused == 1.0, not 1 - eps
    assert b.fused_prob == 1.0
    assert not math.isnan(b.fused_prob)

    c = got[("s2", "q", "c")]
    assert abs(c.fused_prob - 0.3) < 1e-9 and c.n_mentions == 1


def test_fused_dominates_max_prob(spark):
    # noisy-or is monotone in every input, and the clamp makes the
    # invariant EXACT (no eps tolerance) even at p = 1.0
    fused = fuse_triples(_rows(spark))
    bad = fused.filter(F.col("fused_prob") < F.col("max_prob"))
    assert bad.count() == 0


def test_null_prob_mentions_excluded(spark):
    # the scorer's quarantine path emits sentinel rows with NULL
    # probability — they must not count as evidence OR support
    rows = spark.createDataFrame(
        [
            ("s", "p", "a", 0.5, 1),
            ("s", "p", "a", None, 2),  # quarantined mention
            ("s", "p", "dead", None, 3),  # fact with ONLY null support
        ],
        "subj string, pred string, obj string, prob double, doc_id long",
    )
    got = {(r.subj, r.pred, r.obj): r for r in fuse_triples(rows).collect()}
    a = got[("s", "p", "a")]
    assert abs(a.fused_prob - 0.5) < 1e-12  # NOT fused toward 1.0
    assert a.n_mentions == 1 and a.n_docs == 1  # null row not counted
    assert ("s", "p", "dead") not in got  # all-null fact vanishes


def test_top_k_objects_deterministic_ties(spark):
    rows = spark.createDataFrame(
        [("s", "p", o, 0.5, 1) for o in ("z", "y", "x")]
        + [("s", "p", "w", 0.9, 2)],
        "subj string, pred string, obj string, prob double, doc_id long",
    )
    top = top_k_objects(fuse_triples(rows), k=2).orderBy("rank").collect()
    # rank 1 = strongest; the three 0.5-ties break on obj ascending
    assert [(r.obj, r.rank) for r in top] == [("w", 1), ("x", 2)]


def test_fusion_is_single_exchange(spark):
    fused = fuse_triples(_rows(spark))
    fused.collect()
    plan = fused._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("== Initial Plan ==")[0]
    # one shuffle on the triple key; countDistinct partials under it
    assert plan.count("Exchange") <= 2, plan  # key agg + distinct expand
    assert "SortMergeJoin" not in plan and "Cartesian" not in plan


def test_temporal_scoping_rides_the_same_shuffle(spark):
    from datetime import datetime

    rows = spark.createDataFrame(
        [
            ("s", "p", "a", 0.5, 1, datetime(2024, 3, 1)),
            ("s", "p", "a", 0.5, 2, datetime(2024, 1, 5)),
            ("s", "p", "a", None, 3, datetime(2020, 1, 1)),  # quarantined
        ],
        "subj string, pred string, obj string, prob double, "
        "doc_id long, ts timestamp",
    )
    fused = fuse_triples(rows, ts_col="ts")
    r = fused.collect()[0]
    # min/max over SUPPORTED mentions only: the NULL-prob row's earlier
    # timestamp must not widen the envelope
    assert r.first_seen == datetime(2024, 1, 5)
    assert r.last_seen == datetime(2024, 3, 1)
    # same single-exchange shape as the untimed path
    plan = fused._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("== Initial Plan ==")[0]
    assert plan.count("Exchange") <= 2, plan
    # and the untimed path's schema is unchanged (no ts columns)
    assert "first_seen" not in fuse_triples(rows).columns


def test_resolve_functional_picks_and_diagnoses(spark):
    from information_extraction_for_chinese_nlp_spark.operators.fusion import (
        resolve_functional,
    )

    rows = spark.createDataFrame(
        [
            # (subj, pred) = (s, p): conflict between a (0.8) and b (0.5)
            ("s", "p", "a", 0.5, 1),
            ("s", "p", "a", 0.5, 2),
            ("s", "p", "a", 0.2, 3),
            ("s", "p", "b", 0.5, 4),
            # (s, q): uncontested
            ("s", "q", "c", 0.3, 5),
        ],
        "subj string, pred string, obj string, prob double, doc_id long",
    )
    got = {
        (r.subj, r.pred): r
        for r in resolve_functional(fuse_triples(rows)).collect()
    }
    assert len(got) == 2
    p = got[("s", "p")]
    assert p.obj == "a" and p.n_candidates == 2
    assert abs(p.fused_prob - 0.8) < 1e-9
    assert abs(p.margin - 0.3) < 1e-9  # 0.8 - 0.5
    q = got[("s", "q")]
    assert q.obj == "c" and q.n_candidates == 1 and q.margin is None


def test_resolve_functional_tie_chain_deterministic(spark):
    from information_extraction_for_chinese_nlp_spark.operators.fusion import (
        resolve_functional,
    )

    rows = spark.createDataFrame(
        [
            # equal fused_prob; 'b' wins on n_docs (2 docs vs 1)
            ("s", "p", "a", 0.5, 1),
            ("s", "p", "b", 0.3, 2),
            ("s", "p", "b", 0.3, 3),
        ],
        "subj string, pred string, obj string, prob double, doc_id long",
    )
    # force an exact fused tie: round both to 2dp first
    fused = fuse_triples(rows).withColumn(
        "fused_prob", F.round(F.lit(0.5), 2)
    )
    r = resolve_functional(fused).collect()[0]
    assert r.obj == "b" and r.margin == 0.0

    # full tie everywhere -> obj ascending wins
    rows2 = spark.createDataFrame(
        [("s", "p", "z", 0.5, 1), ("s", "p", "y", 0.5, 2)],
        "subj string, pred string, obj string, prob double, doc_id long",
    )
    assert resolve_functional(fuse_triples(rows2)).collect()[0].obj == "y"


def test_entity_salience_weighted_degree(spark):
    from information_extraction_for_chinese_nlp_spark.operators.fusion import (
        entity_salience,
    )

    rows = spark.createDataFrame(
        [
            ("s1", "p", "e", 0.5, 1),
            ("s2", "p", "e", 0.5, 2),
            ("s2", "q", "e", 0.3, 3),
            ("s1", "p", "f", 0.9, 4),
        ],
        "subj string, pred string, obj string, prob double, doc_id long",
    )
    got = {r.obj: r for r in entity_salience(fuse_triples(rows)).collect()}
    e = got["e"]
    assert e.n_facts == 3 and e.n_subjects == 2 and e.n_preds == 2
    assert e.total_mentions == 3
    assert abs(e.support - (0.5 + 0.5 + 0.3)) < 1e-9
    f = got["f"]
    assert f.n_facts == 1 and abs(f.support - 0.9) < 1e-9


def test_validate_facts_status_branches(spark):
    from information_extraction_for_chinese_nlp_spark.operators.fusion import (
        validate_facts,
    )

    fused = spark.createDataFrame(
        [
            ("s", "amount", "500元", 0.9, 3),   # ok
            ("s", "amount", "five", 0.9, 3),    # bad_object
            ("s", "amount", "900元", 0.2, 3),   # low_conf (after pattern)
            ("s", "date", "2024-01-01", 0.9, 1),  # low_support
            ("s", "mystery", "x", 0.9, 9),      # unknown_pred
        ],
        "subj string, pred string, obj string, fused_prob double, n_docs long",
    )
    constraints = spark.createDataFrame(
        [
            ("amount", "[0-9,]+元", 0.5, None),
            ("date", None, None, 2),
        ],
        "pred string, obj_pattern string, min_prob double, min_docs int",
    )
    got = {
        (r.pred, r.obj): r.status
        for r in validate_facts(fused, constraints).collect()
    }
    assert got[("amount", "500元")] == "ok"
    assert got[("amount", "five")] == "bad_object"
    assert got[("amount", "900元")] == "low_conf"
    assert got[("date", "2024-01-01")] == "low_support"
    assert got[("mystery", "x")] == "unknown_pred"
    # pattern is anchored: a partial match is not enough
    fused2 = spark.createDataFrame(
        [("s", "amount", "x500元y", 0.9, 3)],
        "subj string, pred string, obj string, fused_prob double, n_docs long",
    )
    assert (
        validate_facts(fused2, constraints).collect()[0].status == "bad_object"
    )


def test_validate_facts_broadcasts_constraints(spark):
    from information_extraction_for_chinese_nlp_spark.operators.fusion import (
        validate_facts,
    )

    fused = spark.createDataFrame(
        [("s", "p", "o", 0.9, 3)],
        "subj string, pred string, obj string, fused_prob double, n_docs long",
    )
    constraints = spark.createDataFrame(
        [("p", None, None, None)],
        "pred string, obj_pattern string, min_prob double, min_docs int",
    )
    out = validate_facts(fused, constraints)
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("== Initial Plan ==")[0]
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan


def test_kg_diff_classifies_and_prunes_steady_state(spark):
    from information_extraction_for_chinese_nlp_spark.operators.fusion import (
        kg_diff,
    )

    old = spark.createDataFrame(
        [
            ("s", "p", "same", 0.5),
            ("s", "p", "moved", 0.5),
            ("s", "p", "gone", 0.5),
            ("s", "p", "nudged", 0.5),
        ],
        "subj string, pred string, obj string, fused_prob double",
    )
    new = spark.createDataFrame(
        [
            ("s", "p", "same", 0.5),
            ("s", "p", "moved", 0.8),
            ("s", "p", "fresh", 0.9),
            ("s", "p", "nudged", 0.50000001),
        ],
        "subj string, pred string, obj string, fused_prob double",
    )
    got = {r.obj: r for r in kg_diff(old, new, tol=1e-6).collect()}
    assert set(got) == {"moved", "gone", "fresh"}  # steady state pruned
    assert got["moved"].change == "changed"
    assert got["moved"].old_prob == 0.5 and got["moved"].new_prob == 0.8
    assert got["gone"].change == "removed" and got["gone"].new_prob is None
    assert got["fresh"].change == "added" and got["fresh"].old_prob is None


def test_fusion_seeded_sweep_matches_python_reference(spark):
    """2k seeded random mentions over ~150 facts (probs spanning 0,
    near-0, mid, near-1, exactly 1.0, and NULL): fuse_triples matches
    a direct Python product fold within float tolerance, and the
    result is invariant to input partitioning/order."""
    import random

    from information_extraction_for_chinese_nlp_spark.operators.fusion import (
        fuse_triples,
    )

    rng = random.Random(1347)
    rows = []
    for _ in range(2000):
        subj = f"s{rng.randrange(30)}"
        pred = f"p{rng.randrange(5)}"
        obj = f"o{rng.randrange(4)}"
        roll = rng.random()
        if roll < 0.05:
            prob = None  # quarantined
        elif roll < 0.10:
            prob = 1.0  # ln(0) guard + clamp path
        elif roll < 0.15:
            prob = 0.0  # no-evidence mention (still counts as support)
        else:
            prob = round(rng.random(), 6)
        rows.append((subj, pred, obj, prob, rng.randrange(200)))

    ref: dict = {}
    for subj, pred, obj, prob, doc in rows:
        if prob is None:
            continue
        fact = ref.setdefault(
            (subj, pred, obj),
            {"miss": 1.0, "n": 0, "docs": set(), "mx": 0.0, "fd": doc},
        )
        fact["miss"] *= 1.0 - prob
        fact["n"] += 1
        fact["docs"].add(doc)
        fact["mx"] = max(fact["mx"], prob)
        fact["fd"] = min(fact["fd"], doc)

    df = spark.createDataFrame(
        rows, "subj string, pred string, obj string, prob double, doc_id long"
    )
    for reshaped in (df, df.repartition(17, "doc_id"), df.coalesce(1)):
        got = {
            (r.subj, r.pred, r.obj): r
            for r in fuse_triples(reshaped).collect()
        }
        assert set(got) == set(ref)
        for k, w in ref.items():
            g = got[k]
            want = max(1.0 - w["miss"], w["mx"])
            assert abs(g.fused_prob - want) < 1e-6, (k, g.fused_prob, want)
            assert g.fused_prob >= g.max_prob  # exact clamp invariant
            assert g.n_mentions == w["n"], k
            assert g.n_docs == len(w["docs"]), k
            assert g.max_prob == w["mx"] and g.first_doc == w["fd"], k


def test_resolve_functional_recency_supersedes_confidence(spark):
    from datetime import datetime

    from information_extraction_for_chinese_nlp_spark.operators.fusion import (
        resolve_functional,
    )

    fused = spark.createDataFrame(
        [
            # 'old' is better supported, 'new' is more recent
            ("s", "status", "old", 0.9, 5, 9, datetime(2024, 1, 1)),
            ("s", "status", "new", 0.6, 1, 1, datetime(2024, 6, 1)),
            # undated fact must not beat a dated one
            ("s", "addr", "dated", 0.3, 1, 1, datetime(2024, 2, 2)),
            ("s", "addr", "undated", 0.9, 5, 9, None),
        ],
        "subj string, pred string, obj string, fused_prob double, "
        "n_docs long, n_mentions long, last_seen timestamp",
    )
    got = {
        (r.subj, r.pred): r
        for r in resolve_functional(fused, strategy="recency").collect()
    }
    assert got[("s", "status")].obj == "new"
    assert got[("s", "status")].last_seen == datetime(2024, 6, 1)
    assert got[("s", "addr")].obj == "dated"
    # confidence strategy (default) picks the other way
    conf = {
        (r.subj, r.pred): r.obj for r in resolve_functional(fused).collect()
    }
    assert conf[("s", "status")] == "old"
    assert conf[("s", "addr")] == "undated"

    import pytest as _pytest
    with _pytest.raises(ValueError, match="strategy"):
        resolve_functional(fused, strategy="nope")


def test_k_hop_minimal_hops_and_early_exit(spark):
    from information_extraction_for_chinese_nlp_spark.operators.traversal import (
        k_hop,
    )

    edges = spark.createDataFrame(
        # chain a-b-c-d plus a triangle a-b-x; 'iso' is disconnected
        [("a", "b"), ("b", "c"), ("c", "d"), ("a", "x"), ("x", "b")],
        "src string, dst string",
    )
    seeds = spark.createDataFrame([("a",), ("a",), ("ghost",)], "node string")
    got = {r.node: r.hop for r in k_hop(edges, seeds, k=6).collect()}
    # minimal hop wins even when a longer path exists (b via a directly,
    # not a-x-b); ghost seed (absent from graph) stays at hop 0;
    # k=6 over a diameter-3 component early-exits without error
    assert got == {"a": 0, "ghost": 0, "b": 1, "x": 1, "c": 2, "d": 3}

    # directed: downstream only
    d = {
        r.node: r.hop
        for r in k_hop(
            edges,
            spark.createDataFrame([("b",)], "node string"),
            k=3,
            directed=True,
        ).collect()
    }
    assert d == {"b": 0, "c": 1, "d": 2}

    # k=0: just the seeds
    z = {r.node: r.hop for r in k_hop(edges, seeds, k=0).collect()}
    assert z == {"a": 0, "ghost": 0}


def test_validate_facts_null_object_fails_pattern(spark):
    # ~regexp_like(NULL, ...) is NULL: without the NULL-safe coalesce a
    # NULL object would skip the bad_object branch and validate as 'ok'
    from information_extraction_for_chinese_nlp_spark.operators.fusion import (
        validate_facts,
    )

    fused = spark.createDataFrame(
        [("s", "amount", None, 0.9, 3), ("s", "free", None, 0.9, 3)],
        "subj string, pred string, obj string, fused_prob double, n_docs long",
    )
    constraints = spark.createDataFrame(
        [("amount", "[0-9]+元", None, None), ("free", None, None, None)],
        "pred string, obj_pattern string, min_prob double, min_docs int",
    )
    got = {r.pred: r.status for r in validate_facts(fused, constraints).collect()}
    assert got["amount"] == "bad_object"  # NULL matches no pattern
    assert got["free"] == "ok"  # no pattern constraint -> NULL passes
