"""Entity linking: blocking -> broadcast candidate join -> similarity ->
best-match selection (SURVEY.md §2.8; the KG tail of north_star).

The alias dictionary is small by construction (it's curated), so the
candidate join broadcasts it — no shuffle of the mention table, which is
the 100 TB side. Blocking keys bound the candidate set per mention;
scoring is char-n-gram Jaccard (set expressions, JVM-side) with an
optional TF-IDF cosine variant for longer surface forms.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.money import normalize_money_udf


def char_ngrams(col, n: int = 2):
    """array of DISTINCT char n-grams of a string column (JVM-side, no
    UDF). Strings shorter than n yield an EMPTY array — the previous
    sequence(1, greatest(len-n+1, 0)) formulation produced a DESCENDING
    [1, 0] sequence there and emitted the whole short string as a
    pseudo-gram, so two identical 1-char surfaces scored Jaccard 1.0 in
    Spark while the DuckDB oracle (strict range) and the Python n-gram
    path both scored 0.0 (latent engine divergence, caught in r5)."""
    return F.array_distinct(char_ngrams_multiset(col, n))


def char_ngrams_multiset(col, n: int = 2):
    """NON-distinct char n-grams (TF-IDF needs term frequencies);
    strings shorter than n yield an EMPTY array (matching the Python
    `_ngrams_py` contract — the distinct variant's sequence(1, 0) quirk
    would emit the whole short string as a pseudo-gram)."""
    idx = F.sequence(F.lit(1), F.length(col) - (n - 1))
    return F.when(
        F.length(col) >= n,
        F.transform(idx, lambda i: F.substring(col, i, n)),
    ).otherwise(F.array().cast("array<string>"))


def jaccard(a, b):
    inter = F.size(F.array_intersect(a, b)).cast("double")
    union = F.size(F.array_union(a, b)).cast("double")
    return F.when(union > 0, inter / union).otherwise(F.lit(0.0))


def _ngrams_py(s: str, n: int) -> list[str]:
    return [s[i : i + n] for i in range(max(len(s) - n + 1, 0))]


def make_tfidf_scorer(aliases: list[str], ngram: int = 2):
    """Char-n-gram TF-IDF cosine, IDF fitted on the alias corpus
    (sklearn-style smooth idf: ln((1+N)/(1+df)) + 1; terms unseen in
    the corpus get df=0 weight). The alias dictionary is small and
    curated by contract, so fitting happens driver-side at plan time —
    the scorer closure ships to workers with the UDF.

    This is the reference per-pair implementation, kept as the parity
    oracle for :func:`make_tfidf_batch_scorer` (the vectorized path
    ``link_entities`` actually runs) — see
    tests/test_graph.py::test_tfidf_batch_matches_loop."""
    import math
    from collections import Counter

    n_docs = len(aliases)
    df: Counter = Counter()
    for a in aliases:
        df.update(set(_ngrams_py(a, ngram)))
    default_idf = math.log(1.0 + n_docs) + 1.0
    idf = {t: math.log((1.0 + n_docs) / (1.0 + c)) + 1.0 for t, c in df.items()}

    def weights(s: str) -> dict:
        counts = Counter(_ngrams_py(s, ngram))
        return {t: n * idf.get(t, default_idf) for t, n in counts.items()}

    def score(obj, alias) -> float:
        if obj is None or alias is None:
            return 0.0
        wa, wb = weights(obj), weights(alias)
        dot = sum(w * wb[t] for t, w in wa.items() if t in wb)
        na = math.sqrt(sum(w * w for w in wa.values()))
        nb = math.sqrt(sum(w * w for w in wb.values()))
        return dot / (na * nb) if na and nb else 0.0

    return score


def make_tfidf_batch_scorer(aliases: list[str], ngram: int = 2):
    """Vectorized TF-IDF cosine over whole Arrow batches.

    Same fit and same scores as :func:`make_tfidf_scorer` (parity is
    pinned in tests), but the per-batch work that scales with the
    MENTION side — the 100 TB side — is numpy, not a Python loop over
    candidate pairs:

    - alias vectors (term-index array, tf·idf weight array, norm) are
      precomputed ONCE here, driver-side, under the same curated-dict
      contract that already gates the IDF fit;
    - per batch, objs and aliases are factorized so weights are built
      once per DISTINCT surface, not once per pair (a blocked candidate
      join repeats both sides heavily);
    - dot products run per distinct alias: its sparse vector is
      scattered into a reusable dense scratch array over the corpus
      vocabulary, and the dots against every distinct obj paired with
      it are one gather-multiply + ``np.add.reduceat`` over the objs'
      concatenated CSR slices. The Python-level loop count is bounded
      by the alias dictionary (contract-small), never by the mentions.

    Returns ``score_batch(obj: pd.Series, alias: pd.Series) ->
    np.ndarray[float64]``.
    """
    import math
    from collections import Counter

    import numpy as np

    n_docs = len(aliases)
    df: Counter = Counter()
    for a in aliases:
        df.update(set(_ngrams_py(a, ngram)))
    default_idf = math.log(1.0 + n_docs) + 1.0
    vocab = {t: i for i, t in enumerate(df)}
    idf_arr = np.empty(len(vocab))
    for t, c in df.items():
        idf_arr[vocab[t]] = math.log((1.0 + n_docs) / (1.0 + c)) + 1.0
    V = len(vocab)

    def _vec(s: str):
        """(sorted term-index array, tf·idf array, oov_sq, norm)."""
        counts = Counter(_ngrams_py(s, ngram))
        iv = []
        oov_sq = 0.0
        for t, c in counts.items():
            j = vocab.get(t)
            if j is None:
                w = c * default_idf
                oov_sq += w * w
            else:
                iv.append((j, c * idf_arr[j]))
        iv.sort()
        idx = np.fromiter((j for j, _ in iv), dtype=np.int64, count=len(iv))
        val = np.fromiter((w for _, w in iv), dtype=np.float64, count=len(iv))
        norm = math.sqrt(float(val @ val) + oov_sq)
        return idx, val, norm

    alias_vecs = {a: _vec(a) for a in set(aliases)}

    # parity fallback for aliases OUTSIDE the fitted corpus: their OOV
    # n-grams are not in `vocab`, so the indexed dot would silently
    # lose OOV-term agreement (obj 'abcd' vs unseen alias 'abcd' must
    # score 1.0, as the loop scorer does). Unseen aliases are rare by
    # contract (the fit covers the dict), so those rows take the exact
    # per-pair path.
    _loop_score = make_tfidf_scorer(aliases, ngram)

    def score_batch(obj, alias) -> "np.ndarray":
        import pandas as pd

        n = len(obj)
        out = np.zeros(n)
        if n == 0:
            return out
        o_codes, o_uniq = pd.factorize(obj, use_na_sentinel=True)
        a_codes, a_uniq = pd.factorize(alias, use_na_sentinel=True)
        scratch = np.zeros(V)
        valid = np.flatnonzero((o_codes >= 0) & (a_codes >= 0))
        if valid.size == 0:
            return out
        # fit once per DISTINCT obj — but only objs that appear in a
        # scoreable row (an all-null-alias batch pays zero fits)
        o_vecs = [None] * len(o_uniq)
        for c in np.unique(o_codes[valid]):
            o_vecs[c] = _vec(o_uniq[c])
        order = valid[np.argsort(a_codes[valid], kind="stable")]
        a_sorted = a_codes[order]
        starts = np.flatnonzero(np.r_[True, a_sorted[1:] != a_sorted[:-1]])
        bounds = np.r_[starts, a_sorted.size]
        for s, e in zip(bounds[:-1], bounds[1:]):
            rows = order[s:e]
            a = a_uniq[a_sorted[s]]
            fitted = alias_vecs.get(a)
            if fitted is None:
                # out-of-corpus alias: exact per-pair parity path
                for r in rows:
                    out[r] = _loop_score(o_uniq[o_codes[r]], a)
                continue
            b_idx, b_val, b_norm = fitted
            if b_norm == 0.0 or b_idx.size == 0:
                continue
            scratch[b_idx] = b_val
            oc_rows = o_codes[rows]
            uo = np.unique(oc_rows)
            lens = np.fromiter(
                (o_vecs[c][0].size for c in uo), dtype=np.int64, count=uo.size
            )
            nz = np.flatnonzero(lens)
            dots = np.zeros(uo.size)
            if nz.size:
                cat_idx = np.concatenate([o_vecs[uo[k]][0] for k in nz])
                cat_val = np.concatenate([o_vecs[uo[k]][1] for k in nz])
                prod = cat_val * scratch[cat_idx]
                offs = np.r_[0, np.cumsum(lens[nz])[:-1]]
                dots[nz] = np.add.reduceat(prod, offs)
            norms = np.fromiter(
                (o_vecs[c][2] for c in uo), dtype=np.float64, count=uo.size
            )
            denom = norms * b_norm
            with np.errstate(divide="ignore", invalid="ignore"):
                s_u = np.where(denom > 0.0, dots / denom, 0.0)
            out[rows] = s_u[np.searchsorted(uo, oc_rows)]
            scratch[b_idx] = 0.0
        return out

    return score_batch


def block_key_for_mention(pred_col, obj_col):
    """Blocking key: entity type + normalized money value (the reference's
    obj normalization, F4, doubles as the blocking function)."""
    return F.concat_ws("#", pred_col, normalize_money_udf(obj_col))


# The TF-IDF scorer fits its IDF table driver-side, which requires
# collecting the DISTINCT aliases — valid only under the "small curated
# dictionary" contract this module is built on. The guard makes that
# contract enforceable instead of aspirational: past the cap the
# collect would OOM the driver / bloat every task closure silently.
MAX_TFIDF_ALIASES = 1_000_000


def link_entities(
    mentions: DataFrame,
    alias_dict: DataFrame,
    threshold: float = 0.5,
    ngram: int = 2,
    scorer: str = "jaccard",
    max_tfidf_aliases: int = MAX_TFIDF_ALIASES,
    emb_col: str = "embedding",
) -> DataFrame:
    """mentions(mention_id, pred, obj) × alias_dict(alias, canonical_id,
    block_key) -> (mention_id, pred, obj, canonical_id, score).

    Unlinked mentions are kept with NULL canonical_id (left join), so the
    caller can mint new vertex ids for them.

    ``scorer``: 'jaccard' (char-n-gram set Jaccard, pure Catalyst — the
    default for short surfaces) or 'tfidf' (char-n-gram TF-IDF cosine
    via an Arrow-batched UDF, north_star's weighting for longer surface
    forms — rare-n-gram agreement counts more than boilerplate). The
    tfidf path collects the distinct aliases to the driver to fit the
    IDF table and fails fast with a ValueError past
    ``max_tfidf_aliases``. The guard is a single LIMIT cap+1 collect
    (one scan, one action) — driver memory on the failure path is
    bounded by cap+1 rows, the same order the SUCCESS path holds at a
    full dictionary, never by the oversized dict's true size. An alias
    set past the cap isn't a curated dictionary; use
    ``scorer='tfidf_distributed'`` (identical scores, Spark-side fit,
    no cap) or ``scorer='jaccard'`` there instead.

    'tfidf_distributed' computes the SAME smooth-idf cosine with the
    IDF fit as a Spark aggregation — no driver collect, no closure, no
    Python anywhere. Cost shape: one linear explode+groupBy over the
    mention side (map-side combinable) plus broadcast idf/alias
    tables; pick it when the alias dictionary outgrows the driver-fit
    contract or when a pure-Catalyst plan is preferred over the Arrow
    UDF. Parity with 'tfidf' is pytest-pinned and both paths run
    against the same DuckDB oracle gate.

    'embedding' (the third north_star scorer) scores candidates by the
    cosine of ``emb_col`` arrays both frames must carry (mention-context
    and alias embeddings from the same encoder) — pure Catalyst
    ``aggregate``/``zip_with`` arithmetic, no UDF, fully distributed;
    the blocking/broadcast/argmax machinery is shared with the other
    scorers, so switching scorers never changes the join shape.
    """
    m = mentions.withColumn("block_key", block_key_for_mention(F.col("pred"), F.col("obj")))
    if scorer == "jaccard":
        score_col = jaccard(
            char_ngrams(F.col("obj"), ngram), char_ngrams(F.col("alias"), ngram)
        )
    elif scorer == "tfidf":
        # single action: LIMIT cap+1 + collect is both the fit input and
        # the guard (one scan of the alias side per job — the old shape
        # burned a separate count() action before collecting)
        rows = (
            alias_dict.select("alias")
            .distinct()
            .limit(max_tfidf_aliases + 1)
            .collect()
        )
        if len(rows) > max_tfidf_aliases:
            raise ValueError(
                f"alias dictionary has over {max_tfidf_aliases} distinct "
                "aliases, past the tfidf driver-side fitting cap; this "
                "is beyond the small-curated-dict contract — use "
                "scorer='jaccard' (fully distributed) or raise "
                "max_tfidf_aliases explicitly"
            )
        score_fn = make_tfidf_batch_scorer([r.alias for r in rows], ngram)

        @F.pandas_udf("double")
        def tfidf_udf(obj: pd.Series, alias: pd.Series) -> pd.Series:
            from ..functions.worker import pin_worker_threads

            pin_worker_threads()
            return pd.Series(score_fn(obj, alias), dtype="float64")

        score_col = tfidf_udf(F.col("obj"), F.col("alias"))
    elif scorer == "tfidf_distributed":
        # the SAME smooth-idf cosine as scorer='tfidf', but the fit is a
        # Spark aggregation instead of a driver-side collect: no
        # max_tfidf_aliases cap, no closure shipping — the dict's only
        # remaining bound is the broadcast of the enriched alias table
        # (drop to a shuffle join on block_key past that). Shape: one
        # linear explode+groupBy over the mention side (map-side
        # combinable), broadcast idf/alias tables, per-candidate dot
        # over the carried weight maps — no Python anywhere.
        # distinct aliases materialize ONCE (lazy checkpoint) — ndocs
        # and the df explode both consume this aggregation, and this is
        # the path that exists for dicts too large to re-scan casually
        dd = alias_dict.select("alias").distinct().localCheckpoint(eager=False)
        ndocs = dd.agg(F.count("*").cast("double").alias("_n"))
        dterms = dd.select(
            "alias",
            F.explode(char_ngrams(F.col("alias"), ngram)).alias("t"),
        )
        idf = (
            dterms.groupBy("t").agg(F.count("*").alias("_df"))
            .crossJoin(F.broadcast(ndocs))
            .select(
                "t",
                (F.log((1.0 + F.col("_n")) / (1.0 + F.col("_df"))) + 1.0)
                .alias("_w"),
            )
        )
        a_terms = (
            alias_dict
            # explode_outer mirrors the mention side: an alias SHORTER
            # than the n-gram size has zero terms, and a plain explode
            # would drop it from the rebuilt dict — and so from the
            # candidate join — entirely, where the 'tfidf'/'jaccard'
            # paths keep it as a 0.0-scored candidate (NULL canonical_id
            # at threshold > 0, linked at threshold <= 0). The NULL-t
            # sentinel row survives as an empty weight map with norm 0.
            .withColumn(
                "t", F.explode_outer(char_ngrams_multiset(F.col("alias"), ngram))
            )
            .groupBy("alias", "canonical_id", "block_key", "t")
            .agg(F.count("*").alias("_tf"))
            # left only for the NULL-t sentinel; non-null alias terms
            # are in the idf corpus by construction
            .join(F.broadcast(idf), on="t", how="left")
            .withColumn(
                "_w", F.when(F.col("t").isNotNull(), F.col("_tf") * F.col("_w"))
            )
        )
        alias_dict = a_terms.groupBy("alias", "canonical_id", "block_key").agg(
            F.map_from_entries(
                F.collect_list(
                    F.when(F.col("t").isNotNull(), F.struct("t", "_w"))
                )
            ).alias("_wmap"),
            F.sqrt(
                F.coalesce(F.sum(F.col("_w") * F.col("_w")), F.lit(0.0))
            ).alias("_nb"),
        )
        # the mention frame is REBUILT from the explode+groupBy itself —
        # pred/obj/block_key ride along as grouping keys, so there is ONE
        # scan of the mention source and ONE shuffle (the aggregation,
        # map-side combinable), never a second mention-scale join back.
        # explode_outer keeps sub-n-gram objs alive (t = NULL sentinel ->
        # empty weight map, norm 0, score 0.0 — loop-path parity), and
        # the full-key grouping also scores duplicate (mention_id, obj)
        # input rows independently instead of merging their n-grams.
        m_terms = (
            # dedupe mention ROWS before exploding: duplicate input rows
            # must not double the term frequencies (tf counts per-obj
            # n-gram occurrences, so the dedupe has to happen above the
            # explode, not on the exploded rows)
            m.select("mention_id", "pred", "obj", "block_key")
            .distinct()
            .select(
                "mention_id", "pred", "obj", "block_key",
                F.explode_outer(
                    char_ngrams_multiset(F.col("obj"), ngram)
                ).alias("t"),
            )
            .groupBy("mention_id", "pred", "obj", "block_key", "t")
            .agg(F.count("*").alias("_tf"))
            .join(F.broadcast(idf), on="t", how="left")
            .crossJoin(F.broadcast(ndocs))
            .withColumn(
                "_w",
                F.when(
                    F.col("t").isNotNull(),
                    F.col("_tf")
                    * F.coalesce(
                        F.col("_w"), F.log(F.lit(1.0) + F.col("_n")) + 1.0
                    ),
                ),
            )
        )
        m = m_terms.groupBy("mention_id", "pred", "obj", "block_key").agg(
            F.map_from_entries(
                F.collect_list(
                    F.when(F.col("t").isNotNull(), F.struct("t", "_w"))
                )
            ).alias("_omap"),
            F.sqrt(
                F.coalesce(F.sum(F.col("_w") * F.col("_w")), F.lit(0.0))
            ).alias("_na"),
        )
        dot = F.aggregate(
            F.map_entries(F.col("_omap")),
            F.lit(0.0),
            lambda acc, e: acc
            + e["value"]
            * F.coalesce(
                F.try_element_at(F.col("_wmap"), e["key"]), F.lit(0.0)
            ),
        )
        score_col = F.when(
            (F.col("_na") > 0) & (F.col("_nb") > 0),
            dot / (F.col("_na") * F.col("_nb")),
        ).otherwise(F.lit(0.0))
    elif scorer == "embedding":
        from .similarity import cosine

        for side, df in (("mentions", mentions), ("alias_dict", alias_dict)):
            if emb_col not in df.columns:
                raise ValueError(
                    f"scorer='embedding' needs an {emb_col!r} column on "
                    f"{side}"
                )
        m = m.withColumnRenamed(emb_col, "_m_emb")
        alias_dict = alias_dict.withColumnRenamed(emb_col, "_a_emb")
        # NULL-safe: a missing embedding on either side scores 0.0
        # (unlinked) instead of propagating NULL through the argmax
        score_col = F.coalesce(
            cosine(F.col("_m_emb"), F.col("_a_emb")), F.lit(0.0)
        )
    else:
        raise ValueError(f"unknown scorer {scorer!r}")
    cand = m.join(
        F.broadcast(alias_dict), on="block_key", how="left"
    ).withColumn("score", score_col)
    scored = cand.withColumn(
        "canonical_id",
        F.when(F.col("score") >= threshold, F.col("canonical_id")),
    )
    best = F.max_by(
        F.struct("canonical_id", "score", "alias"),
        F.struct(F.col("score"), F.col("canonical_id")),
    )
    return (
        scored.groupBy("mention_id", "pred", "obj")
        .agg(best.alias("_b"))
        .select(
            "mention_id",
            "pred",
            "obj",
            F.col("_b.canonical_id").alias("canonical_id"),
            F.round(F.col("_b.score"), 6).alias("score"),
        )
    )
