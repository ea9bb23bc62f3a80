"""Text analysis for training-data pipelines: token counting, quality
scoring, language-ID heuristic, document fingerprinting, PII redaction,
and Gopher-style repetition filters.

Everything is built-in Catalyst expressions (JVM-side, codegen) — no
Python in the hot path. The only shuffle in the module is
``repetition_features``' bigram aggregate (deliberately linear in
document length; see its docstring).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

STOPWORDS = ["the", "a", "of", "and", "to", "in", "is"]
ZH_STOPCHARS = ["的", "是", "了"]

# marker profiles for the language-ID heuristic: whitespace-token match
# for space-delimited languages, per-CHARACTER occurrence counting for
# CJK — real Chinese running text has no whitespace token boundaries, so
# a token-equality check could never fire on it.
LANG_MARKERS = {
    "en": ["the", "a", "of"],
    "zh": ZH_STOPCHARS,
}

# CJK unified ideographs (the zh analysis unit: one char ≈ one token)
_CJK = "[一-鿿]"


def token_count(col):
    """Whitespace token count (empty string -> 0)."""
    return F.when(F.length(F.trim(col)) == 0, 0).otherwise(
        F.size(F.split(F.trim(col), r"\s+"))
    )


def _char_occurrences(col, ch: str):
    """Occurrences of a single character (length delta after removal)."""
    return F.length(col) - F.length(F.replace(col, F.lit(ch), F.lit("")))


def quality_features(docs: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """-> per-doc (n_chars, n_tokens, avg_token_len, stopword_ratio,
    punct_ratio, quality_score).

    CJK-aware: each CJK character counts as one token unit (running
    Chinese text has no whitespace boundaries — whitespace counting
    alone scores every zh document as ~1 token and a punct_ratio of
    ~1.0, so a --min-quality filter would silently drop the entire
    Chinese corpus), CJK chars are word chars for the punct ratio, and
    the zh stop-CHARACTERS 的/是/了 count toward stopword density like
    the English stop tokens do.
    """
    cols = quality_feature_cols(F.col(text_col))
    return docs.select(
        F.col(id_col).alias("doc_id"),
        *[v.alias(k) for k, v in cols.items()],
    )


def quality_feature_cols(text) -> dict:
    """The quality features as pure column EXPRESSIONS over ``text`` —
    usable inline (``df.filter(quality_feature_cols(col)["quality_score"]
    >= t)``) so a curation pipeline can quality-filter WITHOUT joining a
    skinny feature frame back to the corpus (each such join-back makes
    Spark re-execute the whole upstream subtree for the second
    reference — the composed-plan scan blowup the q8_dataprep audit
    caught). ``quality_features`` is this dict applied as a select."""
    # CJK chars replaced by a space so remaining Latin tokens still split
    stripped = F.regexp_replace(text, _CJK, " ")
    n_cjk = F.length(text) - F.length(F.regexp_replace(text, _CJK, ""))
    toks = F.split(F.trim(stripped), r"\s+")
    stop = F.array(*[F.lit(w) for w in STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda w: F.array_contains(stop, w)))
    for ch in ZH_STOPCHARS:
        n_stop = n_stop + _char_occurrences(text, ch)
    n_punct = F.length(text) - F.length(
        F.regexp_replace(text, r"[^\w\s" + _CJK[1:-1] + "]", "")
    )
    n_tokens = token_count(stripped) + n_cjk
    stopword_ratio = F.when(n_tokens > 0, n_stop / n_tokens.cast("double")).otherwise(0.0)
    punct_ratio = F.when(
        F.length(text) > 0, n_punct / F.length(text).cast("double")
    ).otherwise(0.0)
    avg_tok = F.when(
        n_tokens > 0,
        F.length(F.regexp_replace(text, r"\s+", ""))
        / n_tokens.cast("double"),
    ).otherwise(0.0)
    # simple composite: long-enough docs with moderate stopword density
    quality = (
        F.least(n_tokens / F.lit(100.0), F.lit(1.0)) * 0.5
        + F.least(stopword_ratio * 5, F.lit(1.0)) * 0.3
        + (1 - F.least(punct_ratio * 10, F.lit(1.0))) * 0.2
    )
    return {
        "n_chars": F.length(text),
        "n_tokens": n_tokens.cast("int"),
        "avg_token_len": F.round(avg_tok, 6),
        "stopword_ratio": F.round(stopword_ratio, 6),
        "punct_ratio": F.round(punct_ratio, 6),
        "quality_score": F.round(quality, 6),
    }


def lang_id(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Marker language ID: argmax over per-language marker OCCURRENCE
    counts — whitespace-token equality for en, per-CHARACTER counting
    for zh (running Chinese text has no token boundaries, so a
    token-equality check could never fire on real zh input); 'und' when
    nothing matches. Ties break toward the lexicographically larger
    language code (zh over en), same as the oracle."""
    text = F.col(text_col)
    toks = F.split(F.trim(text), r"\s+")
    scores = []
    for lang, markers in LANG_MARKERS.items():
        if lang == "zh":
            hits = F.lit(0)
            for ch in markers:
                hits = hits + _char_occurrences(text, ch)
        else:
            arr = F.array(*[F.lit(w) for w in markers])
            hits = F.size(F.filter(toks, lambda w: F.array_contains(arr, w)))
        scores.append(
            F.struct(hits.cast("int").alias("hits"), F.lit(lang).alias("lang"))
        )
    best = F.array_max(F.array(*scores))
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.when(best["hits"] > 0, best["lang"]).otherwise("und").alias("lang_pred"),
        best["hits"].alias("marker_hits"),
    )


def fingerprint(docs: DataFrame, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """Normalized-content fingerprint: md5 over the lowercased,
    whitespace-collapsed text (stable dedup/citation key)."""
    norm = F.lower(F.regexp_replace(F.trim(F.col(text_col)), r"\s+", " "))
    return docs.select(
        F.col(id_col).alias("doc_id"), F.md5(norm).alias("fingerprint")
    )


def winnow_fingerprints(docs: DataFrame, k: int = 8, w: int = 4,
                        id_col: str = "doc_id",
                        text_col: str = "text") -> DataFrame:
    """-> (doc_id, fp): MOSS-style winnowing fingerprints (Schleimer,
    Wilkerson & Aiken, SIGMOD'03) — rolling k-gram hashes, then the
    minimum of every w-hash window, deduplicated.

    The winnowing guarantee: any match of length ≥ k + w - 1 between two
    documents yields at least one shared fingerprint, with only ~2/(w+1)
    of all hashes retained — localized partial-overlap detection that a
    whole-document hash cannot give. All expressions are JVM-side and
    byte-portable (md5-hex → int), so a SQL oracle reproduces the set.
    Documents shorter than k + w - 1 normalized chars emit no rows.
    """
    # each stage lands in a real column: inlining `hs` into the window
    # transform would re-evaluate the whole hash array PER WINDOW
    # element (Catalyst doesn't CSE across nested lambdas) — O(n²) md5
    # per document instead of O(n)
    norm = F.lower(F.regexp_replace(F.trim(F.col(text_col)), r"\s+", " "))
    normed = docs.select(F.col(id_col).alias("doc_id"), norm.alias("t")).filter(
        F.length("t") >= k + w - 1
    )
    hashes = F.transform(
        F.sequence(F.lit(1), F.length("t") - (k - 1)),
        lambda i: F.conv(
            F.substring(F.md5(F.substring(F.col("t"), i, k)), 1, 8), 16, 10
        ).cast("long"),
    )
    hashed = normed.select("doc_id", hashes.alias("hs"))
    wins = F.transform(
        F.sequence(F.lit(0), F.size("hs") - w),
        lambda j: F.array_min(F.slice(F.col("hs"), j + 1, w)),
    )
    return hashed.select(
        "doc_id", F.explode(F.array_distinct(wins)).alias("fp")
    )


# PII patterns, ordered most-specific first: an email must redact as
# EMAIL before its digit run could partially match PHONE, and an
# ID-shaped token (letter + 9 digits) must redact as IDNUM before PHONE
# eats its 9-digit run (A123456789 -> A<PHONE>, mistyping the ID and
# leaking the letter prefix). Kept deliberately regex-simple: the point
# is the Catalyst-chain shape and redaction accounting, not
# locale-complete PII coverage.
PII_PATTERNS = [
    ("EMAIL", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("IDNUM", r"\b[A-Z][0-9]{9}\b"),  # TW national-ID shape (verdict corpus)
    ("PHONE", r"\+?[0-9][0-9 -]{7,14}[0-9]"),
]


def pii_scrub_col(text):
    """The PII redaction chain as a pure column expression — usable
    inline (``df.withColumn(text_col, pii_scrub_col(...))``) so a
    curation pipeline scrubs WITHOUT joining the skinny (doc_id, text)
    frame back to the corpus (the join-back doubles upstream
    execution — see quality_feature_cols)."""
    out = text
    for name, pat in PII_PATTERNS:
        out = F.regexp_replace(out, pat, f"<{name}>")
    return out


def _pii_placeholder_count(col):
    return F.size(
        F.regexp_extract_all(col, F.lit("<(EMAIL|PHONE|IDNUM)>"), F.lit(0))
    )


def scrub_pii(docs: DataFrame, id_col: str = "doc_id",
              text_col: str = "text") -> DataFrame:
    """-> (doc_id, text, n_redactions): PII redacted with typed
    placeholders — emails, phone-like digit runs, national-ID-shaped
    tokens. Pure sequential ``regexp_replace`` chain (JVM-side,
    codegen); n_redactions counts matched placeholders so a downstream
    filter can drop PII-dense documents entirely. The pattern list is a
    pluggable module constant, mirroring the reference's sequential
    scrub-list design (run_infer.py:52-59)."""
    out = pii_scrub_col(F.col(text_col))
    n_placeholders = _pii_placeholder_count

    # AFTER − BEFORE: a doc already carrying literal placeholder tokens
    # (re-scrubbed corpus, quoted placeholder) must report only the
    # redactions THIS pass made, or a drop-PII-dense filter discards
    # clean documents on the second pass.
    redacted = docs.select(
        F.col(id_col).alias("doc_id"),
        out.alias("text"),
        (n_placeholders(out) - n_placeholders(F.col(text_col)))
        .cast("long")
        .alias("n_redactions"),
    )
    return redacted


def repetition_features(docs: DataFrame, id_col: str = "doc_id",
                        text_col: str = "text") -> DataFrame:
    """-> (doc_id, dup_line_frac, top_bigram_frac, char_run_max):
    Gopher-style repetition signals (Rae et al. '21 §A1.1) for
    filtering degenerate/boilerplate documents:

    - dup_line_frac: 1 − distinct/total over newline-split lines
      (projection);
    - top_bigram_frac: occurrences of the most frequent word bigram
      over total bigrams — explode + two-level aggregate, LINEAR in
      document length (a per-row nested transform/filter would be
      quadratic per document and die on long boilerplate docs);
    - char_run_max: longest single-character run (projection).

    One shuffle for the bigram aggregate plus a per-doc join; the
    projections stay codegen'd.
    """
    lines = F.split(F.col(text_col), "\n")
    n_lines = F.size(lines)
    dup_line_frac = F.when(
        n_lines > 0,
        1.0 - F.size(F.array_distinct(lines)) / n_lines.cast("double"),
    ).otherwise(0.0)

    runs = F.regexp_extract_all(F.col(text_col), F.lit(r"(.)\1*"), F.lit(0))
    char_run_max = F.when(
        F.length(F.col(text_col)) > 0,
        # coalesce: '.' never matches \n, so a newline-only text has NO
        # runs and array_max(empty) is NULL — which a downstream
        # `char_run_max <= k` filter would silently drop
        F.coalesce(F.array_max(F.transform(runs, F.length)), F.lit(0)),
    ).otherwise(0)

    proj = docs.select(
        F.col(id_col).alias("doc_id"),
        F.round(dup_line_frac, 6).alias("dup_line_frac"),
        char_run_max.cast("long").alias("char_run_max"),
    )

    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    bigrams = F.transform(
        F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))),
        lambda w, i: F.concat_ws(" ", w, F.element_at(toks, i + 2)),
    )
    bg = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(bigrams).alias("bg"),
    )
    top = (
        bg.groupBy("doc_id", "bg").count()
        .groupBy("doc_id")
        .agg(F.max("count").alias("_top"), F.sum("count").alias("_n"))
        .select(
            "doc_id",
            F.round(F.col("_top") / F.col("_n").cast("double"), 6).alias(
                "top_bigram_frac"
            ),
        )
    )
    return proj.join(top, on="doc_id", how="left").select(
        "doc_id",
        "dup_line_frac",
        F.coalesce("top_bigram_frac", F.lit(0.0)).alias("top_bigram_frac"),
        "char_run_max",
    )
