"""PySpark-native knowledge-graph construction engine.

A from-scratch re-expression of the capabilities of the reference repo
``kiangkiangkiang/Information-Extraction-for-Chinese-NLP`` (UIE-style
prompt-conditioned span extraction over Chinese legal verdicts) as an
idiomatic Spark DataFrame pipeline over multi-turn transcript tables:

    transcripts (conv_id, turn_idx, role, text, tool, ts)
        -> window-ordered turn assembly per conv_id
        -> span-preserving text regularization
        -> sliding-window chunking with gold-span rebasing
        -> prompt expansion (one record per entity type)
        -> Arrow-batched scorer (mapInPandas; ONNX-ready, deterministic stub)
        -> UIE-style start/end pointer span decode
        -> select strategies (all / max / threshold)
        -> entity normalization + linking + connected-components canonicalization
        -> (subj, pred, obj) edge table + entity vertex table

Everything is declarative DataFrame / SQL so Catalyst handles pushdown,
pruning, broadcast selection, and AQE skew splitting; Python appears only
inside vectorized pandas/Arrow UDFs (never per-row).
"""

__version__ = "0.1.0"

ENTITY_TYPES = ["精神慰撫金額", "醫療費用", "薪資收入"]
"""The reference's prompt schema (reference: config/base_config.py:6)."""

REGULARIZED_TOKENS = [r"\n", r" ", r"　", r"\\n"]
"""Scrub list, applied in order (reference: config/base_config.py:17)."""
