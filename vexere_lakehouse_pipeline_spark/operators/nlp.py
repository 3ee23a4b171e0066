"""NLP column operators: language routing + sentiment scoring.

Re-expresses the reference's driver-side pandas loops
(`predict/sentiment_analysis.py` — langdetect `.apply` at :10-14 and a
HuggingFace transformer batch loop at :35-140) as Arrow-batched pandas
UDFs that run distributed.

The engine contract for sentiment is "text → POS/NEG(/NEU) doubles in
[0,1], 4dp" — the *model* is pluggable.  Tests and this container use
the deterministic fake scorer (md5-derived probabilities); a real
transformer drops in via :func:`sentiment_udf` with a custom
``score_batch`` (load the model lazily per executor, score in batches —
the predict_batch_udf pattern)."""

from __future__ import annotations

import hashlib
from collections.abc import Callable

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

SENTIMENT_SCHEMA = "pos double, neg double, neu double"

ScoreBatch = Callable[[pd.Series], pd.DataFrame]


def fake_score_batch(texts: pd.Series) -> pd.DataFrame:
    """Deterministic stand-in scorer (FIXTURES.md §5): md5(text) drives
    a probability triple summing to ~1, rounded to 4dp."""

    def one(t: str | None) -> tuple[float, float, float]:
        if t is None:
            return (0.0, 0.0, 1.0)
        h = hashlib.md5(t.encode("utf-8")).digest()
        a, b, c = h[0] + 1, h[1] + 1, h[2] + 1
        s = a + b + c
        # Integer floor at 4dp (not round()): exact in both Python and
        # SQL engines, so oracle checks reproduce it bit-for-bit.
        return (a * 10000 // s / 10000, b * 10000 // s / 10000,
                c * 10000 // s / 10000)

    scored = texts.map(one)
    return pd.DataFrame(
        {
            "pos": scored.map(lambda x: x[0]),
            "neg": scored.map(lambda x: x[1]),
            "neu": scored.map(lambda x: x[2]),
        }
    )


def sentiment_udf(score_batch: ScoreBatch = fake_score_batch):
    """Arrow-batched sentiment scorer returning
    struct<pos:double, neg:double, neu:double>.

    ``score_batch`` runs once per Arrow batch on the executor; a real
    model implementation should lazy-init the model in a module/closure
    global so each Python worker loads it once (broadcast-per-executor
    lifecycle), exactly the predict_batch_udf pattern.
    """

    @pandas_udf(SENTIMENT_SCHEMA)
    def _score(texts: pd.Series) -> pd.DataFrame:
        return score_batch(texts)

    return _score


def langdetect_udf():
    """Model-based language detection (langdetect, seeded deterministic
    per the reference predict/sentiment_analysis.py:8) as a pandas UDF;
    raises ImportError at call time if langdetect isn't installed —
    callers fall back to functions.text.detect_language (pure-Spark
    heuristic)."""
    import langdetect  # noqa: F401 — gate: not present in this container

    from langdetect import DetectorFactory, detect

    DetectorFactory.seed = 0

    @pandas_udf("string")
    def _detect(texts: pd.Series) -> pd.Series:
        def safe(t):
            try:
                return detect(t)
            except Exception:
                return "und"

        return texts.map(safe)

    return _detect


def language_column(col: str | Column) -> Column:
    """Best-available language id: langdetect when importable, else the
    JVM-side heuristic (no Python in the plan)."""
    try:
        return langdetect_udf()(F.col(col) if isinstance(col, str) else col)
    except ImportError:
        from vexere_lakehouse_pipeline_spark.functions.text import detect_language

        return detect_language(col)


# ---------------------------------------------------------------------------
# Python UDTF (Spark >= 3.5): one input row -> many typed output rows.
# Kept for API coverage next to explode()-based shingling (which stays
# the JVM-side fast path — a UDTF pays the Python worker round-trip).
# Use a UDTF when span logic needs real Python (a tokenizer lib, a
# spaCy pipeline); this one emits word n-gram spans with positions.
# ---------------------------------------------------------------------------
try:  # pragma: no cover - availability gate
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos int, ngram string")
    class NgramSpans:
        """Yield (position, n-gram) for word trigrams of the input."""

        def eval(self, text: str, n: int = 3):  # noqa: D102
            import re as _re

            words = [w for w in _re.split(r"[^a-z0-9]+", (text or "").lower()) if w]
            if not words:
                return
            if len(words) < n:
                yield 0, " ".join(words)
                return
            for i in range(len(words) - n + 1):
                yield i, " ".join(words[i : i + n])

    HAS_UDTF = True
except ImportError:  # pragma: no cover
    NgramSpans = None
    HAS_UDTF = False


def register_udtfs(spark) -> None:
    """Register UDTFs for SQL use: ``SELECT s.* FROM t, LATERAL
    ngram_spans(t.text, 3) s``."""
    if not HAS_UDTF:  # pragma: no cover
        raise NotImplementedError("Python UDTFs require pyspark >= 3.5")
    spark.udtf.register("ngram_spans", NgramSpans)
