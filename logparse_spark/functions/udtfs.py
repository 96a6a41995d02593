"""Python UDTFs (user-defined TABLE functions) — the §2.3 UDTF surface.

Spark 4 Python UDTFs run Arrow-optimized (`useArrow=True`): eval() is
invoked per input row but rows move JVM<->Python in Arrow batches, not
pickled one at a time.  UDTFs are still the slow path relative to
builtin generators (explode/posexplode/inline) — use one only when the
row-expansion logic genuinely needs Python.  `SplitSentences` is kept
deliberately simple so a SQL oracle (unnest + string_split) can verify
the full lateral-join path exactly.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="idx int, sentence string", useArrow=True)
class SplitSentences:
    """text -> one row per '. '-separated sentence, with its index."""

    def eval(self, text: str):  # noqa: D102 - contract in class docstring
        for i, s in enumerate((text or "").split(". ")):
            yield i, s


def register_udtfs(spark) -> None:
    """Register all UDTFs for SQL LATERAL use."""
    spark.udtf.register("split_sentences", SplitSentences)
