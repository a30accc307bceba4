"""Python UDTF (user-defined table function) surface.

The reference has no UDTF (SURVEY.md §2.10); the engine ships the API so a
user can define one-row-in/N-rows-out expansions without leaving Python —
Spark 4's ``@udtf`` decorator, planned as a LATERAL table function.

Like scalar Python UDFs (SURVEY.md §4 "Defeats Catalyst #2"), a UDTF runs
row-at-a-time in a forked Python worker and blocks pushdown through it —
it is the PARITY/escape-hatch path. Every UDTF here documents its native
rewrite (``posexplode`` over a split, for the tokenizer below), which is
what production pipelines should use; the contract entry feeds the UDTF a
bounded slice and its DuckDB oracle certifies the semantics match the
native form exactly.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="pos int, token string")
class PosTokens:
    """Emit (position, token) per whitespace token of the input text —
    semantically identical to ``posexplode(split(trim(text), '\\s+'))``,
    which is the zero-Python production rewrite. NULL text emits no rows
    (matching posexplode over a NULL array)."""

    def eval(self, text: str):
        if text is None:
            return
        for i, t in enumerate(text.strip().split()):
            yield (i, t)


def register_udtfs(spark) -> None:
    """Register the engine's table functions on a session (idempotent)."""
    spark.udtf.register("pos_tokens", PosTokens)
