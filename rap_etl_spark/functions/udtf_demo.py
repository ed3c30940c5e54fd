"""V6: Python UDTF (Spark 4.x) — demo only.

Native ``explode``/``posexplode`` is ALWAYS preferred for exploding token
arrays (JVM-side, codegen); this UDTF exists to cover the API surface and
as the template for genuinely table-generating Python logic (e.g. a
tokenizer that yields a variable number of typed rows per input)."""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="pos: int, token: int")
class ExplodeTokens:
    """Yield (position, token) rows for one token array."""

    def eval(self, tokens):  # noqa: D102 (Spark UDTF contract)
        if tokens is None:
            return
        for i, t in enumerate(tokens):
            yield (i, int(t))


def register(spark) -> None:
    spark.udtf.register("explode_tokens", ExplodeTokens)
