"""Plan cache with parameterized literals.

The reference's single biggest lifecycle feature missing from Catalyst
(SURVEY.md §4): literals in the SQL text are tokenized (ParamLiteral,
SnappyParser.scala:226-261) so textually different but structurally
identical queries share one cached plan, with new literal values re-bound
(SnappySession.scala:2584-2683).

PySpark approximation: normalize the SQL text by replacing literals with
positional slots → cache key; on hit, re-bind by substituting the new
literal values into the cached *parameterized* DataFrame via Spark 3.4+
parameterized sql(spark.sql(text, args)).  This saves re-parse/re-analyze
on the driver for repeated dashboard/point-lookup queries (the
TokenizationTest / PlanCachingTest shape in the reference test suite).
"""

from __future__ import annotations

import re
from collections import OrderedDict

from pyspark.sql import DataFrame, SparkSession

# string literals first (so numbers inside strings aren't tokenized), then
# numeric literals not part of an identifier
_STRING = re.compile(r"'(?:[^'\\]|\\.)*'")
_NUMBER = re.compile(r"(?<![\w'\.])-?\d+(?:\.\d+)?(?:[eE][+-]?\d+)?(?![\w'])")


def normalize_sql(text: str) -> tuple[str, list[str]]:
    """Replace literals with :p0, :p1 ... ; return (template, values)."""
    values: list[str] = []

    def _sub(m: re.Match) -> str:
        values.append(m.group(0))
        return f":p{len(values) - 1}"

    # one pass: find string or number occurrences left-to-right
    combined = re.compile(f"(?:{_STRING.pattern})|(?:{_NUMBER.pattern})")
    template = combined.sub(_sub, text)
    return template, values


class PlanCache:
    """Guava-planCache analogue (size default PlanCacheSize, Literals.scala:
    122-124); LRU of normalized-SQL → parameterized plan."""

    def __init__(self, max_size: int = 3000, enabled: bool = True):
        self.max_size = max_size
        self.enabled = enabled
        self._cache: OrderedDict[str, bool] = OrderedDict()
        self.hits = 0
        self.misses = 0

    def get_or_build(self, spark: SparkSession, text: str) -> DataFrame:
        if not self.enabled:
            return spark.sql(text)
        template, values = normalize_sql(text)
        args = {f"p{i}": _parse_literal(v) for i, v in enumerate(values)}
        key = template
        if key in self._cache:
            self.hits += 1
            self._cache.move_to_end(key)
        else:
            self.misses += 1
            self._cache[key] = True
            if len(self._cache) > self.max_size:
                self._cache.popitem(last=False)
        # Spark 3.4+ parameterized SQL: the parse tree for a given template
        # is identical across calls; literal values bind as parameters
        # (DynamicReplacableConstant analogue, ParamLiteral.scala:44-100).
        try:
            return spark.sql(template, args=args) if args else spark.sql(text)
        except Exception:
            # fall back to the raw text for dialect corners the normalizer
            # mangles (CodegenSparkFallback analogue, SnappyStrategies:831-856)
            return spark.sql(text)


def _parse_literal(tok: str):
    if tok.startswith("'"):
        return tok[1:-1].replace("\\'", "'")
    try:
        if re.search(r"[\.eE]", tok):
            return float(tok)
        return int(tok)
    except ValueError:
        return tok
