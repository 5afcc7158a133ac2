"""Vector/embedding column builders — pure Catalyst expressions over
array<float> columns (F.zip_with / F.aggregate), computed in double.

These are the JVM-side primitives for similarity search and
embedding-based dedup; no Python crosses the row boundary, so a 100 TB
embedding table scans at parquet speed.  (A Pandas-UDF/numpy batch path
would win only for very high dimensions; at 64-1024 dims the codegen'd
fold is competitive and avoids Arrow transfer entirely.)
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def _as_double(v: Column) -> Column:
    return F.transform(v, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(_as_double(a), _as_double(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(_as_double(a), F.lit(0.0), lambda acc, x: acc + x * x)
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def dot_of_double(ad: Column, bd: Column) -> Column:
    """`dot` over arrays ALREADY cast to double (hoist the `_as_double`
    transform out of a per-pair loop — e.g. an exploded row × centroid
    join — and pay it once per row instead).  Bit-identical to
    `dot(a, b)` when `ad`/`bd` are `_as_double(a)`/`_as_double(b)`: the
    same products fold in the same order."""
    return F.aggregate(
        F.zip_with(ad, bd, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm_of_double(ad: Column) -> Column:
    """`norm` over an array already cast to double; bit-identical to
    `norm(a)` for `ad = _as_double(a)`."""
    return F.sqrt(F.aggregate(ad, F.lit(0.0), lambda acc, x: acc + x * x))


def l2_distance(a: Column, b: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.zip_with(_as_double(a), _as_double(b), lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def lsh_hyperplane_bucket(
    v: Column, num_planes: int, dims: int, seed: str = "plane"
) -> Column:
    """Random-hyperplane LSH bucket id (sign pattern over pseudo-random
    hyperplanes).  Hyperplane components are md5-derived uniforms in
    [-1, 1] — deterministic and reproducible in plain SQL, so the bucketed
    scale path has an exact oracle.  Bucket = sum of sign bits.  `seed`
    namespaces the plane family (banded LSH uses one family per band)."""
    import hashlib

    dv = _as_double(v)
    # same md5-derived uniforms as the SQL oracle, but computed here
    # (hashlib md5 == Spark md5) instead of as 64 Catalyst
    # md5/conv/substring trees per plane — analyzing + constant-folding
    # those dominated query build time (~3 s of driver work per query).
    # All planes ship as ONE parsed 2-D literal + a single transform/fold
    # pair: per-plane expression trees made Catalyst analysis itself the
    # dominant cost at 10+ planes (same collapse as the kmeans argmin,
    # operators/ml_ops.py).  repr() doubles are shortest-round-trip, so
    # the parsed values are bit-identical to the oracle's.
    planes = F.expr(
        "array("
        + ", ".join(
            "array("
            + ", ".join(
                repr(
                    int(hashlib.md5(f"{seed}{p}~{d}".encode()).hexdigest()[:8], 16)
                    / float(2**31)
                    - 1.0
                )
                + "D"
                for d in range(dims)
            )
            + ")"
            for p in range(num_planes)
        )
        + ")"
    )
    projs = F.transform(
        planes,
        lambda comps: F.aggregate(
            F.zip_with(dv, comps, lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
    )
    # bucket = Σ sign-bit << plane-index: distinct powers of two, so the
    # fold order cannot change the (exact integer) sum
    return F.aggregate(
        F.zip_with(
            projs,
            F.expr(f"sequence(0, {num_planes - 1})"),
            lambda pr, p: F.when(
                pr > 0, F.pow(F.lit(2.0), p.cast("double")).cast("long")
            ).otherwise(F.lit(0).cast("long")),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
