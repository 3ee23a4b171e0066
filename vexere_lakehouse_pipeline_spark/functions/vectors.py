"""Vector math over array<float|double> embedding columns.

Pure Column expressions (`zip_with`/`aggregate` fold inside codegen) —
the hot path of similarity search never leaves the JVM.  A vectorized
pandas-UDF alternative lives in operators/similarity.py for very wide
vectors where Arrow+numpy wins.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dot_product(a: Column | str, b: Column | str) -> Column:
    return F.aggregate(
        F.zip_with(_c(a), _c(b), lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column | str) -> Column:
    return F.sqrt(
        F.aggregate(
            _c(a), F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
        )
    )


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity; null/zero-norm safe (returns null)."""
    return dot_product(a, b) / F.nullif(l2_norm(a) * l2_norm(b), F.lit(0.0))


def cosine_from_norms(a: Column | str, b: Column | str,
                      norm_a: Column | str, norm_b: Column | str) -> Column:
    """Cosine with precomputed L2 norms.

    Join-heavy similarity plans should hoist ``l2_norm`` into a column
    on each side BEFORE the join — otherwise each pair recomputes both
    norms, tripling the fold work (norms are O(dim) like the dot
    product).  Bit-identical to :func:`cosine_similarity`: same
    expressions, evaluated once.
    """
    return dot_product(a, b) / F.nullif(_c(norm_a) * _c(norm_b), F.lit(0.0))


def sign_sketch(a: Column | str, n_bits: int = 63) -> Column:
    """Pack the signs of the first ``n_bits`` components into ONE
    bigint — a binary embedding sketch (64-dim float64 → 8 bytes).
    Hamming distance between two sketches approximates angular
    distance (the SimHash/binary-embedding identity: P[sign bits
    differ] = angle/pi per hyperplane), so ``bit_count(xor(a, b))``
    ranks like cosine at 1/64th the bytes and pure int64 arithmetic —
    bit-portable across engines, unlike any float score.

    NULL and zero vectors get a NULL sketch (cosine undefined — the
    same exclusion contract as every similarity path).  ``n_bits`` is
    capped at 63 so the sketch stays a non-negative int64.
    """
    if not 1 <= n_bits <= 63:
        raise ValueError(f"n_bits must be in [1, 63], got {n_bits}")
    c = _c(a)
    terms = [
        F.when(
            F.element_at(c, i + 1).cast("double") >= 0,
            F.lit(1 << i).cast("long"),
        ).otherwise(F.lit(0).cast("long"))
        for i in range(n_bits)
    ]
    acc = terms[0]
    for t in terms[1:]:
        acc = acc + t
    nonzero = l2_norm(c) > 0
    return F.when(c.isNull() | ~nonzero, F.lit(None).cast("long")).otherwise(
        acc
    )


def hamming_distance(a: Column | str, b: Column | str) -> Column:
    """bit_count(a XOR b) over two int64 sign sketches."""
    return F.bit_count(_c(a).bitwiseXOR(_c(b)))


def sign_lsh_bucket(a: Column | str, n_bits: int = 8,
                    offset: int = 0) -> Column:
    """Random-hyperplane-style LSH bucket from the signs of components
    [offset, offset + n_bits) (deterministic, engine-portable stand-in
    for sampled hyperplanes; adequate for bucketing normalized
    embeddings).  Returns a compact bit-string like '10110010'.

    ``offset`` gives INDEPENDENT hash tables from disjoint dim slices —
    the standard multi-table LSH recall lever (candidates = union over
    tables; a true neighbor is lost only if it disagrees in EVERY
    table's slice), used by knn_graph/topk n_tables > 1."""
    c = _c(a)
    bits = F.transform(
        F.slice(c, offset + 1, n_bits),
        lambda x: F.when(x.cast("double") >= 0, F.lit("1")).otherwise(F.lit("0")),
    )
    # NULL vector -> NULL bucket (joins nothing), matching the SQL
    # oracle; concat_ws alone would coerce it to '' and cluster all
    # null-embedding rows into one spurious bucket.
    return F.when(c.isNull(), F.lit(None).cast("string")).otherwise(
        F.concat_ws("", bits)
    )
