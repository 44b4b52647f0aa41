"""Embedding-space clustering primitives — centroids and assignment.

The two halves of Lloyd's algorithm as relational plans over an
``array<float>`` column:

* :func:`label_centroids` — the M-step: per-group mean vectors via
  ``posexplode`` + one hash aggregate keyed ``(group, pos)``. The array
  never round-trips through Python and the shuffle carries scalars.
  Exact-decimal sums make the mean order-independent (bit-identical on
  any partitioning), which is what lets an oracle engine replay it.
* :func:`assign_to_centroids` — the E-step: nearest-centroid assignment
  via a broadcast of the (small, k-row) centroid frame, squared-L2 in a
  single ``zip_with``/``aggregate`` JVM expression, deterministic argmin
  through a struct-min with the centroid id as tiebreaker.

At 100 TB the E-step is a map-only stage (centroids broadcast, one
output row per input row before the final count aggregate) and the
M-step is one shuffle of ``groups × dims`` scalars — both survive any
scale-up. Iterating the two to convergence is a driver loop; MLlib
KMeans (already used by `operators/similarity.build_ivf_index`) is the
prebuilt alternative — this module exists for deterministic,
oracle-checkable steps.

Beyond-reference surface (SURVEY §2.5: the reference has no numeric
vector operations at all).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def label_centroids(
    df: DataFrame,
    group_col: str,
    vec_col: str = "embedding",
    scale: int = 9,
) -> DataFrame:
    """Per-group mean vector, flat ``(group, pos, centroid)`` form."""
    flat = df.select(group_col, F.posexplode(vec_col).alias("pos", "val"))
    return flat.groupBy(group_col, "pos").agg(
        (
            F.sum(F.col("val").cast(f"decimal(18,{scale})")).cast("double")
            / F.count(F.lit(1))
        ).alias("centroid")
    )


def centroid_vectors(flat_centroids: DataFrame, group_col: str) -> DataFrame:
    """Re-assemble flat centroids into ``(centroid_id, centroid)`` arrays,
    position-sorted so the vector layout is deterministic."""
    return (
        flat_centroids.groupBy(group_col)
        .agg(F.array_sort(F.collect_list(F.struct("pos", "centroid"))).alias("pc"))
        .select(
            F.col(group_col).alias("centroid_id"),
            F.transform("pc", lambda s: s["centroid"]).alias("centroid"),
        )
    )


def assign_to_centroids(
    df: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    keep_cols: tuple[str, ...] = (),
    with_distance: bool = False,
) -> DataFrame:
    """Nearest-centroid assignment (squared L2, deterministic tiebreak).

    ``centroids`` is a ``(centroid_id, centroid: array<double>)`` frame —
    small by construction (k rows), so it packs into ONE broadcast row
    and the argmin runs per corpus row inside a single JVM expression:
    truly map-only, zero shuffles of the corpus side (a cross-join +
    groupBy(id) formulation would shuffle a k×-expanded corpus — the
    audit caught exactly that in the first cut). Distances are rounded
    to 6dp before the argmin so a last-ulp float difference can never
    flip an assignment between engines; exact ties break toward the
    smaller ``centroid_id`` via struct ordering.
    """
    packed = centroids.agg(
        F.array_sort(F.collect_list(F.struct("centroid_id", "centroid"))).alias("_cents")
    )
    # The double-cast probe vector is projected BELOW the cross join:
    # inside the per-centroid lambda a non-attribute expression is
    # re-evaluated per element, so referencing the cast transform there
    # rebuilt the O(d) array once per CENTROID (O(k·d) per row). As a
    # column on the stream side of the join it is built once per row
    # and the lambda reads an O(1) attribute; no Project-collapse rule
    # crosses a Join, so the alias cannot be inlined back.
    pre = df.select(
        F.col(id_col), *[F.col(c) for c in keep_cols],
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("__vec"))
    vec = F.col("__vec")

    def _scored(c):
        d2 = F.aggregate(
            F.zip_with(vec, c["centroid"], lambda a, b: (a - b) * (a - b)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        return F.struct(F.round(d2, 6).alias("d2"), c["centroid_id"].alias("centroid_id"))

    best = F.array_min(F.transform(F.col("_cents"), _scored))
    out = [id_col, *keep_cols, best["centroid_id"].alias("assigned")]
    if with_distance:
        # The (rounded) squared distance to the winning centroid — the
        # outlier-pruning signal; same determinism contract as the argmin.
        out.append(best["d2"].alias("d2"))
    return pre.crossJoin(F.broadcast(packed)).select(*out)
