"""Graph operators (SURVEY.md §2): normalization, degrees, orientation,
adjacency, triangle counting, and the iterative algorithms."""

from trianglecounting_spark.operators.normalize import (
    adjacency,
    degrees,
    max_node_id,
    normalize_edges,
    orient_dodg,
    rank_by_degree,
    undirect,
)
from trianglecounting_spark.operators.triangles import (
    clustering_coefficients,
    triangle_count_kernel,
    triangle_count_sql,
    triangle_per_edge_support,
    wedge_count,
)

__all__ = [
    "adjacency",
    "degrees",
    "max_node_id",
    "normalize_edges",
    "orient_dodg",
    "rank_by_degree",
    "undirect",
    "clustering_coefficients",
    "triangle_count_kernel",
    "triangle_count_sql",
    "triangle_per_edge_support",
    "wedge_count",
]
