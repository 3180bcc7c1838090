"""shaclex_ray — a Ray-Data-native knowledge-graph construction and
shape-validation engine with the query/data-processing capabilities of
weso/shaclex, built from scratch on ray.data.Dataset + Arrow batches.
"""

__version__ = "0.4.0"
