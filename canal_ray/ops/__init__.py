"""Operator library over the driver testdata tables.

Each module implements Ray-Data-first operators (vectorized ``map_batches``,
pre-aggregation before shuffles, broadcast small sides) that are exposed
through ``__ray_entry__.queries()`` with DuckDB oracles where SQL can express
the semantics.
"""
