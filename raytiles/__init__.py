"""raytiles — a Ray-Data-native spatial-join + tiling engine.

Reimplements the capabilities of the fosskers/vectortiles MVT codec
(see SURVEY.md) as a distributed Ray Data pipeline: geoparse ->
tile/cell assignment -> two-phase tile aggregation -> stateful MVT
encoder actors, plus the training-data ops a 100 TB corpus pipeline
needs (dedup, similarity search, text analysis).

The package registers itself for cloudpickle pickle-by-value so stage
callables (actor classes, batch fns) ship self-contained to Ray
workers regardless of the driver's working directory — no reliance on
workers being able to import this package from disk.
"""

from __future__ import annotations


def _register_self_shipping() -> None:
    try:
        import sys
        from ray import cloudpickle
        cloudpickle.register_pickle_by_value(sys.modules[__name__])
    except Exception:  # pragma: no cover — ray absent / vendored api drift
        pass


_register_self_shipping()
