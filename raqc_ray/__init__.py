"""raqc_ray — a from-scratch, Ray-Data-native schema + constraint validation
engine over Arrow tables of image+caption pairs (and generic tabular data),
with the query/data-processing capabilities of USDA-ARS-NWRC/raqc's
repeat-array quality checks reimagined for web-scale tables.

Blueprint: /root/repo/SURVEY.md.  The reference checkout is empty in this
sandbox (SURVEY.md §0); reference citations in docstrings use the
reconstructed-upstream convention ``[R] path :: symbol (rec.)``.

Layout
------
- ``schema``     binding Arrow schemas (images / captions / violations / verdicts)
- ``codecs``     pure-numpy PPM + PNG codecs, phash (fixture + decode-check support)
- ``sketches``   vendored HyperLogLog + t-digest (mergeable, order-canonicalized)
- ``fixtures``   deterministic synthetic image+caption tables (FIXTURES.md)
- ``config``     CheckSpec registry + RunConfig — the engine's declarative surface
- ``stages``     map_batches stage bodies (row checks, stats partials, decode pool)
- ``checks``     shuffle-based checks (uniqueness, near-dup, referential) + drift
- ``pipelines``  end-to-end validation pipeline (read → checks → verdicts)
- ``state``      per-partition checkpoint/lineage manifest (resume)
- ``ops``        training-data pipeline operators (dedup, ANN, text analysis)
"""

__version__ = "0.1.0"
