"""Shim: the procedural heatmap-domain builder moved into the package
(agenda_tpu/io/procedural.py) so bench.py can quick-train the composed
bench's stage-3 detector without a tests/ dependency (VERDICT r4 #4)."""

from agenda_tpu.io.procedural import make_heatmap_domain  # noqa: F401
