"""Shared test fixtures — re-exported from the package so bench.py and
__graft_entry__ (which cannot depend on tests/) share one implementation
(agenda_tpu/io/tiny_fixture.py)."""

from agenda_tpu.io.tiny_fixture import (  # noqa: F401
    bytes_to_unicode,
    make_tiny_pipeline_dir,
    write_tiny_tokenizer,
    write_tiny_vlm,
)
