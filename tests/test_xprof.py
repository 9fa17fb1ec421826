"""utils/xprof: parse jax.profiler xplane traces into per-op reports.

The CPU backend emits no per-op device lines, so the parsing/aggregation
logic is tested against a synthetic XSpace proto (the schema is what the
parser consumes); a live-trace test runs when a TPU backend is attached
(AGENDA_TPU_TESTS=1 pytest -m tpu).
"""

import os

import jax
import jax.numpy as jnp
import pytest

from agenda_tpu.utils import xprof


def _write_synthetic_trace(trace_dir: str) -> None:
    pb2 = xprof._xplane_pb2()
    xs = pb2.XSpace()
    plane = xs.planes.add()
    plane.name = "/device:TPU:0"
    plane.event_metadata[1].id = 1
    plane.event_metadata[1].name = "%fusion.65 = bf16[16,8,40,4096] fusion(...)"
    plane.event_metadata[2].id = 2
    plane.event_metadata[2].name = "%convolution.3 = bf16[16,64,64,320] convolution(...)"
    line = plane.lines.add()
    line.name = "XLA Ops"
    for md, dur_ms, n in ((1, 7.0, 2), (2, 2.5, 4)):
        for _ in range(n):
            ev = line.events.add()
            ev.metadata_id = md
            ev.duration_ps = int(dur_ms * 1e9)
    # a host plane that must be ignored
    host = xs.planes.add()
    host.name = "/host:CPU"
    os.makedirs(trace_dir, exist_ok=True)
    with open(os.path.join(trace_dir, "x.xplane.pb"), "wb") as f:
        f.write(xs.SerializeToString())


def test_device_op_report_synthetic(tmp_path):
    if not xprof.available():
        pytest.skip("no xplane proto module in this environment")
    trace_dir = str(tmp_path / "trace")
    _write_synthetic_trace(trace_dir)

    rep = xprof.device_op_report(trace_dir, iters=2)
    assert rep is not None and rep.plane == "/device:TPU:0"
    # (2*7.0 + 4*2.5) / 2 iters = 12.0 ms/iter
    assert abs(rep.total_ms - 12.0) < 1e-6
    cats = dict(rep.by_category)
    assert abs(cats["fusion"] - 7.0) < 1e-6
    assert abs(cats["convolution"] - 5.0) < 1e-6
    # top op: the fusion label, 7 ms/iter
    assert rep.top_ops[0][0].startswith("%fusion.65") and abs(rep.top_ops[0][1] - 7.0) < 1e-6
    text = xprof.format_report(rep)
    assert "by category" in text and "ms/iter" in text


def test_cli_profile_report_synthetic(tmp_path, capsys):
    if not xprof.available():
        pytest.skip("no xplane proto module in this environment")
    from agenda_tpu.cli import profile_report

    trace_dir = str(tmp_path / "t")
    _write_synthetic_trace(trace_dir)
    rc = profile_report.main([trace_dir, "--iters", "2"])
    out = capsys.readouterr().out
    assert rc == 0 and "plane /device:TPU:0" in out


def test_missing_trace_dir_is_graceful(tmp_path):
    assert xprof.device_op_report(str(tmp_path / "nope")) is None
    assert "no device trace" in xprof.format_report(None)


@pytest.mark.tpu
def test_live_trace_report(tmp_path):
    """Real trace on a real device (CPU backends emit no per-op lines)."""
    if not xprof.available():
        pytest.skip("no xplane proto module in this environment")
    if jax.default_backend() == "cpu":
        pytest.skip("needs a TPU backend (AGENDA_TPU_TESTS=1 pytest -m tpu)")

    @jax.jit
    def f(x):
        return jnp.tanh(x @ x.T).sum()

    x = jnp.ones((512, 512), jnp.float32)
    f(x).block_until_ready()
    trace_dir = str(tmp_path / "trace")
    with jax.profiler.trace(trace_dir):
        for _ in range(3):
            r = f(x)
        r.block_until_ready()
    rep = xprof.device_op_report(trace_dir, iters=3)
    assert rep is not None and rep.total_ms > 0
