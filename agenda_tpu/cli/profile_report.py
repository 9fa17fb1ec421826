"""CLI: per-op device-time report from a ``jax.profiler`` trace directory.

Pair with any trainer/generator's ``AGENDA_TPU_PROFILE_DIR`` (see
``utils/profiling.maybe_profile``):

    AGENDA_TPU_PROFILE_DIR=/tmp/trace python -m agenda_tpu.cli.finetune_sd ...
    python -m agenda_tpu.cli.profile_report /tmp/trace --iters 20

The reference has no profiling surface at all (SURVEY.md §5: tqdm only); this
is the TPU-framework replacement for nsight/torch-profiler workflows.
"""

from __future__ import annotations

import argparse


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Summarize a jax.profiler trace.")
    p.add_argument("trace_dir", help="Directory passed to jax.profiler.trace")
    p.add_argument("--iters", type=int, default=1,
                   help="Iterations captured inside the trace (report is per-iter).")
    p.add_argument("--top", type=int, default=25, help="How many top ops to list.")
    return p.parse_args(argv)


def main(argv=None) -> int:
    from agenda_tpu.utils import xprof

    args = parse_args(argv)
    rep = xprof.device_op_report(args.trace_dir, iters=args.iters, top=args.top)
    print(xprof.format_report(rep))
    return 0 if rep is not None else 1


if __name__ == "__main__":
    raise SystemExit(main())
