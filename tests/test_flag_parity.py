"""CLI flag parity vs the reference scripts' argparse surfaces.

The reference's flag tables ARE its public API (SURVEY.md §5 "Config/flag
system: mirror the argparse CLIs verbatim"). This test extracts every
``add_argument("--flag"...)`` from the reference scripts and asserts our
parsers accept it. Skips when the reference checkout is not present (the
repo is standalone; the reference is only mounted in the build environment).
"""

import os
import re

import pytest

REF = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference checkout not mounted"
)

# (reference script, our parser module, flags we intentionally do not carry)
CASES = [
    (
        "data_generation/finetune_sd.py",
        "agenda_tpu.cli.finetune_sd",
        {
            "--local_rank",  # torch.distributed plumbing (jax needs none)
            "--hub_model_id", "--hub_token",  # push_to_hub credentials
            "--logging_dir",  # accelerate tracker dir (we log into output_dir)
            "--mixed_precision",  # bf16 is native; flag kept? see parser
            "--enable_npu_flash_attention",  # Ascend NPU only
            "--dream_training", "--dream_detail_preservation",  # DREAM paper
            "--non_ema_revision", "--revision", "--variant",  # HF hub revisions
            "--dataloader_num_workers",  # torch DataLoader knob
            "--use_karras_sigmas",  # unused by the reference pipeline itself
        },
    ),
    (
        "data_generation/finetune_sd_token.py",
        "agenda_tpu.cli.finetune_sd_token",
        {
            "--local_rank", "--hub_model_id", "--hub_token", "--logging_dir",
            "--mixed_precision", "--revision", "--variant",
            "--dataloader_num_workers",
        },
    ),
    (
        "data_generation/data_generation.py",
        "agenda_tpu.cli.data_generation",
        set(),
    ),
    (
        "data_annotation/refine_label.py",
        "agenda_tpu.cli.refine_label",
        set(),
    ),
]


def _ref_flags(path: str):
    src = open(os.path.join(REF, path)).read()
    return set(re.findall(r"add_argument\(\s*['\"](--[A-Za-z0-9_-]+)['\"]", src))


@pytest.mark.parametrize("ref_script,module,waived", CASES,
                         ids=[c[0].split("/")[-1] for c in CASES])
def test_parser_accepts_reference_flags(ref_script, module, waived):
    import importlib

    mod = importlib.import_module(module)
    parser_flags = set()
    # parse_args builds the parser fresh; grab it via the module's parse_args
    # signature by introspecting an ArgumentParser constructed the same way.
    import argparse

    orig = argparse.ArgumentParser.parse_args
    captured = {}

    def fake_parse(self, args=None, namespace=None):
        captured["parser"] = self
        return orig(self, [], namespace)

    argparse.ArgumentParser.parse_args = fake_parse
    try:
        try:
            mod.parse_args([])
        except SystemExit:
            pass  # required-arg errors are fine; the parser was captured
    finally:
        argparse.ArgumentParser.parse_args = orig
    parser = captured["parser"]
    parser_flags = {s for s in parser._option_string_actions if s.startswith("--")}

    ref = _ref_flags(ref_script)
    assert ref, f"no flags extracted from {ref_script}?"
    missing = sorted(ref - parser_flags - waived)
    assert not missing, (
        f"{module} missing reference flags: {missing} "
        f"(waive intentionally-dropped ones in CASES)"
    )
